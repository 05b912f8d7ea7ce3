"""console_log_parser_spark — a PySpark-native console/telemetry log
analytics engine.

A from-scratch rebuild of the capabilities of ``fzs/console_log_parser``
(reference at /root/reference, read-only) as a parse -> enrich -> route ->
aggregate DataFrame pipeline over tables of pre-tokenized console
transcripts, designed for 10^12-sequence scale:

- ``functions.ansi``    compiled-regex ANSI/VT sequence model (replaces the
                        reference's byte-at-a-time VT500 FSM,
                        vtparser.py:246-476, with vectorized regex passes)
- ``oracle``            independent pure-Python char-at-a-time oracle used
                        only by tests (clean-room FSM, validated against the
                        reference's golden transcripts)
- ``datagen``           deterministic synthetic tokenized-transcript tables
- ``operators.parse``   Arrow-vectorized parse stage (mapInArrow)
- ``operators.enrich``  broadcast source->route lookup join
- ``operators.route``   salted repartition + per-sink fan-out writes
- ``operators.aggregate`` per-sink aggregates (counts, token sums,
                        severity and escape-sequence histograms)
- ``plans.pipeline``    end-to-end DAG assembly
- ``plans.checkpoint``  micro-batch lineage manifests + resume
"""

__version__ = "0.1.0"
