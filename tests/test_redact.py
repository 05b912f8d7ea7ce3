"""PII redaction (operators/redact.py)."""
from __future__ import annotations

from console_log_parser_spark.operators.redact import (
    PII_PATTERNS, redact_pii)


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return {r["doc_id"]: r for r in redact_pii(df).collect()}


def test_redact_counts_and_placeholders(spark):
    rows = _run(spark, [
        "plain words only",
        "write a@b.io and c.d+e@ex.org now",
        "host 10.2.3.4 then 255.255.255.0",
        "call +01-555-123-4567 today",
        "mix a@b.io 10.0.0.1 +01-555-000-1111",
    ])
    assert (rows[0]["n_email"], rows[0]["n_ipv4"], rows[0]["n_phone"]) \
        == (0, 0, 0)
    assert rows[0]["text_redacted"] == "plain words only"
    assert rows[1]["n_email"] == 2
    assert rows[1]["text_redacted"] == "write <EMAIL> and <EMAIL> now"
    assert rows[2]["n_ipv4"] == 2
    assert rows[2]["text_redacted"] == "host <IP> then <IP>"
    assert rows[3]["n_phone"] == 1
    assert rows[3]["text_redacted"] == "call <PHONE> today"
    assert rows[4]["text_redacted"] == "mix <EMAIL> <IP> <PHONE>"


def test_redact_documented_overlap_semantics(spark):
    # an @ with a purely numeric domain is NOT an email (the pattern
    # requires an alphabetic TLD) — the embedded IPv4 still gets
    # scrubbed; an IPv4-shaped local part with a real TLD counts for
    # BOTH classes on the raw text, and the sequential email-first
    # replacement scrubs it exactly once
    rows = _run(spark, ["ping a@1.2.3.4 done", "1.2.3.4@ex.com here"])
    r = rows[0]
    assert r["n_email"] == 0 and r["n_ipv4"] == 1
    assert r["text_redacted"] == "ping a@<IP> done"
    r = rows[1]
    assert r["n_email"] == 1 and r["n_ipv4"] == 1
    assert r["text_redacted"] == "<EMAIL> here"


def test_redact_plan_is_pure_map(spark):
    # zero exchange, zero Python: built-in regexp exprs only
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert len(PII_PATTERNS) == 3
