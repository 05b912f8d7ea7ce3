#!/usr/bin/env bash
# Package the library and run the pipeline exactly as the north rule
# deploys it: spark-submit --py-files at a chosen parallelism.
#
#   tools/submit_pipeline.sh <in_dir> <out_dir> [cores=8] [batches=8]
set -euo pipefail
cd "$(dirname "$0")/.."

IN_DIR=${1:?in_dir}
OUT_DIR=${2:?out_dir}
CORES=${3:-8}
BATCHES=${4:-8}

ZIP=$(python - <<'EOF'
from console_log_parser_spark.session import package_zip
print(package_zip())
EOF
)

# Same allocator pinning as session.py (large transient Arrow/decode
# buffers must come off the reused heap, not mmap/munmap cycles).
export MALLOC_MMAP_THRESHOLD_=${MALLOC_MMAP_THRESHOLD_:-536870912}
export MALLOC_TRIM_THRESHOLD_=${MALLOC_TRIM_THRESHOLD_:-536870912}

MEM="${SPARK_GRAFT_DRIVER_MEM:-8g}"
exec spark-submit \
    --master "local[$CORES]" \
    --driver-memory "$MEM" \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.driver.extraJavaOptions="-Xms$MEM -XX:+AlwaysPreTouch" \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    jobs/run_pipeline.py --in-dir "$IN_DIR" --out-dir "$OUT_DIR" \
    --batches "$BATCHES"
