#!/usr/bin/env bash
# Deployment-path smoke: the literal north-rule invocation —
# `spark-submit --py-files pasar_spark.zip` against a multi-executor
# master (local-cluster[2,4] here: 2 separate executor JVMs, 4 cores
# each) — driving gen -> ingest -> resume-noop -> stats through the CLI.
# Each step is its own spark-submit (its own driver JVM), so the resume
# step also proves the checkpoint survives process death.
#
# Usage: scripts/submit_demo.sh [workdir] [n_events]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_HOME="${SPARK_HOME:-$(python -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')}"
WORK="${1:-$(mktemp -d /tmp/pasar_submit_XXXX)}"
EVENTS="${2:-2000000}"
MASTER="${PASAR_SUBMIT_MASTER:-local-cluster[2,4,4096]}"
ZIP="$WORK/pasar_spark.zip"

mkdir -p "$WORK"
python - "$REPO" "$ZIP" <<'EOF'
import shutil, sys
repo, zip_path = sys.argv[1], sys.argv[2]
shutil.make_archive(zip_path[:-4], "zip", root_dir=repo, base_dir="pasar_spark")
EOF

submit() {
  "$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER" \
    --conf spark.executor.memory=3g \
    --conf spark.ui.showConsoleProgress=false \
    --py-files "$ZIP" \
    "$REPO/scripts/submit_driver.py" "$@" 2>"$WORK/last_stderr.log"
}

echo "# gen: deterministic change log ($EVENTS events)" >&2
submit gen --wal "$WORK/wal" --events "$EVENTS" --files 32

echo "# ingest: chunked replay into the lake table" >&2
submit ingest --table "$WORK/tbl" --wal "$WORK/wal" --chunk-size $((EVENTS / 4)) --buckets 32

echo "# ingest again: fully-applied WAL must be a no-op (exactly-once across driver JVMs)" >&2
submit ingest --table "$WORK/tbl" --wal "$WORK/wal" --chunk-size $((EVENTS / 4)) --buckets 32

echo "# stats" >&2
submit stats --table "$WORK/tbl"
