"""SparkSession factory tuned for the CDC-ingest workload.

Defaults are chosen for the 100 TB design point and scaled by core count
for local runs:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting) —
  the engine's backstop for hot conversation keys on top of explicit
  salting (see cdc/lww.py);
- Arrow execution on — every Python-side transform is a vectorized
  pandas_udf batch, never a row-at-a-time UDF;
- shuffle partitions sized to cores locally; on a real cluster this is
  2-3x total executor cores (AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pasar-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit the gateway JVM already exists and carries the
    # submitted --master/--conf (PYSPARK_GATEWAY_PORT is how the python
    # driver finds it); forcing local[*] here would fight the submit.
    # Explicit callers and PASAR_SPARK_MASTER still win.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("PASAR_SPARK_MASTER") or (
        None if under_submit else "local[*]"
    )
    cores = os.cpu_count() or 4
    if master and master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner != "*":
            cores = int(inner)
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let the planner pick shuffled-hash join when its size checks
        # pass (guide: often faster than sort-merge when one side is
        # moderately small per partition — skips both sorts). Not a
        # local-only knob: the same preference is the guide's baseline
        # for batch ETL clusters; SMJ remains the fallback whenever the
        # per-partition build side would not fit.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PASAR_DRIVER_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Parquet writers: zstd compresses transcripts ~2x better than
        # snappy at similar CPU — matters at 100 TB.
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
