"""Gaps-and-islands interval merging (sessionization / era derivation).

The reference's flagship derived computation: the OHDSI era algorithm —
merge overlapping/nearby intervals with a persistence gap — implemented
twice in 112/135-line SQL monsters with UNION-interleaved event streams
and a theta join (etl/pypasar/db/sql/postgres/condition_era/
condition_era.sql:1-112, drug_era/drug_era.sql:1-135; SURVEY.md §2.6).

Spark-first formulation: two windows + one groupBy, no theta join —

1. carry the running max of interval end over preceding rows
   (``max(end).rowsBetween(unboundedPreceding, -1)``);
2. flag a new island where start > running_max + gap;
3. running sum of flags = island id;
4. groupBy island → era bounds + counts.

Cost: one shuffle (window partitioning doubles as the groupBy
partitioning, so Catalyst reuses the exchange). The theta-join version
the reference uses would be O(n^2)-ish per key; this is O(n log n) per
key (the sort), distributed across the key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_eras(
    df: DataFrame,
    partition_by: list[str],
    start_col: str,
    end_col: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Collapse per-key time points/intervals into eras separated by more
    than ``gap_seconds``. Returns one row per era:
    partition cols + era_start, era_end, n_events.

    With ``end_col=None`` each row is a point event (end = start) — the
    sessionization case. Timestamps in, timestamps out.
    """
    end = F.col(end_col) if end_col else F.col(start_col)
    w_order = Window.partitionBy(*partition_by).orderBy(F.col(start_col), F.col("_end"))
    prev_max_end = F.max("_end").over(w_order.rowsBetween(Window.unboundedPreceding, -1))

    flagged = (
        df.withColumn("_end", end)
        .withColumn("_prev_end", prev_max_end)
        .withColumn(
            "_new_island",
            # interval arithmetic (not epoch casts) so both TIMESTAMP and
            # TIMESTAMP_NTZ inputs work
            (
                F.col("_prev_end").isNull()
                | (
                    F.col(start_col)
                    > F.col("_prev_end") + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
                )
            ).cast("long"),
        )
        .withColumn(
            "_island",
            F.sum("_new_island").over(
                w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        flagged.groupBy(*partition_by, "_island")
        .agg(
            F.min(start_col).alias("era_start"),
            F.max("_end").alias("era_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_island")
    )


def session_stats(
    df: DataFrame, partition_by: list[str], ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Per-key session counts over point events: n_sessions, n_events."""
    eras = merge_eras(df, partition_by, ts_col, gap_seconds=gap_seconds)
    return eras.groupBy(*partition_by).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
