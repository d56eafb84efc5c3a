"""In-pipeline data-quality checks.

Reference analogue: the inline assertions the ETL scatters through its
modules — death-date uniqueness raising ValueError
(etl/pypasar/omop/death.py:31-38), expected-count comments in SQL
(temp_drugmed_view.sql:10-14), and the stats readout
(final_statistics.py:26-52). Here they are first-class, composable
checks that run as single Spark jobs and raise ``QualityError`` with the
offending sample.

Lakehouse tables don't enforce PK/FK constraints (neither does the
reference's Postgres after drop_constraints.sql:1-12) — these checks are
the substitute, run post-commit or ad hoc via the library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(ValueError):
    pass


def assert_unique_key(df: DataFrame, key: list[str], sample: int = 5) -> None:
    """Every key combination appears exactly once (the final-table
    invariant after any replay — LWW guarantees it; this verifies it)."""
    dupes = df.groupBy(*key).count().where(F.col("count") > 1)
    rows = dupes.limit(sample).collect()
    if rows:
        raise QualityError(f"duplicate keys {key}: {[tuple(r)[:-1] for r in rows]}")


def assert_no_nulls(df: DataFrame, cols: list[str], sample: int = 5) -> None:
    cond = None
    for c in cols:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    rows = df.where(cond).limit(sample).collect()
    if rows:
        raise QualityError(f"nulls in {cols}: {len(rows)}+ rows, e.g. {rows[:2]}")


def assert_lsn_monotone_vs_ledger(df: DataFrame, last_lsn: int) -> None:
    """No visible row may carry an lsn beyond the ledger checkpoint —
    would indicate a torn/phantom commit."""
    n = df.where(F.col("lsn") > last_lsn).count()
    if n:
        raise QualityError(f"{n} rows with lsn > ledger last_lsn {last_lsn}")


def quality_report(df: DataFrame, key: list[str]) -> dict:
    """One-pass summary: row count, distinct keys, null text count, lsn
    span — the engine's version of the reference's `stats` entrypoint."""
    agg = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(*key).alias("distinct_keys"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    ).collect()[0]
    return {k: (int(v) if v is not None else None) for k, v in agg.asDict().items()}
