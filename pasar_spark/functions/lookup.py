"""Dictionary lookup with normalized-key fallback (two-pass match).

Reference: the drug-name mapping of temp_drugmed_view.sql:48-112 — exact
match against source_to_concept_map first, then unmatched rows re-matched
on a regex-stripped "base" code, first match per key wins, miss -> default.
(Also J3/J11: plain broadcast dict joins, mappings.py:182-186.)

Spark shape: two broadcast left joins + a unionByName — the dictionary is
the small side both times, so nothing here shuffles the fact table. The
dict side is deduped to one row per key with a deterministic pick
(min over values), mirroring the reference's ROW_NUMBER()=1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dedup_dict(dict_df: DataFrame, key: Column, val: str) -> DataFrame:
    return (
        dict_df.select(key.alias("_dk"), F.col(val).alias("_dv"))
        .groupBy("_dk")
        .agg(F.min("_dv").alias("_dv"))
    )


def two_pass_lookup(
    df: DataFrame,
    dict_df: DataFrame,
    src_col: str,
    dict_key: str,
    dict_val: str,
    normalize: Callable[[Column], Column],
    out_col: str = "mapped",
    default=None,
) -> DataFrame:
    """Adds ``out_col``: exact dict match, else match on normalize(key),
    else ``default``. Both joins broadcast the dictionary.

    Single pass over the fact side: the fallback is a second broadcast
    left join whose condition is gated on pass-1 missing (``_v1 IS NULL``
    as a residual condition on the hash join), not a filter/union split —
    the split formulation scanned the fact side twice (once per branch).
    """
    exact = _dedup_dict(dict_df, F.col(dict_key), dict_val)
    fuzzy = _dedup_dict(dict_df, normalize(F.col(dict_key)), dict_val)

    pass1 = df.join(
        F.broadcast(exact), df[src_col] == exact["_dk"], "left"
    ).withColumnRenamed("_dv", "_v1").drop("_dk")

    out = (
        pass1.join(
            F.broadcast(fuzzy),
            F.col("_v1").isNull() & (normalize(pass1[src_col]) == fuzzy["_dk"]),
            "left",
        )
        .withColumnRenamed("_dv", "_v2")
        .drop("_dk")
    )
    return out.withColumn(
        out_col, F.coalesce(F.col("_v1"), F.col("_v2"), F.lit(default))
    ).drop("_v1", "_v2")
