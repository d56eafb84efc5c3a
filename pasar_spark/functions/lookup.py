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
    else ``default``. Both joins broadcast the dictionary."""
    exact = _dedup_dict(dict_df, F.col(dict_key), dict_val)
    fuzzy = _dedup_dict(dict_df, normalize(F.col(dict_key)), dict_val)

    pass1 = df.join(
        F.broadcast(exact), df[src_col] == exact["_dk"], "left"
    ).withColumnRenamed("_dv", "_v1").drop("_dk")

    matched = pass1.where(F.col("_v1").isNotNull())
    missed = pass1.where(F.col("_v1").isNull()).drop("_v1")

    pass2 = (
        missed.join(
            F.broadcast(fuzzy), normalize(missed[src_col]) == fuzzy["_dk"], "left"
        )
        .withColumnRenamed("_dv", "_v1")
        .drop("_dk")
    )
    out = matched.unionByName(pass2)
    return out.withColumn(
        out_col, F.coalesce(F.col("_v1"), F.lit(default))
    ).drop("_v1")
