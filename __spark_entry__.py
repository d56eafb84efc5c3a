"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in pasar_spark/queries.py (relational + CDC
families) and pasar_spark/queries_docs.py (documents/embeddings families);
this module only re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import pasar_spark.queries as _q
import pasar_spark.queries_docs  # noqa: F401  (registers doc/embedding queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW final-state reduce of the change feed derived from
    the events table at sf0.001 (see pasar_spark.queries.cdc_final_state)."""
    return _q.queries()["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
