"""Driver-retired queries stay oracle-checked here.

The driver's correctness gate records at most 50 registry entries, so two
redundant small-scale twins (dedup_ngram_jaccard, dedup_embedding_cosine)
were retired from __spark_entry__ in r3. Retirement must not mean
untested: this suite runs each retired query against its DuckDB oracle —
the same row-count/schema/value comparison the driver performs.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import pasar_spark.queries_docs  # noqa: F401  (registers the retired queries)
from pasar_spark.queries import retired_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(retired_queries()))
def test_retired_query_matches_oracle(spark, duck, name):
    fn, sql = retired_queries()[name]
    assert sql is not None, f"{name} retired without an oracle"
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _norm_rows(scols, srows) == _norm_rows(dcols, drows)
