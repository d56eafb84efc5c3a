"""Feed sources: where the change events come from.

The reference's actual source is a Postgres chunked cursor —
``pd.read_sql(..., chunksize=CHUNK_SIZE)`` at
etl/pypasar/omop/observation.py:55-65 / observation_utils/config.py:255,
and the LIMIT/OFFSET page loop at etl/pypasar/omop/measurement.py:124-145
(SURVEY.md S2/S3). This module is the engine's seam for that capability:
:class:`ReplayRunner` consumes any :class:`FeedSource`, so the same
checkpointed LSN-range replay tails

- a parquet WAL dir (:class:`ParquetDirSource` — footer-stat pruned, the
  simulated binlog used by tests and the bench),
- a live database (:class:`JdbcSource` — ``spark.read.format("jdbc")``
  with ``partitionColumn=lsn``, the S3 parity path: chunk predicates are
  pushed into the database and each chunk is itself a partitioned
  parallel read, never OFFSET pagination),
- or an already-built DataFrame (:class:`DataFrameSource`).

Contract: ``tip()`` returns the max LSN currently available (None for an
empty feed); ``chunk(lo, hi)`` returns the events with ``lsn`` in
``[lo, hi]``, or None when the source can prove the range is empty
without scanning (footer stats / DB index — the runner then skips the
range without scheduling a job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def lsn_file_stats(path: str) -> list[tuple[str, int, int]] | None:
    """Per-file (path, min_lsn, max_lsn) from parquet footer statistics.

    Returns None when any file lacks lsn stats (callers fall back to a
    full-dir Spark scan). Zero-row-group files (Spark writes these for an
    empty dataset) are skipped, not fatal. O(#files) driver-side metadata
    reads.
    """
    import os

    import pyarrow.parquet as pq

    out = []
    try:
        names = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not names:
            return None
        for f in names:
            full = os.path.join(path, f)
            md = pq.ParquetFile(full).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if "lsn" not in idx:
                return None
            f_min = f_max = None
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(idx["lsn"]).statistics
                if stats is None or not stats.has_min_max:
                    return None
                f_min = stats.min if f_min is None else min(f_min, stats.min)
                f_max = stats.max if f_max is None else max(f_max, stats.max)
            if f_min is None:
                continue  # zero row groups — contributes no lsn range
            out.append((full, int(f_min), int(f_max)))
    except (OSError, ValueError):
        # ValueError covers pyarrow.lib.ArrowInvalid (truncated/partial
        # file from a crashed writer) — fall back to the Spark scan
        return None
    return out


class FeedSource:
    """Abstract change-feed source for LSN-range replay."""

    def tip(self) -> int | None:
        raise NotImplementedError

    def chunk(self, lo: int, hi: int) -> DataFrame | None:
        raise NotImplementedError


class DataFrameSource(FeedSource):
    """An already-built events DataFrame (tests, composition)."""

    def __init__(self, df: DataFrame):
        self.df = df

    def tip(self) -> int | None:
        row = self.df.agg(F.max("lsn").alias("m")).collect()[0]
        return None if row["m"] is None else int(row["m"])

    def chunk(self, lo: int, hi: int) -> DataFrame | None:
        return self.df.where((F.col("lsn") >= lo) & (F.col("lsn") <= hi))


class ParquetDirSource(FeedSource):
    """Append-only parquet WAL dir, range-partitioned by lsn.

    Footer min/max stats give the feed tip as a metadata read and let
    each chunk list ONLY its overlapping files — at 10^10 events a chunk
    would otherwise schedule one (empty) scan task per non-matching file.
    Stats are captured once per replay call (the WAL may grow later;
    construct a fresh source per replay, as the runner does).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._stats = lsn_file_stats(path)

    def tip(self) -> int | None:
        if self._stats:
            return max(hi for _, _, hi in self._stats)
        row = (
            self.spark.read.parquet(self.path).agg(F.max("lsn").alias("m")).collect()[0]
        )
        return None if row["m"] is None else int(row["m"])

    def chunk(self, lo: int, hi: int) -> DataFrame | None:
        if self._stats is not None:
            overlapping = [
                p for p, f_lo, f_hi in self._stats if f_hi >= lo and f_lo <= hi
            ]
            if not overlapping:
                return None  # provably empty range — skip without a job
            src = self.spark.read.parquet(*overlapping)
        else:
            src = self.spark.read.parquet(self.path)
        return src.where((F.col("lsn") >= lo) & (F.col("lsn") <= hi))


class JdbcSource(FeedSource):
    """Database change feed via Spark's JDBC source (SURVEY.md S3).

    Replaces the reference's driver-side chunked cursor / OFFSET loop:
    the chunk predicate (``lsn BETWEEN lo AND hi``) is pushed into the
    database as the dbtable subquery, and ``partitionColumn=lsn`` with
    ``numPartitions`` splits each chunk into parallel range reads — the
    database does an index range scan per partition instead of a full
    re-scan per page (the O(n^2) OFFSET anti-pattern at
    measurement.py:205).
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        lsn_column: str = "lsn",
        num_partitions: int = 8,
        properties: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.lsn_column = lsn_column
        self.num_partitions = num_partitions
        self.properties = dict(properties or {})

    def _base_options(self) -> dict[str, str]:
        return {"url": self.url, **self.properties}

    def tip_query(self) -> str:
        return f"(SELECT max({self.lsn_column}) AS m FROM {self.table}) t"

    def chunk_options(self, lo: int, hi: int) -> dict[str, str]:
        """The exact reader options a chunk read uses (unit-testable
        without a live database)."""
        return {
            **self._base_options(),
            "dbtable": (
                f"(SELECT * FROM {self.table} WHERE {self.lsn_column} "
                f"BETWEEN {int(lo)} AND {int(hi)}) c"
            ),
            "partitionColumn": self.lsn_column,
            "lowerBound": str(int(lo)),
            "upperBound": str(int(hi) + 1),
            "numPartitions": str(self.num_partitions),
        }

    def tip(self) -> int | None:
        row = (
            self.spark.read.format("jdbc")
            .options(**self._base_options(), dbtable=self.tip_query())
            .load()
            .collect()[0]
        )
        return None if row["m"] is None else int(row["m"])

    def chunk(self, lo: int, hi: int) -> DataFrame | None:
        return (
            self.spark.read.format("jdbc").options(**self.chunk_options(lo, hi)).load()
        )


def as_source(spark: SparkSession, events) -> FeedSource:
    """Coerce the runner's ``events`` argument (path | DataFrame |
    FeedSource) to a FeedSource."""
    if isinstance(events, FeedSource):
        return events
    if isinstance(events, str):
        return ParquetDirSource(spark, events)
    if isinstance(events, DataFrame):
        return DataFrameSource(events)
    raise TypeError(f"cannot build a FeedSource from {type(events).__name__}")
