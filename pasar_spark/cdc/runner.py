"""Chunked, checkpointed, resumable replay driver.

Replaces the reference's LIMIT/OFFSET pagination loop
(etl/pypasar/omop/measurement.py:124-145 — O(n^2) re-scans, driver-carried
id counter) with LSN-range chunking:

- chunk = ``WHERE lsn >= lo AND lsn < hi`` — a pure predicate, pushed into
  the parquet scan (the WAL is written range-partitioned by lsn, so footer
  min/max stats prune whole files; at 10^10 events a chunk touches only
  its own files);
- batch_id = ``lsn-<lo>-<hi>`` is a deterministic function of the range →
  a crash-and-rerun re-derives the same id and the ledger (committed
  atomically WITH the data, lake/table.py) makes re-application a no-op:
  exactly-once without coordination;
- resume = start from ``table.last_lsn + 1``; nothing else to restore;
- fetch cap (``max_events``) mirrors the reference's
  OMOP_MEASUREMENT_..._FETCH_LIMIT sampling knob (measurement.py:154-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pasar_spark.cdc.merge import compact_buckets, merge_batch
from pasar_spark.cdc.schema_evolution import EvolutionPlan, max_schema_ver, promote_extra
from pasar_spark.cdc.sources import FeedSource, as_source, lsn_file_stats
from pasar_spark.lake.table import LakeTable

# The transcript target schema (BASELINE.json input_hint) + the LWW
# comparator column ``lsn`` carried for cross-batch conflict resolution.
BASE_COLUMNS: list[tuple[str, str]] = [
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
    ("lsn", "bigint"),
    # delete tombstone flag — hidden on read, load-bearing for merge
    # correctness under out-of-order arrivals (see cdc/merge.py)
    ("_tombstone", "boolean"),
]
KEY = ["conv_id", "turn_idx"]


# Footer-stat reader lives with the feed sources now (cdc/sources.py);
# re-exported here for callers/tests that grew up with the old location.
_lsn_file_stats = lsn_file_stats


def _max_lsn_from_footers(path: str) -> int | None:
    """Feed tip via footer stats — a metadata read, not a column scan."""
    stats = lsn_file_stats(path)
    if not stats:
        return None
    return max(hi for _, _, hi in stats)


def bootstrap_table(spark: SparkSession, path: str, n_buckets: int) -> LakeTable:
    """Create-or-load the transcripts lake table — the single source of
    truth for the base layout, shared by batch replay and streaming so
    the two paths can never drift."""
    if LakeTable.exists(path):
        t = LakeTable.load(spark, path)
        if t.manifest.get("conflict") == "patch":
            raise ValueError(
                f"table {path!r} has conflict='patch' — row-mode replay/"
                "streaming would apply whole-row LWW over stored column "
                "winners; use cdc.patch.PatchReplayRunner"
            )
        return t
    return LakeTable.create(
        spark,
        path,
        columns=BASE_COLUMNS,
        key=KEY,
        n_buckets=n_buckets,
        bucket_by="conv_id",
    )


class ReplayRunner:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        n_buckets: int = 16,
        chunk_size: int = 1_000_000,
        evolution_plan: EvolutionPlan | None = None,
        normalizer: str = "arrow",
        # 'mor' (default): O(chunk) delta appends + bounded compaction —
        # 3x faster than 'cow' at 8 chunks and the gap grows with table
        # size; 'cow' keeps reads join-free (see cdc/merge.py)
        merge_mode: str = "mor",
        compact_min_files: int = 8,
    ):
        self.spark = spark
        self.table_path = table_path
        self.n_buckets = n_buckets
        self.chunk_size = chunk_size
        self.evolution_plan = evolution_plan or EvolutionPlan()
        self.normalizer = normalizer
        self.merge_mode = merge_mode
        self.compact_min_files = compact_min_files

    # ------------------------------------------------------------------
    def bootstrap(self) -> LakeTable:
        return bootstrap_table(self.spark, self.table_path, self.n_buckets)

    # ------------------------------------------------------------------
    def replay(
        self,
        events: DataFrame | str | FeedSource,
        max_events: int | None = None,
        stop_after_chunks: int | None = None,
    ) -> LakeTable:
        """Apply the change feed from the current checkpoint to its end.

        ``events`` is anything :func:`as_source` accepts: a parquet WAL
        dir path (footer-stat pruned), a live :class:`JdbcSource` /
        custom :class:`FeedSource`, or an events DataFrame. The replay
        loop itself never knows which — the source decides how ``tip``
        and each LSN-range ``chunk`` are answered (SURVEY.md S2/S3).

        ``stop_after_chunks`` exists for crash/resume testing: it aborts
        the loop mid-stream exactly as a killed driver would.
        """
        source = as_source(self.spark, events)

        hi = source.tip()
        if hi is None:
            return self.bootstrap()
        if max_events is not None:
            hi = min(hi, max_events - 1)
            if hi < 0:
                return self.bootstrap()

        table = self.bootstrap()
        lo = table.last_lsn + 1
        chunks_done = 0
        # Real LSN spaces are sparse (WAL byte offsets, GTID gaps), so the
        # loop must not degrade to O(lsn_range / chunk_size) empty-merge
        # iterations. `probe_gap` consults source.next_lsn(lo) — free for
        # parquet (footer stats), an index min-probe for JDBC — whenever a
        # gap is evidenced: at start, after a provably-empty range, and
        # after a merged window that saw zero events. Dense feeds never
        # probe after the first jump. Jump targets are deterministic for
        # an append-only feed, so batch ids stay stable across resume.
        probe_gap = True
        while lo <= hi:
            if probe_gap:
                nxt = source.next_lsn(lo)
                if nxt is None or nxt > hi:
                    break
                lo = max(lo, nxt)
                probe_gap = False
            chunk_hi = min(lo + self.chunk_size - 1, hi)
            batch_id = f"lsn-{lo}-{chunk_hi}"
            chunk = source.chunk(lo, chunk_hi)
            if chunk is None:
                # source proved the lsn range empty (footer stats / DB
                # index): nothing to apply; re-walked (cheaply) on resume
                # since last_lsn doesn't advance past it
                lo = chunk_hi + 1
                probe_gap = True
                continue

            if not table.has_batch(batch_id):
                if self.evolution_plan.steps:
                    ver = max_schema_ver(chunk)
                    if ver > table.manifest["ledger"].get("feed_schema_ver", 0):
                        table = self.evolution_plan.apply_up_to(table, ver)
                chunk = promote_extra(chunk, table)
                table, delta = merge_batch(
                    table,
                    chunk,
                    batch_id,
                    last_lsn=chunk_hi,
                    normalizer=self.normalizer,
                    mode=self.merge_mode,
                )
                if delta.get("events_seen", 1) == 0:
                    probe_gap = True  # window was empty — jump the gap
                if self.merge_mode == "mor":
                    table, _ = compact_buckets(table, min_files=self.compact_min_files)
            lo = chunk_hi + 1
            chunks_done += 1
            if stop_after_chunks is not None and chunks_done >= stop_after_chunks:
                break
        return table

    # ------------------------------------------------------------------
    def replay_partitions(
        self,
        sources: dict,
        stop_after_chunks: int | None = None,
    ) -> LakeTable:
        """Partitioned change feeds (the Kafka/binlog-shard shape): each
        source partition has its OWN monotonic offset space — there is no
        global LSN to checkpoint. Progress is kept per partition in the
        ledger (``source_partitions``), committed atomically with each
        chunk's data; resume reads the per-partition offsets back and
        continues every partition from its own cut point.

        ``sources`` maps a partition id to anything :func:`as_source`
        accepts. Cross-partition conflicts resolve through the same LWW
        order (ts, lsn) as everything else — deterministic under ANY
        partition processing order or interleaving, which is what makes
        processing partitions sequentially here (or in parallel on a
        real cluster, one writer per partition racing through the
        optimistic commit protocol) produce the same final state.

        Batch ids are (partition, offset-range)-deterministic, so a
        crash/rerun re-derives them and the ledger dedupes redelivery;
        chunks older than the ledger's id window are excluded by the
        offset cut itself, exactly like the single-feed path."""
        table = self.bootstrap()
        chunks_done = 0
        for part in sorted(sources, key=str):
            source = as_source(self.spark, sources[part])
            hi = source.tip()
            if hi is None:
                continue
            lo = table.source_offset(part) + 1
            probe_gap = True
            while lo <= hi:
                if probe_gap:
                    nxt = source.next_lsn(lo)
                    if nxt is None or nxt > hi:
                        break
                    lo = max(lo, nxt)
                    probe_gap = False
                chunk_hi = min(lo + self.chunk_size - 1, hi)
                batch_id = f"p{part}-lsn-{lo}-{chunk_hi}"
                chunk = source.chunk(lo, chunk_hi)
                if chunk is None:
                    lo = chunk_hi + 1
                    probe_gap = True
                    continue
                if not table.has_batch(batch_id):
                    if self.evolution_plan.steps:
                        ver = max_schema_ver(chunk)
                        if ver > table.manifest["ledger"].get("feed_schema_ver", 0):
                            table = self.evolution_plan.apply_up_to(table, ver)
                    chunk = promote_extra(chunk, table)
                    table, delta = merge_batch(
                        table,
                        chunk,
                        batch_id,
                        normalizer=self.normalizer,
                        mode=self.merge_mode,
                        partition_offsets={part: chunk_hi},
                    )
                    if delta.get("events_seen", 1) == 0:
                        probe_gap = True
                    if self.merge_mode == "mor":
                        table, _ = compact_buckets(
                            table, min_files=self.compact_min_files
                        )
                lo = chunk_hi + 1
                chunks_done += 1
                if stop_after_chunks is not None and chunks_done >= stop_after_chunks:
                    return table
        return table
