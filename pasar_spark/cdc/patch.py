"""Patch-mode tables: per-column LWW as a TABLE conflict rule.

Row-mode tables (the default) resolve whole rows — correct when every
change event carries a full row image. Feeds without full images
(Debezium with ``REPLICA IDENTITY`` short of FULL, sparse UPDATEs,
multi-producer column enrichment) need the patch rule: each column
independently resolves to its most recent non-null value, and a DELETE
resets every column so pre-delete values cannot resurrect.

The storage problem: a materialized row loses the per-column ORDER that
decided each value, and without it a later fold cannot re-resolve
correctly (an incoming old-but-never-superseded column set must win
against a newer row whose column came from an even older event). So
patch tables store, per payload column ``c``, a winner STRUCT
``_pv_<c>: struct<ts, lsn, v>`` — value plus the order that set it.
That makes the stored form CLOSED under resolution:

    resolve(resolve(E1) ∪ E2) == resolve(E1 ∪ E2)

because every per-column winner is a plain ``max`` over structs —
associative and commutative — exactly the property merge-on-read
folding, compaction, and the changes() diff already rely on in row
mode. Deletes ride the same max: a delete contributes ``(order, NULL)``
to every column and a tombstone to the row term.

Scale shape: identical to row mode — one aggregate with map-side
combine per stage, bucket-pruned commits, O(chunk) MoR writes. Cost is
one extra struct per payload column in storage and shuffle (the price
of column-level conflict resolution; Delta/Iceberg offer nothing
equivalent natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pasar_spark.lake.table import LakeTable

KEY = ["conv_id", "turn_idx"]
ORDER = ["ts", "lsn"]


def stored_columns(
    key: list[tuple[str, str]], payload: list[tuple[str, str]]
) -> list[tuple[str, str]]:
    """Physical schema of a patch table: key + row-version order cols +
    one winner struct per payload column + the row tombstone."""
    return [
        *key,
        ("ts", "timestamp"),
        ("lsn", "bigint"),
        *[
            (f"_pv_{n}", f"struct<ts:timestamp,lsn:bigint,v:{t}>")
            for n, t in payload
        ],
        ("_tombstone", "boolean"),
    ]


def payload_names(table: LakeTable) -> list[str]:
    return [c[len("_pv_") :] for c in table.schema.names() if c.startswith("_pv_")]


def reduce_events(
    events: DataFrame,
    key: list[str],
    payload: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Raw change events -> stored form (one row per key).

    Per column: ``max`` over candidates — non-null sets carry their
    value, deletes carry NULL — keyed by (ts, lsn) inside the struct.
    Row term: whole-row LWW of (ts, lsn, op) for version + tombstone.
    """
    ostruct = F.struct(*[F.col(o) for o in order_cols()])
    aggs = [
        F.max(F.struct(*[F.col(o) for o in order_cols()],
                       (F.col(op_col) == "D").alias("_t"))).alias("_row")
    ]
    for c in payload:
        is_del = F.col(op_col) == "D"
        value = F.when(is_del, F.lit(None)).otherwise(F.col(c))
        aggs.append(
            F.max(
                F.when(
                    F.col(c).isNotNull() | is_del,
                    F.struct(
                        *[F.col(o) for o in order_cols()], value.alias("v")
                    ),
                )
            ).alias(f"_pv_{c}")
        )
    g = events.groupBy(*key).agg(*aggs)
    return g.select(
        *key,
        *[F.col(f"_row.{o}").alias(o) for o in order_cols()],
        *[F.col(f"_pv_{c}") for c in payload],
        F.col("_row._t").alias("_tombstone"),
    )


def resolve_stored(df: DataFrame, key: list[str], payload: list[str]) -> DataFrame:
    """Fold N stored rows per key into one — the associative reduce used
    by MoR reads, compaction, and the changes() diff."""
    aggs = [
        F.max(
            F.struct(*[F.col(o) for o in order_cols()], F.col("_tombstone").alias("_t"))
        ).alias("_row")
    ]
    for c in payload:
        aggs.append(F.max(F.col(f"_pv_{c}")).alias(f"_pv_{c}"))
    g = df.groupBy(*key).agg(*aggs)
    return g.select(
        *key,
        *[F.col(f"_row.{o}").alias(o) for o in order_cols()],
        *[F.col(f"_pv_{c}") for c in payload],
        F.col("_row._t").alias("_tombstone"),
    )


def materialize(df: DataFrame, payload: list[str]) -> DataFrame:
    """Stored form -> user view: live rows, winner values as plain
    columns, provenance structs dropped."""
    live = df.where((F.col("_tombstone").isNull()) | (~F.col("_tombstone")))
    keep = [c for c in df.columns if not c.startswith("_pv_") and c != "_tombstone"]
    return live.select(*keep, *[F.col(f"_pv_{c}.v").alias(c) for c in payload])


def order_cols() -> list[str]:
    return list(ORDER)


def merge_patch_chunk(
    table: LakeTable,
    events: DataFrame,
    batch_id: str,
    last_lsn: int | None = None,
) -> LakeTable:
    """Apply one chunk of PARTIAL change events to a patch table:
    reduce to stored form, bucket, write, commit with the ledger —
    idempotent under batch-id redelivery, shared by batch replay and
    the streaming tail."""
    if table.has_batch(batch_id):
        return table
    key = table.manifest["key"]
    names = payload_names(table)
    stored = reduce_events(events, key, names).withColumn(
        "_bucket", table.bucket_expr()
    )
    files = table.write_files(stored, table.new_commit_id())
    return table.commit_append(files, batch_id, last_lsn=last_lsn)


class PatchReplayRunner:
    """Chunked, checkpointed replay of a PARTIAL-update change feed into
    a patch-mode table. Mirrors :class:`ReplayRunner` (same feed-source
    seam, LSN chunking, gap probes, deterministic batch ids, ledger
    exactly-once, MoR appends + minor compaction) with the patch reduce
    in place of whole-row LWW."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        payload: list[tuple[str, str]] | None = None,
        key: list[tuple[str, str]] | None = None,
        n_buckets: int = 16,
        chunk_size: int = 1_000_000,
        compact_min_files: int = 8,
    ):
        self.spark = spark
        self.table_path = table_path
        self.payload = payload or [("role", "string"), ("text", "string"), ("tool", "string")]
        self.key = key or [("conv_id", "string"), ("turn_idx", "int")]
        self.n_buckets = n_buckets
        self.chunk_size = chunk_size
        self.compact_min_files = compact_min_files

    # ------------------------------------------------------------------
    def bootstrap(self) -> LakeTable:
        if LakeTable.exists(self.table_path):
            t = LakeTable.load(self.spark, self.table_path)
            if t.manifest.get("conflict") != "patch":
                raise ValueError(
                    f"table {self.table_path!r} is a row-mode table — "
                    "patch replay would write winner structs into a "
                    "whole-row-LWW layout; use cdc.runner.ReplayRunner"
                )
            return t
        t = LakeTable.create(
            self.spark,
            self.table_path,
            columns=stored_columns(self.key, self.payload),
            key=[k for k, _ in self.key],
            n_buckets=self.n_buckets,
            bucket_by=self.key[0][0],
            name="transcripts-patch",
        )
        # mark the conflict rule in the manifest so any future reader can
        # dispatch (and so row-mode tools refuse politely)
        import json

        m = json.loads(json.dumps(t.manifest))
        m["conflict"] = "patch"
        return t._commit(m, tag="conflict-patch")

    def read(self, table: LakeTable | None = None) -> DataFrame:
        """Resolved, materialized user view of the patch table."""
        table = table or LakeTable.load(self.spark, self.table_path)
        names = payload_names(table)
        key = table.manifest["key"]
        stored = table.read(include_tombstones=True)
        return materialize(resolve_stored(stored, key, names), names)

    # ------------------------------------------------------------------
    def replay(self, events, max_events: int | None = None) -> LakeTable:
        from pasar_spark.cdc.sources import as_source

        source = as_source(self.spark, events)
        hi = source.tip()
        table = self.bootstrap()
        if hi is None:
            return table
        if max_events is not None:
            hi = min(hi, max_events - 1)
        key = table.manifest["key"]
        names = payload_names(table)
        lo = table.last_lsn + 1
        probe_gap = True
        while lo <= hi:
            if probe_gap:
                nxt = source.next_lsn(lo)
                if nxt is None or nxt > hi:
                    break
                lo = max(lo, nxt)
                probe_gap = False
            chunk_hi = min(lo + self.chunk_size - 1, hi)
            batch_id = f"patch-lsn-{lo}-{chunk_hi}"
            chunk = source.chunk(lo, chunk_hi)
            if chunk is None:
                lo = chunk_hi + 1
                probe_gap = True
                continue
            if not table.has_batch(batch_id):
                table = merge_patch_chunk(table, chunk, batch_id, last_lsn=chunk_hi)
                table = self._compact(table)
            lo = chunk_hi + 1
        return table

    def _compact(self, table: LakeTable) -> LakeTable:
        """Minor fold: buckets holding >= compact_min_files delta files
        collapse to ONE resolved delta (O(deltas) write) — stored form is
        closed under resolution, so folding is just resolve_stored."""
        key = table.manifest["key"]
        names = payload_names(table)
        for b, n in sorted(table.bucket_file_counts().items(), key=lambda kv: int(kv[0])):
            if n < self.compact_min_files:
                continue
            entries = table.bucket_entries(b)
            df = table._read_entries(entries)
            if df is None:
                continue
            folded = resolve_stored(df, key, names).withColumn(
                "_bucket", F.lit(int(b))
            )
            files = table.write_files(folded, table.new_commit_id())
            table = table.commit_merge(
                replaced_buckets=[int(b)],
                new_files={b: files.get(b, [])},
                batch_id=f"patch-compact-{b}-v{table.version}",
            )
        return table


class PatchStreamingIngest:
    """Structured Streaming tail into a patch table — same composition
    as streaming/stream.py: the file source discovers appended WAL
    files, the epoch id becomes the batch id, and the snapshot-embedded
    ledger turns at-least-once epoch redelivery into exactly-once."""

    def __init__(
        self,
        runner: PatchReplayRunner,
        wal_path: str,
        checkpoint_path: str,
        max_files_per_trigger: int | None = None,
        schema=None,
        followers: list | None = None,
    ):
        self.runner = runner
        self.wal_path = wal_path
        self.checkpoint_path = checkpoint_path
        self.max_files_per_trigger = max_files_per_trigger
        # downstream incremental consumers with a .refresh() keyed on
        # consumed source versions (cdc/derived.py works unchanged over a
        # patch source — its materialized view gives the same pre/post
        # images) — same epoch-embedded refresh + redelivery-heal
        # contract as streaming/stream.py followers
        self.followers = list(followers) if followers else []
        # pinned WAL envelope schema (patch feeds carry feed-specific
        # payload columns, so the pin comes from the caller's feed
        # registry); None infers from current WAL contents, which
        # requires at least one file to exist before start
        self.schema = schema

    def _apply_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        table = LakeTable.load(self.runner.spark, self.runner.table_path)
        table = merge_patch_chunk(table, batch_df, f"patch-stream-{epoch_id}")
        self.runner._compact(table)
        for f in self.followers:
            f.refresh()

    def run_available_now(self) -> LakeTable:
        import os

        self.runner.bootstrap()
        schema = self.schema
        if schema is None:
            schema = self.runner.spark.read.parquet(self.wal_path).schema
        os.makedirs(self.wal_path, exist_ok=True)
        reader = self.runner.spark.readStream.schema(schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        q = (
            reader.parquet(self.wal_path)
            .writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for f in self.followers:
            f.refresh()  # zero-epoch drains still catch followers up
        return LakeTable.load(self.runner.spark, self.runner.table_path)
