"""Structured Streaming facade: continuous binlog tail -> MERGE.

The batch replay (cdc/runner.py) and this stream share the SAME per-batch
core (schema evolution -> promote -> LWW reduce -> bucket-pruned MERGE);
only the chunking authority differs:

- batch replay chunks by LSN range (deterministic batch ids);
- streaming lets the Structured Streaming file source discover newly
  appended WAL files and uses the streaming epoch id as the batch id.

Exactly-once composition: Structured Streaming's checkpoint gives
at-least-once redelivery of a failed epoch; the lake table's snapshot-
embedded ledger (batch id "stream-<epoch>") makes re-application a no-op
— together: exactly-once, the same argument as the batch path, so a
crash between our snapshot commit and the streaming checkpoint commit is
harmless.

The reference has no streaming at all (SURVEY.md §2.10) — its closest
artifact is the LIMIT/OFFSET batch loop (measurement.py:124-145); this
module is the north-rule 'binlog/WAL tail' capability.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pasar_spark.cdc.merge import compact_buckets, merge_batch
from pasar_spark.cdc.runner import bootstrap_table
from pasar_spark.cdc.schema_evolution import EvolutionPlan, max_schema_ver, promote_extra
from pasar_spark.lake.table import LakeTable


def envelope_schema() -> StructType:
    """The change-event WAL envelope (datagen.EVENT_COLUMNS / FIXTURES.md
    F2) as an explicit StructType — what a production feed registry would
    pin for the stream source. Payload columns beyond the envelope travel
    in the JSON ``extra`` field and are promoted by schema evolution, so
    this schema is STABLE across feed schema versions by construction."""
    return StructType(
        [
            StructField("lsn", LongType()),
            StructField("op", StringType()),
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
            StructField("schema_ver", IntegerType()),
            StructField("extra", StringType()),
        ]
    )


def open_wal_stream(
    spark: SparkSession,
    wal_path: str,
    schema: StructType | None,
    wire_format: str,
    max_files_per_trigger: int | None,
):
    """Build the readStream over the WAL dir — the one place the wire
    format decides the source shape. ``debezium-json`` tails JSON lines
    (schema is `value string` by construction, always startable against
    an empty dir); ``parquet`` needs an envelope schema — pinned by the
    caller (production) or inferred from current contents (ad-hoc)."""
    import os

    if wire_format == "debezium-json":
        os.makedirs(wal_path, exist_ok=True)
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.text(wal_path)
    if schema is None:
        schema = spark.read.parquet(wal_path).schema
    os.makedirs(wal_path, exist_ok=True)  # tail-before-first-ship
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(wal_path)


class StreamingIngest:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        wal_path: str,
        checkpoint_path: str,
        n_buckets: int = 16,
        evolution_plan: EvolutionPlan | None = None,
        normalizer: str = "arrow",
        max_files_per_trigger: int | None = None,
        merge_mode: str = "mor",
        compact_min_files: int = 8,
        audit_checks=None,
        schema: StructType | None = None,
        wire_format: str = "parquet",
        dlq_path: str | None = None,
        followers: list | None = None,
    ):
        self.spark = spark
        self.table_path = table_path
        self.wal_path = wal_path
        self.checkpoint_path = checkpoint_path
        self.n_buckets = n_buckets
        self.evolution_plan = evolution_plan or EvolutionPlan()
        self.normalizer = normalizer
        self.max_files_per_trigger = max_files_per_trigger
        self.merge_mode = merge_mode
        self.compact_min_files = compact_min_files
        # quality-gated streaming (WAP per epoch): each micro-batch is
        # committed STAGED, audited by these checks against the staged
        # state, and only a passing audit publishes — readers of a live
        # tail never observe a bad epoch; a failing epoch raises, the
        # stream stops, and on restart the same epoch re-stages (the
        # batch id only entered the ledger if it published)
        self.audit_checks = audit_checks
        # pinned WAL envelope schema (the production path: a stream must
        # be startable BEFORE the first file ships, and must not re-infer
        # its envelope from whatever happens to be in the directory).
        # None keeps the old infer-from-contents behavior for ad-hoc use.
        self.schema = schema
        # WAL encoding: "parquet" (native envelope files) or
        # "debezium-json" (JSON-lines connector events — the shape a
        # Kafka-Connect file/S3 sink ships; cdc/debezium.py decodes them
        # inside each epoch, so the merge core is format-blind).
        if wire_format not in ("parquet", "debezium-json"):
            raise ValueError(f"unknown wire_format {wire_format!r}")
        self.wire_format = wire_format
        # quarantine for non-row-change lines on the debezium-json path
        # (truncates, tx markers, corrupt JSON): written per epoch under
        # dlq/epoch=<id>/ with overwrite, so a redelivered epoch rewrites
        # rather than duplicates its rejects — same idempotence argument
        # as the ledger. None drops rejects silently.
        self.dlq_path = dlq_path
        # downstream incremental consumers (anything with a .refresh()
        # that folds the table's CDF, e.g. cdc.derived.DerivedConvStats):
        # refreshed inside every epoch AFTER the source commit, so a
        # derived dashboard table tracks the live tail with at most one
        # epoch of lag. Exactly-once composes: a follower's refresh is
        # idempotent via its own source-version-keyed batch id, and it
        # folds ALL unconsumed source versions (not just this epoch's),
        # so a crash anywhere between the source commit and the last
        # follower's commit heals on the next delivery.
        self.followers = list(followers) if followers else []

    def bootstrap(self) -> LakeTable:
        return bootstrap_table(self.spark, self.table_path, self.n_buckets)

    def _apply_epoch(self, batch_df, epoch_id: int) -> None:
        batch_id = f"stream-{epoch_id}"
        table = LakeTable.load(self.spark, self.table_path)
        if table.has_batch(batch_id):
            # redelivered epoch after a checkpoint/commit race: the source
            # merge is a ledger no-op, but followers still refresh — the
            # crash may have landed BETWEEN the source commit and a
            # follower's commit, and this redelivery is what heals them.
            self._refresh_followers()
            return
        raw = None
        if self.wire_format == "debezium-json":
            from pasar_spark.cdc.debezium import debezium_rejects, from_debezium

            # the raw epoch is consumed 2-3 times (DLQ split, schema-ver
            # probe, merge) — persist it so the JSON parse runs once per
            # line, not once per action
            raw = batch_df.persist()
            if self.dlq_path is not None:
                debezium_rejects(raw, "value").write.mode("overwrite").text(
                    f"{self.dlq_path}/epoch={epoch_id}"
                )
            batch_df = from_debezium(raw, "value")
        try:
            if self.evolution_plan.steps:
                ver = max_schema_ver(batch_df)
                if ver > table.manifest["ledger"].get("feed_schema_ver", 0):
                    table = self.evolution_plan.apply_up_to(table, ver)
            batch_df = promote_extra(batch_df, table)
            if self.audit_checks is not None:
                from pasar_spark.cdc.wap import write_audit_publish

                table, _, _ = write_audit_publish(
                    table, batch_df, batch_id, checks=self.audit_checks,
                    normalizer=self.normalizer, mode=self.merge_mode,
                )
            else:
                table, _ = merge_batch(
                    table, batch_df, batch_id,
                    normalizer=self.normalizer, mode=self.merge_mode,
                )
            if self.merge_mode == "mor":
                compact_buckets(table, min_files=self.compact_min_files)
            self._refresh_followers()
        finally:
            if raw is not None:
                raw.unpersist()

    def _refresh_followers(self) -> None:
        """Advance each registered incremental consumer to the source
        head. Runs inside the epoch (driver-side, like foreachBatch
        itself); a raising follower fails the epoch AFTER the source
        commit, so the stream stops, restart redelivers the epoch, the
        source merge no-ops, and the follower retries — at-least-once
        refresh on top of an idempotent fold = exactly-once."""
        for f in self.followers:
            f.refresh()

    def _start(self, **trigger):
        self.bootstrap()
        stream = open_wal_stream(
            self.spark, self.wal_path, self.schema,
            self.wire_format, self.max_files_per_trigger,
        )
        return (
            stream.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(**trigger)
            .start()
        )

    def run_available_now(self):
        """Drain everything currently in the WAL dir, then stop — the
        bounded trigger (catch-up / test runs). Post-condition with
        followers: they are caught up to the source HEAD, even when the
        drain fired zero epochs (e.g. out-of-band source commits since
        the last drain — compaction, another writer)."""
        q = self._start(availableNow=True)
        q.awaitTermination()
        self._refresh_followers()
        return LakeTable.load(self.spark, self.table_path)

    def start(self, processing_time: str = "1 second"):
        """LIVE tail: fire every ``processing_time``, picking up WAL
        files as the shipper appends them — the production trigger. The
        per-epoch core (ledger batch id ``stream-<epoch>``, snapshot
        commit, MoR compaction) is identical to availableNow, so the
        exactly-once argument carries over unchanged. Returns the
        StreamingQuery; callers stop() it (tests) or awaitTermination()
        (a deployment)."""
        return self._start(processingTime=processing_time)


class MultiTableStreamingIngest:
    """Streaming demux: ONE WAL tail feeding N lake tables — the live
    form of cdc/router.py MultiTableReplayRunner (the reference's
    `python . etl <tables>` shape on a continuous feed).

    The streaming epoch replaces the router's LSN window: the epoch id
    is the batch id on EVERY target's ledger, so at-least-once epoch
    redelivery dedupes per table — a crash between two tables' commits
    inside one epoch heals on redelivery (committed tables no-op via
    ``has_batch``, laggards apply). No lockstep position commits are
    needed here: the streaming checkpoint is the single group-position
    authority, so a table whose epoch slice is empty simply skips (its
    recomputed slice is empty again on any redelivery).

    The epoch is persisted once and sliced per table — one decode/scan
    per epoch regardless of table count, same single-pass argument as
    the batch router.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        tables: list[str],
        route_by: str,
        wal_path: str,
        checkpoint_path: str,
        n_buckets: int = 16,
        normalizer: str = "arrow",
        max_files_per_trigger: int | None = None,
        merge_mode: str = "mor",
        compact_min_files: int = 8,
        schema: StructType | None = None,
        wire_format: str = "parquet",
        dlq_path: str | None = None,
        on_unrouted: str = "error",
        followers: list | None = None,
    ):
        import os

        if wire_format not in ("parquet", "debezium-json"):
            raise ValueError(f"unknown wire_format {wire_format!r}")
        if on_unrouted not in ("error", "ignore"):
            raise ValueError(f"on_unrouted must be 'error'|'ignore', got {on_unrouted!r}")
        if not tables:
            raise ValueError("tables must name at least one target")
        self.spark = spark
        self.base_dir = base_dir
        self.names = sorted(tables)
        self.route_by = route_by
        self.wal_path = wal_path
        self.checkpoint_path = checkpoint_path
        self.n_buckets = n_buckets
        self.normalizer = normalizer
        self.max_files_per_trigger = max_files_per_trigger
        self.merge_mode = merge_mode
        self.compact_min_files = compact_min_files
        self.schema = schema
        self.wire_format = wire_format
        self.dlq_path = dlq_path
        self.on_unrouted = on_unrouted
        self.followers = list(followers) if followers else []
        self.unrouted_events = 0
        # same guard as MultiTableReplayRunner: a separator or '.'/'..'
        # component would place a "table" outside base_dir
        bad = [
            n
            for n in self.names
            if os.sep in n or not n.strip() or n.strip() in (".", "..")
        ]
        if bad:
            raise ValueError(f"table names must be plain dir names, got {bad}")
        self._paths = {n: os.path.join(base_dir, n) for n in self.names}

    def bootstrap(self) -> dict[str, LakeTable]:
        from pasar_spark.cdc.router import sweep_stale_staging

        # a crashed combined epoch leaves its staging dir behind; without
        # this a long-lived streaming deployment that never runs a batch
        # replay over the same base_dir would leak staged epochs forever
        sweep_stale_staging(self.base_dir)
        return {
            n: bootstrap_table(self.spark, p, self.n_buckets)
            for n, p in self._paths.items()
        }

    def _apply_epoch(self, batch_df, epoch_id: int) -> None:
        from pyspark.sql import functions as F

        from pasar_spark.cdc.router import UnroutedEvents

        batch_id = f"stream-{epoch_id}"
        raw = None
        if self.wire_format == "debezium-json":
            from pasar_spark.cdc.debezium import debezium_rejects, from_debezium

            raw = batch_df.persist()
            if self.dlq_path is not None:
                debezium_rejects(raw, "value").write.mode("overwrite").text(
                    f"{self.dlq_path}/epoch={epoch_id}"
                )
            # _table = source.table, so route_by="_table" demuxes by the
            # connector's own relation identity — the canonical Debezium
            # multi-table topology (one publication, one LSN stream)
            batch_df = from_debezium(raw, "value", include_table=True)
        routed = batch_df.withColumn("_route", F.expr(self.route_by)).persist()
        try:
            counts = {
                r["_route"]: r["n"]
                for r in routed.groupBy("_route").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            n_unrouted = sum(v for k, v in counts.items() if k not in self._paths)
            if n_unrouted and self.on_unrouted == "error":
                raise UnroutedEvents(
                    f"epoch {epoch_id}: {n_unrouted} events route to "
                    "unconfigured targets — add them to `tables` or pass "
                    "on_unrouted='ignore'"
                )
            tables = {}
            todo = []
            already_applied = False
            for name in self.names:
                if counts.get(name, 0) == 0:
                    continue  # empty slice: checkpoint is the position authority
                table = LakeTable.load(self.spark, self._paths[name])
                if table.has_batch(batch_id):
                    already_applied = True
                    continue  # redelivered epoch, this target already has it
                tables[name] = table
                todo.append(name)
            if n_unrouted and (todo or not already_applied):
                # counted on first delivery: when work remains (todo), or
                # when NO routed target has applied this epoch — which
                # covers an epoch whose events are ALL unrouted (todo
                # empty, nothing ever records the batch id), previously a
                # silent drop. A redelivered fully-applied epoch (some
                # target has the batch, nothing todo) doesn't double the
                # count; partial redeliveries and all-unrouted epochs
                # recount — at-least-once under crash-redelivery, same
                # contract as the batch router's per-window counter.
                self.unrouted_events += n_unrouted
            from pasar_spark.cdc.router import combined_eligible, combined_window

            if todo and self.merge_mode == "mor" and combined_eligible(tables, todo):
                # the epoch is the window: one reduce + one write for all
                # targets, per-route max lsn recorded (no window bound)
                combined_window(
                    self.base_dir, tables, routed, todo, batch_id, counts,
                    chunk_hi=None, normalizer=self.normalizer,
                    compact_min_files=self.compact_min_files,
                )
            else:
                for name in todo:
                    table = tables[name]
                    part = routed.where(F.col("_route") == F.lit(name)).drop("_route")
                    part = promote_extra(part, table)
                    table, _ = merge_batch(
                        table, part, batch_id,
                        normalizer=self.normalizer, mode=self.merge_mode,
                    )
                    if self.merge_mode == "mor":
                        compact_buckets(table, min_files=self.compact_min_files)
            self._refresh_followers()
        finally:
            routed.unpersist()
            if raw is not None:
                raw.unpersist()

    def _refresh_followers(self) -> None:
        # same contract as StreamingIngest followers: refresh inside the
        # epoch, idempotent fold keyed on consumed source versions, so
        # redelivery heals a crash between source and follower commits
        for f in self.followers:
            f.refresh()

    def _start(self, **trigger):
        self.bootstrap()
        stream = open_wal_stream(
            self.spark, self.wal_path, self.schema,
            self.wire_format, self.max_files_per_trigger,
        )
        return (
            stream.writeStream.foreachBatch(self._apply_epoch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(**trigger)
            .start()
        )

    def run_available_now(self) -> dict[str, LakeTable]:
        """Drain everything currently in the WAL dir, then stop; returns
        every target at its final version."""
        q = self._start(availableNow=True)
        q.awaitTermination()
        self._refresh_followers()
        return {n: LakeTable.load(self.spark, p) for n, p in self._paths.items()}

    def start(self, processing_time: str = "1 second"):
        """LIVE multi-table tail; same trigger semantics as
        StreamingIngest.start()."""
        return self._start(processingTime=processing_time)
