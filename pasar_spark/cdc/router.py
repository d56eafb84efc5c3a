"""Multi-table WAL router: one change feed, many target tables.

The reference is a multi-table ETL — ``python . etl <tables>`` drives
~22 OMOP targets through one pipeline (etl/__main__.py:21-44; source
relations enumerated at etl/pypasar/omop/measurement.py:16-24), and a
real Debezium/binlog feed interleaves every relation of the captured
schema in ONE global-LSN stream. This module is that shape for the lake:
:class:`MultiTableReplayRunner` demuxes a single feed into N lake
tables with ONE scan per LSN window.

Scale design (the part that matters at 10^10 events):

- **One pass per window, not one pass per table.** The window chunk is
  persisted once; each table's slice is a filter over the cached rows.
  N independent single-table replays over an interleaved WAL would each
  scan the whole feed — N× read amplification. Here read cost is
  O(feed), independent of table count.
- **Lockstep windows, per-table ledgers.** Every table commits every
  window — tables with events through the normal ``merge_batch`` path,
  empty tables through a METADATA-ONLY position advance
  (``commit_append({}, ...)``: no Spark job, one manifest write). So all
  tables' ``last_lsn`` agree at every window boundary, and a crash can
  split them across at most ONE window.
- **Resume = min over tables.** ``lo = min(last_lsn)+1`` re-derives the
  exact window the crash interrupted (window starts are deterministic
  functions of the feed: either a prior window's ``hi+1`` or a
  ``next_lsn`` probe result, both stable for an append-only feed);
  tables that already committed it skip via ``has_batch`` — the same
  ledger-dedup exactly-once argument as the single-table runner
  (cdc/runner.py), now per target.
- **Routing is a Catalyst expression**, evaluated once per window on
  the cached chunk (e.g. a column carried by the feed, Debezium's
  ``source.table``, or any derived expr). Per-route counts come from one
  ``groupBy`` over the cached rows; empty slices never launch a merge.

Heterogeneous payloads: all targets share the transcript base schema
(cdc/runner.py BASE_COLUMNS, the BASELINE.json input_hint); per-table
extra columns ride the ``extra`` JSON transport and promote through the
standard schema-evolution path (cdc/schema_evolution.py), exactly as in
the single-table runner.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pasar_spark.cdc.merge import compact_buckets, merge_batch
from pasar_spark.cdc.schema_evolution import EvolutionPlan, max_schema_ver, promote_extra
from pasar_spark.cdc.sources import FeedSource, as_source
from pasar_spark.lake.table import LakeTable
from pasar_spark.cdc.runner import bootstrap_table


class UnroutedEvents(ValueError):
    """Events routed to a table name outside the configured target set."""


class MultiTableReplayRunner:
    """Demux one LSN-ordered change feed into N lake tables.

    ``tables`` — target names (list), or ``{name: {per-table kwargs}}``
    to override e.g. ``n_buckets`` per target. Each target lives at
    ``<base_dir>/<name>``.

    ``route_by`` — a column name or Catalyst expression (str or Column)
    evaluated on each event to yield its target table name. Events whose
    route is NULL or names no configured target are handled per
    ``on_unrouted``: ``'error'`` (default — raise, nothing committed for
    the offending window) or ``'ignore'`` (drop; the loss is counted in
    ``runner.unrouted_events`` after :meth:`replay` — silent truncation
    is never an option, only explicit, counted truncation).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        tables: list[str] | dict[str, dict],
        route_by: str | Column,
        n_buckets: int = 16,
        chunk_size: int = 1_000_000,
        evolution_plan: EvolutionPlan | None = None,
        normalizer: str = "arrow",
        merge_mode: str = "mor",
        compact_min_files: int = 8,
        on_unrouted: str = "error",
    ):
        if on_unrouted not in ("error", "ignore"):
            raise ValueError(f"on_unrouted must be 'error'|'ignore', got {on_unrouted!r}")
        self.spark = spark
        self.base_dir = base_dir
        self.table_opts: dict[str, dict] = (
            {n: dict(o) for n, o in tables.items()}
            if isinstance(tables, dict)
            else {n: {} for n in tables}
        )
        if not self.table_opts:
            raise ValueError("tables must name at least one target")
        self.route_by = route_by
        self.n_buckets = n_buckets
        self.chunk_size = chunk_size
        self.evolution_plan = evolution_plan or EvolutionPlan()
        self.normalizer = normalizer
        self.merge_mode = merge_mode
        self.compact_min_files = compact_min_files
        self.on_unrouted = on_unrouted
        #: events dropped by on_unrouted='ignore' across replay() calls
        self.unrouted_events = 0

    # ------------------------------------------------------------------
    def _route_expr(self) -> Column:
        e = self.route_by
        return F.expr(e) if isinstance(e, str) else e

    def bootstrap(self) -> dict[str, LakeTable]:
        return {
            name: bootstrap_table(
                self.spark,
                os.path.join(self.base_dir, name),
                opts.get("n_buckets", self.n_buckets),
            )
            for name, opts in self.table_opts.items()
        }

    # ------------------------------------------------------------------
    def replay(
        self,
        events: DataFrame | str | FeedSource,
        max_events: int | None = None,
        stop_after_chunks: int | None = None,
    ) -> dict[str, LakeTable]:
        """Apply the feed from the group checkpoint to its tip; returns
        ``{name: LakeTable}`` at the final versions.

        The loop mirrors cdc/runner.py replay() (LSN windows, sparse-gap
        probing, deterministic batch ids) — the difference is purely the
        per-window demux fan-out described in the module docstring.
        """
        source = as_source(self.spark, events)
        tables = self.bootstrap()

        hi = source.tip()
        if hi is None:
            return tables
        if max_events is not None:
            hi = min(hi, max_events - 1)
            if hi < 0:
                return tables

        lo = min(t.last_lsn for t in tables.values()) + 1
        names = sorted(tables)
        chunks_done = 0
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
            if all(tables[n].has_batch(batch_id) for n in names):
                lo = chunk_hi + 1  # resume fast-path: whole window applied
                chunks_done += 1
                continue
            chunk = source.chunk(lo, chunk_hi)
            if chunk is None:
                lo = chunk_hi + 1
                probe_gap = True
                continue

            routed = chunk.withColumn("_route", self._route_expr()).persist()
            try:
                counts = {
                    r["_route"]: r["n"]
                    for r in routed.groupBy("_route").agg(
                        F.count(F.lit(1)).alias("n")
                    ).collect()
                }
                unrouted = {
                    k: v for k, v in counts.items() if k not in self.table_opts
                }
                n_unrouted = sum(unrouted.values())
                if n_unrouted and self.on_unrouted == "error":
                    raise UnroutedEvents(
                        f"window [{lo},{chunk_hi}]: {n_unrouted} events route "
                        f"to unconfigured targets {sorted(map(repr, unrouted))[:5]}"
                        " — add them to `tables` or pass on_unrouted='ignore'"
                    )
                self.unrouted_events += n_unrouted
                if sum(counts.get(n, 0) for n in names) == 0:
                    probe_gap = True  # window had no routable events

                for name in names:
                    t = tables[name]
                    if t.has_batch(batch_id):
                        continue
                    if counts.get(name, 0) == 0:
                        # metadata-only position advance: keeps the
                        # lockstep invariant without a Spark job
                        tables[name] = t.commit_append(
                            {}, batch_id, last_lsn=chunk_hi,
                            metrics_delta={"events_seen": 0},
                        )
                        continue
                    part = routed.where(F.col("_route") == F.lit(name)).drop("_route")
                    if self.evolution_plan.steps:
                        ver = max_schema_ver(part)
                        if ver > t.manifest["ledger"].get("feed_schema_ver", 0):
                            t = self.evolution_plan.apply_up_to(t, ver)
                    part = promote_extra(part, t)
                    t, delta = merge_batch(
                        t,
                        part,
                        batch_id,
                        last_lsn=chunk_hi,
                        normalizer=self.normalizer,
                        mode=self.merge_mode,
                    )
                    if self.merge_mode == "mor":
                        t, _ = compact_buckets(t, min_files=self.compact_min_files)
                    tables[name] = t
            finally:
                routed.unpersist()

            lo = chunk_hi + 1
            chunks_done += 1
            if stop_after_chunks is not None and chunks_done >= stop_after_chunks:
                break
        return tables
