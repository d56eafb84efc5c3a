"""Bucket-pruned copy-on-write MERGE — the engine's upsert primitive.

Semantics (the Iceberg statement this stands in for on a real cluster):

    MERGE INTO transcripts t
    USING (LWW-reduced chunk) s
    ON  t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND (s.ts, s.lsn) > (t.ts, t.lsn) AND s.op = 'D' THEN DELETE
    WHEN MATCHED AND (s.ts, s.lsn) > (t.ts, t.lsn)                THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op <> 'D'                              THEN INSERT *

Replaces the reference's truncate-then-load (etl/pypasar/omop/person.py:
24-33, measurement.py:91-95) with an incremental O(changes)+O(touched
buckets) rewrite.

Scale notes (100 TB / 1000 executors):
- the source side is LWW-reduced FIRST (one row per touched key), so the
  join's streamed side is bounded by distinct keys per chunk, not raw
  event volume;
- the target side is pruned to the buckets the chunk actually touches
  (manifest file-list pruning — Iceberg partition pruning analogue);
- both sides shuffle-hash-join on the natural key; AQE skew-join splits
  any still-hot bucket. On real Iceberg, a storage-partitioned join
  removes the target-side shuffle entirely — the bucket layout here is
  chosen to make that swap possible;
- metrics ride the write job via ``DataFrame.observe`` (no extra pass
  over the data), the Spark-native version of the reference's per-table
  stats (etl/__main__.py:77-98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pasar_spark.cdc.lww import lww_reduce
from pasar_spark.functions.normalize import normalize_text, normalize_text_native
from pasar_spark.lake.table import LakeTable

ORDER = ["ts", "lsn"]


def _require_row_mode(table: LakeTable, op: str) -> None:
    """Whole-row LWW applied to a patch table's stored form would keep
    only the newest stored row per key and silently discard older rows'
    per-column winner structs — irreversible data loss. Every row-mode
    entry point refuses patch tables up front; compaction/vacuum instead
    DISPATCH on the conflict rule (see compact_buckets)."""
    if table.manifest.get("conflict") == "patch":
        raise ValueError(
            f"{op}: table {table.path!r} has conflict='patch' (per-column "
            "LWW); use cdc.patch.merge_patch_chunk / PatchReplayRunner — "
            "whole-row LWW would discard stored column winners"
        )


def _obs_get(obs: Observation, defaults: dict) -> dict:
    """``Observation.get`` tolerating the unfilled case: a dynamic-
    partition write of ZERO rows skips the observed stage entirely, and
    converting the never-filled metrics row trips a JVM assertion
    (PythonSQLUtils.toPyRow). No rows flowed through the observe node,
    so ``defaults`` (the zero metrics) ARE the true answer."""
    try:
        return dict(obs.get)
    except Exception:
        return dict(defaults)


def merge_batch(
    table: LakeTable,
    changes: DataFrame,
    batch_id: str,
    last_lsn: int | None = None,
    normalizer: str = "arrow",  # 'arrow' | 'native' | 'none'
    mode: str = "cow",  # 'cow' (eager merge) | 'mor' (append deltas)
    partition_offsets: dict | None = None,
    stage: str | None = None,  # WAP: commit as staged snapshot <stage>
) -> tuple[LakeTable, dict]:
    """Apply one chunk of change events; returns (new table, metrics delta).

    Idempotent: a batch_id already in the ledger is a no-op (exactly-once
    under replay/crash-retry).

    mode='cow': read+join+rewrite the affected buckets (reads stay cheap,
    writes cost O(touched buckets) — fine while chunks >> table).
    mode='mor': append the LWW-reduced chunk as per-bucket delta files —
    O(chunk) writes regardless of table size, the 10^10-event path; reads
    LWW-resolve deltas until compact_buckets folds them. Both modes are
    equivalent under LWW because the reduce is associative: resolving
    (base ∪ deltas) lazily equals resolving eagerly per batch.
    """
    _require_row_mode(table, "merge_batch")
    if table.has_batch(batch_id):
        return table, {"skipped_batches": 1}

    key = table.manifest["key"]
    order = table.manifest.get("resolve_order", ORDER)
    schema_cols = table.schema.names()
    payload = [c for c in schema_cols if c not in set(key) | set(order) | {"_tombstone"}]

    lsn_col = order[-1]  # the monotone component of the resolve order
    obs_src = Observation(f"src-{batch_id}")
    changes = changes.observe(
        obs_src, F.count(F.lit(1)).alias("events_seen"), F.max(lsn_col).alias("max_lsn")
    )

    reduced = lww_reduce(changes, key=key, order=order, payload=payload + ["op"])
    if normalizer == "arrow":
        reduced = reduced.withColumn("text", normalize_text(F.col("text")))
    elif normalizer == "native":
        reduced = reduced.withColumn("text", normalize_text_native(F.col("text")))
    reduced = reduced.withColumn("_bucket", table.bucket_expr())

    if mode == "mor":
        is_delete = F.col("op") == "D"
        obs = Observation(f"mor-{batch_id}")
        final = reduced.select(
            *key,
            *order,
            *[F.when(is_delete, F.lit(None)).otherwise(F.col(c)).alias(c) for c in payload],
            is_delete.alias("_tombstone"),
            F.col("_bucket"),
        ).observe(
            obs,
            F.sum((~F.col("_tombstone")).cast("long")).alias("applied"),
            F.sum(F.col("_tombstone").cast("long")).alias("deleted"),
        )
        commit_id = table.new_commit_id()
        new_files = table.write_files(final, commit_id)
        m = _obs_get(obs, {"applied": 0, "deleted": 0})
        src_stats = _obs_get(obs_src, {"events_seen": 0, "max_lsn": None})
        delta = {
            "applied": int(m["applied"] or 0),
            "deleted": int(m["deleted"] or 0),
            "events_seen": int(src_stats["events_seen"] or 0),
        }
        if last_lsn is None:
            last_lsn = (
                int(src_stats["max_lsn"]) if src_stats["max_lsn"] is not None else None
            )
        table = table.commit_append(
            new_files,
            batch_id,
            last_lsn=last_lsn,
            metrics_delta=delta,
            partition_offsets=partition_offsets,
            staged_name=stage,
        )
        return table, delta

    reduced = reduced.persist()
    try:
        affected = sorted(
            r["_bucket"] for r in reduced.select("_bucket").distinct().collect()
        )
        src_stats = obs_src.get

        base = table.read(buckets=affected, include_tombstones=True)
        change_side = reduced.select(
            *[F.col(k).alias(f"_ck_{k}") for k in key],
            *[F.col(c).alias(f"_c_{c}") for c in order + payload + ["op", "_bucket"]],
        )
        cond = None
        for k in key:
            c = base[k] == change_side[f"_ck_{k}"]
            cond = c if cond is None else (cond & c)
        joined = base.join(change_side, cond, "full_outer")

        base_exists = F.col(order[-1]).isNotNull()
        base_live = base_exists & ~F.coalesce(F.col("_tombstone"), F.lit(False))
        change_exists = F.col(f"_c_{order[-1]}").isNotNull()
        newer = F.struct(*[F.col(f"_c_{c}") for c in order]) > F.struct(
            *[F.col(c) for c in order]
        )
        take_change = change_exists & (~base_exists | newer)
        is_delete = F.col("_c_op") == "D"
        # Deletes are persisted as TOMBSTONES (row kept, payload nulled,
        # _tombstone=true) so an out-of-order staler event in a later chunk
        # can never resurrect the key. Tombstone GC past the out-of-order
        # horizon is a vacuum concern, not a merge concern.
        decision = (
            F.when(take_change & ~is_delete, F.lit("apply"))
            .when(take_change & is_delete & base_live, F.lit("delete"))
            .when(take_change & is_delete & ~base_live, F.lit("noop_delete"))
            .when(change_exists & ~take_change, F.lit("stale"))
            .otherwise(F.lit("keep"))
        )

        taken = F.col("_dec").isin("apply", "delete", "noop_delete")
        out_cols = []
        for k in key:
            out_cols.append(F.coalesce(F.col(k), F.col(f"_ck_{k}")).alias(k))
        for c in order:
            out_cols.append(F.when(taken, F.col(f"_c_{c}")).otherwise(F.col(c)).alias(c))
        for c in payload:
            out_cols.append(
                F.when(F.col("_dec") == "apply", F.col(f"_c_{c}"))
                .when(taken, F.lit(None))
                .otherwise(F.col(c))
                .alias(c)
            )
        out_cols.append(
            F.when(F.col("_dec").isin("delete", "noop_delete"), F.lit(True))
            .when(F.col("_dec") == "apply", F.lit(False))
            .otherwise(F.coalesce(F.col("_tombstone"), F.lit(False)))
            .alias("_tombstone")
        )
        merged = joined.withColumn("_dec", decision).select(*out_cols, F.col("_dec"))

        obs_merge = Observation(f"merge-{batch_id}")
        merged = merged.observe(
            obs_merge,
            F.sum((F.col("_dec") == "apply").cast("long")).alias("applied"),
            F.sum((F.col("_dec") == "delete").cast("long")).alias("deleted"),
            F.sum((F.col("_dec") == "stale").cast("long")).alias("skipped_stale"),
        )
        final = merged.drop("_dec").withColumn("_bucket", table.bucket_expr())

        commit_id = table.new_commit_id()
        new_files = table.write_files(final, commit_id)
        m = obs_merge.get if affected else {"applied": 0, "deleted": 0, "skipped_stale": 0}
        delta = {
            "applied": int(m["applied"] or 0),
            "deleted": int(m["deleted"] or 0),
            "skipped_stale": int(m["skipped_stale"] or 0),
            "events_seen": int(src_stats["events_seen"] or 0),
        }
        if last_lsn is None:
            last_lsn = int(src_stats["max_lsn"]) if src_stats["max_lsn"] is not None else None
        table = table.commit_merge(
            replaced_buckets=affected,
            new_files=new_files,
            batch_id=batch_id,
            last_lsn=last_lsn,
            metrics_delta=delta,
            partition_offsets=partition_offsets,
            staged_name=stage,
        )
        return table, delta
    finally:
        reduced.unpersist()


def compact_buckets(
    table: LakeTable,
    min_files: int = 8,
    buckets: list[str] | None = None,
    policy: str = "tiered",  # 'tiered' (LSM-style) | 'full'
    major_ratio: float = 1.0,
) -> tuple[LakeTable, dict]:
    """Fold MoR delta files; bounds read amplification to ``min_files``.

    policy='tiered' (the 10^10-event path): when a bucket's delta file
    count reaches ``min_files``, fold ONLY the deltas into one delta
    (minor compaction, O(deltas) write) — unless the folded deltas have
    grown to ``major_ratio`` x the base row count, in which case rewrite
    the whole bucket (major compaction, resolves it). Like an LSM tree,
    each row is rewritten O(log) times over the table's life instead of
    O(table/chunk) times under full-rewrite-every-K-chunks.

    policy='full': always rewrite the whole bucket (the pre-tiered
    behavior; simplest read path).

    Both policies reuse the LWW reduce, so any interleaving of minor and
    major compactions yields the same final state (associativity —
    property-tested). Tombstones are KEPT: they still guard against
    resurrection by out-of-order stragglers; vacuum_tombstones drops
    them past the out-of-order horizon."""
    unresolved = set(table.manifest.get("unresolved", []))
    if buckets is not None:
        todo = [str(b) for b in buckets if str(b) in unresolved]
    else:
        todo = [
            b
            for b in unresolved
            if len(table.bucket_entries(b, kind="delta")) >= min_files
        ]
    if not todo:
        return table, {"compacted_buckets": 0, "minor_compacted_buckets": 0}

    key = table.manifest["key"]
    order = table.manifest.get("resolve_order", ["ts", "lsn"])
    payload = [c for c in table.schema.names() if c not in set(key) | set(order)]
    # Patch tables fold with the PER-COLUMN resolve (their stored form is
    # closed under it); whole-row lww_reduce here would pick the newest
    # stored row and discard older rows' still-winning column structs.
    is_patch = table.manifest.get("conflict") == "patch"
    if is_patch:
        from pasar_spark.cdc.patch import resolve_stored

        patch_cols = [
            c[len("_pv_"):] for c in table.schema.names() if c.startswith("_pv_")
        ]

        def _fold(df):
            return resolve_stored(df, key, patch_cols)
    else:

        def _fold(df):
            return lww_reduce(df, key=key, order=order, payload=payload)

    major, minor = [], []
    for b in todo:
        if not table.bucket_entries(b, kind="delta"):
            # nothing to fold — e.g. an explicitly-passed bucket whose
            # entries all pre-date the 'kind' field (default to base);
            # the minor path would otherwise lww_reduce(None) and crash
            continue
        base_rows = sum(e.get("rows", 0) for e in table.bucket_entries(b, kind="base"))
        delta_rows = sum(e.get("rows", 0) for e in table.bucket_entries(b, kind="delta"))
        if policy == "full" or base_rows == 0 or delta_rows >= major_ratio * base_rows:
            major.append(b)
        else:
            minor.append(b)

    delta_metrics = {"compacted_buckets": len(major), "minor_compacted_buckets": len(minor)}

    if minor:
        entries = [e for b in minor for e in table.bucket_entries(b, kind="delta")]
        deltas = table._read_entries(entries)
        folded = _fold(deltas)
        folded = folded.select(*table.schema.names()).withColumn(
            "_bucket", table.bucket_expr()
        )
        commit_id = table.new_commit_id()
        new_files = table.write_files(folded, commit_id)
        table = table.commit_replace_deltas(
            new_files,
            batch_id=f"compact-minor-v{table.version}",
            metrics_delta=delta_metrics if not major else None,
            tag=f"compact-minor-v{table.version}",
        )

    if major:
        data = table.read(buckets=major, include_tombstones=True).withColumn(
            "_bucket", table.bucket_expr()
        )
        commit_id = table.new_commit_id()
        # major compaction rewrites the bucket's long-lived base anyway —
        # the one place key-clustered files are worth their sort (row-group
        # pruning for point lookups; 2.6x too slow on the ingest path)
        new_files = table.write_files(data, commit_id, sort_keys=True)
        table = table.commit_merge(
            replaced_buckets=major,
            new_files=new_files,
            batch_id=f"compact-v{table.version}",
            metrics_delta=delta_metrics,
            tag=f"compact-v{table.version}",
        )
    return table, delta_metrics


def vacuum_tombstones(
    table: LakeTable, horizon_lsn: int, min_tombstones: int = 1
) -> tuple[LakeTable, dict]:
    """Drop tombstones whose lsn < horizon (the feed's max out-of-order
    distance behind the applied LSN): past the horizon no staler event
    can arrive, so the guard row is dead weight. Rewrites only buckets
    that actually hold old tombstones.

    ``min_tombstones``: only rewrite a bucket once it holds at least
    this many reclaimable tombstones. A bucket rewrite is O(bucket)
    regardless of how little it reclaims, and deletes spread thinly
    across the key space put ONE old tombstone in every bucket — the
    default (1) then degenerates to a full-table rewrite per vacuum
    (measured: all 64 buckets, endurance_r4.json). Setting a density
    floor makes vacuum cost proportional to reclaimable garbage; the
    skipped tombstones are correctness-neutral dead weight and are
    picked up once their bucket accumulates enough.

    Patch-table safe: all reads go through ``table.read``, which
    dispatches unresolved buckets to the per-column resolve for
    conflict='patch' manifests; the rewritten rows keep their winner
    structs (pinned by tests/test_patch_table.py)."""
    candidates = []
    all_buckets = list(table.manifest["buckets"].keys())
    flags = (
        table.read(buckets=[int(b) for b in all_buckets], include_tombstones=True)
        .where(F.col("_tombstone") & (F.col("lsn") < horizon_lsn))
        .withColumn("_bucket", table.bucket_expr())
        .groupBy("_bucket")
        .count()
        .where(F.col("count") >= min_tombstones)
        .select("_bucket")
        .collect()
    )
    candidates = [str(r["_bucket"]) for r in flags]
    if not candidates:
        return table, {"vacuumed_buckets": 0}
    data = (
        table.read(buckets=[int(b) for b in candidates], include_tombstones=True)
        .where(~(F.col("_tombstone") & (F.col("lsn") < horizon_lsn)))
        .withColumn("_bucket", table.bucket_expr())
    )
    commit_id = table.new_commit_id()
    new_files = table.write_files(data, commit_id)
    delta = {"vacuumed_buckets": len(candidates)}
    table = table.commit_merge(
        replaced_buckets=candidates,
        new_files=new_files,
        batch_id=f"vacuum-v{table.version}",
        metrics_delta=delta,
        tag=f"vacuum-v{table.version}",
    )
    return table, delta
