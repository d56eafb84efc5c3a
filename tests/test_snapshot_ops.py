"""Snapshot operations: incremental changes() (CDC-out), rollback,
snapshot expiry + orphan cleanup.

changes() is the engine's change-data-feed — what a downstream consumer
tails instead of re-reading the table (Iceberg/Delta CDF analogue). Its
contract: exactly the keys whose LIVE state differs between two
snapshots, classified insert/update/delete, post-image payload (null on
delete), pre-image resolve-order for lineage, and a read cost of
O(changed buckets) via driver-side manifest diff — proven here by
checking the planned input files.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.merge import compact_buckets
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import LakeTable

N = 10_000
CHUNK = 5_000


@pytest.fixture(scope="module")
def halves(spark, tmp_path_factory):
    """A table replayed in two chunks; (path, v_half, final_table)."""
    root = tmp_path_factory.mktemp("snapops")
    wal = str(root / "wal")
    write_change_log(
        change_events(spark, N, n_convs=120, seed=21, delete_fraction=0.12),
        wal,
        n_files=4,
    )
    tbl = str(root / "tbl")
    t1 = ReplayRunner(spark, tbl, n_buckets=8, chunk_size=CHUNK).replay(
        wal, max_events=CHUNK
    )
    t2 = ReplayRunner(spark, tbl, n_buckets=8, chunk_size=CHUNK).replay(wal)
    return tbl, t1.version, t2


def _brute_diff(spark, tbl, v_from, to_table):
    """Independent diff: full-outer join of the two snapshot reads."""
    key = ["conv_id", "turn_idx"]
    a = LakeTable.load(spark, tbl, version=v_from).read()
    b = to_table.read()
    j = b.alias("b").join(a.alias("a"), key, "full_outer")
    return {
        (r["conv_id"], r["turn_idx"], r["ct"])
        for r in j.select(
            *key,
            F.when(F.col("a.lsn").isNull(), "insert")
            .when(F.col("b.lsn").isNull(), "delete")
            .when(F.col("a.lsn") != F.col("b.lsn"), "update")
            .alias("ct"),
        )
        .where(F.col("ct").isNotNull())
        .collect()
    }


def test_changes_matches_brute_force_diff(spark, halves):
    tbl, v1, t2 = halves
    got = {
        (r["conv_id"], r["turn_idx"], r["_change_type"])
        for r in t2.changes(v1).collect()
    }
    want = _brute_diff(spark, tbl, v1, t2)
    assert got == want
    kinds = {ct for _, _, ct in got}
    assert kinds == {"insert", "update", "delete"}  # feed exercises all three


def test_changes_post_and_pre_images(spark, halves):
    tbl, v1, t2 = halves
    ch = t2.changes(v1)
    # every change carries its own position: the winner's lsn for
    # inserts/updates, the TOMBSTONE's lsn for deletes (what lets
    # changes_as_debezium re-emit a replayable feed) — and a delete's
    # position is strictly newer than the row it killed
    assert ch.where("lsn IS NULL").count() == 0
    assert ch.where("_change_type = 'delete' AND text IS NOT NULL").count() == 0
    dels = ch.where("_change_type = 'delete'")
    assert dels.count() > 0 and dels.where(
        "ts < _prev_ts OR (ts = _prev_ts AND lsn <= _prev_lsn)"
    ).count() == 0
    # updates carry the pre-image lsn, strictly older than the post-image
    assert ch.where("_change_type = 'update' AND _prev_lsn IS NULL").count() == 0
    upd = ch.where("_change_type = 'update'")
    assert upd.where("_prev_lsn >= lsn").count() == 0 or upd.where(
        "_prev_ts > ts"
    ).count() == 0  # LWW order (ts, lsn): newer wins


def test_changes_is_bucket_pruned(spark, tmp_path):
    """Touch ONE conversation in the second commit: changes() must plan
    only the touched bucket's files, not the table."""
    wal1 = str(tmp_path / "w1")
    write_change_log(
        change_events(spark, 6_000, n_convs=100, seed=5), wal1, n_files=2
    )
    tbl = str(tmp_path / "tbl")
    t1 = ReplayRunner(spark, tbl, n_buckets=8, chunk_size=10_000).replay(wal1)
    one = spark.createDataFrame(
        t1.read()
        .orderBy("conv_id", "turn_idx")
        .limit(1)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn")
        .withColumn("lsn", F.lit(10_000_000).cast("bigint"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("text", F.lit("rewritten"))
        .withColumn("op", F.lit("U"))
        .collect(),  # pin: the feed is re-evaluated per action during replay
        schema=(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, lsn bigint, op string"
        ),
    )
    conv = one.collect()[0]["conv_id"]
    t2 = ReplayRunner(spark, tbl, n_buckets=8, chunk_size=10_000).replay(one)

    ch = t2.changes(t1.version)
    rows = ch.collect()
    assert [(r["conv_id"], r["_change_type"]) for r in rows] == [(conv, "update")]
    touched = str(t1.bucket_of(conv))
    allowed = {
        os.path.join(t2.path, e["path"])
        for m in (t1.manifest, t2.manifest)
        for e in m["buckets"].get(touched, [])
    }
    planned = {p.removeprefix("file://") for p in ch.inputFiles()}
    assert planned, "changes() should read the touched bucket"
    assert planned <= allowed, "changes() read an untouched bucket"


def test_changes_across_compaction_is_empty(spark, halves):
    tbl, v1, t2 = halves
    compacted, n = compact_buckets(t2, min_files=1)
    assert sum(n.values()) > 0, "compaction should have folded something"
    # physical rewrite, logical no-op -> empty change set
    assert compacted.changes(t2.version).count() == 0
    # and the v1 diff is unchanged by compaction
    assert compacted.changes(v1).count() == t2.changes(v1).count()


def test_load_by_tag(spark, tmp_path):
    """Tag refs: every commit records its tag -> version; load(tag=...)
    time-travels by event name instead of version number."""
    from pasar_spark.cdc.runner import ReplayRunner
    from pasar_spark.datagen import change_events, write_change_log

    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 1_000, n_convs=20, seed=13), wal, n_files=1)
    t = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=2, chunk_size=400).replay(wal)
    tags = t.manifest["tags"]
    name, version = sorted(tags.items())[0]
    at_tag = LakeTable.load(spark, t.path, tag=name)
    assert at_tag.version == version
    import pytest as _p

    with _p.raises(KeyError, match="unknown tag"):
        LakeTable.load(spark, t.path, tag="nope")
    with _p.raises(ValueError):
        LakeTable.load(spark, t.path, version=1, tag=name)


def test_rollback_restores_state_and_replays_forward(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 8_000, n_convs=80, seed=31), wal, n_files=4)
    tbl = str(tmp_path / "tbl")
    t1 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=4_000).replay(
        wal, max_events=4_000
    )
    t2 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=4_000).replay(wal)
    s1 = sorted(map(tuple, t1.read().collect()))
    s2 = sorted(map(tuple, t2.read().collect()))

    rb = t2.rollback(t1.version)
    assert rb.version == t2.version + 1  # history advances, never rewinds
    assert sorted(map(tuple, rb.read().collect())) == s1
    # ledger rolled back with the data: the second chunk's batch is
    # unapplied again, so a forward replay re-applies it exactly-once
    assert rb.last_lsn == t1.last_lsn
    t3 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=4_000).replay(wal)
    assert sorted(map(tuple, t3.read().collect())) == s2


def test_expire_snapshots_reclaims_only_unreferenced(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 6_000, n_convs=60, seed=41), wal, n_files=3)
    tbl = str(tmp_path / "tbl")
    t = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=2_000).replay(wal)
    t, _ = compact_buckets(t, min_files=1)
    state = sorted(map(tuple, t.read().collect()))
    old_version = 2  # first data commit

    # an in-flight (uncommitted) write must survive the age guard
    orphan = t.write_files(
        t.read(include_tombstones=True).withColumn("_bucket", t.bucket_expr()),
        "commit-inflight",
    )
    orphan_files = [
        os.path.join(t.path, e["path"]) for es in orphan.values() for e in es
    ]

    stats = t.expire_snapshots(keep_last=1, min_age_sec=3600)
    assert stats["expired_manifests"] > 0
    assert all(os.path.exists(f) for f in orphan_files), "age guard violated"
    assert sorted(map(tuple, t.read().collect())) == state
    with pytest.raises(FileNotFoundError):
        LakeTable.load(spark, tbl, version=old_version)

    # age the orphans out and expire again: now they go
    for f in orphan_files:
        os.utime(f, (time.time() - 7200, time.time() - 7200))
    stats2 = t.expire_snapshots(keep_last=1, min_age_sec=3600)
    assert stats2["deleted_files"] >= len(orphan_files)
    assert not any(os.path.exists(f) for f in orphan_files)
    assert sorted(map(tuple, t.read().collect())) == state


def test_rebucket_preserves_state_and_replay_continues(spark, tmp_path):
    """Partition evolution: grow the bucket count, state identical,
    replay resumes into the new layout, reads prune on the new expr."""
    wal = str(tmp_path / "wal")
    write_change_log(
        change_events(spark, 8_000, n_convs=80, seed=51, delete_fraction=0.1),
        wal,
        n_files=4,
    )
    t = ReplayRunner(spark, str(tmp_path / "tbl"), n_buckets=4, chunk_size=4_000).replay(
        wal, max_events=4_000
    )
    state_half = sorted(map(tuple, t.read().collect()))
    lsn_half = t.last_lsn

    rb = t.rebucket(16)
    assert rb.manifest["n_buckets"] == 16
    assert len(rb.manifest["buckets"]) > 4
    assert rb.last_lsn == lsn_half  # ledger survives the rewrite
    assert sorted(map(tuple, rb.read().collect())) == state_half

    # replay the second half into the NEW layout; equals a straight
    # 16-bucket replay of the whole feed
    t2 = ReplayRunner(
        spark, str(tmp_path / "tbl"), n_buckets=16, chunk_size=4_000
    ).replay(wal)
    ref = ReplayRunner(
        spark, str(tmp_path / "ref"), n_buckets=16, chunk_size=4_000
    ).replay(wal)
    assert sorted(map(tuple, t2.read().collect())) == sorted(
        map(tuple, ref.read().collect())
    )

    # bucket pruning works against the new count
    conv = t2.read().orderBy("conv_id").limit(1).collect()[0]["conv_id"]
    b = t2.bucket_of(conv)
    pruned = t2.read(buckets=[b]).where(F.col("conv_id") == conv)
    assert pruned.count() > 0

    # tombstones survive the rewrite: deleted keys stay deleted
    assert t2.read().count() == ref.read().count()


def test_changes_across_rebucket_falls_back_to_full_diff(spark, tmp_path):
    """Partition evolution inside the CDF range: bucket pruning is
    impossible across two key->bucket maps, so changes() degrades to a
    full two-sided diff (used to raise, stranding any consumer whose
    checkpoint pre-dated the rebucket). Must equal the brute-force
    diff of the two snapshot reads."""
    wal = str(tmp_path / "wal")
    write_change_log(
        change_events(spark, 4_000, n_convs=60, seed=52, delete_fraction=0.12),
        wal,
        n_files=2,
    )
    t1 = ReplayRunner(
        spark, str(tmp_path / "t"), n_buckets=4, chunk_size=2_000
    ).replay(wal, stop_after_chunks=1)
    rb = t1.rebucket(8)
    t2 = ReplayRunner(
        spark, str(tmp_path / "t"), n_buckets=8, chunk_size=2_000
    ).replay(wal)
    assert t2.manifest["n_buckets"] == 8 and t2.version > rb.version

    got = {
        (r["conv_id"], r["turn_idx"], r["_change_type"])
        for r in t2.changes(t1.version).collect()
    }
    want = _brute_diff(spark, str(tmp_path / "t"), t1.version, t2)
    assert got == want and len(got) > 0
    # pure-rebucket range (no data change) emits nothing: a rewrite is
    # a logical no-op even when every file moved buckets
    assert rb.changes(t1.version).count() == 0


def test_lineage_maps_buckets_to_batches(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 6_000, n_convs=60, seed=53), wal, n_files=3)
    t = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=4, chunk_size=2_000).replay(wal)
    lin = t.lineage()
    assert set(lin) == set(t.manifest["buckets"])
    batches = {e["batch"] for es in lin.values() for e in es}
    # every chunk batch that wrote files is traceable per bucket
    assert any(b and b.startswith("lsn-") for b in batches)
    # rows in lineage equal manifest row counts (no Spark job ran)
    for b, es in lin.items():
        assert all(e["rows"] >= 0 and e["path"] for e in es)
        assert all(e["kind"] in ("base", "delta") for e in es)


def test_poll_changes_tails_the_feed(spark, tmp_path):
    """Downstream-consumer loop: poll, apply, checkpoint the version."""
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 6_000, n_convs=60, seed=71), wal, n_files=3)
    tbl = str(tmp_path / "tbl")
    t1 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=3_000).replay(
        wal, max_events=3_000
    )
    v = t1.version

    # nothing new -> no job, version unchanged
    df, v2 = LakeTable.poll_changes(spark, tbl, v)
    assert df is None and v2 == v

    # a new half lands; poll returns the diff up to the new tip
    t2 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=3_000).replay(wal)
    df, v3 = LakeTable.poll_changes(spark, tbl, v)
    assert v3 == t2.version
    got = {(r["conv_id"], r["turn_idx"], r["_change_type"]) for r in df.collect()}
    assert got == _brute_diff(spark, tbl, v, t2)

    # consumer is caught up again
    df, v4 = LakeTable.poll_changes(spark, tbl, v3)
    assert df is None and v4 == v3


def test_expire_min_age_protects_inflight_manifests(spark, halves):
    """A manifest linked but not yet flipped onto CURRENT (or whose
    STAGED pointer hasn't landed) is a commit mid-publish, not garbage:
    min_age_sec must shield it from expiry — same in-flight guard the
    orphan-file age check provides — so crash repair can still roll it
    forward. Age zero (the default) keeps today's reclaim-everything
    behavior."""
    import json as _json

    tbl, v1, t2 = halves
    # simulate a linked-but-unflipped commit: an off-chain manifest
    # numbered past CURRENT with parent = CURRENT
    orphan_v = t2.version + 7
    m = _json.loads(_json.dumps(t2.manifest))
    m["parent_version"] = t2.version
    path = LakeTable._manifest_path(tbl, orphan_v)
    with open(path, "w") as fh:
        _json.dump(m, fh)

    t2.expire_snapshots(keep_last=1, min_age_sec=3600)
    assert os.path.exists(path)  # young: protected

    t2.expire_snapshots(keep_last=1, min_age_sec=0)
    assert not os.path.exists(path)  # aged out (or age guard off): reclaimed
