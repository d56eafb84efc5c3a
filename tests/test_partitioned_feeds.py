"""Partitioned change feeds (Kafka/binlog-shard shape).

Real feeds arrive as N partitions, each with its OWN monotonic offset
space and keys partitioned across them. The engine must checkpoint
per-partition offsets atomically with the data, resume every partition
from its own cut point, and produce the same final state as a
single-feed replay of the union — LWW makes partition order irrelevant.

The fixture splits one deterministic feed by key hash (as a partitioned
producer would), so each partition's offset space is SPARSE in the
global lsn domain — also exercising the next_lsn gap jumps per
partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import LakeTable


@pytest.fixture(scope="module")
def split_feed(spark, tmp_path_factory):
    """(wal_union, {0: wal_p0, 1: wal_p1}) — keys hash-partitioned."""
    root = tmp_path_factory.mktemp("partfeed")
    ev = change_events(spark, 8_000, n_convs=100, seed=81, delete_fraction=0.1)
    union = str(root / "union")
    write_change_log(ev, union, n_files=4)
    parts = {}
    for p in (0, 1):
        path = str(root / f"p{p}")
        write_change_log(
            ev.where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == p), path, n_files=2
        )
        parts[p] = path
    return union, parts


def _state(t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["text"], r["lsn"]) for r in t.read().collect()
    )


def test_partitioned_equals_union_replay(spark, split_feed, tmp_path):
    union, parts = split_feed
    ref = ReplayRunner(spark, str(tmp_path / "ref"), n_buckets=4, chunk_size=3_000).replay(
        union
    )
    t = ReplayRunner(
        spark, str(tmp_path / "part"), n_buckets=4, chunk_size=3_000
    ).replay_partitions(parts)
    assert _state(t) == _state(ref)
    # per-partition offsets checkpointed to each partition's tip
    for p in parts:
        assert t.source_offset(p) >= 0
    assert max(t.source_offset(p) for p in parts) == 7_999


def test_partitioned_resume_mid_stream(spark, split_feed, tmp_path):
    union, parts = split_feed
    tbl = str(tmp_path / "t")
    r = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=2_000)
    partial = r.replay_partitions(parts, stop_after_chunks=2)
    # crash here: a fresh runner resumes every partition from its own cut
    offs = {p: partial.source_offset(p) for p in parts}
    assert any(o >= 0 for o in offs.values())
    full = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=2_000).replay_partitions(
        parts
    )
    ref = ReplayRunner(spark, str(tmp_path / "ref"), n_buckets=4, chunk_size=2_000).replay(
        union
    )
    assert _state(full) == _state(ref)
    # offsets only ever moved forward
    for p in parts:
        assert full.source_offset(p) >= offs[p]


def test_partitioned_rerun_is_noop(spark, split_feed, tmp_path):
    _, parts = split_feed
    tbl = str(tmp_path / "t")
    t1 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=4_000).replay_partitions(parts)
    t2 = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=4_000).replay_partitions(parts)
    assert t2.version == t1.version  # nothing new -> no commits at all


def test_offsets_survive_in_one_atomic_commit(spark, split_feed, tmp_path):
    """The offset checkpoint must live IN the data commit: loading any
    historical snapshot yields offsets consistent with its data."""
    _, parts = split_feed
    tbl = str(tmp_path / "t")
    t = ReplayRunner(spark, tbl, n_buckets=4, chunk_size=2_000).replay_partitions(parts)
    for h in t.history():
        snap = LakeTable.load(spark, tbl, version=h["version"])
        for p in parts:
            off = snap.source_offset(p)
            if off >= 0:
                # no event beyond the checkpoint is visible in this snapshot
                beyond = (
                    snap.read()
                    .where(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == p)
                    .where(F.col("lsn") > off)
                    .count()
                )
                assert beyond == 0


def test_concurrent_partition_writers(spark, split_feed, tmp_path):
    """One writer per partition, racing through the optimistic commit
    protocol — the real-cluster deployment shape. Final state must equal
    the single-feed replay regardless of commit interleaving."""
    from concurrent.futures import ThreadPoolExecutor

    union, parts = split_feed
    tbl = str(tmp_path / "t")
    ReplayRunner(spark, tbl, n_buckets=4, chunk_size=1_500).bootstrap()

    def run(p):
        return ReplayRunner(
            spark, tbl, n_buckets=4, chunk_size=1_500
        ).replay_partitions({p: parts[p]})

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(run, sorted(parts)))

    t = LakeTable.load(spark, tbl)
    ref = ReplayRunner(
        spark, str(tmp_path / "ref"), n_buckets=4, chunk_size=1_500
    ).replay(union)
    assert _state(t) == _state(ref)
    # every partition's checkpoint reached its feed tip
    tips = {
        p: spark.read.parquet(parts[p]).agg(F.max("lsn")).collect()[0][0]
        for p in parts
    }
    for p in parts:
        assert t.source_offset(p) == tips[p]
