"""Incremental derived-table maintenance (cdc/derived.py).

Invariant: after every refresh, the derived aggregate equals a
from-scratch groupBy of the source's live state — while the refresh
itself only reads the CDF slice plus the touched aggregate buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.derived import DerivedConvStats
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import LakeTable


def _oracle(src: LakeTable):
    return sorted(
        (r["conv_id"], r["n_turns"], r["total_chars"])
        for r in src.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.coalesce(F.sum(F.length("text").cast("long")), F.lit(0)).alias(
                "total_chars"
            ),
        )
        .collect()
    )


def _state(stats: DerivedConvStats):
    return sorted(
        (r["conv_id"], r["n_turns"], r["total_chars"]) for r in stats.read().collect()
    )


@pytest.fixture()
def pipeline(spark, tmp_path):
    wal = str(tmp_path / "wal")
    ev = change_events(spark, 6_000, n_convs=80, seed=83, delete_fraction=0.1)
    write_change_log(ev, wal, n_files=4)
    runner = ReplayRunner(spark, str(tmp_path / "src"), n_buckets=4, chunk_size=2_000)
    stats = DerivedConvStats(
        spark, str(tmp_path / "src"), str(tmp_path / "derived"), n_buckets=4
    )
    return wal, runner, stats


def test_full_then_incremental_matches_oracle(spark, pipeline):
    wal, runner, stats = pipeline
    src = runner.replay(wal, stop_after_chunks=1)
    der, info = stats.refresh()
    assert info["mode"] == "full"
    assert _state(stats) == _oracle(src)

    # more source commits (updates + deletes across chunks), then an
    # incremental fold of everything since
    src = runner.replay(wal)
    der, info = stats.refresh()
    assert info["mode"] == "incremental"
    assert _state(stats) == _oracle(src)
    # checkpoint advanced to the source head, atomically with the data
    assert der.source_offset("__source_version__") == src.version


def test_refresh_is_idempotent_and_noop_when_caught_up(spark, pipeline):
    wal, runner, stats = pipeline
    runner.replay(wal)
    stats.refresh()
    der1, info1 = stats.refresh()
    assert info1["mode"] == "noop"
    der2, info2 = stats.refresh()
    assert der2.version == der1.version


def test_fully_deleted_conversation_leaves_derived(spark, pipeline):
    wal, runner, stats = pipeline
    src = runner.replay(wal)
    stats.refresh()
    # delete every live turn of one conversation via the engine
    victim = src.read().select("conv_id").first()["conv_id"]
    turns = [r["turn_idx"] for r in src.read().where(F.col("conv_id") == victim).collect()]
    from pasar_spark.cdc.merge import merge_batch

    deletes = (
        spark.createDataFrame(
            [(victim, t, "D", 900_000 + i, None) for i, t in enumerate(turns)],
            "conv_id string, turn_idx int, op string, lsn bigint, text string",
        )
        .withColumn("ts", F.lit("2026-08-01 00:00:00").cast("timestamp"))
        .withColumn("role", F.lit(None).cast("string"))
        .withColumn("tool", F.lit(None).cast("string"))
    )
    src2, _ = merge_batch(src, deletes, "kill-conv", last_lsn=900_000 + len(turns))
    der, info = stats.refresh()
    assert info["mode"] == "incremental"
    assert stats.read().where(F.col("conv_id") == victim).count() == 0
    assert _state(stats) == _oracle(src2)


def test_incremental_refresh_prunes_buckets(spark, pipeline):
    """A change localized to one conversation touches only that
    conversation's aggregate bucket — the O(changes) claim."""
    wal, runner, stats = pipeline
    src = runner.replay(wal)
    stats.refresh()
    conv = src.read().select("conv_id").first()["conv_id"]
    from pasar_spark.cdc.merge import merge_batch

    upd = (
        spark.createDataFrame(
            [(conv, 0, "U", 950_000, "a longer updated text body")],
            "conv_id string, turn_idx int, op string, lsn bigint, text string",
        )
        .withColumn("ts", F.lit("2026-08-02 00:00:00").cast("timestamp"))
        .withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(None).cast("string"))
    )
    src2, _ = merge_batch(src, upd, "one-conv-touch", last_lsn=950_000)
    der, info = stats.refresh()
    assert info["mode"] == "incremental"
    assert info["touched_buckets"] == 1
    assert _state(stats) == _oracle(src2)


def test_derived_over_patch_source(spark, tmp_path):
    """IVM works against a PATCH-mode source too: the bootstrap aggregate
    materializes winner structs, and the incremental path rides the
    already-materialized CDF images."""
    from pasar_spark.cdc.patch import PatchReplayRunner, merge_patch_chunk

    ev = (
        change_events(spark, 4_000, n_convs=60, seed=91, delete_fraction=0.1)
        .withColumn(
            "text", F.when(F.col("lsn") % 3 == 0, F.lit(None)).otherwise(F.col("text"))
        )
        .select("conv_id", "turn_idx", "op", "ts", "lsn", "role", "text", "tool")
    )
    wal = str(tmp_path / "pwal")
    write_change_log(ev, wal, n_files=2)
    runner = PatchReplayRunner(spark, str(tmp_path / "src"), n_buckets=4, chunk_size=2_000)
    src = runner.replay(wal, max_events=2_000)
    stats = DerivedConvStats(
        spark, str(tmp_path / "src"), str(tmp_path / "derived"), n_buckets=4
    )

    def patch_oracle():
        return sorted(
            (r["conv_id"], r["n_turns"], r["total_chars"])
            for r in runner.read()
            .groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.coalesce(F.sum(F.length("text").cast("long")), F.lit(0)).alias(
                    "total_chars"
                ),
            )
            .collect()
        )

    der, info = stats.refresh()
    assert info["mode"] == "full"
    assert _state(stats) == patch_oracle()

    runner.replay(wal)  # the rest of the feed (partial updates + deletes)
    der, info = stats.refresh()
    assert info["mode"] == "incremental"
    assert _state(stats) == patch_oracle()


def test_changes_pre_images_emit_before_values(spark, pipeline):
    wal, runner, stats = pipeline
    src1 = runner.replay(wal, stop_after_chunks=1)
    v1 = src1.version
    src2 = runner.replay(wal)
    ch = src2.changes(v1, pre_images=True)
    assert "_prev_text" in ch.columns and "_prev_role" in ch.columns
    upd = ch.where("_change_type = 'update'")
    if upd.count():
        row = upd.first()
        assert row["_prev_lsn"] is not None
        # an update's pre-image text is the OLD winner, distinct version
        assert row["lsn"] != row["_prev_lsn"]


def test_refresh_falls_back_to_full_when_cdf_expired(spark, pipeline):
    """ADVICE r3 (low): if the source's expire_snapshots dropped the
    manifest at the derived table's checkpoint (consumer lagged past
    retention), refresh() must pay one full re-aggregate instead of
    crashing forever on the missing manifest."""
    import os

    wal, runner, stats = pipeline
    src = runner.replay(wal, stop_after_chunks=1)
    der, info = stats.refresh()
    assert info["mode"] == "full"
    frm = der.source_offset("__source_version__")

    # source advances several versions, then retention drops v{frm}
    src = runner.replay(wal)
    src.expire_snapshots(keep_last=1, min_age_sec=0.0)  # no writer in flight
    assert not os.path.exists(LakeTable._manifest_path(src.path, frm))

    der, info = stats.refresh()
    assert info["mode"] == "full"
    assert _state(stats) == _oracle(src)
    assert der.source_offset("__source_version__") == src.version
    # and the NEXT refresh is a plain noop / incremental again
    der, info = stats.refresh()
    assert info["mode"] == "noop"


def test_refresh_survives_source_rebucket(spark, pipeline):
    """Partition evolution on the SOURCE between refreshes: the CDF
    range crosses the rebucket (full-diff fallback), and the derived
    aggregate still converges to the from-scratch oracle."""
    wal, runner, stats = pipeline
    src = runner.replay(wal, stop_after_chunks=1)
    der, info = stats.refresh()
    assert info["mode"] == "full"

    src.rebucket(8)  # source grows its bucket count mid-stream
    from pasar_spark.cdc.runner import ReplayRunner as RR

    src = RR(spark, src.path, n_buckets=8, chunk_size=2_000).replay(wal)
    der, info = stats.refresh()
    assert info["mode"] == "incremental"  # consumer never noticed
    assert _state(stats) == _oracle(src)
