"""Multi-writer optimistic concurrency (Iceberg commit strategy).

Every lakehouse runs MORE than one writer against a table — at minimum a
compaction service racing the ingest stream. The commit protocol must
make a losing writer rebase and retry (never crash, never lose the
winner's files), and racing twins applying the SAME batch must resolve
to exactly-once. Interleavings are simulated by holding two stale
``LakeTable`` handles and committing through them in a chosen order —
exactly the state two driver processes would be in.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import CommitConflict, LakeTable


@pytest.fixture()
def base_table(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 4_000, n_convs=50, seed=61), wal, n_files=2)
    t = ReplayRunner(spark, str(tmp_path / "tbl"), n_buckets=4, chunk_size=10_000).replay(
        wal
    )
    return t


def _delta_files(handle: LakeTable, conv_id: str, lsn: int, text: str):
    """One-row delta fileset written through ``handle`` (not committed)."""
    row = (
        handle.spark.createDataFrame(
            [(conv_id, 0, "user", text, None, lsn)],
            "conv_id string, turn_idx int, role string, text string, tool string, lsn bigint",
        )
        .withColumn("ts", F.lit("2026-06-01 00:00:00").cast("timestamp"))
        .withColumn("_tombstone", F.lit(False))
        .withColumn("_bucket", handle.bucket_expr())
    )
    return handle.write_files(row, handle.new_commit_id())


def test_racing_appends_both_land(spark, base_table):
    t = base_table
    a = LakeTable.load(spark, t.path)  # writer A's (soon stale) view
    b = LakeTable.load(spark, t.path)  # writer B's view

    fb = _delta_files(b, "conv-race-b", 900_001, "from b")
    fa = _delta_files(a, "conv-race-a", 900_002, "from a")

    tb = b.commit_append(fb, "batch-b", last_lsn=900_001)
    # A commits against a base that no longer is CURRENT -> must rebase
    ta = a.commit_append(fa, "batch-a", last_lsn=900_002)

    assert ta.version == tb.version + 1
    led = ta.manifest["ledger"]["batch_ids"]
    assert "batch-a" in led and "batch-b" in led
    final = LakeTable.load(spark, t.path).read()
    assert final.where("conv_id = 'conv-race-a'").count() == 1
    assert final.where("conv_id = 'conv-race-b'").count() == 1
    assert ta.last_lsn == 900_002


def test_same_batch_racing_twins_is_exactly_once(spark, base_table):
    t = base_table
    a = LakeTable.load(spark, t.path)
    b = LakeTable.load(spark, t.path)
    fa = _delta_files(a, "conv-twin", 900_010, "twin write")
    fb = _delta_files(b, "conv-twin", 900_010, "twin write")

    tb = b.commit_append(fb, "batch-twin", last_lsn=900_010)
    ta = a.commit_append(fa, "batch-twin", last_lsn=900_010)  # loser adopts

    assert ta.version == tb.version  # no second commit was minted
    final = LakeTable.load(spark, t.path)
    assert final.manifest["ledger"]["batch_ids"].count("batch-twin") == 1
    assert final.read().where("conv_id = 'conv-twin'").count() == 1


def test_same_batch_on_current_base_still_raises(spark, base_table):
    """Non-racing double apply (a plain programming error) stays loud."""
    t = base_table
    f1 = _delta_files(t, "conv-dup", 900_020, "x")
    t2 = t.commit_append(f1, "batch-dup")
    f2 = _delta_files(t2, "conv-dup", 900_021, "y")
    with pytest.raises(CommitConflict, match="already committed"):
        t2.commit_append(f2, "batch-dup")


def test_compaction_racing_ingest_keeps_new_delta(spark, base_table):
    """Major compaction folds the files it READ; an ingest landing
    between its read and its commit must survive the swap."""
    t = base_table
    compactor = LakeTable.load(spark, t.path)  # compactor's snapshot
    folded = compactor.write_files(
        compactor.read(include_tombstones=True).withColumn(
            "_bucket", compactor.bucket_expr()
        ),
        compactor.new_commit_id(),
        sort_keys=True,
    )

    # ingest wins the race with a brand-new conversation
    ingest = LakeTable.load(spark, t.path)
    fi = _delta_files(ingest, "conv-mid-compact", 900_030, "landed mid-compaction")
    ingest.commit_append(fi, "batch-mid", last_lsn=900_030)

    merged = compactor.commit_merge(
        replaced_buckets=list(range(t.manifest["n_buckets"])),
        new_files=folded,
        batch_id="compact-race",
    )

    final = LakeTable.load(spark, t.path)
    assert final.read().where("conv_id = 'conv-mid-compact'").count() == 1
    # the surviving delta keeps its bucket unresolved until next fold
    hot = str(final.bucket_of("conv-mid-compact"))
    assert hot in final.manifest["unresolved"]
    kinds = {e["kind"] for e in final.bucket_entries(hot)}
    assert kinds == {"base", "delta"}
    # and the folded state is intact (row counts: base state + the newcomer)
    assert final.read().count() == t.read().count() + 1
    assert merged.version == final.version


def test_minor_compaction_racing_ingest_keeps_new_delta(spark, base_table):
    """Minor compaction folds the deltas it READ; a delta appended since
    must ride on top of the folded one."""
    t = base_table
    # make some deltas to fold
    t1 = t.commit_append(_delta_files(t, "conv-d1", 900_040, "a"), "b-d1")
    t2 = t1.commit_append(_delta_files(t1, "conv-d1", 900_041, "b"), "b-d2")

    minor = LakeTable.load(spark, t.path)  # minor compactor snapshot
    hot = str(minor.bucket_of("conv-d1"))
    deltas = minor.bucket_entries(hot, kind="delta")
    assert len(deltas) >= 2
    folded_df = (
        minor._read_entries(deltas)
        .withColumn("_bucket", F.lit(int(hot)))
    )
    folded = minor.write_files(folded_df, minor.new_commit_id())

    # a racing ingest appends one more delta to the same bucket
    racer = LakeTable.load(spark, t.path)
    racer.commit_append(
        _delta_files(racer, "conv-d1", 900_042, "newest"), "b-race", last_lsn=900_042
    )

    minor.commit_replace_deltas({hot: folded[hot]}, "b-minor")

    final = LakeTable.load(spark, t.path)
    row = final.read().where("conv_id = 'conv-d1'").collect()
    assert len(row) == 1 and row[0]["text"] == "newest"  # LWW winner survived


def _current(path: str) -> int:
    import os

    with open(os.path.join(path, "metadata", "CURRENT")) as fh:
        return int(fh.read().strip())


def test_current_pointer_never_moves_backwards(spark, base_table):
    """ADVICE r2 (medium): writer A links manifest v+1 then stalls before
    flipping CURRENT; writer B crash-repairs (rolls CURRENT forward),
    rebases, commits v+2. When A resumes its flip, the pointer must NOT
    roll back to v+1 — B's acknowledged commit would vanish for every
    reader until some future commit repaired it."""
    import json

    t = base_table
    v = t.version

    # writer A: manifest linked, flip never happened (simulated stall)
    stalled = json.loads(json.dumps(t.manifest))
    stalled["version"] = v + 1
    stalled["parent_version"] = v
    stalled["ledger"]["batch_ids"] = stalled["ledger"]["batch_ids"] + ["batch-stalled"]
    LakeTable._write_manifest(t.path, v + 1, stalled)
    assert _current(t.path) == v

    # writer B: loses the race for v+1, repairs the pointer, lands v+2
    b = LakeTable.load(spark, t.path)
    fb = _delta_files(b, "conv-after-stall", 900_050, "from b")
    tb = b.commit_append(fb, "batch-b-after-stall", last_lsn=900_050)
    assert tb.version == v + 2 and _current(t.path) == v + 2

    # A resumes: its flip must be a no-op, not a rollback
    LakeTable._flip_current(t.path, v + 1)
    assert _current(t.path) == v + 2


def test_commit_races_metric_counts_lost_races(spark, base_table, monkeypatch):
    """ADVICE r2 (low): losing exactly 3 races must record
    commit_races == 3 (one per observed winning commit), not a
    quadratic accumulation."""
    import json

    t = base_table
    orig = LakeTable._write_manifest
    state = {"competitors": 0}

    def racing(path, version, manifest):
        # intercept writer A's attempts (identified by its batch id) and
        # land a competitor's manifest at the same version first
        is_a = manifest["ledger"]["batch_ids"][-1:] == ["batch-races"]
        if is_a and state["competitors"] < 3:
            state["competitors"] += 1
            comp = json.loads(json.dumps(manifest))
            comp["ledger"]["batch_ids"] = [
                b for b in comp["ledger"]["batch_ids"] if b != "batch-races"
            ] + [f"comp-{state['competitors']}"]
            # a real competitor builds from CURRENT and carries its own
            # metrics — it never inherits A's in-flight race counter
            comp["metrics"].pop("commit_races", None)
            orig(path, version, comp)  # competitor claims the version
        orig(path, version, manifest)  # A's link -> FileExistsError

    monkeypatch.setattr(LakeTable, "_write_manifest", staticmethod(racing))
    fa = _delta_files(t, "conv-races", 900_060, "under contention")
    ta = t.commit_append(fa, "batch-races", last_lsn=900_060)
    monkeypatch.setattr(LakeTable, "_write_manifest", staticmethod(orig))

    assert state["competitors"] == 3
    assert ta.metrics.get("commit_races", 0) == 3
    assert "batch-races" in ta.manifest["ledger"]["batch_ids"]
