"""Exactly-once + crash/resume properties of the replay runner.

- idempotence: re-applying any committed batch is a no-op (batch-id dedup
  via the snapshot-embedded ledger);
- crash-resume: killing the driver after k chunks and restarting yields a
  final state identical to the uninterrupted run;
- at-least-once input: duplicate LSN deliveries never double-apply.
"""

from __future__ import annotations

import pytest

from pasar_spark.cdc.merge import merge_batch
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import LakeTable

N = 8_000


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    path = str(root / "wal")
    write_change_log(
        change_events(spark, N, n_convs=120, seed=11, duplicate_fraction=0.05),
        path,
        n_files=6,
    )
    return str(root), path


def _state(table):
    return sorted(
        (r.conv_id, r.turn_idx, r.text, r.lsn)
        for r in table.read().collect()
    )


def test_crash_resume_equals_uninterrupted(spark, wal):
    root, path = wal
    full = ReplayRunner(spark, f"{root}/t_full", n_buckets=4, chunk_size=2_000).replay(path)

    crashy = ReplayRunner(spark, f"{root}/t_crash", n_buckets=4, chunk_size=2_000)
    t = crashy.replay(path, stop_after_chunks=2)  # "crash" mid-stream
    assert t.last_lsn < N - 1
    resumed = crashy.replay(path)  # fresh runner call = restarted driver
    assert resumed.last_lsn == N - 1
    assert _state(resumed) == _state(full)


def test_reapply_committed_batch_is_noop(spark, wal):
    root, path = wal
    table = LakeTable.load(spark, f"{root}/t_full")
    version_before = table.version
    events = spark.read.parquet(path).limit(100)
    t2, delta = merge_batch(table, events, batch_id="lsn-0-1999")  # already committed
    assert delta == {"skipped_batches": 1}
    assert t2.version == version_before  # no new snapshot


def test_snapshot_history_has_per_batch_lineage(spark, wal):
    root, _ = wal
    table = LakeTable.load(spark, f"{root}/t_full")
    hist = table.history()
    tags = [t for h in hist for t in h["tags"]]
    assert "batch-lsn-0-1999" in tags
    # ledger advanced monotonically across snapshots
    lsns = [h["last_lsn"] for h in hist]
    assert lsns == sorted(lsns)
