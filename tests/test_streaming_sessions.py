"""Streaming sessionization (applyInPandasWithState) vs the batch
gaps-and-islands merge.

Observed availableNow semantics (pinned by this test): after the last
data micro-batch the engine fires a final timer-only batch with the
fully-advanced watermark, so the emitted set is exactly the batch
sessions whose close point (end + gap) is at or below
max_event_time - watermark_delay.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pasar_spark.operators.eras import merge_eras
from pasar_spark.streaming.sessions import sessionize_stream

BASE = dt.datetime(2025, 1, 1)
GAP_S = 1000


def _write_file(path, rows):
    pdf = pd.DataFrame(
        {
            "user_id": pd.Series([u for u, _ in rows], dtype="int64"),
            "ts": pd.Series([BASE + dt.timedelta(seconds=s) for _, s in rows],
                            dtype="datetime64[us]"),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), path)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_sessions")
    wal = root / "wal"
    wal.mkdir()
    # time-ordered files => one micro-batch each (maxFilesPerTrigger=1).
    # Watermark delay == gap == 1000s; final wm = 50000 - 1000 = 49000.
    #   session A  (u1): 0,50,100      closes at wm >= 1100   -> emitted
    #   session D  (u2): 5             closes at wm >= 1005   -> emitted
    #   session B  (u1): 10000,10050   closes at wm >= 11050  -> emitted
    #   session E1 (u2): 28500         closes at wm >= 29500  -> emitted
    #   session E2 (u2): 48500         closes at wm >= 49500  -> OPEN
    #   session C  (u1): 50000         closes at wm >= 51000  -> OPEN
    _write_file(wal / "f0.parquet", [(1, 0), (1, 50), (1, 100), (2, 5)])
    _write_file(wal / "f1.parquet", [(1, 10_000), (1, 10_050)])
    _write_file(wal / "f2.parquet", [(2, 28_500), (2, 48_500)])
    _write_file(wal / "f3.parquet", [(1, 50_000)])
    return str(wal)


def test_streaming_sessions_match_batch_islands(spark, wal, tmp_path):
    sessionize_stream(
        spark, wal, str(tmp_path / "ckpt"), gap_seconds=GAP_S, query_name="sess_t1"
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_t1").collect()
    }

    batch = merge_eras(
        spark.read.parquet(wal), ["user_id"], "ts", gap_seconds=GAP_S
    ).collect()
    final_wm = BASE + dt.timedelta(seconds=50_000 - GAP_S)
    expected = {
        (r.user_id, r.era_start, r.era_end, r.n_events)
        for r in batch
        if r.era_end + dt.timedelta(seconds=GAP_S) <= final_wm
    }
    assert got == expected and len(expected) == 4

    # everything emitted must agree with the batch islands bit-for-bit
    batch_set = {(r.user_id, r.era_start, r.era_end, r.n_events) for r in batch}
    assert got <= batch_set


def test_streaming_sessions_resume_no_duplicates(spark, wal, tmp_path):
    """Restarting the drained query with the same checkpoint re-emits
    nothing (state store + committed offsets replay clean) — needs the
    foreachBatch/parquet sink; memory sinks refuse checkpoint recovery."""
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    sessionize_stream(spark, wal, ckpt, gap_seconds=GAP_S, output_path=out)
    first = spark.read.parquet(out).count()
    assert first == 4
    sessionize_stream(spark, wal, ckpt, gap_seconds=GAP_S, output_path=out)
    assert spark.read.parquet(out).count() == first  # no re-emission
