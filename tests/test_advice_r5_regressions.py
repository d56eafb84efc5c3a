"""Regression tests for round-4 review findings (ADVICE.md round 5).

1. from_debezium's observe-barrier names must be unique even when plans
   are composed from concurrent threads (the old bare-global increment
   could mint duplicates; a query unioning two feeds then fails analysis
   with a duplicate-observation error).
2. A c/r/u event whose row image lacks ``ts`` must fall back to the
   source-block timestamps (as deletes already did) — otherwise it lands
   with null ts and loses every (ts, lsn) LWW comparison, silently
   shadowed by older events.
3. Strict-mode audio decode must distinguish CORRUPT WAV (RIFF/WAVE
   header present, parse failed → data-quality failure) from genuinely
   non-WAV containers (→ missing-codec failure).
4. The PyAV frame seek must pass its offset in av.time_base microseconds
   (seek WITHOUT stream=); with stream= the offset is interpreted in
   stream.time_base units and silently samples wrong frames.
5. expire_snapshots' default min_age_sec must guard in-flight writers: a
   young unreferenced data file or above-head manifest survives a
   default-args expire; min_age_sec=0 is the explicit single-writer
   opt-in to immediate reclaim.
"""

from __future__ import annotations

import json
import os
import re
import threading
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.debezium import from_debezium
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.functions.multimodal import _audio_feature, _real_frame_ref
from pasar_spark.lake.table import LakeTable

_C_EVENT = (
    '{"payload": {"after": {"conv_id": "c-0", "turn_idx": 0, "role": "user",'
    ' "text": "hi", "ts": 1000, "schema_ver": 1}, "op": "c",'
    ' "source": {"lsn": 1, "ts_us": 1000}}}'
)


def test_from_debezium_observe_names_unique_across_threads(spark):
    df = spark.createDataFrame([(_C_EVENT,)], "value string")
    n = 8
    outs = [None] * n
    barrier = threading.Barrier(n)

    def build(i):
        barrier.wait()  # maximize the read-increment race window
        outs[i] = from_debezium(df, "value")

    threads = [threading.Thread(target=build, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    # duplicate observation names fail at ANALYSIS; count() forces it
    assert u.count() == n
    names = set(
        re.findall(r"dbz_parse_\d+", u._jdf.queryExecution().analyzed().toString())
    )
    assert len(names) == n


def test_from_debezium_source_ts_fallback_for_upserts(spark):
    lines = [
        # row image lacks ts entirely -> source.ts_us supplies event time
        '{"payload": {"after": {"conv_id": "c", "turn_idx": 0, "text": "a",'
        ' "schema_ver": 1}, "op": "c", "source": {"lsn": 10, "ts_us": 1000777}}}',
        # no ts_us either -> source.ts_ms (millis)
        '{"payload": {"after": {"conv_id": "c", "turn_idx": 1, "text": "b"},'
        ' "op": "u", "source": {"lsn": 11, "ts_ms": 2000}}}',
        # no source timestamps at all -> top-level envelope ts_ms
        '{"payload": {"after": {"conv_id": "c", "turn_idx": 2, "text": "c"},'
        ' "op": "u", "ts_ms": 3000, "source": {"lsn": 12}}}',
        # row-image ts present -> it wins over the source block
        '{"payload": {"after": {"conv_id": "c", "turn_idx": 3, "text": "d",'
        ' "ts": 4000999}, "op": "c", "source": {"lsn": 13, "ts_us": 1}}}',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {
        r.lsn: r.us
        for r in from_debezium(df, "value")
        .select("lsn", F.unix_micros("ts").alias("us"))
        .collect()
    }
    assert got == {10: 1000777, 11: 2_000_000, 12: 3_000_000, 13: 4000999}


def test_audio_strict_distinguishes_corrupt_wav_from_missing_codec():
    # RIFF/WAVE-tagged but truncated: a DATA-QUALITY failure
    corrupt_wav = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00"
    with pytest.raises(ValueError, match="corrupt or truncated WAV"):
        _audio_feature(corrupt_wav, strict=True)
    # genuinely non-WAV container: a MISSING-CODEC failure
    with pytest.raises(NotImplementedError, match="ffmpeg-class codec"):
        _audio_feature(b"\x00" * 32, strict=True)
    # non-strict mode still degrades both to the deterministic stub
    assert isinstance(_audio_feature(corrupt_wav, strict=False), str)
    assert isinstance(_audio_feature(b"\x00" * 32, strict=False), str)


def test_real_frame_seek_offset_in_av_time_base():
    """Pin the seek contract with a fake PyAV: offset must be t_ms*1000
    (av.time_base microseconds) and the stream= kwarg must NOT be passed
    (which would reinterpret the offset in stream.time_base units)."""

    class _Frame:
        width, height = 4, 2
        planes = [b"\x00" * 8]

    class _Container:
        seek_calls: list = []

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        streams = SimpleNamespace(video=[object()])

        def seek(self, offset, **kw):
            _Container.seek_calls.append((offset, kw))

        def decode(self, stream):
            yield _Frame()

    fake_av = SimpleNamespace(open=lambda buf: _Container())
    ref = _real_frame_ref(fake_av, b"fake-video-bytes", t_ms=2500)
    assert ref is not None and ref.startswith("frame@2500:4x2:")
    assert len(_Container.seek_calls) == 1
    offset, kwargs = _Container.seek_calls[0]
    assert offset == 2500 * 1000  # av.time_base = 1/1e6
    assert "stream" not in kwargs  # stream= would change the unit


def test_expire_default_min_age_guards_inflight_artifacts(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 400, n_convs=8, seed=5), wal, n_files=2)
    table = ReplayRunner(
        spark, str(tmp_path / "t"), n_buckets=2, chunk_size=100
    ).replay(wal)

    # an uncommitted writer's artifacts: a young unreferenced data file...
    orphan = os.path.join(table.path, "data", "inflight.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"x")
    # ...and a young above-head manifest (a commit in its link->flip window)
    inflight_v = table.version + 5
    inflight_manifest = LakeTable._manifest_path(table.path, inflight_v)
    with open(inflight_manifest, "w") as fh:
        json.dump({"buckets": {}, "parent_version": table.version}, fh)

    table.expire_snapshots(keep_last=1)  # default min_age: live-writer posture
    assert os.path.exists(orphan)
    assert os.path.exists(inflight_manifest)

    # single-writer maintenance opts in to immediate reclaim explicitly
    table.expire_snapshots(keep_last=1, min_age_sec=0.0)
    assert not os.path.exists(orphan)
    assert not os.path.exists(inflight_manifest)
