"""Long-chain endurance with maintenance interleaved (VERDICT r3 #7).

A 16-chunk replay chain with ``vacuum_tombstones`` AND
``expire_snapshots`` running INSIDE the live chain (every 4 chunks) must
converge to exactly the LWW reduce of the full feed — maintenance can
reclaim storage but never perturb state. The full-scale variant (16M
events, flat per-chunk wall time) is scripts/endurance_chain.py; this
marker-gated test pins the state-equivalence property at suite scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.lww import lww_reduce
from pasar_spark.cdc.merge import vacuum_tombstones
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.table import LakeTable

MAX_JITTER_S = 3600  # datagen default ts disorder; the vacuum horizon


@pytest.mark.slow
def test_sixteen_chunk_chain_with_vacuum_and_expiry(spark, tmp_path):
    wal = str(tmp_path / "wal")
    n_events = 160_000
    ev = change_events(spark, n_events, n_convs=300, seed=90, delete_fraction=0.12)
    write_change_log(ev, wal, n_files=16)

    runner = ReplayRunner(
        spark, str(tmp_path / "tbl"), n_buckets=8, chunk_size=n_events // 16
    )
    table = runner.bootstrap()
    n_chunks = 0
    vacuumed_buckets = 0
    while table.last_lsn < n_events - 1:
        table = runner.replay(wal, stop_after_chunks=1)
        n_chunks += 1
        if n_chunks % 4 == 0:
            table, vstats = vacuum_tombstones(
                table, horizon_lsn=table.last_lsn - MAX_JITTER_S
            )
            vacuumed_buckets += vstats.get("vacuumed_buckets", 0)
            table.expire_snapshots(keep_last=4, min_age_sec=0.0)
    assert n_chunks >= 16
    # maintenance actually did something: tombstones were reclaimed and
    # old snapshots expired (the chain doesn't grow unboundedly)
    assert vacuumed_buckets > 0
    import os

    manifests = [
        f
        for f in os.listdir(str(tmp_path / "tbl" / "metadata"))
        if f.startswith("v") and f.endswith(".json")
    ]
    assert len(manifests) < n_chunks  # expiry kept the chain short

    # exact final-state equivalence with the independent LWW reduce
    won = lww_reduce(
        spark.read.parquet(wal), key=["conv_id", "turn_idx"], order=["ts", "lsn"]
    ).where(F.col("op") != "D")
    want = sorted(
        (r.conv_id, r.turn_idx, r.lsn) for r in won.select("conv_id", "turn_idx", "lsn").collect()
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.lsn)
        for r in LakeTable.load(spark, str(tmp_path / "tbl"))
        .read()
        .select("conv_id", "turn_idx", "lsn")
        .collect()
    )
    assert got == want
