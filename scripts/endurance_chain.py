"""Long-chain endurance: 16+ replay chunks with compaction AND tombstone
vacuum interleaved (VERDICT r3 #7).

The 10^8 validation exercises 4 big chunks; this harness exercises the
OTHER axis — a long commit chain — asserting the two properties a
10^10-event deployment depends on:

- per-chunk wall time stays FLAT as the chain grows (O(chunk) MoR
  appends + LSM-tiered compaction, never O(table));
- interleaving ``vacuum_tombstones`` (horizon = applied LSN − max event
  ts-disorder, here datagen's max_jitter_s = 3600) and snapshot expiry
  into the live chain does not perturb the final state: the replayed
  table must match an independent DuckDB LWW reduce of the same WAL
  exactly (row count + per-key equality hash).

Usage: python scripts/endurance_chain.py [n_events] [n_chunks] [out.json]
Defaults 16M events / 16 chunks. Writes/prints a JSON report;
BENCH.md §1 cites the numbers. Run solo (hypervisor variance).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_JITTER_S = 3600  # datagen default; the feed's max ts disorder


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pasar_spark.cdc.merge import vacuum_tombstones
    from pasar_spark.cdc.runner import ReplayRunner
    from pasar_spark.datagen import change_events, write_change_log
    from pasar_spark.lake.table import LakeTable
    from pasar_spark.session import get_spark

    root = tempfile.mkdtemp(prefix="pasar_endurance_", dir="/dev/shm")
    wal = os.path.join(root, "wal")
    tbl = os.path.join(root, "tbl")
    spark = get_spark(
        "endurance",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": os.path.join(root, "spill"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        write_change_log(
            change_events(spark, n_events, n_convs=max(10_000, n_events // 100), seed=42),
            wal,
            n_files=128,
        )
        runner = ReplayRunner(
            spark, tbl, n_buckets=64, chunk_size=n_events // n_chunks
        )
        chunks = []
        maint = []
        table = runner.bootstrap()
        while True:
            t0 = time.time()
            table = runner.replay(wal, stop_after_chunks=1)
            dt = time.time() - t0
            done = table.last_lsn >= n_events - 1
            chunks.append(round(dt, 2))
            # maintenance interleaved into the LIVE chain every 4 chunks:
            # vacuum dead tombstones, then expire old snapshots (keeps a
            # short time-travel window, reclaims vacuumed/compacted files)
            if len(chunks) % 4 == 0 or done:
                m0 = time.time()
                table, vstats = vacuum_tombstones(
                    table, horizon_lsn=table.last_lsn - MAX_JITTER_S
                )
                estats = table.expire_snapshots(keep_last=4, min_age_sec=0.0)
                maint.append(
                    {
                        "after_chunk": len(chunks),
                        "vacuum": vstats,
                        "expire": estats,
                        "wall_sec": round(time.time() - m0, 2),
                    }
                )
            if done:
                break

        # flatness: mean of the last quarter vs first quarter of chunks
        q = max(len(chunks) // 4, 1)
        flatness = round(sum(chunks[-q:]) / q / (sum(chunks[:q]) / q), 3)

        # independent final-state oracle: DuckDB LWW-reduces the raw WAL
        # and EXACT-compares the winner set (conv_id, turn_idx, lsn)
        # against the engine's live state exported to parquet — a
        # symmetric EXCEPT, no cross-engine hash compatibility games
        import duckdb

        final = LakeTable.load(spark, tbl)
        eng_dir = os.path.join(root, "eng_state")
        final.read().select("conv_id", "turn_idx", "lsn").write.mode(
            "overwrite"
        ).parquet(eng_dir)
        con = duckdb.connect()
        con.execute(
            f"""
            CREATE VIEW oracle AS
            WITH feed AS (SELECT * FROM '{wal}/*.parquet'),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                           ORDER BY ts DESC, lsn DESC) AS rn
              FROM feed)
            SELECT conv_id, turn_idx, lsn
            FROM ranked WHERE rn = 1 AND op <> 'D';
            CREATE VIEW eng AS
            SELECT conv_id, turn_idx, lsn FROM '{eng_dir}/*.parquet';
            """
        )
        drows = con.execute("SELECT count(*) FROM oracle").fetchone()[0]
        erows = con.execute("SELECT count(*) FROM eng").fetchone()[0]
        diff = con.execute(
            """
            SELECT count(*) FROM (
              (SELECT * FROM eng EXCEPT SELECT * FROM oracle)
              UNION ALL
              (SELECT * FROM oracle EXCEPT SELECT * FROM eng))
            """
        ).fetchone()[0]
        report = {
            "n_events": n_events,
            "n_chunks_requested": n_chunks,
            "chunk_wall_sec": chunks,
            "maintenance": maint,
            "last_over_first_quarter": flatness,
            "final_rows_engine": erows,
            "final_rows_duckdb": drows,
            "winner_set_diff": diff,
            "state_match": erows == drows and diff == 0,
            "events_per_sec": round(n_events / sum(chunks)),
            "metrics": final.metrics,
        }
        print(json.dumps(report))
        if out_path:
            with open(out_path, "w") as f:
                json.dump(report, f, indent=2)
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
