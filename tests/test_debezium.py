"""Debezium envelope interop: consume connector JSON, produce it back.

Round-trip law: ``from_debezium(to_debezium(ev)) == ev`` for row-change
events (modulo delete payload nulls — the engine envelope carries no
before-image values). Source law: replaying a Debezium JSON-lines WAL
lands the exact final state the native parquet feed lands. Producer law:
a consumer that tails ``changes_as_debezium`` output and LWW-applies it
converges to the source table — which is what makes the delete rows'
tombstone-position (ts, lsn) in the CDF load-bearing: a delete re-emitted
at the PRE-image's position would tie with the row it kills and lose the
LWW comparison at the consumer.

Reference parity: the reference ingests via a Postgres cursor over
staging tables (SURVEY.md S3); Debezium is that same Postgres feed in
its logical-replication form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.cdc.debezium import (
    DebeziumJsonSource,
    changes_as_debezium,
    from_debezium,
    to_debezium,
)
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.cdc.sources import DataFrameSource
from pasar_spark.datagen import EVENT_COLUMNS, change_events


def _events(spark, n=4_000, seed=11):
    return change_events(spark, n, n_convs=80, seed=seed)


def _rows(df):
    return sorted(tuple(r) for r in df.select(*EVENT_COLUMNS).collect())


def _expected_after_roundtrip(ev):
    # deletes lose their payload columns (the engine envelope has no
    # before-image values to carry) — everything else is identity
    is_del = F.col("op") == "D"
    null_s = F.lit(None).cast("string")
    return ev.select(
        "lsn",
        "op",
        "conv_id",
        "turn_idx",
        F.when(is_del, null_s).otherwise(F.col("role")).alias("role"),
        F.when(is_del, null_s).otherwise(F.col("text")).alias("text"),
        F.when(is_del, null_s).otherwise(F.col("tool")).alias("tool"),
        "ts",
        "schema_ver",
        F.when(is_del, null_s).otherwise(F.col("extra")).alias("extra"),
    )


@pytest.mark.parametrize("wrapped", [False, True])
def test_roundtrip_engine_debezium_engine(spark, wrapped):
    ev = _events(spark)
    back = from_debezium(to_debezium(ev, wrapped=wrapped), "value")
    assert _rows(back) == _rows(_expected_after_roundtrip(ev))


def test_framing_and_junk_lines(spark):
    ev = _events(spark, n=200, seed=7).where("op = 'I'").limit(5)
    wrapped = to_debezium(ev, wrapped=True)
    bare = to_debezium(ev, wrapped=False)
    junk = spark.createDataFrame(
        [
            ('{"payload": {"op": "t", "source": {"lsn": 9}}}',),  # truncate
            ('{"payload": {"op": "m", "ts_ms": 1}}',),  # message marker
            ("not json at all",),
            ('{"schema": {"type": "struct"}}',),  # schema-only fragment
        ],
        "value string",
    )
    out = from_debezium(wrapped.union(bare).union(junk), "value")
    # both framings parse identically; junk contributes nothing
    assert _rows(out) == _rows(
        _expected_after_roundtrip(ev.union(ev))
    )


@pytest.mark.parametrize("cache", [False, True])
def test_debezium_wal_replay_matches_native_feed(spark, tmp_path, cache):
    """A JSON-lines Debezium WAL replayed through the UNCHANGED runner
    equals the native parquet-feed replay — op mapping, micro-timestamp
    decode and sparse WAL LSNs all exercised by the real merge loop.
    cache=True covers the persist-the-parse tier."""
    ev = _events(spark, n=6_000, seed=23)
    wal = str(tmp_path / "dbz_wal")
    to_debezium(ev, wrapped=True).repartition(6).write.text(wal)

    native = ReplayRunner(
        spark, str(tmp_path / "t_native"), n_buckets=4, chunk_size=2_000
    ).replay(DataFrameSource(ev))
    src = DebeziumJsonSource(spark, wal, cache=cache)
    tailed = ReplayRunner(
        spark, str(tmp_path / "t_dbz"), n_buckets=4, chunk_size=2_000
    ).replay(src)
    src.unpersist()

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn"]
    a = sorted(tuple(r) for r in native.read().select(*cols).collect())
    b = sorted(tuple(r) for r in tailed.read().select(*cols).collect())
    assert a == b and len(a) > 0


def test_vacuumed_tombstone_delete_still_converges_consumer(spark, tmp_path):
    """A delete whose tombstone was VACUUMED inside the CDF range has no
    own (ts, lsn); the producer must synthesize a position strictly
    after the pre-image or the consumer's strict-greater LWW comparison
    skips the delete as a stale tie and the key survives downstream."""
    from pasar_spark.cdc.merge import vacuum_tombstones
    from pasar_spark.cdc.runner import bootstrap_table

    path = str(tmp_path / "src")
    v0 = bootstrap_table(spark, path, n_buckets=2).version
    base = spark.createDataFrame(
        [(f"k{i}", 0, "I", f"2025-01-01 00:00:{i:02d}", i, "user", f"t{i}", None)
         for i in range(6)],
        "conv_id string, turn_idx int, op string, ts_s string, lsn bigint,"
        " role string, text string, tool string",
    ).withColumn("ts", F.expr("cast(ts_s as timestamp)")).drop("ts_s")
    t1 = ReplayRunner(spark, path, n_buckets=2, chunk_size=1 << 30).replay(
        DataFrameSource(base)
    )
    v1 = t1.version
    dele = spark.createDataFrame(
        [("k0", 0, "D", "2025-01-02 00:00:00", 20, None, None, None)],
        "conv_id string, turn_idx int, op string, ts_s string, lsn bigint,"
        " role string, text string, tool string",
    ).withColumn("ts", F.expr("cast(ts_s as timestamp)")).drop("ts_s")
    t2 = ReplayRunner(spark, path, n_buckets=2, chunk_size=1 << 30).replay(
        DataFrameSource(dele)
    )
    t3, _ = vacuum_tombstones(t2, horizon_lsn=100)
    # precondition: the CDF really lost the tombstone's own position
    ch = t3.changes(v1)
    assert ch.where("_change_type = 'delete' AND lsn IS NULL").count() == 1

    dst = str(tmp_path / "dst")
    ReplayRunner(spark, dst, n_buckets=2, chunk_size=1 << 30).replay(
        DataFrameSource(
            from_debezium(changes_as_debezium(t3, v0, v1), "value")
        )
    )
    consumer = ReplayRunner(spark, dst, n_buckets=2, chunk_size=1 << 30).replay(
        DataFrameSource(from_debezium(changes_as_debezium(t3, v1), "value"))
    )
    got = sorted(r.conv_id for r in consumer.read().collect())
    want = sorted(r.conv_id for r in t3.read().collect())
    assert got == want and "k0" not in got and len(got) == 5


def test_evolved_columns_ride_extra_and_consumer_converges(spark, tmp_path):
    """Evolution-promoted columns are NOT in the fixed wire row image —
    they travel in the extra JSON with the emitted schema_ver, and a
    consumer running the same EvolutionPlan re-promotes them. Proves a
    post-evolution table can still be tailed losslessly."""
    from pasar_spark.cdc.runner import bootstrap_table
    from pasar_spark.cdc.schema_evolution import EvolutionPlan

    plan = EvolutionPlan(steps={1: [("add", "sentiment", "int")]})
    ev_all = change_events(spark, 4_000, n_convs=60, seed=7, evolution_lsn=1_000)
    path = str(tmp_path / "src")
    v0 = bootstrap_table(spark, path, n_buckets=4).version
    t = ReplayRunner(
        spark, path, n_buckets=4, chunk_size=1_500, evolution_plan=plan
    ).replay(DataFrameSource(ev_all))
    assert "sentiment" in t.schema.names()
    assert t.read().where("sentiment IS NOT NULL").count() > 0

    consumer = ReplayRunner(
        spark, str(tmp_path / "dst"), n_buckets=4, chunk_size=1 << 30,
        evolution_plan=plan,
    ).replay(DataFrameSource(from_debezium(changes_as_debezium(t, v0), "value")))
    cols = ["conv_id", "turn_idx", "text", "sentiment"]
    a = sorted(tuple(r) for r in t.read().select(*cols).collect())
    b = sorted(tuple(r) for r in consumer.read().select(*cols).collect())
    assert a == b and len(a) > 0


def test_debezium_replay_resumes_after_crash(spark, tmp_path):
    """Kill the replay after one chunk, resume with a fresh runner over
    the SAME JSON WAL: the ledger's exactly-once argument is
    source-agnostic, so the final state equals an uninterrupted replay."""
    ev = _events(spark, n=6_000, seed=37)
    wal = str(tmp_path / "wal")
    to_debezium(ev, wrapped=True).repartition(4).write.text(wal)
    path = str(tmp_path / "t")
    ReplayRunner(spark, path, n_buckets=4, chunk_size=1_500).replay(
        DebeziumJsonSource(spark, wal), stop_after_chunks=1
    )
    resumed = ReplayRunner(spark, path, n_buckets=4, chunk_size=1_500).replay(
        DebeziumJsonSource(spark, wal)
    )
    clean = ReplayRunner(
        spark, str(tmp_path / "t2"), n_buckets=4, chunk_size=1_500
    ).replay(DebeziumJsonSource(spark, wal))
    cols = ["conv_id", "turn_idx", "text", "ts", "lsn"]
    a = sorted(tuple(r) for r in resumed.read().select(*cols).collect())
    b = sorted(tuple(r) for r in clean.read().select(*cols).collect())
    assert a == b and len(a) > 0


def test_wal_source_rejects_partition_the_input(spark, tmp_path):
    """DebeziumJsonSource.rejects() + the accepted feed partition the WAL
    exactly: junk lines surface for quarantine, never reach the replay."""
    ev = _events(spark, n=300, seed=13)
    wal = str(tmp_path / "wal")
    junk = ['{"payload":{"op":"t","source":{"lsn":1}}}', "BAD {"]
    to_debezium(ev, wrapped=True).union(
        spark.createDataFrame([(j,) for j in junk], "value string")
    ).repartition(2).write.text(wal)
    src = DebeziumJsonSource(spark, wal)
    assert sorted(r.value for r in src.rejects().collect()) == sorted(junk)
    n_total = spark.read.text(wal).count()
    assert src.chunk(0, 1 << 60).count() + src.rejects().count() == n_total


def test_wal_to_parquet_conversion_replays_identically(spark, tmp_path):
    """to_parquet (the documented scale path: one parse, then footer-stat
    pruned chunks) lands the same final state as tailing the JSON WAL
    directly — and junk lines don't survive the conversion."""
    ev = _events(spark, n=4_000, seed=29)
    wal = str(tmp_path / "wal")
    to_debezium(ev, wrapped=True).union(
        spark.createDataFrame([("junk line",)], "value string")
    ).repartition(4).write.text(wal)
    src = DebeziumJsonSource(spark, wal)
    converted = src.to_parquet(str(tmp_path / "pq"), n_files=6)
    a = ReplayRunner(
        spark, str(tmp_path / "ta"), n_buckets=4, chunk_size=1_500
    ).replay(src)
    b = ReplayRunner(
        spark, str(tmp_path / "tb"), n_buckets=4, chunk_size=1_500
    ).replay(converted)
    cols = ["conv_id", "turn_idx", "text", "ts", "lsn"]
    ra = sorted(tuple(r) for r in a.read().select(*cols).collect())
    rb = sorted(tuple(r) for r in b.read().select(*cols).collect())
    assert ra == rb and len(ra) > 0


def test_changes_as_debezium_consumer_converges(spark, tmp_path):
    """Tail the table's CDF as Debezium events into a second table in two
    version hops (hop 2 carries real updates AND deletes) — the consumer
    must land the source's exact live state."""
    ev = _events(spark, n=6_000, seed=31)
    cut = ev.agg(F.expr("percentile(lsn, 0.5)")).collect()[0][0]
    src_path = str(tmp_path / "src")
    from pasar_spark.cdc.runner import bootstrap_table

    v0 = bootstrap_table(spark, src_path, n_buckets=4).version
    runner = ReplayRunner(spark, src_path, n_buckets=4, chunk_size=2_000)
    t1 = runner.replay(DataFrameSource(ev.where(F.col("lsn") <= cut)))
    v1 = t1.version
    t2 = ReplayRunner(spark, src_path, n_buckets=4, chunk_size=2_000).replay(
        DataFrameSource(ev)
    )
    hop2 = from_debezium(changes_as_debezium(t2, v1), "value")
    assert hop2.where("op = 'D'").count() > 0  # the interesting case
    assert hop2.where("op = 'U'").count() > 0

    consumer = ReplayRunner(
        spark, str(tmp_path / "dst"), n_buckets=4, chunk_size=100_000
    )
    consumer.replay(
        DataFrameSource(from_debezium(changes_as_debezium(t2, v0, v1), "value"))
    )
    dst = ReplayRunner(
        spark, str(tmp_path / "dst"), n_buckets=4, chunk_size=100_000
    ).replay(DataFrameSource(hop2))

    cols = ["conv_id", "turn_idx", "role", "text", "ts"]
    a = sorted(tuple(r) for r in t2.read().select(*cols).collect())
    b = sorted(tuple(r) for r in dst.read().select(*cols).collect())
    assert a == b and len(a) > 0
