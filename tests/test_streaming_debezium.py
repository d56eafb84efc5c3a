"""Structured Streaming over a Debezium JSON-lines WAL: the live-tail
twin of tests/test_debezium.py. The stream must (1) land the same final
state as the native-envelope batch replay, (2) keep converging as the
shipper appends more connector files, and (3) quarantine non-row-change
lines (truncates, tx markers, corrupt JSON) to the dead-letter queue
instead of silently dropping them — counted exactly, across epochs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pasar_spark.cdc.debezium import to_debezium
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.cdc.sources import DataFrameSource
from pasar_spark.datagen import change_events
from pasar_spark.streaming.stream import StreamingIngest

JUNK_A = [
    '{"payload": {"op": "t", "source": {"lsn": 77}}}',  # truncate
    "corrupt { json",
]
JUNK_B = [
    '{"payload": {"op": "m", "ts_ms": 5}}',  # tx marker / message
]


def _ship(spark, ev, wal, junk):
    lines = to_debezium(ev, wrapped=True).union(
        spark.createDataFrame([(j,) for j in junk], "value string")
    )
    lines.repartition(2).write.mode("append").text(wal)


def _state(table):
    return sorted(
        (r.conv_id, r.turn_idx, r.text, r.lsn) for r in table.read().collect()
    )


def test_debezium_stream_matches_batch_resumes_and_quarantines(spark, tmp_path):
    wal = str(tmp_path / "dbz_wal")
    dlq = str(tmp_path / "dlq")
    ev_all = change_events(spark, 6_000, n_convs=100, seed=57)

    ingest = StreamingIngest(
        spark,
        str(tmp_path / "tbl"),
        wal,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=4,
        wire_format="debezium-json",
        dlq_path=dlq,
    )

    # stage 1: first half of the feed ships as connector JSON + junk
    _ship(spark, ev_all.where("lsn < 3000"), wal, JUNK_A)
    t1 = ingest.run_available_now()
    b1 = ReplayRunner(
        spark, str(tmp_path / "b1"), n_buckets=4, chunk_size=2_000
    ).replay(DataFrameSource(ev_all.where("lsn < 3000")))
    assert _state(t1) == _state(b1) and len(_state(t1)) > 0

    # stage 2: the shipper appends the rest (plus more junk); the SAME
    # checkpoint resumes the tail
    _ship(spark, ev_all.where("lsn >= 3000"), wal, JUNK_B)
    t2 = ingest.run_available_now()
    b2 = ReplayRunner(
        spark, str(tmp_path / "b2"), n_buckets=4, chunk_size=2_000
    ).replay(DataFrameSource(ev_all))
    assert _state(t2) == _state(b2)

    # stage 3: nothing new -> no state change
    v = t2.version
    t3 = ingest.run_available_now()
    assert t3.version == v and _state(t3) == _state(t2)

    # the DLQ holds exactly the junk lines, nothing else
    got = sorted(r.value for r in spark.read.text(f"{dlq}/*").collect())
    assert got == sorted(JUNK_A + JUNK_B)


def test_debezium_stream_applies_schema_evolution_mid_tail(spark, tmp_path):
    """schema_ver and the extra JSON ride the Debezium row image, so
    evolution arriving mid-tail works over the connector wire exactly as
    over native parquet: a later epoch carrying schema_ver=1 evolves the
    table (add 'sentiment'), promotes the extra, and the final state
    matches an independent LWW+json oracle over the RAW feed."""
    import duckdb

    from pasar_spark.cdc.schema_evolution import EvolutionPlan
    from pasar_spark.lake.table import LakeTable

    wal = str(tmp_path / "wal")
    evo_lsn = 3_000
    ev_all = change_events(spark, 6_000, n_convs=80, seed=7, evolution_lsn=evo_lsn)

    ingest = StreamingIngest(
        spark, str(tmp_path / "tbl"), wal,
        checkpoint_path=str(tmp_path / "ckpt"), n_buckets=4,
        evolution_plan=EvolutionPlan(steps={1: [("add", "sentiment", "int")]}),
        wire_format="debezium-json",
    )
    _ship(spark, ev_all.where(f"lsn < {evo_lsn}"), wal, [])
    t1 = ingest.run_available_now()
    assert "sentiment" not in t1.schema.names()  # nothing evolved yet

    _ship(spark, ev_all.where(f"lsn >= {evo_lsn}"), wal, [])
    t2 = ingest.run_available_now()
    assert "sentiment" in t2.schema.names()

    raw = str(tmp_path / "raw")
    ev_all.write.parquet(raw)
    con = duckdb.connect()
    want = {
        (c, t): s
        for c, t, s in con.execute(
            f"""
        SELECT conv_id, turn_idx,
               CAST(json_extract_string(extra, '$.sentiment') AS INT)
        FROM (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                       ORDER BY ts DESC, lsn DESC) rn FROM '{raw}/*.parquet')
        WHERE rn = 1 AND op <> 'D'
        """
        ).fetchall()
    }
    t = LakeTable.load(spark, str(tmp_path / "tbl"))
    got = {(r.conv_id, r.turn_idx): r.sentiment for r in t.read().collect()}
    assert got == want


def test_debezium_stream_starts_on_empty_wal(spark, tmp_path):
    """The text source needs no schema, so the connector tail is
    startable before the first file ships — then converges."""
    wal = str(tmp_path / "wal")
    ingest = StreamingIngest(
        spark,
        str(tmp_path / "tbl"),
        wal,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_buckets=4,
        wire_format="debezium-json",
    )
    t0 = ingest.run_available_now()  # empty drain: clean no-op
    ev = change_events(spark, 1_500, n_convs=30, seed=3)
    _ship(spark, ev, wal, [])
    t1 = ingest.run_available_now()
    want = (
        ReplayRunner(spark, str(tmp_path / "b"), n_buckets=4, chunk_size=1_000)
        .replay(DataFrameSource(ev))
    )
    assert _state(t1) == _state(want) and len(_state(t1)) > 0


def test_from_debezium_composes_with_public_readstream(spark, tmp_path):
    """The composition a Kafka consumer actually writes:
    ``readStream`` (one ``value string`` column — the post-
    ``CAST(value AS STRING)`` Kafka wire shape) -> :func:`from_debezium`
    applied to the STREAMING DataFrame -> ``foreachBatch`` into the merge
    core. No Kafka plugin ships in this sandbox, so a text-file stream
    stands in; the decode-and-merge plan is identical because both
    sources present the same single-column wire schema. This pins the
    PUBLIC seam (decode inside the streaming plan, including the
    observe barrier on a streaming Dataset), not StreamingIngest's
    internal wire_format path, which the other tests already cover."""
    from pasar_spark.cdc.debezium import from_debezium
    from pasar_spark.cdc.merge import merge_batch
    from pasar_spark.cdc.runner import bootstrap_table
    from pasar_spark.lake.table import LakeTable

    wal = str(tmp_path / "wire")
    ev = change_events(spark, 4_000, n_convs=80, seed=91)
    _ship(spark, ev, wal, JUNK_A)

    table_path = str(tmp_path / "tbl")
    bootstrap_table(spark, table_path, 4)

    # exactly what a Kafka deployment writes, modulo .format("kafka")
    wire = spark.readStream.text(wal)
    decoded = from_debezium(wire, "value")

    def apply(batch_df, epoch_id):
        t = LakeTable.load(spark, table_path)
        bid = f"kafka-{epoch_id}"
        if not t.has_batch(bid):
            merge_batch(t, batch_df, bid)

    q = (
        decoded.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = ReplayRunner(
        spark, str(tmp_path / "b"), n_buckets=4, chunk_size=2_000
    ).replay(DataFrameSource(ev))
    got = LakeTable.load(spark, table_path)
    assert _state(got) == _state(want) and len(_state(got)) > 0
