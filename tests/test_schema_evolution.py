"""In-flight schema evolution: add / rename / widen mid-replay.

Feed declares schema_ver=1 from a given LSN; the evolution plan adds a
``sentiment int`` column carried in the ``extra`` JSON. Later the table is
widened (int->bigint) and renamed — old files must stay readable through
the field-id mapping (lake/schema.py)."""

from __future__ import annotations

import pytest

from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.cdc.schema_evolution import EvolutionPlan
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.schema import TableSchema


def test_schema_ops_field_ids():
    s = TableSchema.from_pairs([("a", "int"), ("b", "string")])
    s2 = s.add_column("c", "long").rename_column("a", "a2").widen_column("a2", "bigint")
    assert s2.field_by_name("a2").id == 1  # rename keeps the id
    assert s2.field_by_name("a2").type == "bigint"
    assert s2.field_by_name("c").id == 3
    with pytest.raises(ValueError):
        s2.widen_column("b", "int")  # illegal narrowing/change


def test_mid_stream_column_add(spark, tmp_path):
    wal = str(tmp_path / "wal")
    evo_lsn = 3_000
    write_change_log(
        change_events(spark, 6_000, n_convs=80, seed=3, evolution_lsn=evo_lsn),
        wal,
        n_files=4,
    )
    plan = EvolutionPlan(steps={1: [("add", "sentiment", "int")]})
    runner = ReplayRunner(
        spark, str(tmp_path / "t"), n_buckets=4, chunk_size=2_000, evolution_plan=plan
    )
    table = runner.replay(wal)

    assert "sentiment" in table.schema.names()
    df = table.read()
    # rows whose winning event predates the evolution point have null
    # sentiment; rows written after carry the promoted JSON value
    n_new = df.where("sentiment is not null").count()
    n_old = df.where("sentiment is null and text is not null").count()
    assert n_new > 0 and n_old > 0
    got = {(r.conv_id, r.turn_idx): r.sentiment for r in df.collect()}
    # spot-check against the winning event's extra payload via LWW on raw log
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW e AS SELECT * FROM '{wal}/*.parquet'")
    want = {
        (c, t): s
        for c, t, s in con.execute(
            """
        SELECT conv_id, turn_idx,
               CAST(json_extract_string(extra, '$.sentiment') AS INT)
        FROM (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                       ORDER BY ts DESC, lsn DESC) rn FROM e)
        WHERE rn = 1 AND op <> 'D'
        """
        ).fetchall()
    }
    assert got == want


def test_rename_and_widen_keep_old_files_readable(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 2_000, n_convs=40, seed=5), wal, n_files=2)
    runner = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=4, chunk_size=1_000)
    table = runner.replay(wal)
    before = {(r.conv_id, r.turn_idx): r.turn_idx for r in table.read().collect()}

    table = table.rename_column("turn_idx", "turn_no").widen_column("turn_no", "bigint")
    df = table.read()
    assert dict(df.dtypes)["turn_no"] == "bigint"
    after = {(r.conv_id, int(r.turn_no)): int(r.turn_no) for r in df.collect()}
    assert after == before  # old parquet files read through id mapping + cast
