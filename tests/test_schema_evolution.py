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


def test_ingest_after_key_rename(spark, tmp_path):
    """Renaming a KEY column mid-stream must not corrupt later ingest:
    the feed keeps sending the old envelope name; promote_extra renames
    it via the recorded feed alias (never synthesizes a key from JSON,
    which would group every conversation onto a NULL key)."""
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 4_000, n_convs=60, seed=13), wal, n_files=4)
    runner = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=4, chunk_size=2_000)
    # first half, then rename the key column, then the second half
    table = runner.replay(wal, max_events=2_000)
    table = table.rename_column("turn_idx", "turn_no")
    table = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=4, chunk_size=2_000).replay(wal)

    got = sorted(
        (r.conv_id, int(r.turn_no), r.lsn)
        for r in table.read().select("conv_id", "turn_no", "lsn").collect()
    )
    import duckdb

    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT conv_id, turn_idx, lsn FROM (
              SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                ORDER BY ts DESC, lsn DESC) rn FROM '{wal}/*.parquet') t
            WHERE rn = 1 AND op <> 'D'
            """
        ).fetchall()
    )
    assert got == want


def test_evolution_commit_is_atomic_and_idempotent(spark, tmp_path):
    """One manifest commit per feed version: re-applying the plan after
    any crash point is a no-op (the old per-op commits could crash
    between DDL and the ledger bump, bricking the table with
    'column already exists')."""
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 1_000, n_convs=20, seed=17), wal, n_files=2)
    plan = EvolutionPlan(steps={1: [("add", "sentiment", "int"), ("rename", "tool", "tool_name")]})
    runner = ReplayRunner(
        spark, str(tmp_path / "t"), n_buckets=4, chunk_size=1_000, evolution_plan=plan
    )
    table = runner.bootstrap()
    v0 = table.version
    table = plan.apply_up_to(table, 1)
    assert table.version == v0 + 1  # exactly ONE commit for the whole version
    assert table.manifest["ledger"]["feed_schema_ver"] == 1
    assert "sentiment" in table.schema.names()
    assert "tool_name" in table.schema.names()
    # idempotent re-application (simulated crash-rerun)
    t2 = plan.apply_up_to(table, 1)
    assert t2.version == table.version
