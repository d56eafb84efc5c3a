"""fsck (lake/fsck.py): the integrity checker must pass a healthy table,
catch each corruption class it documents, and never crash on the
corruption it exists to find."""

from __future__ import annotations

import json
import os

import pytest

from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log
from pasar_spark.lake.fsck import fsck
from pasar_spark.lake.table import LakeTable


@pytest.fixture()
def table(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(
        change_events(spark, 3_000, n_convs=50, seed=71, delete_fraction=0.1),
        wal, n_files=2,
    )
    return ReplayRunner(
        spark, str(tmp_path / "tbl"), n_buckets=4, chunk_size=1_500
    ).replay(wal)


def _first_data_file(t: LakeTable) -> str:
    for entries in t.manifest["buckets"].values():
        for e in entries:
            return os.path.join(t.path, e["path"])
    raise AssertionError("table has no data files")


def test_healthy_table_is_ok(table):
    r = fsck(table.path, deep=True)
    assert r["ok"], r["errors"]
    assert r["errors"] == []
    assert r["checked"]["manifests"] >= 2
    assert r["checked"]["files"] > 0


def test_missing_data_file_is_an_error(table):
    os.remove(_first_data_file(table))
    r = fsck(table.path)
    assert not r["ok"]
    assert any("missing" in e for e in r["errors"])


def test_corrupt_manifest_is_an_error_not_a_crash(table):
    mpath = LakeTable._manifest_path(table.path, table.version)
    with open(mpath, "w") as fh:
        fh.write("{ not json")
    r = fsck(table.path)
    assert not r["ok"]
    assert any("unreadable" in e for e in r["errors"])


def test_dangling_staged_pointer_is_an_error(table):
    with open(os.path.join(table.path, "metadata", "STAGED-ghost"), "w") as fh:
        fh.write("9999")
    r = fsck(table.path)
    assert not r["ok"]
    assert any("STAGED-ghost" in e for e in r["errors"])


def test_torn_file_caught_by_deep_rowcount(table):
    """Simulate a partial restore: a referenced file replaced by a valid
    parquet with the WRONG contents. Shallow fsck passes (file exists);
    deep fsck catches the row-count mismatch from the footer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    victim = _first_data_file(table)
    tbl = pq.read_table(victim)
    pq.write_table(tbl.slice(0, max(tbl.num_rows - 1, 0)), victim)
    assert fsck(table.path)["ok"]
    r = fsck(table.path, deep=True)
    assert not r["ok"]
    assert any("footer has" in e for e in r["errors"])


def test_orphans_warn_but_do_not_fail(table):
    orphan = os.path.join(table.path, "data", "zz-orphan", "part-0.parquet")
    os.makedirs(os.path.dirname(orphan))
    import shutil

    shutil.copy(_first_data_file(table), orphan)
    r = fsck(table.path)
    assert r["ok"]
    assert r["checked"]["orphan_files"] == 1
    assert any("orphan" in w for w in r["warnings"])


def test_expired_history_is_healthy(table, spark):
    """A table whose old manifests were expired must still fsck clean —
    chains legally end at the retention horizon."""
    LakeTable.load(spark, table.path).expire_snapshots(
        keep_last=1, min_age_sec=0
    )
    r = fsck(table.path, deep=True)
    assert r["ok"], r["errors"]


def test_patch_table_fscks_clean(spark, tmp_path):
    """fsck is storage-mode-agnostic: a patch table (per-column winner
    structs, different schema shape) must pass the same walk."""
    from pasar_spark.cdc.patch import PatchReplayRunner
    from pasar_spark.datagen import change_events, write_change_log

    wal = str(tmp_path / "wal")
    write_change_log(
        change_events(spark, 2_000, n_convs=40, seed=3, delete_fraction=0.1),
        wal, n_files=2,
    )
    t = PatchReplayRunner(
        spark, str(tmp_path / "ptbl"), n_buckets=4, chunk_size=1_000
    ).replay(wal)
    r = fsck(t.path, deep=True)
    assert r["ok"], r["errors"]
    assert r["checked"]["files"] > 0


def test_cli_fsck(table, capsys):
    from pasar_spark.cli import main

    assert main(["fsck", "--table", table.path, "--deep"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"]
    os.remove(_first_data_file(table))
    assert main(["fsck", "--table", table.path]) == 1
