from __future__ import annotations

import pytest

from pasar_spark.cdc.quality import (
    QualityError,
    assert_lsn_monotone_vs_ledger,
    assert_no_nulls,
    assert_unique_key,
    quality_report,
)
from pasar_spark.cdc.runner import ReplayRunner
from pasar_spark.datagen import change_events, write_change_log


def test_quality_checks_pass_on_replayed_table(spark, tmp_path):
    wal = str(tmp_path / "wal")
    write_change_log(change_events(spark, 3_000, n_convs=50, seed=17), wal, n_files=2)
    t = ReplayRunner(spark, str(tmp_path / "t"), n_buckets=4, chunk_size=1_000).replay(wal)
    df = t.read()
    assert_unique_key(df, ["conv_id", "turn_idx"])  # LWW invariant
    assert_no_nulls(df, ["conv_id", "turn_idx", "ts", "lsn"])
    assert_lsn_monotone_vs_ledger(df, t.last_lsn)
    rep = quality_report(df, ["conv_id", "turn_idx"])
    assert rep["rows"] == rep["distinct_keys"]
    assert rep["max_lsn"] <= t.last_lsn


def test_quality_checks_fail_loudly(spark):
    df = spark.createDataFrame(
        [("a", 0, 1), ("a", 0, 2), ("b", None, 3)], "conv_id string, turn_idx int, lsn bigint"
    )
    with pytest.raises(QualityError, match="duplicate keys"):
        assert_unique_key(df, ["conv_id", "turn_idx"])
    with pytest.raises(QualityError, match="nulls"):
        assert_no_nulls(df, ["turn_idx"])
    with pytest.raises(QualityError, match="lsn"):
        assert_lsn_monotone_vs_ledger(df, 1)
