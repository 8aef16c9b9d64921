"""CLI surface (python -m crypto_streaming_lakehouse_spark)."""

from __future__ import annotations

import pytest

from crypto_streaming_lakehouse_spark.__main__ import main


def test_list_filters_by_tag(capsys):
    assert main(["list", "--tag", "causal"]) == 0
    out = capsys.readouterr().out
    assert "q_ipw_ate" in out and "q_did_estimate" in out
    assert "q_groupby_agg" not in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q_groupby_agg"]) == 0
    assert "l_returnflag" in capsys.readouterr().out


def test_unknown_query_suggests(capsys):
    with pytest.raises(SystemExit) as e:
        main(["oracle", "q_groupby"])
    assert "did you mean" in str(e.value)


def test_run_json(capsys):
    assert (
        main(
            [
                "run",
                "q_global_agg",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--format",
                "json",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert out.strip().startswith("[")


def test_explain_prints_plan(capsys):
    assert (
        main(["explain", "q_filter_eq", "--sf-dir", "/root/testdata/sf0.001"])
        == 0
    )
    assert "Physical Plan" in capsys.readouterr().out


def test_snapshot_history_cli(spark, tmp_path, capsys):
    from crypto_streaming_lakehouse_spark.sources.snapshots import (
        snapshot_write,
    )

    table = str(tmp_path / "tbl")
    snapshot_write(spark.range(3), table)
    snapshot_write(spark.range(3, 5), table)
    assert main(["snapshot-history", table]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "v2" in out and "op=append" in out
