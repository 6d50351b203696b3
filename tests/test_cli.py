"""Replay CLI: day discovery and error paths."""

from __future__ import annotations

from etl_pipeline_for_detection_banking_fraud_spark.cli import discover_days, main


def test_discover_days_orders_by_date(tmp_path):
    for d in ("15042021", "01032021", "02032021"):
        (tmp_path / f"transactions_{d}.txt").write_text("")
    assert discover_days(str(tmp_path)) == ["01032021", "02032021", "15042021"]


def test_replay_empty_dir_exits_2(tmp_path, capsys):
    rc = main(["replay", "--data", str(tmp_path), "--warehouse", str(tmp_path / "wh")])
    assert rc == 2
    assert "no transactions" in capsys.readouterr().err
