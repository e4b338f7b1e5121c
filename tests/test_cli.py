"""CLI driver test (reference: cmd/cdc-lite/main.go) — run the monitor for a
bounded duration over a parquet source dir, then check the log."""

from __future__ import annotations

from cdc_lite_spark.cli import main
from cdc_lite_spark.sources.changelog import read_changes


def test_cli_monitors_and_stops(spark, sf_dir, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region,nation",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "12",
        ],
        spark=spark,
    )
    assert rc == 0
    log = read_changes(spark, out)
    assert log.filter("table = 'region'").count() == 5
    assert log.filter("table = 'nation'").count() == 25


def test_cli_diff_mode_with_keys(spark, sf_dir, tmp_path):
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    rc = main(
        [
            "--source", sf_dir,
            "--tables", "region",
            "--output-dir", out,
            "--state-dir", state,
            "--interval", "0.5",
            "--duration", "12",
            "--mode", "diff",
            "--keys", "region=r_regionkey",
        ],
        spark=spark,
    )
    assert rc == 0
    log = read_changes(spark, out, table="region")
    assert log.count() == 5
    assert log.filter("operation = 'INSERT'").count() == 5
