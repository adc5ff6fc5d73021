"""CLI runner — argument handling and end-to-end query execution."""

from __future__ import annotations

import json

from bangumi_notion_data_integration_project_spark.run import main


def test_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "category_summary" in out
    assert "dedup_exact" in out


def test_unknown_query(capsys):
    assert main(["--query", "nope"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_no_query_usage():
    assert main([]) == 2


def test_run_query(spark, sf_dir, capsys):
    assert main(["--query", "global_summary", "--sf-dir", sf_dir]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["query"] == "global_summary"
    assert payload["rows"] == 1


def test_run_query_to_parquet(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "res.parquet")
    assert main(
        ["--query", "cross_join_dims", "--sf-dir", sf_dir, "--out", out]
    ) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["rows"] == 25
    assert spark.read.parquet(out).count() == 25
