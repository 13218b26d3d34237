"""Query-CLI contract: the clickhouse-client analogue must list the
registry, run ad-hoc SQL over the fixture views, and run registered
queries by name."""

from __future__ import annotations

from solis_solarman_clickhouse_spark.__main__ import main

from .conftest import SF_DIR


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "agg_tpch_q1" in out and "doc_exact_dedup" in out
    assert len(out.splitlines()) > 300


def test_cli_sql(spark, capsys):
    rc = main(
        [
            "--sf-dir", SF_DIR, "--format", "csv",
            "--sql",
            "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "r_name" and out[1] == "AFRICA"


def test_cli_registered_query(spark, capsys):
    rc = main(["--sf-dir", SF_DIR, "--format", "csv", "--query", "sort_topk_global"])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "o_orderkey,o_totalprice" and len(out) == 11


def test_cli_unknown_query(spark, capsys):
    assert main(["--sf-dir", SF_DIR, "--query", "nope"]) == 2
