"""CLI surface tests (reference main.py argparse parity)."""

import pytest

from ngafid_cpat_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out
    assert "dedup_minhash_lsh\trows-only" in out


def test_cli_analyze_no_write(spark, telemetry, dims, tmp_path, capsys):
    airports, runways = dims
    tpath = str(tmp_path / "telemetry")
    apath = str(tmp_path / "airports")
    rpath = str(tmp_path / "runways")
    telemetry.write.parquet(tpath)
    airports.write.parquet(apath)
    runways.write.parquet(rpath)
    rc = main(
        ["analyze", "--telemetry", tpath, "--airports", apath,
         "--runways", rpath, "--no-write"]
    )
    assert rc == 0
    assert "approach" in capsys.readouterr().out


def test_cli_analyze_writes_and_filters(spark, telemetry, dims, tmp_path):
    airports, runways = dims
    tpath = str(tmp_path / "telemetry")
    apath = str(tmp_path / "airports")
    rpath = str(tmp_path / "runways")
    out = str(tmp_path / "out")
    telemetry.write.parquet(tpath)
    airports.write.parquet(apath)
    runways.write.parquet(rpath)
    first = telemetry.select("flight").first()["flight"]
    rc = main(
        ["analyze", str(first), "--telemetry", tpath, "--airports", apath,
         "--runways", rpath, "--output", out]
    )
    assert rc == 0
    back = spark.read.parquet(out)
    flights = {r["flight_id"] for r in back.select("flight_id").distinct().collect()}
    assert flights <= {first}


def test_cli_query_unknown_errors(capsys):
    assert main(["query", "nope"]) == 2
