"""CLI surface tests (reference main.py argparse parity)."""

import pytest

from ngafid_cpat_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out
    # r04: minhash/simhash became oracle-paired (md5 hash families);
    # only the sketch queries remain rows-only at the driver gate
    assert "dedup_minhash_lsh\toracle" in out
    # r13: approx_distinct_parts upgraded to the portable-HLL strict
    # oracle; r14: the sampled rank-exact quantile upgrade closed the
    # catalog's last rows-only row — every registered query now
    # carries a strict oracle
    assert "approx_distinct_parts\toracle" in out
    assert "approx_quantile_events\toracle" in out
    assert "rows-only" not in out


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


def test_cli_analyze_work_queue_mode(spark, telemetry, dims, tmp_path, capsys):
    """Entry point 1: pending scan -> analyze -> manifest commit; the
    second invocation finds an empty queue."""
    from ngafid_cpat_spark import sinks

    airports, runways = dims
    tpath = str(tmp_path / "telemetry")
    apath = str(tmp_path / "airports")
    rpath = str(tmp_path / "runways")
    out = str(tmp_path / "approaches")
    status = str(tmp_path / "flight_analyses")
    telemetry.write.parquet(tpath)
    airports.write.parquet(apath)
    runways.write.parquet(rpath)
    flights = [r["flight"] for r in telemetry.select("flight").distinct().collect()]
    # flight 99 is pending but has NO telemetry in this run's input —
    # it must stay queued, not be marked analyzed
    sinks.create_table(
        spark.createDataFrame(
            [{"flight_id": f, "approach_analysis": 0} for f in [*flights, 99]]
        ),
        status, keys=["flight_id"], n_buckets=4,
    )
    rc = main(
        ["analyze", "--telemetry", tpath, "--airports", apath, "--runways", rpath,
         "--output", out, "--status", status]
    )
    assert rc == 0
    assert "committed" in capsys.readouterr().out
    # every flight flipped to analyzed; results landed in the table
    st = {r["flight_id"]: r["approach_analysis"]
          for r in sinks.read_table(spark, status).collect()}
    assert st[99] == 0              # absent from telemetry -> still queued
    assert all(v == 1 for f, v in st.items() if f != 99)
    assert sinks.read_table(spark, out).count() > 0
    # re-run: only the telemetry-less flight remains; its (empty)
    # batch commits and nothing changes for the others
    rc = main(
        ["analyze", "--telemetry", tpath, "--airports", apath, "--runways", rpath,
         "--output", out, "--status", status]
    )
    assert rc == 0


def test_cli_index_lifecycle(spark, tmp_path, capsys):
    """build -> probe -> delete -> probe through the CLI surface."""
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "idx")
    assert main([
        "index", "build", "--embeddings", emb_path, "--path", idx,
        "--k-coarse", "4", "--m", "4", "--k-sub", "4", "--n-iter", "1",
    ]) == 0
    assert "built index" in capsys.readouterr().out
    assert main([
        "index", "probe", "--path", idx, "--embeddings", emb_path,
        "--query-id", "0", "--k", "5", "--n-probe", "2", "--rerank", "20",
    ]) == 0
    out = capsys.readouterr().out
    assert "cosine" in out and "vec_id" in out
    dest = str(tmp_path / "idx2")
    assert main([
        "index", "delete", "--base", idx, "--dest", dest, "--ids", "1", "2",
    ]) == 0
    assert "deleted 2 ids" in capsys.readouterr().out
    assert main([
        "index", "probe", "--path", dest, "--embeddings", emb_path,
        "--query-id", "0", "--k", "5", "--n-probe", "2", "--rerank", "20",
    ]) == 0
    # a missing query id errors cleanly
    assert main([
        "index", "probe", "--path", dest, "--embeddings", emb_path,
        "--query-id", "99999999",
    ]) == 2


def test_cli_index_generational_root_flip(spark, tmp_path, capsys):
    """`index compact/delete --root`: dest defaults to the next
    gen-<n> dir under the root and the current-generation pointer is
    flipped atomically after the write; `index current` resolves it."""
    import os

    from ngafid_cpat_spark.operators import similarity as S

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    root = str(tmp_path / "root")
    assert main([
        "index", "build", "--embeddings", emb_path, "--root", root,
        "--k-coarse", "4", "--m", "4", "--k-sub", "4", "--n-iter", "1",
    ]) == 0
    out = capsys.readouterr().out
    assert "root pointer set" in out
    assert S.resolve_index_dir(root).endswith("gen-000001")

    # compact an EMPTY stream (degenerates to copying the base) with
    # auto-dest under the root; the pointer must flip to gen-000002
    empty_stream = str(tmp_path / "empty_stream")
    os.makedirs(empty_stream)
    assert main([
        "index", "compact", "--root", root, "--stream", empty_stream,
    ]) == 0
    out = capsys.readouterr().out
    assert "pointer flipped" in out
    assert S.resolve_index_dir(root).endswith("gen-000002")
    assert main(["index", "current", "--root", root]) == 0
    assert capsys.readouterr().out.strip().endswith("gen-000002")

    # delete with --root: auto-dest gen-000003, pointer flips, and a
    # probe through the ROOT no longer returns the deleted id
    assert main([
        "index", "delete", "--root", root, "--ids", "0",
    ]) == 0
    assert "pointer flipped" in capsys.readouterr().out
    assert S.resolve_index_dir(root).endswith("gen-000003")
    assert main([
        "index", "probe", "--path", root, "--embeddings", emb_path,
        "--query-id", "1", "--k", "5", "--n-probe", "4", "--rerank", "20",
    ]) == 0
    out = capsys.readouterr().out
    assert "cosine" in out
    # vec_id 0 was retracted; it may not appear as a neighbor
    import re

    ids = {int(m) for m in re.findall(r"^\|(\d+)\s*\|", out, re.M)}
    assert 0 not in ids
