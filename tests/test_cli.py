"""End-to-end CLI surface test: every verb's happy path through main(argv)
— the deployment interface (SURVEY §3.2 / emopcmd.py analog) pinned as one
lifecycle: synth → enqueue → run → query → rollup → increment → export
(multi-run) → vacuum → compact."""

from __future__ import annotations

import json

from engine.cli import main


def _run(capsys, *argv) -> dict | list:
    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_full_lifecycle(spark, tmp_path, capsys, monkeypatch):
    # main() ends with spark.stop(); its getOrCreate returns the SHARED
    # test session, so stopping it would kill every later test file
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    c1 = str(tmp_path / "c1.parquet")
    c2 = str(tmp_path / "c2.parquet")
    root = str(tmp_path / "runs")

    r = _run(capsys, "synth", "--out", c1, "--docs", "120", "--partitions", "2")
    assert r["docs"] == 120
    r = _run(capsys, "synth", "--out", c2, "--docs", "180", "--partitions", "2")
    assert r["docs"] == 180

    r = _run(capsys, "enqueue", "--pages", c1, "--runs-root", root,
             "--run-id", "d1")
    assert r["run_id"] == "d1" and r["n_partitions"] >= 8

    r = _run(capsys, "run", "--pages", c1, "--runs-root", root,
             "--run-id", "d1")
    assert r["complete"] and r["docs_processed"] > 0

    r = _run(capsys, "query", "--runs-root", root, "--run-id", "d1")
    assert r["complete"] and r["pending"] == 0

    rows = _run(capsys, "rollup", "--runs-root", root, "--run-id", "d1")
    assert isinstance(rows, list) and len(rows) >= 3

    r = _run(capsys, "increment", "--pages", c2, "--runs-root", root,
             "--base-run-ids", "d1", "--run-id", "d2")
    assert r["complete"] and r["docs_processed"] == 60

    # re-increment with the same run_id: resume path, clean no-op
    r = _run(capsys, "increment", "--pages", c2, "--runs-root", root,
             "--base-run-ids", "d1", "--run-id", "d2")
    assert r["docs_processed"] == 0 and r["complete"]

    dest = str(tmp_path / "table")
    r = _run(capsys, "export", "--runs-root", root, "--run-id", "d1,d2",
             "--dest", dest)
    assert r["run_id"] == "d1,d2" and r["rows"] == 180

    r = _run(capsys, "vacuum", "--runs-root", root, "--run-id", "d2")
    assert "increment_input" in r["removed"]

    r = _run(capsys, "compact", "--runs-root", root, "--run-id", "d1",
             "--target-file-mb", "1")
    assert r["files_after"] <= r["files_before"]

    # WARC ingest path: the same corpus arriving as Common-Crawl segment
    # files runs the identical lifecycle via --pages-format warc
    from engine.sources import export_pages_warc, read_pages_parquet

    wdir = str(tmp_path / "c1_warc")
    export_pages_warc(read_pages_parquet(spark, c1), wdir)
    r = _run(capsys, "enqueue", "--pages", wdir, "--pages-format", "warc",
             "--runs-root", root, "--run-id", "w1")
    assert r["run_id"] == "w1"
    r = _run(capsys, "run", "--pages", wdir, "--pages-format", "warc",
             "--runs-root", root, "--run-id", "w1")
    assert r["complete"] and r["docs_processed"] > 0


def test_cli_degenerate_list_args_fail_fast(tmp_path):
    """ADVICE round-3: comma/whitespace-only list args must die with a
    usage error BEFORE a Spark session starts — an empty --base-run-ids
    would re-extract every base url; an empty export --run-id used to
    IndexError on ms[0]."""
    import pytest

    from engine.cli import main

    with pytest.raises(SystemExit):
        main([
            "increment", "--pages", "x", "--runs-root", str(tmp_path),
            "--base-run-ids", " , ",
        ])
    with pytest.raises(SystemExit):
        main([
            "export", "--runs-root", str(tmp_path), "--run-id", " ,, ",
            "--dest", str(tmp_path / "out"),
        ])


def test_cli_stats_verb(spark, tmp_path, capsys, monkeypatch):
    """stats = the one-scan data-quality profile of a run's extracted
    table: counts reconcile with the run result, quality quantiles land
    in [0, 1]."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    c = str(tmp_path / "c.parquet")
    root = str(tmp_path / "runs")
    _run(capsys, "synth", "--out", c, "--docs", "120", "--partitions", "2")
    _run(capsys, "enqueue", "--pages", c, "--runs-root", root, "--run-id", "s1")
    r = _run(capsys, "run", "--pages", c, "--runs-root", root, "--run-id", "s1")
    st = _run(capsys, "stats", "--runs-root", root, "--run-id", "s1")
    assert st["run_id"] == "s1"
    assert st["rows"] == r["docs_processed"]
    assert st["ok"] + st["failed"] == st["rows"]
    assert st["text_bytes"] > 0 and st["n_versions"] == 1
    assert 0.0 <= st["quality_p50"] <= st["quality_p90"] <= 1.0
    # approx distinct within its documented error of the true url count
    assert abs(st["approx_urls"] - st["rows"]) <= 0.1 * st["rows"]
