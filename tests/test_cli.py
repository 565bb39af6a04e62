"""CLI entry point: list/run/unknown-key behavior (argparse-level;
execution is smoke-tested via the shared session fixture)."""

from __future__ import annotations

import io
from contextlib import redirect_stderr, redirect_stdout

from samza_hello_samza_spark.__main__ import main
from samza_hello_samza_spark.registry import all_queries


def test_cli_list_matches_registry():
    out = io.StringIO()
    with redirect_stdout(out):
        assert main(["list"]) == 0
    assert set(out.getvalue().split()) == set(all_queries())


def test_cli_list_glob():
    out = io.StringIO()
    with redirect_stdout(out):
        main(["list", "dedup_*"])
    keys = out.getvalue().split()
    assert keys and all(k.startswith("dedup_") for k in keys)


def test_cli_unknown_key_suggests():
    err = io.StringIO()
    with redirect_stderr(err):
        rc = main(["run", "dedup"])
    assert rc == 2 and "did you mean" in err.getvalue()


def test_cli_run_and_explain(spark, tmp_path):
    from tests.conftest import SF_DIR

    out_dir = str(tmp_path / "out")
    rc = main(["run", "groupby_count", "--sf-dir", SF_DIR, "--out", out_dir])
    assert rc == 0
    got = {r.event_type: r.views for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 5
    text = io.StringIO()
    with redirect_stdout(text):
        assert main(["run", "groupby_count", "--sf-dir", SF_DIR, "--explain"]) == 0
