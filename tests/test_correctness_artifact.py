"""The committed full-surface correctness artifact must cover the
entire query registry — the "180 green" claim is a checked-in,
re-runnable fact (tools/driver_sim.py --json), not a private run."""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_artifact() -> str | None:
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_LOCAL_r*.json")))
    return paths[-1] if paths else None


def test_artifact_covers_full_registry():
    path = _latest_artifact()
    if path is None:
        pytest.skip("no CORRECTNESS_LOCAL artifact committed yet this round")
    import __spark_entry__ as entry_mod

    with open(path) as f:
        art = json.load(f)
    registry = set(entry_mod.queries())
    covered = set(art["queries"])
    assert covered == registry, (
        f"artifact/registry drift: missing={sorted(registry - covered)} "
        f"stale={sorted(covered - registry)}"
    )
    assert art["result"] == "ALL-MATCH"
    assert art["n_fail"] == 0
    oracled = set(entry_mod.oracle_sql())
    for name, r in art["queries"].items():
        want = "ok" if name in oracled else "rows_only"
        assert r["status"] == want, (name, r)
