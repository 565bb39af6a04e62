"""Bench-coverage invariants (VERDICT r05 #3).

Every registered query key must carry timing evidence: either it is
benched (bench.HEADLINE / bench.EXTRA_VOLUME) with a frozen
first-bench baseline in BASELINE.md, or it is declared in
bench.UNBENCHED with the reason it is not volume-sensitive. A new
registry key therefore CANNOT land without either freezing numbers
or declaring itself — the r04→r05 unbenched-key recurrence is now a
test failure, not a verdict finding.
"""

from __future__ import annotations

import os

import bench
from samza_hello_samza_spark.registry import all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_is_fully_covered_by_bench_or_declaration():
    registry = set(all_queries())
    benched = set(bench.HEADLINE) | set(bench.EXTRA_VOLUME)
    declared = set(bench.UNBENCHED)

    undeclared = sorted(registry - benched - declared)
    assert not undeclared, (
        "registered keys with NO timing evidence and no UNBENCHED "
        f"declaration: {undeclared} — bench them (freeze first-run "
        "numbers in BASELINE.md) or declare why they aren't "
        "volume-sensitive"
    )

    # a key cannot be both benched and declared-unbenched
    both = sorted(benched & declared)
    assert not both, f"keys both benched and declared UNBENCHED: {both}"

    # declarations must not go stale: every declared key still exists
    ghost = sorted(declared - registry)
    assert not ghost, f"UNBENCHED declares unregistered keys: {ghost}"

    # every declaration carries a non-empty reason
    empty = sorted(k for k, v in bench.UNBENCHED.items() if not str(v).strip())
    assert not empty, f"UNBENCHED keys without a reason: {empty}"


def test_every_benched_key_has_a_frozen_baseline():
    """BASELINE.md must mention every benched key — first-bench
    numbers are frozen the same round the key enters a tier, so a
    late-wave key can't ship benchless again."""
    with open(os.path.join(_REPO, "BASELINE.md")) as fh:
        base = fh.read()
    benched = sorted(set(bench.HEADLINE) | set(bench.EXTRA_VOLUME))
    missing = [k for k in benched if k not in base]
    assert not missing, (
        f"benched keys without frozen BASELINE.md numbers: {missing}"
    )


def test_sf1_exclusions_all_have_inline_reasons():
    """Every SF1_EXCLUDE member must be a benched key (excluding an
    unbenched key is meaningless) — the reasons live inline in
    bench.py next to the set."""
    benched = set(bench.HEADLINE) | set(bench.EXTRA_VOLUME)
    dangling = sorted(set(bench.SF1_EXCLUDE) - benched)
    assert not dangling, f"SF1_EXCLUDE entries that aren't benched: {dangling}"


def test_every_benched_key_has_machine_readable_freeze():
    """r11 (VERDICT r10 #1): the 2x checker reads BASELINE.json's
    "freezes" table, not BASELINE.md prose — so the table must cover
    every benched key at every tier it is benched in, with positive
    values. A key missing here would make freeze_check() report it
    in missing_freeze; this test makes it unshippable instead."""
    import json

    with open(os.path.join(_REPO, "BASELINE.json")) as fh:
        freezes = json.load(fh).get("freezes", {})
    benched = sorted(set(bench.HEADLINE) | set(bench.EXTRA_VOLUME))

    no_sf01 = [k for k in benched if "sf0.1" not in freezes.get(k, {})]
    assert not no_sf01, f"benched keys without an sf0.1 freeze: {no_sf01}"

    no_sf1 = [
        k
        for k in benched
        if k not in bench.SF1_EXCLUDE and "sf1" not in freezes.get(k, {})
    ]
    assert not no_sf1, f"sf1-benched keys without an sf1 freeze: {no_sf1}"

    # excluded keys must NOT carry an sf1 freeze (stale row detector)
    stale = [
        k for k in benched
        if k in bench.SF1_EXCLUDE and "sf1" in freezes.get(k, {})
    ]
    assert not stale, f"SF1_EXCLUDE keys with a stale sf1 freeze: {stale}"

    ghost = sorted(set(freezes) - set(benched))
    assert not ghost, f"freezes for keys that aren't benched: {ghost}"

    bad = [
        (k, t, v)
        for k, row in freezes.items()
        for t, v in row.items()
        if t in ("sf0.1", "sf1") and not (isinstance(v, (int, float)) and v > 0)
    ]
    assert not bad, f"non-positive freeze values: {bad}"


def test_freeze_check_math_and_missing_detection():
    """freeze_check() flags >2x rows and NEVER silently drops an
    unmatched key (the exact r10 failure mode)."""
    freezes = {
        "a": {"sf0.1": 1.0, "sf1": 2.0},
        "b": {"sf0.1": 0.5},
    }
    out = bench.freeze_check(
        {"a": 2.5, "b": 0.4, "c": 9.9}, "sf0.1", freezes
    )
    assert out["rows"]["a"] == {
        "value": 2.5, "freeze": 1.0, "ratio": 2.5, "ratio_norm": 2.5
    }
    assert out["violations"] == ["a"]
    assert out["raw_violations"] == ["a"]
    assert out["worst"] == ["a", 2.5]
    assert out["missing_freeze"] == ["c"]
    # tier-aware: b has no sf1 freeze
    out1 = bench.freeze_check({"a": 2.0, "b": 1.0}, "sf1", freezes)
    assert out1["rows"]["a"]["ratio"] == 1.0
    assert out1["violations"] == []
    assert out1["missing_freeze"] == ["b"]
    assert out1["aggregate_ratio"] == 1.0
    # r12 probe normalization: a 2x-slow box halves the normalized
    # ratio (the 2x verdict), raw ratios are reported unchanged, and
    # a FAST box (scale < 1) never shrinks the bar below raw.
    out2 = bench.freeze_check(
        {"a": 2.5}, "sf0.1", freezes, probe_scale=2.0
    )
    assert out2["rows"]["a"]["ratio"] == 2.5
    assert out2["rows"]["a"]["ratio_norm"] == 1.25
    assert out2["violations"] == [] and out2["raw_violations"] == ["a"]
    out3 = bench.freeze_check(
        {"a": 2.5}, "sf0.1", freezes, probe_scale=0.5
    )
    assert out3["rows"]["a"]["ratio_norm"] == 2.5
    assert out3["violations"] == ["a"]
