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
