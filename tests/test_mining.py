"""Mining/robust-stats plans: oracle match + semantic invariants."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import mining
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(mining.QUERIES))
def test_oracle_match(spark, duck, name):
    assert name in mining.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(spark, duck, mining.QUERIES[name], mining.ORACLES[name])


def test_pmi_math_spotcheck(spark):
    """Recompute PMI for every returned pair from its own counts."""
    import math

    rows = mining.basket_pmi(spark, SF_DIR).collect()
    assert rows
    # n_baskets: recover from any row via pmi inversion is circular —
    # recompute independently instead.
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    n_baskets = li.select("l_orderkey").distinct().count()
    for r in rows:
        assert r.n_ab >= mining.PMI_MIN_SUPPORT
        assert r.n_ab <= min(r.n_a, r.n_b)
        expect = math.log(r.n_ab * n_baskets / (r.n_a * r.n_b))
        assert abs(r.pmi - expect) < 1e-3, r


def test_winsorize_bounds_and_counts(spark):
    for r in mining.winsorize_values(spark, SF_DIR).collect():
        assert r.lo <= r.hi
        # ~1% clipped on each side, and the clipped mean is pulled
        # toward the interior relative to raw when highs are clipped
        assert 0 <= r.n_clipped_low <= r.n * 0.02 + 1
        assert 0 <= r.n_clipped_high <= r.n * 0.02 + 1
        assert r.n_clipped_low + r.n_clipped_high > 0


def test_group_capped_sample_caps_and_determinism(spark):
    a = mining.group_capped_sample(spark, SF_DIR).collect()
    b = mining.group_capped_sample(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_lang = Counter(r.lang for r in a)
    for lang, n in per_lang.items():
        assert n <= mining.SAMPLE_PER_GROUP, (lang, n)
    assert len(set((r.lang, r.rn) for r in a)) == len(a)  # rn unique per lang


def test_basket_rules_directional_consistency(spark):
    """Every rule's mirror shares n_ab; confidence uses the antecedent."""
    rows = mining.basket_rules(spark, SF_DIR).collect()
    assert rows
    by_pair = {(r.antecedent, r.consequent): r for r in rows}
    for r in rows:
        assert r.n_ab >= mining.RULE_MIN_SUPPORT
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert 0 < r.confidence <= 1.0
        assert r.lift > 0
        assert abs(r.confidence - round(r.n_ab / r.n_a, 6)) < 2e-6, r
        mirror = by_pair.get((r.consequent, r.antecedent))
        if mirror is not None:  # both directions survived the top-k cut
            assert mirror.n_ab == r.n_ab
            assert (mirror.n_a, mirror.n_b) == (r.n_b, r.n_a)
