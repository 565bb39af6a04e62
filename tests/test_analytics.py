"""Analytics plans hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import analytics
from tests.conftest import SF_DIR, assert_matches_oracle

#: rows-only by design (sketch-based; no exact SQL equivalent).
NO_ORACLE = {"events_dau_approx"}


@pytest.mark.parametrize("name", sorted(set(analytics.QUERIES) - NO_ORACLE))
def test_oracle_match(spark, duck, name):
    assert name in analytics.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(
        spark, duck, analytics.QUERIES[name], analytics.ORACLES[name]
    )


def test_dau_approx_close_to_exact(spark):
    """HLL++ sketch stays within 5% of the exact distinct count."""
    exact = {r.day: r.dau for r in analytics.events_dau(spark, SF_DIR).collect()}
    approx = {
        r.day: r.dau for r in analytics.events_dau_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(1, 0.05 * n), (day, n, approx[day])
