"""Analytics plans hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import analytics
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics.QUERIES))
def test_oracle_match(spark, duck, name):
    assert name in analytics.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(
        spark, duck, analytics.QUERIES[name], analytics.ORACLES[name]
    )
