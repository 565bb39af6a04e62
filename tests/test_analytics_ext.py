"""Extended analytics plans (Q7-Q21 shapes) match their DuckDB oracles."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import analytics_ext
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics_ext.QUERIES))
def test_oracle_match(spark, duck, name):
    assert name in analytics_ext.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(
        spark, duck, analytics_ext.QUERIES[name], analytics_ext.ORACLES[name]
    )


def test_every_query_has_oracle_or_is_documented():
    assert set(analytics_ext.ORACLES) == set(analytics_ext.QUERIES)
