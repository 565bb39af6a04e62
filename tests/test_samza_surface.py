"""Every samza-surface operator hash-matches its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.operators import samza_surface
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(samza_surface.QUERIES))
def test_oracle_match(spark, duck, name):
    assert name in samza_surface.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(
        spark, duck, samza_surface.QUERIES[name], samza_surface.ORACLES[name]
    )
