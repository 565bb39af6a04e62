"""Samza SQL surface (spark.sql) hash-matches DuckDB oracles."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import samza_sql
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(samza_sql.QUERIES))
def test_oracle_match(spark, duck, name):
    assert_matches_oracle(
        spark, duck, samza_sql.QUERIES[name], samza_sql.ORACLES[name]
    )
