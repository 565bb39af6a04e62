"""OLAP plans hash-match their DuckDB oracles at sf0.001."""

from __future__ import annotations

import pytest

from samza_hello_samza_spark.plans import olap
from tests.conftest import SF_DIR, assert_matches_oracle

#: rows-only by design (sketch-based; no exact SQL equivalent).
NO_ORACLE = {"event_value_percentiles_approx"}


@pytest.mark.parametrize("name", sorted(set(olap.QUERIES) - NO_ORACLE))
def test_oracle_match(spark, duck, name):
    assert name in olap.ORACLES, f"{name} missing oracle"
    assert_matches_oracle(spark, duck, olap.QUERIES[name], olap.ORACLES[name])


def test_percentile_approx_within_rank_window(spark):
    """percentile_approx guarantees *rank* accuracy, so each approx
    value must fall between the exact percentiles ±2 rank points
    (value-relative bounds are meaningless on discrete small samples)."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.session import load_table

    ev = load_table(spark, SF_DIR, "events")
    bounds = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            *[
                F.percentile("value", max(0.0, p - 0.02)).alias(f"lo{int(p * 100)}")
                for p in olap.PCTS
            ],
            *[
                F.percentile("value", min(1.0, p + 0.02)).alias(f"hi{int(p * 100)}")
                for p in olap.PCTS
            ],
        )
        .collect()
    }
    approx = {
        r.event_type: r
        for r in olap.event_value_percentiles_approx(spark, SF_DIR).collect()
    }
    assert set(bounds) == set(approx)
    for et, a in approx.items():
        b = bounds[et]
        for p in olap.PCTS:
            n = int(p * 100)
            got = getattr(a, f"p{n}")
            lo, hi = getattr(b, f"lo{n}"), getattr(b, f"hi{n}")
            assert lo <= got <= hi, (et, p, lo, got, hi)


def test_skyline_is_exact_pareto_frontier(spark):
    """Frontier vs brute-force O(n^2) domination check at sf0.001: every
    returned point is non-dominated, every non-dominated point is
    returned."""
    from pyspark.sql import functions as F

    from samza_hello_samza_spark.plans.olap import parts_skyline
    from samza_hello_samza_spark.session import load_table

    part = load_table(spark, SF_DIR, "part")
    pts = {
        (float(r.price), int(r.size))
        for r in part.groupBy(
            F.round("p_retailprice", 2).alias("price"), F.col("p_size").alias("size")
        ).count().collect()
    }

    def dominated(p):
        return any(
            q != p and q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )

    want = {p for p in pts if not dominated(p)}
    got = {(float(r.price), int(r.size)) for r in parts_skyline(spark, SF_DIR).collect()}
    assert got == want
