"""Central query registry: merges every operator module's QUERIES/ORACLES.

``__spark_entry__.py`` re-exports these for the driver. Modules are
imported lazily-tolerantly so one broken optional module never takes
down the whole registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "samza_hello_samza_spark.operators.samza_surface",
    "samza_hello_samza_spark.plans.analytics",
    "samza_hello_samza_spark.plans.analytics_ext",
    "samza_hello_samza_spark.plans.samza_sql",
    "samza_hello_samza_spark.plans.olap",
    "samza_hello_samza_spark.plans.temporal",
    "samza_hello_samza_spark.plans.behavior",
    "samza_hello_samza_spark.plans.matview",
    "samza_hello_samza_spark.plans.stats",
    "samza_hello_samza_spark.plans.quality_checks",
    "samza_hello_samza_spark.plans.mining",
    "samza_hello_samza_spark.operators.dedup",
    "samza_hello_samza_spark.operators.similarity",
    "samza_hello_samza_spark.operators.text_analysis",
    "samza_hello_samza_spark.operators.retrieval",
    "samza_hello_samza_spark.operators.text_filters",
    "samza_hello_samza_spark.operators.sampling",
    "samza_hello_samza_spark.operators.sketches",
    "samza_hello_samza_spark.operators.graph",
    "samza_hello_samza_spark.operators.tokenizer",
    "samza_hello_samza_spark.operators.tokenizer_wp",
    "samza_hello_samza_spark.operators.lm",
    "samza_hello_samza_spark.operators.multimodal",
    "samza_hello_samza_spark.operators.asof",
    "samza_hello_samza_spark.operators.packing_io",
    "samza_hello_samza_spark.sources.zonemap",
    "samza_hello_samza_spark.sources.bloom_index",
    "samza_hello_samza_spark.sources.inverted",
    "samza_hello_samza_spark.sources.merge",
    "samza_hello_samza_spark.sources.jsonl_sink",
)

#: modules whose hard dependencies (numpy/pandas for vectorized paths)
#: may be absent on a minimal driver image; everything else must import.
_OPTIONAL_MODULES = frozenset(
    {
        "samza_hello_samza_spark.operators.similarity",
        "samza_hello_samza_spark.operators.multimodal",
        # module-level pandas import (merge UDF); optional like the others
        "samza_hello_samza_spark.sources.jsonl_sink",
        "samza_hello_samza_spark.operators.tokenizer",
        "samza_hello_samza_spark.operators.tokenizer_wp",
        "samza_hello_samza_spark.operators.lm",
    }
)


def _load() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib
    import warnings

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError as exc:
            # Only known-optional modules may shrink the surface, and
            # never silently: the driver's query count must not drop
            # without an explanation in stderr.
            if mod_name not in _OPTIONAL_MODULES:
                raise
            warnings.warn(
                f"optional module {mod_name} failed to import ({exc}); "
                "its queries are not registered",
                RuntimeWarning,
                stacklevel=2,
            )
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
