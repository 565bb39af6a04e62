"""Remote-table lookups with caching and rate limiting.

Reference: RemoteTableJoinExample.java:86-120 — a Samza RemoteTable
wraps an async HTTP read function with a rate limiter and a caching
layer, then stream messages join against it by key.

Spark-first translation: per-row RPCs from executors are wrong at
scale, so the lookup happens in two legal shapes:

1. ``resolve_keys`` — the driver (or a scheduled job) resolves the
   distinct key set through the cached/rate-limited read function,
   producing a small DataFrame that is then ``broadcast()`` joined.
   This is the 100 TB pattern: distinct keys ≪ rows.
2. ``lookup_udf`` — a mapInPandas fallback for genuinely unbounded
   key spaces; each Python worker keeps its own LRU cache so repeated
   keys in a partition hit cache, and the rate limiter bounds
   per-worker call rate.

The HTTP fetch itself is injectable (no network in this container;
tests inject a deterministic function).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RateLimiter:
    """Token-bucket limiter (reference: .withReadRateLimit(10))."""

    def __init__(self, permits_per_second: float):
        self.permits_per_second = permits_per_second
        self._next_free = 0.0

    def acquire(self) -> float:
        """Block until a permit is available; returns wait seconds."""
        now = time.monotonic()
        wait = max(0.0, self._next_free - now)
        if wait:
            time.sleep(wait)
        self._next_free = max(now, self._next_free) + 1.0 / self.permits_per_second
        return wait


class CachedLookupTable:
    """TTL+LRU cache over a keyed read function.

    Mirrors CachingTableDescriptor.withReadTtl(5s) over a
    RemoteTableDescriptor read function.
    """

    def __init__(
        self,
        read_fn: Callable[[str], object],
        ttl_seconds: float = 300.0,
        max_entries: int = 100_000,
        rate_limit_per_sec: float | None = None,
    ):
        self.read_fn = read_fn
        self.ttl = ttl_seconds
        self.max_entries = max_entries
        self.limiter = RateLimiter(rate_limit_per_sec) if rate_limit_per_sec else None
        self._cache: OrderedDict[object, tuple[float, object]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: object) -> object:
        now = time.monotonic()
        entry = self._cache.get(key)
        if entry is not None and now - entry[0] <= self.ttl:
            self._cache.move_to_end(key)
            self.hits += 1
            return entry[1]
        self.misses += 1
        if self.limiter:
            self.limiter.acquire()
        value = self.read_fn(key)
        self._cache[key] = (now, value)
        self._cache.move_to_end(key)
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)
        return value

    def resolve_keys(
        self,
        spark: SparkSession,
        keys: Iterable[object],
        key_col: str = "key",
        value_col: str = "value",
    ) -> DataFrame:
        """Resolve a bounded key set into a broadcastable lookup frame."""
        rows = [(k, self.get(k)) for k in keys]
        return spark.createDataFrame(rows, [key_col, value_col])


#: Driver-side key-cardinality budget. 1M string keys ≈ tens of MB on
#: the driver and a few-hundred-MB broadcast — the documented ceiling
#: for the resolve-and-broadcast shape. Beyond it, the distinct key
#: set no longer fits the "keys ≪ rows" premise and callers must use
#: ``lookup_map_in_pandas`` (executor-side cached lookups) instead.
MAX_RESOLVED_KEYS = 1_000_000


def broadcast_lookup_join(
    stream: DataFrame,
    table: CachedLookupTable,
    key_col: str,
    value_col: str = "looked_up",
    max_keys: int = MAX_RESOLVED_KEYS,
) -> DataFrame:
    """Stream ⋈ remote table, resolved once and broadcast.

    The distinct key set is computed from the stream (one narrow
    aggregation), resolved through the cache/rate limiter on the
    driver, and broadcast — executors never make remote calls.

    Driver memory is bounded: the collect is capped at ``max_keys``
    distinct keys (enforced with ``limit(max_keys + 1)``, so the probe
    itself can't OOM either). Overflow raises with a pointer to the
    unbounded-cardinality path rather than silently degrading.
    """
    spark = stream.sparkSession
    rows = stream.select(key_col).distinct().limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        raise ValueError(
            f"distinct {key_col!r} cardinality exceeds max_keys={max_keys}; "
            "the resolve-and-broadcast shape assumes keys ≪ rows. Use "
            "lookup_map_in_pandas() for unbounded key spaces."
        )
    keys = [r[0] for r in rows]
    lookup = table.resolve_keys(spark, keys, key_col=key_col, value_col=value_col)
    return stream.join(F.broadcast(lookup), key_col, "left")


#: per-worker-process lookup caches, keyed by caller-supplied name.
#: Python workers are reused across tasks, so a named cache gives
#: repeated keys within (and across) partitions cache hits without
#: any shuffle — the executor-side analog of Samza's CachingTable.
_WORKER_TABLES: dict[str, CachedLookupTable] = {}


def lookup_map_in_pandas(
    stream: DataFrame,
    read_fn: Callable[[object], object],
    key_col: str,
    value_col: str = "looked_up",
    value_type: str = "string",
    cache_name: str = "default",
    ttl_seconds: float = 300.0,
    max_entries: int = 100_000,
    rate_limit_per_sec: float | None = None,
) -> DataFrame:
    """Remote-table join for *unbounded* key spaces: per-executor lookups.

    The scale shape the driver-side resolve can't cover: each Python
    worker keeps its own TTL/LRU ``CachedLookupTable`` (bounded at
    ``max_entries``), so memory is O(cache) per worker, not O(distinct
    keys) anywhere. ``read_fn`` must be picklable; the rate limiter
    bounds per-worker call rate (reference: .withReadRateLimit(10),
    RemoteTableJoinExample.java:86-120).

    Arrow-batched ``mapInPandas`` — no shuffle, no row-at-a-time UDF.
    """
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    out_schema = StructType(
        list(stream.schema.fields)
        + [StructField(value_col, _parse_datatype_string(value_type), True)]
    )

    def with_lookup(batches):
        table = _WORKER_TABLES.get(cache_name)
        if table is None:
            table = CachedLookupTable(
                read_fn,
                ttl_seconds=ttl_seconds,
                max_entries=max_entries,
                rate_limit_per_sec=rate_limit_per_sec,
            )
            _WORKER_TABLES[cache_name] = table
        for pdf in batches:
            pdf = pdf.copy()
            pdf[value_col] = [table.get(k) for k in pdf[key_col]]
            yield pdf

    return stream.mapInPandas(with_lookup, out_schema)
