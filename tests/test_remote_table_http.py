"""Remote-table lookups against a REAL localhost HTTP service.

RemoteTableJoinExample.java:110-168 does a live HTTP GET through a
rate-limited caching table; the unit tests elsewhere inject the read
function. Here a stdlib ``http.server`` serves keyed JSON so the
cache, the token-bucket limiter, and the executor-side mapInPandas
path all cross an actual socket — no new dependencies.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from samza_hello_samza_spark.sources.remote_table import (
    CachedLookupTable,
    broadcast_lookup_join,
    lookup_map_in_pandas,
)


class _KeyedHandler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib naming)
        q = parse_qs(urlparse(self.path).query)
        key = q.get("key", [""])[0]
        with self.server.lock:
            self.server.n_requests += 1
            self.server.keys_seen.append(key)
        body = json.dumps({"key": key, "value": f"profile-{key}"}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def http_table_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _KeyedHandler)
    srv.lock = threading.Lock()
    srv.n_requests = 0
    srv.keys_seen = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _http_read_fn(port: int):
    def read(key):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/lookup?key={key}", timeout=10
        ) as resp:
            return json.loads(resp.read())["value"]

    return read


def test_broadcast_lookup_join_over_real_socket(spark, http_table_server):
    """Driver-side resolve: one HTTP GET per DISTINCT key (the cache
    absorbs repeats), then a broadcast join enriches every row."""
    port = http_table_server.server_address[1]
    table = CachedLookupTable(_http_read_fn(port), ttl_seconds=300)
    stream = spark.createDataFrame(
        [(i, f"u{i % 5}") for i in range(40)], "event_id long, user_id string"
    )
    out = broadcast_lookup_join(stream, table, "user_id", value_col="profile")
    rows = out.collect()
    assert len(rows) == 40
    assert all(r.profile == f"profile-{r.user_id}" for r in rows)
    assert http_table_server.n_requests == 5  # distinct keys only
    assert table.misses == 5 and table.hits == 0  # resolve saw each key once


def test_ttl_cache_hits_and_expiry_over_real_socket(http_table_server):
    port = http_table_server.server_address[1]
    table = CachedLookupTable(_http_read_fn(port), ttl_seconds=0.3)
    assert table.get("a") == "profile-a"
    assert table.get("a") == "profile-a"  # within TTL → cache hit
    assert http_table_server.n_requests == 1
    assert (table.hits, table.misses) == (1, 1)
    time.sleep(0.4)
    assert table.get("a") == "profile-a"  # expired → re-fetch
    assert http_table_server.n_requests == 2
    assert (table.hits, table.misses) == (1, 2)


def test_rate_limiter_paces_real_requests(http_table_server):
    """withReadRateLimit analog: N cold keys at R permits/sec must take
    at least (N-1)/R wall-clock seconds."""
    port = http_table_server.server_address[1]
    rate = 20.0
    table = CachedLookupTable(
        _http_read_fn(port), ttl_seconds=300, rate_limit_per_sec=rate
    )
    n = 9
    t0 = time.monotonic()
    for i in range(n):
        table.get(f"k{i}")
    elapsed = time.monotonic() - t0
    assert http_table_server.n_requests == n
    assert elapsed >= (n - 1) / rate * 0.9  # pacing held (10% sched slack)
    # cached re-reads are NOT paced
    t1 = time.monotonic()
    for i in range(n):
        table.get(f"k{i}")
    assert time.monotonic() - t1 < (n - 1) / rate / 2
    assert http_table_server.n_requests == n


def test_lookup_map_in_pandas_over_real_socket(spark, http_table_server):
    """Executor-side path: Python workers make the HTTP calls, each
    with its own TTL/LRU cache — total requests land between the
    distinct-key count (perfect sharing) and partitions × keys (no
    cross-worker sharing), strictly below row count (caching works)."""
    port = http_table_server.server_address[1]
    n_rows, n_keys, n_parts = 120, 4, 3
    stream = spark.createDataFrame(
        [(i, f"u{i % n_keys}") for i in range(n_rows)],
        "event_id long, user_id string",
    ).repartition(n_parts)
    out = lookup_map_in_pandas(
        stream,
        _http_read_fn(port),
        "user_id",
        value_col="profile",
        cache_name=f"http-{port}",  # unique per test run/server
    )
    rows = out.collect()
    assert len(rows) == n_rows
    assert all(r.profile == f"profile-{r.user_id}" for r in rows)
    assert n_keys <= http_table_server.n_requests <= n_parts * n_keys
    assert http_table_server.n_requests < n_rows
