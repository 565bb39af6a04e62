"""Size-gated join-strategy hints.

A raw ``F.broadcast(dim)`` *overrides* Spark's size threshold: the
planner will ship the frame to every executor no matter how big it
is. That is right for genuinely bounded relations (``nation`` is 25
rows at any scale factor, a scalar-subquery aggregate is 1 row) and
wrong for TPC-H-style dims that grow with the corpus — ``customer``
at the 100 TB target is ~1.5 TB, and a forced hint would OOM every
executor on the cluster.

``maybe_broadcast`` consults Catalyst's own statistics for the
frame's optimized logical plan (file-size based for parquet scans,
propagated estimates for derived plans) and only attaches the hint
when the estimate fits the budget. Otherwise the frame is returned
unhinted and the join strategy is left to the planner + AQE, which
re-checks sizes at runtime from actual shuffle statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default byte budget for an *explicit* broadcast hint. Deliberately
#: larger than the 64 MB ``spark.sql.autoBroadcastJoinThreshold`` the
#: session sets: a hinted dim is one we know is reused across many
#: stages, so paying a bigger one-time ship is worth it — but it must
#: still fit comfortably in a single executor's memory alongside the
#: task working set. 256 MB is ~4 GB-executor-safe.
DEFAULT_BROADCAST_BUDGET = 256 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df``'s optimized logical plan.

    Returns ``None`` when no meaningful estimate exists (statistics
    missing, or the conservative Long.MaxValue default), in which case
    callers must NOT broadcast — an unknown size is treated as big.
    """
    try:
        # py4j converts scala.math.BigInt to a plain Python int.
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # py4j/analysis failure → unknown → big
        return None
    # Catalyst uses Long.MaxValue-ish sentinels for "no idea".
    if size < 0 or size >= (1 << 62):
        return None
    return size


def maybe_broadcast(df: DataFrame, max_bytes: int = DEFAULT_BROADCAST_BUDGET) -> DataFrame:
    """Attach a broadcast hint only if the frame's estimated size fits.

    Unlike ``F.broadcast``, declining is safe at any scale: the join
    falls back to the planner's own choice (sort-merge or shuffled
    hash), and AQE's dynamic join-strategy switch can still demote it
    to a broadcast join at runtime if the *actual* size turns out
    small. Column attributes are preserved either way, so
    ``dim.col`` references written against the input keep resolving.
    """
    size = plan_size_bytes(df)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df


def maybe_broadcast_counted(
    df: DataFrame,
    max_bytes: int = DEFAULT_BROADCAST_BUDGET,
    probe_rows: int = 1_000_000,
    est_row_bytes: int = 256,
) -> DataFrame:
    """Cost-based escalation of ``maybe_broadcast``: when Catalyst has
    NO usable estimate (aggregates and joins propagate Long.MaxValue-ish
    sentinels), measure instead of guessing.

    The probe is ``df.limit(probe_rows + 1).count()`` — a bounded job
    that early-terminates the scan after ``probe_rows + 1`` rows, so
    an over-budget frame costs one short partial scan, never a full
    materialization. If the observed count stays under the row budget
    implied by ``max_bytes / est_row_bytes``, the frame is provably
    small RIGHT NOW (runtime truth, the same signal AQE uses from
    shuffle stats) and gets the hint; otherwise strategy is left to
    the planner + AQE.

    Use on derived frames that are *usually* dimension-sized but whose
    bound isn't structural — e.g. a filtered dim, a distinct-key set.
    Structurally bounded frames (1-row aggregates, nation) should keep
    using ``maybe_broadcast``/``F.broadcast`` — no probe job needed.
    """
    size = plan_size_bytes(df)
    if size is not None:
        return F.broadcast(df) if size <= max_bytes else df
    row_budget = min(probe_rows, max(1, max_bytes // est_row_bytes))
    observed = df.limit(row_budget + 1).count()
    if observed <= row_budget:
        return F.broadcast(df)
    return df


def maybe_broadcast_runtime(
    df: DataFrame,
    max_bytes: int = DEFAULT_BROADCAST_BUDGET,
    keep_if_big: bool = False,
) -> DataFrame:
    """Decide from the OBSERVED size, not Catalyst's estimate.

    ``maybe_broadcast_counted``'s limit-probe is still a pre-execution
    guess (rows × assumed row width); this is the runtime path: the
    frame is persisted and materialized once, and the decision reads
    the actual cached-batch byte size through the plan's
    ``InMemoryRelation`` statistics — the same runtime-truth signal
    class AQE reads from shuffle stage stats, surfaced through
    QueryExecution instead of a guess. Catalyst being wrong in EITHER
    direction is corrected: an over-estimated tiny frame (filtered
    dim the optimizer assumes unselective) still gets its broadcast,
    and an under-estimated blowup (generator/explode output estimated
    at input size) is NOT shipped to every executor.

    Storage contract: on the BROADCAST path the frame stays cached —
    the pin is bounded by ``max_bytes`` and the hint's build side
    reads the materialized batches. On the too-big / stats-unavailable
    path the cache is RELEASED by default (``keep_if_big=False``):
    the measurement already happened and holding an arbitrarily large
    frame in executor storage for the session lifetime would leak.
    Pass ``keep_if_big=True`` only when the caller reuses the frame
    across further actions and owns the eventual ``unpersist()``. The
    stats must be read through a FRESH QueryExecution
    (``select("*")``) — a DataFrame whose plan was analyzed before
    ``persist`` keeps its pre-cache estimate.
    """
    from pyspark.storagelevel import StorageLevel

    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()  # materialize → InMemoryRelation carries actual bytes
    fresh = cached.select("*")
    size = plan_size_bytes(fresh)
    if size is not None and size <= max_bytes:
        return F.broadcast(fresh)
    if not keep_if_big:
        cached.unpersist()
    return fresh
