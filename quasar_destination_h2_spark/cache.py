"""Central registry for operator-level persisted intermediates.

Several operators persist a mid-pipeline frame (the tf-idf tf frame,
the key-skew count frame, the LM doc-term frames) so that a frame
feeding two downstream consumers materializes its corpus pass ONCE
instead of recomputing per consumer. The operator cannot unpersist
inside its own body — the returned, still-lazy plan reads the cache —
so in a long-lived session (oracle sweeps, bench loops, plan audits)
those MEMORY_AND_DISK partitions would otherwise accumulate without
bound.

Policy: every operator-level ``persist`` goes through
:func:`persisted`, which registers the frame here; harnesses call
:func:`release` between queries (tools/oracle_check.py, bench.py,
tools/plan_audit.py do). A single query's lifetime is unaffected —
release only runs between queries, after the consumer materialized.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_LOCK = threading.Lock()


def persisted(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` at ``level`` and register it for release().

    MEMORY_AND_DISK is the default deliberately: under memory
    pressure the cached partitions spill to local disk instead of
    being dropped-and-recomputed, so the "persist carries the only
    corpus pass" invariant the operators document survives a small
    executor heap.
    """
    out = df.persist(level)
    with _LOCK:
        _LIVE.append(out)
    return out


def release() -> int:
    """Unpersist every registered frame; returns how many were
    released.

    Contract: call BETWEEN queries only, never while a plan that
    reads a registered cache is still executing — the registry is
    process-global, so a release() racing another thread's in-flight
    query would drop that query's cached blocks mid-plan (Spark
    recomputes them from lineage: correct, but the single-pass
    economics are lost). The registry itself is lock-guarded so
    concurrent persisted()/release() calls cannot corrupt it; the
    between-queries discipline is the caller's (tools/oracle_check,
    bench.py, tools/plan_audit all run queries sequentially).

    Safe to call with a stopped/replaced session (errors per-frame
    are swallowed — the JVM-side block manager drops blocks with the
    session anyway)."""
    with _LOCK:
        live, _LIVE[:] = _LIVE[:], []
    n = 0
    for df in live:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
