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

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


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
    _LIVE.append(out)
    return out


def release() -> int:
    """Unpersist every registered frame; returns how many were
    released. Safe to call with a stopped/replaced session (errors
    per-frame are swallowed — the JVM-side block manager drops blocks
    with the session anyway)."""
    n = 0
    for df in _LIVE:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _LIVE.clear()
    return n
