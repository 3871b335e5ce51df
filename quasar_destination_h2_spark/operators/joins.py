"""[EXT] Custom join strategies Spark lacks as special forms.

* **as-of join** — for each left row, the most recent right row at or
  before its timestamp (per key). H2 1.4.200 has no ASOF form (SURVEY
  §2.2), but it is the canonical time-series enrichment op. Spark has
  no built-in either; the scalable composition is the union trick:
  tag both sides, sort-once per key, carry the last right payload
  forward with last(ignorenulls) — one shuffle on the key, no range
  explosion, state O(1) per row. (DuckDB grew a native ASOF JOIN —
  which is exactly what the oracle uses.)

* **salted join** — skew-buster for hot keys: the probe side gets a
  deterministic salt in [0, n); the build side is replicated n times;
  the join key becomes (key, salt), splitting each hot key's row set
  across n reducers. Result is IDENTICAL to the plain join (the
  conformance oracle *is* the plain join), only the partitioning
  changes. AQE's skew-join handles moderate skew automatically; salting
  is the explicit tool for pathological keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: attach to each left row the latest right row
    with right.on <= left.on, matching on `by` keys. Right side is
    deduplicated to one row per (by, on) first (latest wins)."""
    by = list(by)
    # one right row per (by, on): keep the last by natural column order
    wdup = Window.partitionBy(*by, on).orderBy(*[F.col(c) for c in right_cols])
    r = (
        right.withColumn("_rn", F.row_number().over(wdup))
        .withColumn("_maxrn", F.max("_rn").over(Window.partitionBy(*by, on)))
        .where(F.col("_rn") == F.col("_maxrn"))
        .drop("_rn", "_maxrn")
    )
    lt = left.withColumn("_side", F.lit(1))
    rt = r.select(
        *by, on, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_side", F.lit(0))
    combined = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (side=0) sort before left rows at equal ts, so a
    # right row at exactly left.ts is visible to it (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
    )
    keep = [c for c in left.columns] + [
        F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return filled.where(F.col("_side") == 1).select(*keep)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on `key`: probe rows get a deterministic
    salt (hash of the whole row modulo n), build rows are replicated
    across all salts, and the join runs on (key, salt). Equivalent to
    `left.join(right, key, how)` row-for-row — for probe-preserving
    join types only. `how` is restricted to inner / left / semi /
    anti: the build side is replicated ``n_salts`` times, so a
    right/full outer join would emit each unmatched build row once
    per salt instead of once. (Outer parity would need a post-join
    dedup of the replicated null-matched rows; use AQE skew-join for
    those shapes instead.)"""
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated build "
            "side would duplicate unmatched right rows; use "
            "inner/left/left_semi/left_anti"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lt = left.withColumn("_salt", salt)
    rt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lt.join(rt, [key, "_salt"], how).drop("_salt")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str],
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Point-in-interval range join via bucketization — the Spark
    composition for a join Spark has no special form for (H2 1.4.200
    has none either; SURVEY §2.2).

    A naive `ts BETWEEN start AND end` theta join plans as a nested
    loop — the O(n·m) scale-killer. Instead: each interval explodes
    to the epoch buckets it covers (intervals are short, so a handful
    of rows), each point maps to its single bucket, and the join runs
    as a plain HASH join on (by…, bucket) with the exact range
    predicate as a post-filter. Each (point, interval) pair meets in
    exactly one bucket — the point's — so no dedup is needed.
    `bucket_seconds` trades interval fan-out against bucket
    selectivity; set it near the median interval length."""
    by = list(by)
    p_bucket = F.expr(f"CAST({ts_col} AS LONG) DIV {bucket_seconds}")
    i_buckets = F.sequence(
        F.expr(f"CAST({start_col} AS LONG) DIV {bucket_seconds}"),
        F.expr(f"CAST({end_col} AS LONG) DIV {bucket_seconds}"),
    )
    pb = points.withColumn("_b", p_bucket)
    ib = intervals.withColumn("_b", F.explode(i_buckets))
    return (
        pb.join(ib, [*by, "_b"])
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of join: attach to each left row the EARLIEST right
    row with right.on >= left.on, matching on `by` keys — the
    "next event after" direction (lead-time analysis, next-purchase
    attribution), mirror of :func:`asof_join`. Same scale shape: one
    union, one shuffle on the `by` keys, O(1) window state per row.

    Right side is deduplicated to one row per (by, on) first with the
    same keep-the-last-by-column-order rule as the backward join, so
    the two directions are consistent at shared timestamps."""
    by = list(by)
    wdup = Window.partitionBy(*by, on).orderBy(*[F.col(c) for c in right_cols])
    r = (
        right.withColumn("_rn", F.row_number().over(wdup))
        .withColumn("_maxrn", F.max("_rn").over(Window.partitionBy(*by, on)))
        .where(F.col("_rn") == F.col("_maxrn"))
        .drop("_rn", "_maxrn")
    )
    # left rows sort BEFORE right rows at equal ts (left side=0), so a
    # right row at exactly left.ts is inside the forward frame
    # (>= semantics)
    lt = left.withColumn("_side", F.lit(0))
    rt = r.select(
        *by, on, *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    ).withColumn("_side", F.lit(1))
    combined = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("_side"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = combined.select(
        "*",
        *[
            F.first(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
    )
    keep = [c for c in left.columns] + [
        F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return filled.where(F.col("_side") == 0).select(*keep)
