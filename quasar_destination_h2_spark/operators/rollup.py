"""[EXT] Hypertable-style continuous aggregates over ``events``.

The time-series pattern the reference has no analog for: multi-
resolution rollups where each COARSER level re-aggregates the next
FINER level instead of the raw data — at 100 TB the daily rollup
reads the hourly table (tiny), not the raw events. That only works
for re-aggregable aggregates, which is the design constraint this
module demonstrates twice:

* ``rollup_cascade`` — counts and decimal sums: sums of sums are
  exact, so the cascade is bit-equal to aggregating raw data at any
  level (the DuckDB oracle does exactly that).
* ``user_sketch_rollup`` — distinct users per bucket via DataSketches
  HLL: COUNT(DISTINCT) does NOT re-aggregate, but HLL sketches union
  losslessly (register-wise max), so each level unions the previous
  level's sketches. Estimates are implementation-defined → rows-only
  conformance + a pytest accuracy bound against exact distincts.

Buckets are epoch-aligned (``seconds DIV width * width``) — the same
arithmetic in Spark and the oracle; calendar-aligned buckets would be
``date_trunc`` instead, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (label, width-in-seconds) — each level re-aggregates the previous.
RESOLUTIONS = (("1m", 60), ("1h", 3600), ("1d", 86400))

_DEC = "decimal(38,6)"


def _bucket(col, width: int):
    secs = col.cast("long")
    return (secs - F.pmod(secs, F.lit(width))).alias("bucket_s")


def rollup_cascade(events: DataFrame) -> DataFrame:
    """Multi-resolution rollup: minute level aggregates raw events;
    hour re-aggregates minutes; day re-aggregates hours. One shuffle
    per level, each over progressively tiny input. Output: one row
    per (resolution, bucket, event_type) with re-aggregable stats.

    The raw→minute level is MATERIALIZED (``localCheckpoint``) —
    that is the hypertable continuous-aggregate contract this
    operator models: coarser rollups read the stored fine table,
    never the raw events. Declaratively unioning un-materialized
    levels looks the same but plans three raw-event scans (one per
    union branch re-deriving its chain — verified); with the minute
    level materialized, raw events are scanned exactly once and the
    coarser branches recompute only from the tiny checkpoint (a
    per-minute aggregate is ~10^3-10^5 rows at any corpus size —
    re-aggregating it twice is cheaper than two more checkpoint
    jobs)."""
    label0, w0 = RESOLUTIONS[0]
    level = (
        events.groupBy(
            _bucket(F.col("ts"), w0), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).alias("_vsum"),
        )
        .localCheckpoint()
    )
    out = level.select(
        F.lit(label0).alias("resolution"),
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket_start"),
        "event_type",
        "n",
        F.col("_vsum").cast("double").alias("value_sum"),
    )
    for label, width in RESOLUTIONS[1:]:
        level = (
            level.groupBy(
                _bucket(F.col("bucket_s"), width), F.col("event_type")
            )
            .agg(
                F.sum("n").alias("n"),  # counts of counts
                F.sum("_vsum").alias("_vsum"),  # exact decimal sums of sums
            )
        )
        out = out.unionByName(
            level.select(
                F.lit(label).alias("resolution"),
                F.timestamp_seconds(F.col("bucket_s")).alias("bucket_start"),
                "event_type",
                "n",
                F.col("_vsum").cast("double").alias("value_sum"),
            )
        )
    return out


def user_sketch_rollup(events: DataFrame) -> DataFrame:
    """Distinct-user rollup via mergeable HLL sketches: the minute
    level sketches raw user_ids; every coarser level UNIONS the finer
    level's sketches (register-wise max — lossless). This is how a
    100 TB store answers 'distinct users in any window' without ever
    re-scanning raw data. Estimates carry the sketch's error (~2% at
    default lgK) — pinned by a pytest bound AND by the conformance
    query's accuracy-contract booleans against exact per-bucket
    distincts. Like rollup_cascade, each level is materialized before
    the next unions its sketches — raw events are scanned once."""
    label0, w0 = RESOLUTIONS[0]
    level = (
        events.groupBy(_bucket(F.col("ts"), w0), F.col("event_type"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("_sk"))
        .localCheckpoint()
    )
    frames = [
        level.select(
            F.lit(label0).alias("resolution"),
            "bucket_s",
            "event_type",
            F.expr("hll_sketch_estimate(_sk)").cast("long").alias("approx_users"),
        )
    ]
    for label, width in RESOLUTIONS[1:]:
        level = level.groupBy(
            _bucket(F.col("bucket_s"), width), F.col("event_type")
        ).agg(F.expr("hll_union_agg(_sk)").alias("_sk"))
        frames.append(
            level.select(
                F.lit(label).alias("resolution"),
                "bucket_s",
                "event_type",
                F.expr("hll_sketch_estimate(_sk)").cast("long").alias(
                    "approx_users"
                ),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "resolution",
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket_start"),
        "event_type",
        "approx_users",
    )
