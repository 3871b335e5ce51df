"""Streaming operators over the events schema (ts: int64-ns under
nanosAsLong, or a µs timestamp — either flavor, normalized by the
loader shared with batch).

Plan shapes are the standard scale-safe ones: watermark bounds state,
windowed aggregation shuffles once on (window, key), stream dedup
keeps only in-watermark keys, session windows merge per user. A
1000-executor cluster runs these unchanged — state is partitioned by
group key and pruned by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sources.tables import EVENTS_NS_FALLBACK_SCHEMA, normalize_ts


#: Any ns-precision epoch after 1973-03 exceeds this; any µs/ms/s
#: epoch of ANY date before year ~5000 stays far below it. The
#: ns-fallback magnitude guard splits the flavors on this line.
_NS_MAGNITUDE_FLOOR = 10**17


def _events_schema(spark: SparkSession, path: str) -> "tuple[StructType, bool]":
    """Streaming reads require an explicit schema; batch-infer it from
    the same files so ns fixtures (ts: int64 under nanosAsLong) and µs
    fixtures (ts: timestamp) both stream without a hand-pinned type.
    An empty/not-yet-populated directory can't be inferred from —
    fall back to the explicit ns schema so a stream can start before
    the first file lands (the normal deploy order for a stream).
    Returns (schema, fallback_used): a stream whose schema was PINNED
    (not inferred) cannot re-resolve it once files land, so the
    caller installs the ns-magnitude guard — a µs-flavor file read
    through the pinned LongType would otherwise SILENTLY misparse as
    1970s timestamps (µs value ÷ 1000; observed, not hypothetical)."""
    try:
        return spark.read.parquet(path).schema, False
    except Exception:
        return EVENTS_NS_FALLBACK_SCHEMA, True


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: "int | None" = None
) -> DataFrame:
    """readStream over an events parquet directory, ts normalized by
    the SAME helper as the batch loader (sources.tables.normalize_ts)
    so stream and batch results are comparable row-for-row by
    construction. `max_files_per_trigger` bounds each micro-batch
    (availableNow honors it, splitting a backlog into several batches
    — watermarks advance between them, which is what makes late-data
    semantics testable).

    Empty-directory starts pin the int64-NANOSECOND flavor (the only
    choice inference can't make for us) and guard it: if a file of
    the µs flavor lands later, the micro-batch FAILS with an
    actionable message instead of silently shifting every timestamp
    to 1970 (restart the stream once files exist — the schema then
    resolves from the data — or land ns-flavor files)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema, fallback_used = _events_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if fallback_used:
        # assert_true is NULL on pass; threading it through the ts
        # expression itself keeps it un-prunable while ts is in use
        guard = F.assert_true(
            F.col("ts").isNull() | (F.col("ts") >= _NS_MAGNITUDE_FLOOR),
            F.lit(
                "events stream was started over an EMPTY directory, which "
                "pins the int64-nanosecond ts flavor; an arriving file's ts "
                "is below ns magnitude (a microsecond-flavor file?). "
                "Restart the stream now that files exist (the schema will "
                "resolve from the data), or land ns-flavor files."
            ),
        )
        df = df.withColumn("ts", F.when(guard.isNull(), F.col("ts")))
    return normalize_ts(df)


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark —
    the streaming twin of the batch `events_hourly` conformance query
    (same groups, same sums)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "value_sum"
            ),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def dedup_events_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids arriving
    within the watermark. State holds only keys newer than the
    watermark — bounded memory at any scale."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


#: Output schema of running_user_stats — one row per user per
#: micro-batch in which that user appeared.
USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("value_max", DoubleType()),
    ]
)

_USER_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count / value sum / value max across micro-batches.

    The built-in windowed aggregates can't express "cumulative since
    stream start, emitted every batch" — this is the escape hatch the
    reference has no analog for ([EXT]; SURVEY §2.2 streaming). State
    is one 3-field tuple per user, partitioned by user_id, updated
    from Arrow batches — bounded memory, shuffle only on user_id, so
    a 1000-executor cluster shards state horizontally.
    """
    import pandas as pd  # local: keep module import light

    def update(key, pdfs, state):
        n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["value"].dropna()
            n += len(pdf)
            s += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [s],
                "value_max": [mx if mx != float("-inf") else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def enrich_events_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static
    dimension (user_id → customer row). The static side is broadcast
    per micro-batch — no stream state at all, the standard shape for
    dimension enrichment at any scale."""
    d = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return events.join(F.broadcast(d), "user_id", "left")


def clicks_to_purchases(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream join: each purchase joined to every click by the
    same user in the preceding `horizon`. Both sides carry
    watermarks, and the range condition bounds the join state to the
    horizon — Spark drops buffered clicks older than
    watermark+horizon, so state is finite at any input rate."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (clicks.c_user == purchases.p_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "value",
    )


def stream_to_table(events: DataFrame, table: str, checkpoint: str):
    """foreachBatch append sink: lands each micro-batch of the stream
    in a catalog table (parquet, append). With the checkpoint dir,
    restarts resume from the last committed batch — the streaming
    twin of the engine's INSERT append path."""

    # the ORIGINAL session, not batch.sparkSession: micro-batches run
    # in a cloned session whose relation-cache refresh would not
    # invalidate the main session's cached file listing
    main_session = events.sparkSession

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").format("parquet").saveAsTable(table)
        # invalidate the cached file listing so readers of the table
        # in the main session see the appended files immediately
        main_session.catalog.refreshTable(table)

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def session_windows(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based): one row per session with
    its span and activity. session_window merges adjacent state
    per user — the built-in replacement for custom stateful logic."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "value_sum"
            ),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def hopping_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hopping (sliding) 1-hour/30-minute windowed counts with a
    late-data watermark — the streaming twin of the batch
    ``events_hopping`` conformance query (every event lands in
    exactly two windows; same counts). Window starts surface as
    epoch seconds so downstream consumers and the batch twin compare
    without timestamp-rendering concerns."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("win.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )
