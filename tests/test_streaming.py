"""Streaming round-trips: file-source replay of the events parquet,
availableNow trigger, memory sink; results compared to the batch
equivalents (the batch side is oracle-checked, so agreement here
transitively pins the streaming semantics)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from quasar_destination_h2_spark.sources.tables import load_table
from quasar_destination_h2_spark.streaming import (
    dedup_events_stream,
    hourly_event_counts,
    read_events_stream,
    running_user_stats,
    session_windows,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark):
    """events.parquet replayed into a streaming source directory."""
    d = tempfile.mkdtemp(prefix="events-stream-")
    shutil.copy(f"{SF_DIR}/events.parquet", f"{d}/part-0.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_to_memory(spark, stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        spark, hourly_event_counts(stream), "t_hourly", "complete"
    ).collect()
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "value_sum"
            ),
        )
        .collect()
    )
    key = lambda r: (r.hour, r.event_type)
    got_m = {key(r): (r.n, r.value_sum) for r in got}
    batch_m = {key(r): (r.n, r.value_sum) for r in batch}
    assert got_m == batch_m


def test_stream_dedup_drops_replayed_file(spark, events_dir):
    """Replaying the same events twice (two files) must dedup back to
    the original id set."""
    d = tempfile.mkdtemp(prefix="events-dup-")
    try:
        shutil.copy(f"{events_dir}/part-0.parquet", f"{d}/a.parquet")
        shutil.copy(f"{events_dir}/part-0.parquet", f"{d}/b.parquet")
        stream = read_events_stream(spark, d)
        got = run_to_memory(
            spark, dedup_events_stream(stream), "t_dedup", "append"
        )
        n_unique = load_table(spark, SF_DIR, "events").count()
        assert got.count() == n_unique
        assert got.select("event_id").distinct().count() == n_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_running_user_stats_matches_batch(spark, events_dir):
    """The custom stateful operator's final per-user state (update
    mode: last emitted row per user) must equal the batch groupBy."""
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        spark, running_user_stats(stream), "t_userstats", "update"
    )
    # update mode appends a row per user per batch; keep the last
    final = {
        r.user_id: r
        for r in got.orderBy("n_events").collect()  # last = max n_events
    }
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("mx"),
        )
        .collect()
    )
    assert len(final) == len(batch)
    for r in batch:
        g = final[r.user_id]
        assert g.n_events == r.n
        assert g.value_sum == pytest.approx(r.s, rel=1e-9)
        assert g.value_max == pytest.approx(r.mx, rel=1e-12)


def test_running_user_stats_accumulates_replayed_data(spark, events_dir):
    """Two copies of the events file replayed → per-user counts double:
    the state tuple accumulates everything seen (across micro-batches
    when the source splits files, within one otherwise)."""
    d = tempfile.mkdtemp(prefix="events-state-")
    try:
        shutil.copy(f"{events_dir}/part-0.parquet", f"{d}/a.parquet")
        shutil.copy(f"{events_dir}/part-0.parquet", f"{d}/b.parquet")
        stream = read_events_stream(spark, d)
        got = run_to_memory(
            spark, running_user_stats(stream), "t_userstats2", "update"
        )
        final = {r.user_id: r.n_events for r in got.orderBy("n_events").collect()}
        batch = {
            r.user_id: r.n
            for r in load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert final == {u: 2 * n for u, n in batch.items()}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_session_windows_shape(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        spark, session_windows(stream), "t_sessions", "complete"
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r.session_end > r.session_start
        assert r.n_events >= 1
    # sessions of one user never overlap
    by_user: dict = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1
