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
    clicks_to_purchases,
    dedup_events_stream,
    enrich_events_stream,
    hourly_event_counts,
    read_events_stream,
    running_user_stats,
    session_windows,
    stream_to_table,
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
    q.awaitTermination()
    assert q.exception() is None
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


def test_stream_static_enrichment_matches_batch(spark, events_dir):
    """Stream-static broadcast join == the same join run in batch."""
    customers = load_table(spark, SF_DIR, "customer")
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        spark, enrich_events_stream(stream, customers), "t_enrich", "append"
    )
    batch_events = load_table(spark, SF_DIR, "events")
    batch = batch_events.join(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        ),
        "user_id",
        "left",
    )
    assert got.count() == batch.count() == batch_events.count()
    g = {r.event_id: r.segment for r in got.collect()}
    for r in batch.collect():
        assert g[r.event_id] == r.segment


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream range join == the batch equivalent
    (every purchase x its same-user clicks in the preceding hour)."""
    stream = read_events_stream(spark, events_dir)
    got = run_to_memory(
        spark, clicks_to_purchases(stream), "t_ss_join", "append"
    ).collect()
    ev = load_table(spark, SF_DIR, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = clicks.join(purchases, "user_id").where(
        (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour"))
    )
    got_pairs = {(r.purchase_id, r.click_id) for r in got}
    want_pairs = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert got_pairs == want_pairs and len(got_pairs) > 0


def test_foreachbatch_append_lands_all_rows(spark, events_dir):
    """foreachBatch append sink: the landed table holds exactly the
    streamed rows; a second replayed file appends, not replaces."""
    ckpt = tempfile.mkdtemp(prefix="ckpt-")
    spark.sql("DROP TABLE IF EXISTS stream_landing")
    try:
        stream = read_events_stream(spark, events_dir)
        q = stream_to_table(stream, "stream_landing", ckpt)
        q.awaitTermination()
        assert q.exception() is None
        n = load_table(spark, SF_DIR, "events").count()
        assert spark.table("stream_landing").count() == n
        # second file → appended on resume from the same checkpoint
        shutil.copy(f"{events_dir}/part-0.parquet", f"{events_dir}/part-1.parquet")
        try:
            q2 = stream_to_table(
                read_events_stream(spark, events_dir), "stream_landing", ckpt
            )
            q2.awaitTermination(120)
            assert spark.table("stream_landing").count() == 2 * n
        finally:
            import os

            os.remove(f"{events_dir}/part-1.parquet")
    finally:
        spark.sql("DROP TABLE IF EXISTS stream_landing")
        shutil.rmtree(ckpt, ignore_errors=True)


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


def test_late_event_past_watermark_dropped_in_append(spark):
    """Watermark semantics pinned: an event arriving in a later
    micro-batch with ts below the watermark must be DROPPED — its
    already-closed window is emitted once and never updated. (The
    other streaming tests replay everything in one batch, where the
    watermark never advances mid-run and nothing can be late.)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1577836800  # 2020-01-01T00:00:00Z

    def ns(h, m=0):
        return (base + h * 3600 + m * 60) * 10**9

    def write_file(path, rows):
        ids, tss = [r[0] for r in rows], [r[1] for r in rows]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "ts": pa.array(tss, pa.int64()),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array(["click"] * len(rows)),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            path,
        )

    d = tempfile.mkdtemp(prefix="events-late-")
    try:
        # batch 1: three on-time events in the 01:00 window, plus one
        # at 06:00 that advances the watermark to 05:00 (delay = 1 h)
        write_file(f"{d}/a.parquet", [(1, ns(1, 5)), (2, ns(1, 10)), (3, ns(1, 20)), (4, ns(6))])
        # batch 2: an innocuous on-time event. Spark applies the
        # late-row filter with the watermark as of the PREVIOUS
        # batch's end, so the drop is observable one batch after the
        # advancing event — this spacer batch makes 05:00+ effective.
        write_file(f"{d}/b.parquet", [(5, ns(6, 30))])
        # batch 3: a LATE event back in the (long-closed) 01:00
        # window, plus one at 09:00 that closes the 06:00 window
        write_file(f"{d}/c.parquet", [(6, ns(1, 15)), (7, ns(9))])
        os.utime(f"{d}/a.parquet", (1_000_000, 1_000_000))
        os.utime(f"{d}/b.parquet", (2_000_000, 2_000_000))
        os.utime(f"{d}/c.parquet", (3_000_000, 3_000_000))

        stream = read_events_stream(spark, d, max_files_per_trigger=1)
        got = run_to_memory(
            spark,
            hourly_event_counts(stream, watermark="1 hour"),
            "t_late",
            "append",
        ).collect()
        emitted = {r.hour.hour: r.n for r in got}
        # 01:00 window: 3 on-time events only — the late event_id=6
        # was behind the watermark and must not re-open the window
        assert emitted.get(1) == 3, emitted
        # 06:00 window (both on-time events) closed by the 09:00 event
        assert emitted.get(6) == 2, emitted
        # 09:00 window is still open at end-of-stream: withheld
        assert 9 not in emitted, emitted
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_starts_over_empty_directory(spark):
    """ADVICE r3: a stream must be constructible before the first
    file lands (batch schema inference has nothing to read — the
    explicit ns fallback schema kicks in), and rows arriving *after*
    start must flow with the same normalized µs timestamps."""
    import os

    d = tempfile.mkdtemp(prefix="events-empty-")
    try:
        stream = read_events_stream(spark, d)  # must not raise
        assert stream.isStreaming
        assert dict(stream.dtypes)["ts"] == "timestamp"
        # land a ns-flavor file, then drain: rows flow through the
        # fallback schema with the batch-identical ts arithmetic
        batch = load_table(spark, SF_DIR, "events").limit(7)
        pdf = batch.toPandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[ns]").astype("int64")
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.Table.from_pandas(
            pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]],
            preserve_index=False,
        )
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
        got = run_to_memory(
            spark, stream.select("event_id", "ts"), "empty_start", "append"
        )
        want = {(r.event_id, r.ts) for r in batch.select("event_id", "ts").collect()}
        assert {(r.event_id, r.ts) for r in got.collect()} == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_us_flavor_file_over_empty_dir_start_fails_loudly(spark):
    """ADVICE r4: the empty-dir fallback pins the ns ts flavor; a
    µs-flavor file arriving later used to SILENTLY misparse as 1970s
    timestamps (µs ÷ 1000). The magnitude guard must fail the
    micro-batch with an actionable message instead."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="events-usflavor-")
    try:
        stream = read_events_stream(spark, d)  # empty dir -> ns pin
        pdf = pd.DataFrame(
            {
                "event_id": [1],
                "ts": pd.to_datetime(["2024-05-01 10:00:00"]),
                "user_id": [7],
                "event_type": ["click"],
                "value": [1.5],
                "props": ['{"a":1}'],
            }
        )
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            tbl, os.path.join(d, "p0.parquet"), coerce_timestamps="us"
        )
        q = (
            stream.select("event_id", "ts")
            .writeStream.format("memory")
            .queryName("usflavor_guard")
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        try:
            with pytest.raises(Exception, match="nanosecond|ns-flavor"):
                q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_hopping_counts_match_batch_conformance_query(spark, events_dir):
    """Streaming hopping windows must agree exactly with the batch
    events_hopping conformance query over the same data — the
    batch/stream parity contract for sliding windows."""
    from quasar_destination_h2_spark.plans import REGISTRY
    from quasar_destination_h2_spark.streaming.events import (
        hopping_event_counts,
    )

    stream = read_events_stream(spark, events_dir)
    got = sorted(
        map(
            tuple,
            run_to_memory(
                spark, hopping_event_counts(stream), "t_hopping", "complete"
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, REGISTRY["events_hopping"].fn(spark, SF_DIR).collect())
    )
    assert got == want


def test_streaming_index_maintenance_ivfpq(spark, warehouse_dir):
    """The continuous-crawl loop end-to-end: a file-source embedding
    stream drives engine.append_to_ivfpq_index per micro-batch
    (maxFilesPerTrigger=1 -> one append per staged file); the index
    ends bit-identical to batch appends of the same files, and the
    drift log carries one row per batch with the rebuild verdict."""
    import json
    import os

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.streaming import (
        read_embeddings_stream,
        stream_append_to_index,
    )

    engine = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where("vec_id % 3 = 0")
    engine.build_ivfpq_index("strix", base)

    src = tempfile.mkdtemp(prefix="emb-stream-")
    ck = tempfile.mkdtemp(prefix="emb-ck-")
    try:
        # two staged batch files: in-distribution, then shifted
        emb.where("vec_id % 3 = 1").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, f"{src}/b1"),
            "strix",
            "ivfpq",
            checkpoint=f"{ck}/1",
            rebuild_threshold=1_000_000_000,  # never due in-dist
        )
        q.awaitTermination()
        assert q.exception() is None
        shifted = emb.where("vec_id % 3 = 2").select(
            (F.col("vec_id") + 500_000).alias("vec_id"),
            F.transform("embedding", lambda x: F.lit(1.0))
            .cast("array<float>")
            .alias("embedding"),
        )
        shifted.coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, f"{src}/b2"),
            "strix",
            "ivfpq",
            checkpoint=f"{ck}/2",
            rebuild_threshold=50_000,  # the OOD batch trips this
        )
        q.awaitTermination()
        assert q.exception() is None

        n_base = base.count()
        n1 = emb.where("vec_id % 3 = 1").count()
        n2 = emb.where("vec_id % 3 = 2").count()
        assert engine.table("strix_vectors").count() == n_base + n1 + n2
        # one drift row per non-empty micro-batch, ordered verdicts
        log = {
            (r.appended_rows, bool(r.rebuild_due))
            for r in engine.table("strix_drift_log").collect()
        }
        assert log == {(n1, False), (n2, True)}
        # the streamed index serves the same answers as batch appends
        # of the same files (the append is deterministic)
        queries = (
            emb.where("vec_id < 3")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
            )
            .localCheckpoint()
        )
        got = sorted(
            map(tuple, engine.ivfpq_search("strix", queries, topk=5).collect())
        )
        engine.build_ivfpq_index("strix_ref", base)
        engine.append_to_ivfpq_index(
            "strix_ref", spark.read.parquet(f"{src}/b1")
        )
        engine.append_to_ivfpq_index(
            "strix_ref", spark.read.parquet(f"{src}/b2")
        )
        want = sorted(
            map(
                tuple,
                engine.ivfpq_search("strix_ref", queries, topk=5).collect(),
            )
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_streaming_index_maintenance_text(spark, warehouse_dir):
    """The text-index flavor: micro-batches of documents append
    postings exactly; the drift log carries new_term_ppm per batch."""
    import json

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.streaming import stream_append_to_index

    engine = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = docs.where("doc_id % 2 = 0")
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    engine.build_text_index("strtix", base, n_buckets=nb)

    src = tempfile.mkdtemp(prefix="doc-stream-")
    ck = tempfile.mkdtemp(prefix="doc-ck-")
    try:
        docs.where("doc_id % 2 = 1").coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        batches = spark.readStream.schema(
            "doc_id bigint, text string"
        ).parquet(src)
        q = stream_append_to_index(
            engine, batches, "strtix", "text", checkpoint=ck, n_buckets=nb
        )
        q.awaitTermination()
        assert q.exception() is None
        log = engine.table("strtix_drift_log").collect()
        assert len(log) == 1
        assert log[0].appended_docs == docs.where("doc_id % 2 = 1").count()
        assert not log[0].rebuild_due  # no threshold set
        # probe parity with a rebuild over the union
        qt = spark.createDataFrame(
            [(1, "data"), (1, "spark")], "query_id bigint, term string"
        )
        got = sorted(
            map(tuple, engine.text_search("strtix", qt, topn=5).collect())
        )
        engine.build_text_index("strtix_ref", docs, n_buckets=nb)
        want = sorted(
            map(tuple, engine.text_search("strtix_ref", qt, topn=5).collect())
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_streaming_index_append_replay_is_skipped(spark, warehouse_dir):
    """The at-least-once replay guard: a micro-batch whose commit
    marker (checkpoint, batch_id) already exists in the drift log is
    skipped without touching the index — simulated by planting the
    marker a crashed-after-append run would have left."""
    import json

    from pyspark.sql import functions as F2

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.streaming import (
        read_embeddings_stream,
        stream_append_to_index,
    )

    engine = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    engine.build_ivfpq_index("strrp", emb.where("vec_id % 2 = 0"))
    src = tempfile.mkdtemp(prefix="rp-src-")
    ck = tempfile.mkdtemp(prefix="rp-ck-")
    try:
        emb.where("vec_id % 2 = 1").coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        # plant the marker the first (crashed) run would have left
        marker = spark.createDataFrame(
            [(0, 0, 0, 0, 0, ck, False)],
            "appended_rows bigint, batch_mean_sim_micro bigint, "
            "build_mean_sim_micro bigint, drift_micro bigint, "
            "batch_id bigint, checkpoint string, rebuild_due boolean",
        )
        engine.append_rows_to_log("strrp_drift_log", marker)
        before = engine.table("strrp_vectors").count()
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, src),
            "strrp",
            "ivfpq",
            checkpoint=ck,
        )
        q.awaitTermination()
        assert q.exception() is None
        # skipped: no index rows appended, no second log row
        assert engine.table("strrp_vectors").count() == before
        assert engine.table("strrp_drift_log").count() == 1
        # a FRESH checkpoint (a genuinely new stream) still appends
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, src),
            "strrp",
            "ivfpq",
            checkpoint=tempfile.mkdtemp(prefix="rp-ck2-"),
        )
        q.awaitTermination()
        assert q.exception() is None
        assert (
            engine.table("strrp_vectors").count()
            == before + emb.where("vec_id % 2 = 1").count()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_streaming_index_maintenance_ivfbq(spark, warehouse_dir):
    """The r11 IVF+BQ index rides the same continuous-crawl loop:
    one staged file -> one micro-batch append against the frozen
    coarse centroids, a drift-log row with the verdict, and serving
    parity with a batch append of the same file (the sign encode is
    deterministic and parameterless)."""
    import json

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.streaming import (
        read_embeddings_stream,
        stream_append_to_index,
    )

    engine = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where("vec_id % 2 = 0")
    engine.build_ivfbq_index("sbqix", base)
    src = tempfile.mkdtemp(prefix="bq-stream-")
    ck = tempfile.mkdtemp(prefix="bq-ck-")
    try:
        emb.where("vec_id % 2 = 1").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, f"{src}/b1"),
            "sbqix",
            "ivfbq",
            checkpoint=f"{ck}/1",
            rebuild_threshold=1_000_000_000,
        )
        q.awaitTermination()
        assert q.exception() is None
        n_odd = emb.where("vec_id % 2 = 1").count()
        assert engine.table("sbqix_vectors").count() == base.count() + n_odd
        log = [
            (r.appended_rows, bool(r.rebuild_due))
            for r in engine.table("sbqix_drift_log").collect()
        ]
        assert log == [(n_odd, False)]
        queries = (
            emb.where("vec_id < 3")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
            )
            .localCheckpoint()
        )
        got = sorted(
            map(tuple, engine.ivfbq_search("sbqix", queries, topk=5).collect())
        )
        engine.build_ivfbq_index("sbqix_ref", base)
        engine.append_to_ivfbq_index(
            "sbqix_ref", spark.read.parquet(f"{src}/b1")
        )
        want = sorted(
            map(
                tuple,
                engine.ivfbq_search("sbqix_ref", queries, topk=5).collect(),
            )
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_streaming_index_maintenance_cascade(spark, warehouse_dir):
    """The r12 cascade index rides the same continuous-crawl loop:
    one staged file -> one micro-batch append against BOTH frozen
    quantizers (coarse centroids + PQ codebook), a drift-log row
    with the verdict, and serving parity with a batch append of the
    same file."""
    import json

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.streaming import (
        read_embeddings_stream,
        stream_append_to_index,
    )

    engine = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where("vec_id % 2 = 0")
    engine.build_cascade_index("scsix", base)
    src = tempfile.mkdtemp(prefix="csc-stream-")
    ck = tempfile.mkdtemp(prefix="csc-ck-")
    try:
        emb.where("vec_id % 2 = 1").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        q = stream_append_to_index(
            engine,
            read_embeddings_stream(spark, f"{src}/b1"),
            "scsix",
            "cascade",
            checkpoint=f"{ck}/1",
            rebuild_threshold=1_000_000_000,
        )
        q.awaitTermination()
        assert q.exception() is None
        n_odd = emb.where("vec_id % 2 = 1").count()
        assert engine.table("scsix_vectors").count() == base.count() + n_odd
        log = [
            (r.appended_rows, bool(r.rebuild_due))
            for r in engine.table("scsix_drift_log").collect()
        ]
        assert log == [(n_odd, False)]
        queries = (
            emb.where("vec_id < 3")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
            )
            .localCheckpoint()
        )
        got = sorted(
            map(
                tuple,
                engine.cascade_search("scsix", queries, topk=5).collect(),
            )
        )
        engine.build_cascade_index("scsix_ref", base)
        engine.append_to_cascade_index(
            "scsix_ref", spark.read.parquet(f"{src}/b1")
        )
        want = sorted(
            map(
                tuple,
                engine.cascade_search("scsix_ref", queries, topk=5).collect(),
            )
        )
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
