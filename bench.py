"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs the headline Tier-B + [EXT] queries on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "wall_time_headline", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is executed with a count-only terminal action (the driver
collects separately in correctness); timing covers plan + execution,
not session boot. Queries chosen to exercise the scale-critical plan
shapes: single-shuffle partial aggregation, broadcast-dim multi-join,
window top-k per group, global top-k (TakeOrderedAndProject), and the
bucketed LSH near-dup join (no cartesian product).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "agg_pricing_summary",
    "join_inner_broadcast",
    "window_rank",
    "topk",
    "count_distinct",
    "cte_multi",
    "events_hourly",
    # hardest TPC-H decorrelation shapes: bilateral-trade multi-join,
    # sole-late-supplier semi+anti join, widest-scan 6-way product
    # profit join (r5 addition — heaviest remaining plan family)
    "tpch_q7_volume_shipping",
    "tpch_q21_suppliers_who_kept_waiting",
    "tpch_q17_small_quantity_revenue",
    "tpch_q9_product_profit",
    # [EXT] scale paths: bucketed LSH dedup + brute-force ANN baseline
    # + IVF-confined semantic dedup (r5 addition)
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "semantic_dedup",
    # [EXT] training-pipeline paths: iterative connected components,
    # quality-aware survivor selection over the same fixpoint (r6
    # addition), global token histogram top-k, applyInPandas sequence
    # packing
    "dedup_clusters",
    "dedup_keep_best",
    "vocab_topk",
    "sequence_pack",
    # [EXT] time-series paths: multi-resolution re-aggregation +
    # bucketized range join
    "rollup_cascade",
    "range_join_sessions",
    # [EXT] flagship composition: dedup -> quality gate -> stable split
    "pipeline_curate",
    # r6 additions: two-pass LM scoring with broadcast vocabulary
    # (the DSIR data-selection shape) and the one-scan multi-distinct
    # profile aggregation (Expand-based) — plan families not yet in
    # the headline set
    "importance_weights",
    "table_profile",
    # r7 additions: zero-shuffle chunk explode, the persisted-tf
    # three-stage tf-idf ranking, the broadcast-median quality gate,
    # label-excluded contrastive mining, the dual-model PMI build,
    # and the head-ranked power-sum Zipf fit — the remaining plan
    # families (sequence-generate fan-out, cached-reuse aggregation
    # tree, aggregate-broadcast filter, NLJ-by-design ranking,
    # two-model broadcast join, TakeOrdered + tiny window + OLS)
    "doc_chunking",
    "tfidf_top_terms",
    "quality_filter_percentile",
    "hard_negative_mining",
    "pmi_collocations",
    "zipf_fit",
    # r8 additions: zero-explode BM25 retrieval (per-row HOF counting
    # + one-row stats broadcast), the prefix-filtered Jaccard join
    # (rarest-prefix inverted index + full verification), the
    # zero-shuffle sorted-neighbors diversity profile, and the
    # exact-vs-IVF recall contract — the new plan families
    "bm25_search",
    "dedup_prefix_filter",
    "lexical_diversity",
    "ann_ivf_recall",
    # bipartite new-batch-vs-reference inverted-index join
    "dedup_cross_corpus",
    # rolling power-sum z-score window over the hourly aggregate
    "events_anomaly_zscore",
    # IVF balance diagnostic + candidate-vocab coverage audit
    "ivf_cluster_profile",
    "vocab_oov_rate",
    # sketch-estimator calibration + training-shard balance audit
    "minhash_calibration",
    "shard_balance",
    # r9 additions: the iterative Lloyd refinement + objective trace
    # (one corpus pass per round), the refined-index recall contract,
    # and the query-table batch BM25 (single pruned posting join)
    "kmeans_convergence",
    "ann_ivf_recall_kmeans",
    "bm25_search_many",
    # the ANN serving query family — NOTE: the registered query
    # rebuilds the k-means index per run (the oracle-replayable
    # form), so this entry times BUILD + probe; production amortizes
    # the build via engine.build_ivf_index and pays only the probe
    "ann_index_search",
    # r10: the BM25 text-index serving probe (same declaration-vs-
    # production split: the registered query builds postings in-plan
    # for the oracle; text_probe_only below is the serving number)
    "text_index_search",
    # r10: the PQ serving form (declaration: codebook training +
    # encode + ADC + rerank per run; pq_probe_only below is the
    # amortized serving number) and the H2 CSV function round trip
    # (CSVWRITE one-file export + CSVREAD splittable reload)
    "pq_index_search",
    "csvread_roundtrip",
    # r10: the composed IVF+PQ serving form (declaration: BOTH
    # quantizer trainings + encode + pruned ADC + rerank per run;
    # ivfpq_probe_only below is the amortized serving number over the
    # centroid-partitioned store)
    "ivfpq_index_search",
    # r10: the 1-bit quantization serving path (sign-bit encode +
    # hamming shortlist on packed bigints + exact rerank — the 32x
    # compression tier) and the hybrid lexical+semantic RRF fusion
    "ann_bq_search",
    "hybrid_search_rrf",
)


def _calibration(spark) -> float:
    """Fixed-overhead probe (r8 VERDICT item 3): time a PLANLESS
    workload — a codegen-trivial range count plus an empty-stage
    scheduler roundtrip — whose cost is pure machine/image overhead
    (JVM, scheduler, py4j), independent of every query plan in this
    repo. Round-over-round bench comparisons divide by this to
    separate machine drift from code regressions mechanically: two
    rounds burned analysis proving ~30% uniform inflations were
    environmental; now BENCH_rN.json carries the denominator."""
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_000_000).count()
        spark.sparkContext.parallelize([], 32).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import tempfile as _tf

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quasar-h2-spark-bench")
        .config("spark.sql.warehouse.dir", _tf.mkdtemp(prefix="bench-wh-"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES (1 MB floor
        # by default). The CPU-dense stages here (posting-list pair
        # fan-out, shingle arrays, vector math) do far more work per
        # byte than a scan, so the byte floor under-parallelizes them
        # ~4x at small SF (measured: ngram pair build 1.8 s -> 1.0 s
        # with the floor at 256k). At cluster scale partitions are
        # tens of MB and the floor is never the binding constraint.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quasar_destination_h2_spark import plans

    qs = plans.all_queries()
    times: dict[str, float] = {}

    # warm the scheduler/JIT before calibrating, then probe the
    # machine's fixed overhead (re-probed after the queries: the
    # SMALLER of the two is the calibration — co-tenant noise only
    # inflates)
    _calibration(spark)
    calib_start = _calibration(spark)

    # Load-path throughput (the reference IS a loader: CSVREAD-CTAS
    # bulk load, H2CsvCreateSink.scala:121-122). Export lineitem once
    # as headerless CSV, then time the full sink pipeline: validate ->
    # splittable CSV scan -> parquet saveAsTable (atomic replace).
    import tempfile

    from quasar_destination_h2_spark.engine import Engine
    from quasar_destination_h2_spark.types import Column, ColumnType

    stage = tempfile.mkdtemp(prefix="bench-csv-")
    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    )
    csv_dir = f"{stage}/lineitem_csv"
    # 16 files so the load parallelism reflects the engine, not the
    # accident of the staged export's layout (single-file CSVs cap
    # scan parallelism at maxPartitionBytes granularity)
    li.repartition(16).write.option("header", False).option(
        "emptyValue", ""
    ).csv(csv_dir)
    cols = [
        Column("l_orderkey", ColumnType.NUMBER),
        Column("l_partkey", ColumnType.NUMBER),
        Column("l_suppkey", ColumnType.NUMBER),
        Column("l_quantity", ColumnType.NUMBER),
        Column("l_extendedprice", ColumnType.NUMBER),
        Column("l_discount", ColumnType.NUMBER),
        Column("l_tax", ColumnType.NUMBER),
        Column("l_returnflag", ColumnType.STRING),
    ]
    engine = Engine.from_config(
        json.dumps({"connectionUri": f"{stage}/wh"}), spark=spark
    )
    sink = engine.csv_create_sink()
    sink.consume("/bench_load", cols, csv_dir)  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        sink.consume("/bench_load", cols, csv_dir)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    times["csv_load"] = round(best, 4)
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # time build+execute together: iterative operators (e.g.
        # dedup_clusters) do their work at build time via
        # localCheckpoint, so timing only a count of a pre-built
        # DataFrame would under-report them
        fn(spark, sf_dir).count()  # warm: footer reads, JIT, plans
        # best-of-2 timed runs (the csv_load pattern, generalized):
        # a single timed run is hostage to co-tenant noise — the r3
        # artifact published ~1.5-2x uniform inflation that a clean
        # re-run didn't reproduce. min-of-2 bounds that distortion.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        # drop operator-level persisted intermediates between
        # queries (cache stays warm across the warm+timed runs of
        # ONE query — unchanged measurement — but never leaks into
        # the next query's memory budget)
        from quasar_destination_h2_spark import cache

        cache.release()

    # ANN serving split (r9 VERDICT task 3): the registered
    # ann_index_search entry times BUILD + probe by declaration (the
    # oracle-replayable form). A 100 TB operator amortizes the build
    # via engine.build_ivf_index and tracks PROBE-ONLY serving
    # latency — measured here: build the index once, then time
    # successive ann_topk probe batches over the stored bucketed
    # lists (includes the torn-build verification, honestly — it is
    # part of every serving call).
    from pyspark.sql import functions as F

    from quasar_destination_h2_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    engine.build_ivf_index("bench_annix", emb, kmeans_iters=2)
    times["ann_index_build"] = round(time.perf_counter() - t0, 4)
    probe_queries = (
        emb.where("vec_id < 5")
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 0.5 + 0.01, 6),
            ).alias("qv"),
        )
        .localCheckpoint()  # probe timing excludes query-batch prep
    )
    engine.ann_topk("bench_annix", probe_queries).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _b in range(5):
            engine.ann_topk("bench_annix", probe_queries).count()
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    times["ann_probe_only"] = round(best, 4)

    # Text-retrieval serving split (r10): build the BM25 postings
    # index once (tok-bucketed store + stats row), then time
    # successive text_search probe batches — term semi-join prune
    # over co-located inverted lists, df from the pruned postings,
    # per-query window top-k. Includes the torn-state verification
    # (memoized after the first call), honestly part of serving.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.perf_counter()
    engine.build_text_index("bench_tix", docs, n_buckets=nb)
    times["text_index_build"] = round(time.perf_counter() - t0, 4)
    text_queries = spark.createDataFrame(
        [
            (1, "query"), (1, "spark"), (1, "window"),
            (2, "data"), (2, "join"),
            (3, "stream"), (3, "state"), (3, "window"),
        ],
        "query_id bigint, term string",
    ).localCheckpoint()  # probe timing excludes query-batch prep
    engine.text_search("bench_tix", text_queries).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _b in range(5):
            engine.text_search("bench_tix", text_queries).count()
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    times["text_probe_only"] = round(best, 4)

    # PQ serving split (r10): train codebooks + encode + store ONCE
    # (pq_index_build), then time successive pq_search probe batches
    # over the stored codes — bounded ADC LUT onto the vec_id-
    # bucketed codes (shuffle-free index side), shortlist rerank
    # against the stored vectors. Includes the torn-build check
    # (memoized after the first call), honestly part of serving.
    t0 = time.perf_counter()
    engine.build_pq_index("bench_pqix", emb)
    times["pq_index_build"] = round(time.perf_counter() - t0, 4)
    engine.pq_search("bench_pqix", probe_queries).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _b in range(5):
            engine.pq_search("bench_pqix", probe_queries).count()
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    times["pq_probe_only"] = round(best, 4)

    # IVFPQ serving split (r10): build the composed index ONCE
    # (coarse k-means + PQ codebooks + encode, stored PARTITIONED by
    # centroid_id), then time successive ivfpq_search probe batches —
    # probe-list selection against the bounded stored centroids, ADC
    # over ONLY the probed lists (dynamic partition pruning restricts
    # the file reads), exact rerank of the shortlist against the
    # same-pruned vector store. Includes the torn-build check
    # (memoized after the first call), honestly part of serving.
    t0 = time.perf_counter()
    engine.build_ivfpq_index("bench_ipqix", emb)
    times["ivfpq_index_build"] = round(time.perf_counter() - t0, 4)
    engine.ivfpq_search("bench_ipqix", probe_queries).count()  # warm
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _b in range(5):
            engine.ivfpq_search("bench_ipqix", probe_queries).count()
        dt = (time.perf_counter() - t0) / 5
        best = dt if best is None else min(best, dt)
    times["ivfpq_probe_only"] = round(best, 4)

    calib_end = _calibration(spark)
    calib = min(calib_start, calib_end)
    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "wall_time_headline",
                "value": total,
                "unit": "sec",
                "sf": sf,
                # machine fixed-overhead denominator (start/end probes;
                # calibration_sec = min) — divide query times by this
                # to compare rounds across machine drift
                "calibration_sec": calib,
                "calibration_start_sec": calib_start,
                "calibration_end_sec": calib_end,
                "queries": times,
                "queries_norm": {
                    k: round(v / calib, 2) for k, v in times.items()
                },
                # the headline repeated at the END of the line: the
                # driver's capture keeps the TAIL, and r9's file lost
                # the leading summary to truncation — now both ends
                # carry it (r9 VERDICT task 8)
                "total_sec": total,
                "total_norm": round(total / calib, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
