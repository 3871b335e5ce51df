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
    # [EXT] scale paths: bucketed LSH dedup + brute-force ANN baseline
    "dedup_minhash_lsh",
    "embed_cosine_topk",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quasar-h2-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quasar_destination_h2_spark import plans

    qs = plans.all_queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        df.count()  # warm: parquet footer reads, code paths JIT'd
        t0 = time.perf_counter()
        df.count()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "wall_time_headline",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
