"""Dedup-family scaling probe: measure the ngram pair build and
connected-components clustering at 1x / 3x / 10x the sf0.1 corpus.

Each replica deterministically re-tags ~30% of tokens with a
replica marker (token-hash-selected, so two documents that shared a
token still share its transform): WITHIN a replica the planted
near-dup structure is preserved EXACTLY (pair counts scale linearly
with replicas), while cross-replica copies of the same document drop
to ~0.2 Jaccard — far below the 0.8 threshold — and no artificial
high-document-frequency shingles are introduced (which would engage
the max_df valve and distort the measurement). Linear pair growth +
near-linear wall time is the inverted-index design claim verified
empirically; a quadratic candidate generator would blow up 100x at
the 10x point.

Usage: python tools/scale_probe.py [sf_dir]   (writes one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quasar_destination_h2_spark.operators import dedup
    from quasar_destination_h2_spark.sources.tables import TableSet

    base = TableSet(spark, sf_dir).documents.select(
        "doc_id", "text", "lang", "source"
    )
    n_base = base.count()

    def replicate(k: int):
        parts = []
        for r in range(k):
            tag = f"r{r}x"
            retagged = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.when(
                        F.pmod(F.xxhash64(t), F.lit(10)) < 3,
                        F.concat(F.lit(tag), t),
                    ).otherwise(t),
                ),
                " ",
            )
            parts.append(
                base.select(
                    (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                    retagged.alias("text"),
                    "lang",
                    "source",
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # stage the input as parquet so the timed region is the
        # operator over a realistic splittable scan, not the union
        # construction (and nothing large pins executor memory)
        import tempfile

        path = tempfile.mkdtemp(prefix=f"scale-probe-{k}x-")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    out = {"sf_dir": sf_dir, "n_base_docs": n_base, "points": []}
    for k in (1, 3, 10):
        docs = replicate(k)
        n = docs.count()
        t0 = time.perf_counter()
        n_pairs = dedup.ngram_jaccard_pairs(docs).count()
        t_pairs = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_clusters = (
            dedup.dedup_clusters(docs).where("is_canonical").count()
        )
        t_clusters = time.perf_counter() - t0
        out["points"].append(
            {
                "replicas": k,
                "n_docs": n,
                "n_pairs": n_pairs,
                "n_clusters": n_clusters,
                "pairs_sec": round(t_pairs, 2),
                "clusters_sec": round(t_clusters, 2),
            }
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
