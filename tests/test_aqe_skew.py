"""AQE skew-join handling, pinned on a real hot key: Spark must
split the skewed shuffle partition at runtime (plan shows
``skew=true``). This is the automatic path for moderate skew; the
explicit tool for pathological keys is operators.joins.salted_join
(oracle-checked equivalent to the plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


SKEW_CONF = {
    # force a sort-merge join (no broadcast escape hatch)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # make the hot partition count as skewed at test scale
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_conf(spark):
    saved = {}
    for k, v in SKEW_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_partition(spark, skew_conf):
    """One key holds ~99% of the probe side. AQE must detect the
    oversized shuffle partition after the map stage and split it
    (OptimizeSkewedJoin) — the runtime re-plan the engine relies on
    at cluster scale (DEFAULT_SPARK_CONF enables skewJoin)."""
    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pay"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("rv")
    )
    joined = left.join(right, "k")
    # execute THIS dataset (count() would plan a separate aggregate
    # query and leave joined's own adaptive plan un-finalized)
    assert len(joined.collect()) == 300_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:4000]


def test_salted_join_is_the_fallback_for_pathological_keys(spark, skew_conf):
    """Same fixture through salted_join: the hot key is spread across
    n_salts reducers by construction (no AQE needed), and the result
    matches the plain join row-for-row."""
    from quasar_destination_h2_spark.operators.joins import salted_join

    left = spark.range(0, 20_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(0))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("rv")
    )
    salted = salted_join(left, right, "k", n_salts=8)
    plain = left.join(right, "k")
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_key_skew_profile_detects_the_hot_key(spark):
    """Composition: the diagnostic that decides when to reach for
    AQE-skew/salting must actually surface this module's hot key.
    On the same ~99%-one-key frame, key_skew_profile must rank key 0
    first with a share near 99% and a skew factor near 50x uniform —
    the signal a pipeline author reads before picking salted_join."""
    from pyspark.sql import functions as F

    from quasar_destination_h2_spark.operators.stats import key_skew_profile

    left = spark.range(0, 300_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(0))
        .otherwise(F.floor(F.col("id") / 100) % 49 + 1)
        .alias("k")
    )
    rows = sorted(
        key_skew_profile(left, "k", topn=3).collect(), key=lambda r: -r.cnt
    )
    hot = rows[0]
    assert hot.key == 0
    assert hot.share_ppm > 980_000          # ~99% of all rows
    assert hot.skew_ppm > 40 * 1_000_000    # ~50 keys, one dominant
    assert hot.total_rows == 300_000
