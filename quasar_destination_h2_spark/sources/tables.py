"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. ``events.ts`` comes in two fixture flavors —
int64 nanoseconds (read under ``spark.sql.legacy.parquet.nanosAsLong``
and truncated to µs, matching DuckDB's ``CAST(ts_ns AS TIMESTAMP)``
exactly, verified in tests) or a µs timestamp / timestamp_ntz. Either
way :func:`normalize_ts` lands it on the session-zoned TimestampType
every downstream operator is written against; the streaming reader
(streaming/events.py) shares the same helper so stream and batch
results stay comparable row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Local-fixture parallelism: the test parquet files are a single
    rowgroup, so the scan is ONE task and every downstream per-row
    computation runs on one core. Fan out to the session parallelism
    when (and only when) the scan under-splits — at cluster scale a
    real table has >= parallelism splits and this branch never
    triggers, so no shuffle is added to production plans."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


#: Only the tables whose queries are CPU-bound per row (regex
#: tokenization, shingling, hashing, vector arithmetic) repay a
#: fan-out shuffle at fixture size; the relational tables' scans are
#: cheaper than the extra exchange.
_FAN_OUT_TABLES = frozenset({"documents", "embeddings"})


#: Explicit ns-flavor events schema: lets a *stream* start over a
#: directory no file has landed in yet (batch schema inference needs
#: at least one file). Matches the driver's events fixture columns.
EVENTS_NS_FALLBACK_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # int64 ns under nanosAsLong
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Land whichever ts flavor the fixture carries on the
    session-zoned TimestampType (engine pins the session tz to UTC).
    Shared by the batch loader and the streaming reader
    (streaming/events.py) so the two can never drift apart and
    stream/batch results stay comparable row-for-row.

    * ``bigint`` — ns-precision fixture read under nanosAsLong:
      ns -> µs truncation; DuckDB CAST(timestamp_ns AS TIMESTAMP)
      truncates identically. Integer DIV, not F.floor(x/1000):
      double division loses ulps at ~1.7e18 ns and truncates to the
      wrong µs.
    * ``timestamp_ntz`` — µs fixture read as NTZ: cast to LTZ
      (CAST(ts AS BIGINT) epoch math is legal on LTZ but not NTZ);
      with the UTC session tz the wall-clock rendering is unchanged
      and DuckDB's naive timestamps still compare equal.
    * anything else (already a session-zoned timestamp) — unchanged.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # Spark reads the conf at SCAN time, not plan time, so it must
        # stay set for the session's lifetime — resetting it after
        # building the plan breaks a later collect(). Harmless for the
        # other tables (their timestamps are µs-precision).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_ts(spark.read.parquet(path))
    df = spark.read.parquet(path)
    return _fan_out(spark, df) if name in _FAN_OUT_TABLES else df


class TableSet:
    """Lazy, memoized handle on one scale factor's tables.

    ``t.lineitem`` etc. Each table is loaded once per TableSet; plans
    built from the same TableSet share the scan."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def sql(self, query: str) -> DataFrame:
        """Run a Spark SQL query with every table registered as a temp
        view — the spark.sql() path of the Tier-B surface (subqueries,
        CTEs, EXISTS; SURVEY §2.2). Views are createOrReplaceTempView
        so per-sf_dir re-registration is safe within a session."""
        for name in TABLES:
            getattr(self, name).createOrReplaceTempView(name)
        return self.spark.sql(query)


def register_views(spark: SparkSession, sf_dir: str) -> TableSet:
    """Register every table as a temp view (for the SQL API surface)."""
    ts = TableSet(spark, sf_dir)
    for name in TABLES:
        getattr(ts, name).createOrReplaceTempView(name)
    return ts
