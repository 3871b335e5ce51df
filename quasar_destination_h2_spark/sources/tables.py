"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. ``events.ts`` is a nanosecond parquet timestamp,
which Spark's vectorized reader rejects; we read it via
``spark.sql.legacy.parquet.nanosAsLong`` and convert to a
microsecond TimestampType (truncation — matching DuckDB's
``CAST(ts_ns AS TIMESTAMP)`` exactly, verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # Spark reads the conf at SCAN time, not plan time, so it must
        # stay set for the session's lifetime — resetting it after
        # building the plan breaks a later collect(). Harmless for the
        # other tables (their timestamps are µs-precision).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns-precision fixture: ns -> µs truncation; DuckDB
            # CAST(timestamp_ns AS TIMESTAMP) truncates identically.
            # Integer DIV, not F.floor(x/1000): double division loses
            # ulps at ~1.7e18 ns and truncates to the wrong µs.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        if ts_type == "timestamp_ntz":
            # µs-precision fixture read as NTZ: normalize to the
            # session-zoned TimestampType every downstream operator is
            # written against (CAST(ts AS BIGINT) epoch math is legal
            # on LTZ but not NTZ). Session tz is pinned to UTC in the
            # engine, so the wall-clock rendering is unchanged and
            # DuckDB's naive timestamps still compare equal.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
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
