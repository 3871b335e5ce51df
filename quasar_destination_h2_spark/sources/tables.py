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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
            # ns -> µs truncation; DuckDB CAST(timestamp_ns AS TIMESTAMP)
            # truncates identically.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
            # force plan materialization of the schema before conf reset
            df.schema
            return df
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return spark.read.parquet(path)


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


def register_views(spark: SparkSession, sf_dir: str) -> TableSet:
    """Register every table as a temp view (for the SQL API surface)."""
    ts = TableSet(spark, sf_dir)
    for name in TABLES:
        getattr(ts, name).createOrReplaceTempView(name)
    return ts
