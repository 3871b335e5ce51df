"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship aggregation on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full conformance catalog
(``quasar_destination_h2_spark.plans``) — every implemented operator
from SURVEY.md §2 is registered there with a DuckDB oracle when the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quasar_destination_h2_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "agg_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return plans.all_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — every registered
    query has one (even the approx sketches: they publish exact
    anchors + accuracy-contract booleans; greedy packing is replayed
    by a recursive CTE)."""
    return plans.all_oracles()
