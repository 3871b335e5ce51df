"""Query catalog: the declared conformance surface (SURVEY §2).

Every operator the engine claims is registered here as a named query
over the driver's parquet tables, paired (when SQL-expressible) with
an ANSI-SQL oracle that DuckDB runs on the same data. The driver
hash-compares both sides at sf0.01; this registry feeds
``__spark_entry__.queries()`` / ``oracle_sql()``.

Determinism rules that make the cross-engine hash comparison sound
(and are enforced by code review of each entry):

* every computed/aggregate column is explicitly aliased — names must
  match the oracle exactly;
* floating-point aggregates are rounded identically on both sides
  (summation order differs between engines, so raw double sums are
  not bit-stable);
* integer-valued aggregates are cast to BIGINT on both sides (DuckDB
  widens integer sums to HUGEINT, Spark to LONG);
* LIMIT/top-k queries carry a total tie-breaking ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import TableSet


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a conformance query. The wrapped function receives a
    :class:`TableSet` (lazy per-sf_dir table handles)."""

    def deco(fn: Callable[[TableSet], DataFrame]):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(TableSet(spark, sf_dir))

        runner.__name__ = f"query_{name}"
        runner.__doc__ = fn.__doc__
        REGISTRY[name] = Query(name, runner, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
