"""[EXT] Data-profiling operators — the "what is in this table"
utilities every warehouse front-end runs before anything else.

Spark-first: a profile is ONE aggregation over the table producing
every column's statistics in a single pass (n_nulls, exact distinct
count, numeric min/max), then a per-row ``stack`` transpose into the
long (column_name, stats...) form. Never one job per column — at
100 TB a 16-column table profiled column-by-column is 16 corpus
scans; this is always exactly one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..idents import hygienic_ident
from pyspark.sql.types import NumericType


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Single-pass column profile in long form.

    Output: one row per profiled column —
    (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    with min/max as DOUBLE for numeric columns and NULL otherwise
    (engine-portable: stringified min/max would hang cross-engine
    comparison on float rendering).

    The multiple COUNT(DISTINCT col) aggregates share one shuffle
    (Spark plans them through a single Expand), so the table is
    scanned once regardless of column count — pinned by
    ``tests/test_ext_operators.py::test_table_profile``. n_distinct
    counts non-null values (COUNT DISTINCT semantics in both
    engines)."""
    from ..sources.tables import _fan_out

    # the multi-distinct Expand multiplies rows by n_cols+1 BEFORE the
    # exchange — CPU-dense enough that an under-split local-fixture
    # scan (single/few rowgroups) serializes it; same guarded fan-out
    # the documents/embeddings loaders use (no-op at cluster scale
    # where real tables have >= parallelism splits)
    df = _fan_out(df.sparkSession, df)
    cols = columns if columns is not None else list(df.columns)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    # intermediate aliases are POSITIONAL (__nulls_0, ...) so hostile
    # column names (embedded backticks/quotes) never reach the
    # generated stack() expression as identifiers; the original name
    # appears only as an escaped string literal
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            # coalesce: SUM over an EMPTY table is NULL, and the
            # profile contract is a zero count, not a null one
            F.coalesce(F.sum(F.col(hygienic_ident(c)).isNull().cast("long")), F.lit(0))
            .alias(f"__nulls_{i}")
        )
        aggs.append(F.count_distinct(F.col(hygienic_ident(c))).alias(f"__dist_{i}"))
        if c in numeric:
            aggs.append(F.min(F.col(hygienic_ident(c))).cast("double").alias(f"__min_{i}"))
            aggs.append(F.max(F.col(hygienic_ident(c))).cast("double").alias(f"__max_{i}"))
    wide = df.agg(*aggs)
    rows = []
    for i, c in enumerate(cols):
        lit = c.replace("\\", "\\\\").replace("'", "\\'")
        mn = f"`__min_{i}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`__max_{i}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        rows.append(
            f"'{lit}', `__n`, `__nulls_{i}`, `__dist_{i}`, {mn}, {mx}"
        )
    stack = ", ".join(rows)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
