"""[EXT] pandas UDF surface (SURVEY §2.2 UDF/UDAF extension).

Two demonstrators with *exact* cross-engine parity so they can be
oracle-checked like everything else:

* scalar ``@pandas_udf`` — Arrow-vectorized per-row compute;
* grouped ``applyInPandas`` — per-group pandas frame compute
  (z-score), using ``math.fsum`` (correctly-rounded sums) so the
  result equals the oracle's exact-decimal-sum formula bit-for-bit.

UDFs are the slow path (the rest of the engine is JVM-side); these
exist to cover the extension surface and to document the pattern for
ops that genuinely need Python.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@F.pandas_udf(LongType())
def vowel_count(texts: pd.Series) -> pd.Series:
    """Arrow-batched scalar UDF: vowels per text (oracle:
    len(regexp_extract_all(text, '[aeiou]')))."""
    return texts.str.count("[aeiou]").astype("int64")


def text_vowel_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar pandas_udf demo over documents."""
    return docs.select(
        "doc_id",
        vowel_count(F.col(text_col)).alias("n_vowels"),
        F.length(text_col).cast("bigint").alias("n_chars_raw"),
    )


ZSCORE_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("z_chars", DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group z-score of n_chars. fsum gives correctly-rounded
    double sums — identical to the oracle's SUM(CAST(x AS DECIMAL))
    cast back to double; inputs are small ints so squares are exact."""
    x = pdf["n_chars"].astype("float64")
    n = len(x)
    if n < 2:
        z = pd.Series([0.0] * n, index=x.index)
    else:
        sx = math.fsum(x)
        sx2 = math.fsum(v * v for v in x)
        mean = sx / n
        var = (sx2 - sx * sx / n) / (n - 1)
        std = math.sqrt(var) if var > 0 else 0.0
        z = (x - mean) / std if std > 0 else pd.Series([0.0] * n, index=x.index)
    return pd.DataFrame(
        {
            "source": pdf["source"],
            "doc_id": pdf["doc_id"],
            "z_chars": z.round(6),
        }
    )


def zscore_by_source(docs: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas demo: z-score of doc length within
    each source. One shuffle on the group key; each group is a single
    pandas frame (fine while groups fit an executor — the standard
    applyInPandas contract)."""
    return docs.select("source", "doc_id", "n_chars").groupBy("source").applyInPandas(
        _zscore_group, schema=ZSCORE_SCHEMA
    )


@F.pandas_udf(DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg pandas_udf (SURVEY §2.2 'pandas_udf
    scalar/grouped-agg'): quantity-weighted mean. fsum sums are
    correctly rounded, matching the oracle's exact-decimal
    SUM(v*w)/SUM(w) after one final double rounding each."""
    sw = math.fsum(weights)
    if sw == 0:
        return float("nan")
    return round(math.fsum(values * weights) / sw, 6)


def weighted_price_by_flag(lineitem: DataFrame) -> DataFrame:
    """Grouped-agg UDF demo: per returnflag, the quantity-weighted
    mean extended price. Spark plans this as a real aggregate (partial
    Arrow batches per partition would break fsum exactness, so Spark
    feeds whole groups — one shuffle on the key, same as any agg)."""
    return (
        lineitem.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")).alias(
                "wavg_price"
            )
        )
    )
