"""[EXT] JSONL (newline-delimited JSON) source/sink — the lingua
franca interchange format of LLM training-data pipelines (every
public corpus release and every tokenizer/trainer ingest path speaks
it). The reference's own wire format is CSV (csv_format.py); JSONL is
the extension format the 100 TB pipeline needs next to it.

Spark-first and scale-safe by construction:

* **Write**: ``df.write.json`` — one JSON object per line, written in
  parallel by every task, splittable on read (optionally gzip
  per-file via codec; gzip files are NOT splittable — documented
  trade, default off).
* **Read**: an EXPLICIT schema is REQUIRED. ``inferSchema`` over
  100 TB is a full extra pass before the first real job, and worse,
  the inferred types follow whichever files the sampler saw —
  non-deterministic under file additions. The loader takes a
  ``StructType`` (or a reference table to borrow the schema from)
  and sets ``mode=FAILFAST`` so a corrupt line fails the job instead
  of silently nulling a column (PERMISSIVE's default), matching the
  sink's everything-or-nothing load discipline
  (``H2CsvCreateSink.scala:42`` semantics).

JSON escaping handles embedded newlines/quotes/unicode in text
columns by definition — no record-terminator sniffing like the CSV
path needs (pinned by the hostile-content round-trip test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame, path: str, compression: "str | None" = None
) -> None:
    """Write ``df`` as JSONL under ``path`` (one object per line, one
    file per task — parallel, no driver funnel). ``compression``:
    None (splittable, the 100 TB default) or a Spark codec name
    ("gzip" trades splittability for size — right only for
    cold-archive exports)."""
    w = df.write.mode("overwrite")
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Read a JSONL directory with an EXPLICIT schema, FAILFAST on
    corrupt records (see module docstring for why inference and
    PERMISSIVE are both wrong at scale)."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(path)
    )


def jsonl_roundtrip_schema(df: DataFrame) -> StructType:
    """The schema to hand read_jsonl for a frame produced by
    write_jsonl(df): identical to df's, except JSON has no
    timestamp type — Spark writes timestamps as ISO strings and
    reads them back under the session timezone, which is lossless
    only when both ends pin the same zone (the engine pins UTC in
    DEFAULT_SPARK_CONF)."""
    return df.schema
