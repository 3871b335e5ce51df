"""The CSV wire format (SURVEY §1.3) as Spark reader/writer options.

Quasar renders results as headerless CSV: ``,`` delimiter, ``"`` quote
and escape (doubled quotes), ``\\r\\n`` line ends, minimal quoting,
UTF-8 (``CsvSupport.scala:42-51``, ``package.scala:35``); H2 reads it
back with ``CSVREAD(..., 'charset=UTF-8')`` where an empty field
loads as SQL NULL and an all-empty single-column row is a blank line
and not loaded at all (``H2DestinationSpec.scala:253-263``).

Temporal values are ISO-8601 with a ``T`` separator
(``CsvSupport.scala:96-103``) — Spark's default timestamp patterns
parse these, and we pin the formats explicitly so behavior can't
drift with Spark defaults.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Reader options replicating H2 CSVREAD semantics on Quasar CSV.
CSV_READ_OPTIONS: dict[str, str] = {
    "header": "false",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "encoding": "UTF-8",
    "nullValue": "",  # empty field -> SQL NULL (spec :253-263)
    "emptyValue": "",
    "mode": "FAILFAST",  # schema is externally supplied; bad rows are errors
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][XXX][X]",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]",
    "dateFormat": "yyyy-MM-dd",
    # NOTE multiLine defaults to false: the splittable line-oriented
    # scan is the 100 TB path. Values containing quoted embedded
    # newlines (legal in the wire format, loaded fine by H2 CSVREAD)
    # make that scan fail — the sink catches the parse failure and
    # retries with multiLine=true (whole-file reads; correct, slower).
}

#: Writer options replicating Quasar's renderer (CsvSupport.scala:42-51).
CSV_WRITE_OPTIONS: dict[str, str] = {
    "header": "false",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "encoding": "UTF-8",
    "lineSep": "\r\n",
    "quoteAll": "false",  # minimal quoting
    "emptyValue": '""',
    "nullValue": "",
    # Spark's CSV WRITER trims cell whitespace by default — the
    # reference renderer writes values verbatim (found by the
    # hypothesis round-trip property: " " must not become NULL).
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "dateFormat": "yyyy-MM-dd",
}


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, **overrides: str
) -> DataFrame:
    """Scan a Quasar-format CSV with an externally supplied schema.

    The explicit schema (schema-on-write, §1.1 — never inferred) plus
    FAILFAST reproduces H2 CSVREAD's typed load; the scan is
    splittable and streams, so memory stays O(partition) at any scale.
    """
    opts = {**CSV_READ_OPTIONS, **overrides}
    return spark.read.options(**opts).schema(schema).csv(path)


def write_csv(df: DataFrame, path: str, **overrides: str) -> None:
    """Export a DataFrame in the exact Quasar CSV wire format —
    parity with the reference's encoder (CsvSupport.scala:84-116)."""
    opts = {**CSV_WRITE_OPTIONS, **overrides}
    df.write.mode("overwrite").options(**opts).csv(path)
