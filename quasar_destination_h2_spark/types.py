"""The reference's scalar type universe and its Spark mapping.

The reference accepts exactly the ``ColumnType.Scalar`` universe and
maps it to H2 DDL types in one total match
(``H2CsvCreateSink.scala:85-99``); ``OffsetDate`` and ``Interval`` are
rejected, and rejections are *aggregated* across the whole schema
(``:72-80``). This module reproduces that contract on
``pyspark.sql.types``.

Deliberate adaptations (documented, pinned by tests):

* ``LocalTime`` / ``OffsetTime``: Spark has no TIME type. Canonical
  carrier is ISO-8601 ``StringType`` — preserves the reference's
  nanosecond precision (H2 ``TIME(9)``) and ``OffsetTime`` offsets
  losslessly, which a ns-of-day LongType would not for offsets.
* ``LocalDate`` / ``LocalDateTime`` / ``OffsetDateTime``: native
  carriers ``DateType`` / ``TimestampNTZType`` / ``TimestampType`` by
  default. java.time MIN/MAX (year ±999999999, exercised by
  ``TemporalBounds.scala:21-36``) overflow Spark's internal ranges, so
  ``TypeOptions(temporal_as_string=True)`` switches these three to
  ISO-8601 strings for full-range round-trips.
* ``Number``: H2 ``NUMERIC`` is unbounded; Spark decimals cap at 38
  digits. Default carrier is ``DecimalType(38, 18)``;
  ``TypeOptions(number_carrier=...)`` selects ``"decimal"`` /
  ``"double"`` (IEEE range, e.g. ±1.8e308 extremes) / ``"string"``
  (arbitrary precision, e.g. BigDecimal(Long.MaxValue)^5 ≈ 95 digits,
  H2DestinationSpec.scala:245).
* ``Null``: H2 stores a null-only column as TINYINT
  (``H2CsvCreateSink.scala:88``) → ``ByteType`` all-NULL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence

from pyspark.sql import types as T

from .errors import ColumnTypesNotSupported


class ColumnType(str, Enum):
    """Quasar's scalar column types (SURVEY §1.2)."""

    NULL = "Null"
    BOOLEAN = "Boolean"
    LOCAL_TIME = "LocalTime"
    OFFSET_TIME = "OffsetTime"
    LOCAL_DATE = "LocalDate"
    OFFSET_DATE = "OffsetDate"  # rejected (H2CsvCreateSink.scala:93)
    LOCAL_DATE_TIME = "LocalDateTime"
    OFFSET_DATE_TIME = "OffsetDateTime"
    INTERVAL = "Interval"  # rejected (H2CsvCreateSink.scala:96)
    NUMBER = "Number"
    STRING = "String"


#: Types the reference rejects with ColumnTypesNotSupported.
UNSUPPORTED: frozenset[ColumnType] = frozenset(
    {ColumnType.OFFSET_DATE, ColumnType.INTERVAL}
)


@dataclass(frozen=True)
class Column:
    """A named, typed column — mirrors quasar's Column[ColumnType.Scalar]."""

    name: str
    type: ColumnType


@dataclass(frozen=True)
class TypeOptions:
    """Carrier-type choices for the places Spark's type system is
    narrower than H2's (see module docstring)."""

    number_carrier: str = "decimal"  # "decimal" | "double" | "string"
    decimal_precision: int = 38
    decimal_scale: int = 18
    temporal_as_string: bool = False

    def __post_init__(self) -> None:
        if self.number_carrier not in ("decimal", "double", "string"):
            raise ValueError(f"bad number_carrier: {self.number_carrier}")


DEFAULT_OPTIONS = TypeOptions()


def column_type_to_spark(
    ct: ColumnType, options: TypeOptions = DEFAULT_OPTIONS
) -> T.DataType:
    """Map one ColumnType to its Spark carrier.

    Mirrors the total match at ``H2CsvCreateSink.scala:85-99``; raises
    ``ValueError`` for the two rejected members (callers aggregate via
    :func:`ensure_valid_columns`).
    """
    if ct in UNSUPPORTED:
        raise ValueError(f"unsupported column type: {ct.value}")
    if ct is ColumnType.NULL:
        return T.ByteType()  # H2 TINYINT, all-NULL column
    if ct is ColumnType.BOOLEAN:
        return T.BooleanType()
    if ct is ColumnType.LOCAL_TIME or ct is ColumnType.OFFSET_TIME:
        return T.StringType()  # ISO-8601; no Spark TIME type
    if ct is ColumnType.LOCAL_DATE:
        return T.StringType() if options.temporal_as_string else T.DateType()
    if ct is ColumnType.LOCAL_DATE_TIME:
        return T.StringType() if options.temporal_as_string else T.TimestampNTZType()
    if ct is ColumnType.OFFSET_DATE_TIME:
        return T.StringType() if options.temporal_as_string else T.TimestampType()
    if ct is ColumnType.NUMBER:
        if options.number_carrier == "double":
            return T.DoubleType()
        if options.number_carrier == "string":
            return T.StringType()
        return T.DecimalType(options.decimal_precision, options.decimal_scale)
    if ct is ColumnType.STRING:
        return T.StringType()
    raise ValueError(f"unknown column type: {ct!r}")  # pragma: no cover


def ensure_valid_columns(
    columns: Sequence[Column], options: TypeOptions = DEFAULT_OPTIONS
) -> T.StructType:
    """Validate a schema and build its StructType.

    Collects *all* unsupported types before failing, like the
    reference's ``ValidatedNel`` traversal
    (``H2CsvCreateSink.scala:72-80``); empty schemas are
    unrepresentable in the reference (``NonEmptyList``) so they are
    rejected too.
    """
    cols = list(columns)
    if not cols:
        raise ColumnTypesNotSupported(["<empty schema>"])
    bad = [c.type.value for c in cols if c.type in UNSUPPORTED]
    if bad:
        raise ColumnTypesNotSupported(bad)
    return T.StructType(
        [
            T.StructField(c.name, column_type_to_spark(c.type, options), True)
            for c in cols
        ]
    )
