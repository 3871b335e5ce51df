"""Unit tests for the type universe — mirrors the reference's
column-mapping contract (H2CsvCreateSink.scala:85-99, validation
:72-80, ColumnTypesNotSupported.scala:24-25)."""

import pytest
from pyspark.sql import types as T

from quasar_destination_h2_spark.errors import ColumnTypesNotSupported
from quasar_destination_h2_spark.types import (
    Column,
    ColumnType,
    TypeOptions,
    column_type_to_spark,
    ensure_valid_columns,
)


def test_supported_mappings_default():
    assert column_type_to_spark(ColumnType.NULL) == T.ByteType()
    assert column_type_to_spark(ColumnType.BOOLEAN) == T.BooleanType()
    assert column_type_to_spark(ColumnType.LOCAL_TIME) == T.StringType()
    assert column_type_to_spark(ColumnType.OFFSET_TIME) == T.StringType()
    assert column_type_to_spark(ColumnType.LOCAL_DATE) == T.DateType()
    assert column_type_to_spark(ColumnType.LOCAL_DATE_TIME) == T.TimestampNTZType()
    assert column_type_to_spark(ColumnType.OFFSET_DATE_TIME) == T.TimestampType()
    assert column_type_to_spark(ColumnType.NUMBER) == T.DecimalType(38, 18)
    assert column_type_to_spark(ColumnType.STRING) == T.StringType()


def test_rejected_types_raise():
    for ct in (ColumnType.OFFSET_DATE, ColumnType.INTERVAL):
        with pytest.raises(ValueError):
            column_type_to_spark(ct)


def test_number_carriers():
    assert column_type_to_spark(
        ColumnType.NUMBER, TypeOptions(number_carrier="double")
    ) == T.DoubleType()
    assert column_type_to_spark(
        ColumnType.NUMBER, TypeOptions(number_carrier="string")
    ) == T.StringType()
    assert column_type_to_spark(
        ColumnType.NUMBER, TypeOptions(decimal_precision=20, decimal_scale=4)
    ) == T.DecimalType(20, 4)
    with pytest.raises(ValueError):
        TypeOptions(number_carrier="float128")


def test_temporal_as_string():
    opts = TypeOptions(temporal_as_string=True)
    for ct in (
        ColumnType.LOCAL_DATE,
        ColumnType.LOCAL_DATE_TIME,
        ColumnType.OFFSET_DATE_TIME,
    ):
        assert column_type_to_spark(ct, opts) == T.StringType()


def test_ensure_valid_columns_aggregates_all_bad_types():
    """Validation collects EVERY offending type, not just the first —
    parity with the ValidatedNel traversal (H2CsvCreateSink.scala:72-80)."""
    cols = [
        Column("a", ColumnType.STRING),
        Column("b", ColumnType.OFFSET_DATE),
        Column("c", ColumnType.INTERVAL),
        Column("d", ColumnType.OFFSET_DATE),
    ]
    with pytest.raises(ColumnTypesNotSupported) as ei:
        ensure_valid_columns(cols)
    assert ei.value.types == ["OffsetDate", "Interval", "OffsetDate"]


def test_empty_schema_rejected():
    """Zero-column tables are unrepresentable (NonEmptyList, §1.1)."""
    with pytest.raises(ColumnTypesNotSupported):
        ensure_valid_columns([])


def test_struct_type_shape():
    st = ensure_valid_columns(
        [Column("x", ColumnType.STRING), Column("y", ColumnType.NUMBER)]
    )
    assert st.fieldNames() == ["x", "y"]
    assert all(f.nullable for f in st.fields)
