"""End-to-end sink round-trips — the reference's golden-output suite
(H2DestinationSpec.scala:84-288) re-expressed over the Spark sink.

Each test pushes Quasar-wire-format CSV bytes (headerless, ',', '"'
quote+escape, \r\n, UTF-8 — CsvSupport.scala:42-51) through
CsvCreateSink.consume and reads the table back."""

import datetime
import decimal

import pytest

from quasar_destination_h2_spark.errors import (
    ColumnTypesNotSupported,
    NotAResource,
)
from quasar_destination_h2_spark.sources.sink import ensure_valid_table_name
from quasar_destination_h2_spark.types import Column, ColumnType, TypeOptions

S = ColumnType.STRING
N = ColumnType.NUMBER


def csv_bytes(*rows: str) -> bytes:
    return ("\r\n".join(rows) + ("\r\n" if rows else "")).encode("utf-8")


# -- path validation (spec :84-108) -------------------------------------


def test_root_path_rejected():
    with pytest.raises(NotAResource):
        ensure_valid_table_name("/")
    with pytest.raises(NotAResource):
        ensure_valid_table_name([])


def test_multi_segment_path_rejected():
    with pytest.raises(NotAResource):
        ensure_valid_table_name("foo/bar")
    with pytest.raises(NotAResource):
        ensure_valid_table_name(["foo", "bar"])


def test_single_segment_ok():
    assert ensure_valid_table_name("foo") == "foo"
    assert ensure_valid_table_name("/foo") == "foo"
    assert ensure_valid_table_name(["foo"]) == "foo"


# -- F1 simple (spec :110-121) ------------------------------------------


def test_simple_roundtrip(engine):
    sink = engine.csv_create_sink()
    sink.consume("simple", [Column("x", S), Column("y", N)], csv_bytes("s,8"))
    rows = engine.table("simple").collect()
    assert len(rows) == 1
    assert rows[0]["x"] == "s"
    assert rows[0]["y"] == decimal.Decimal("8.000000000000000000")


# -- F2 every supported type (spec :123-144) ------------------------------


def test_all_supported_types(engine):
    cols = [
        Column("boolean", ColumnType.BOOLEAN),
        Column("number", N),
        Column("string", S),
        Column("localtime", ColumnType.LOCAL_TIME),
        Column("offsettime", ColumnType.OFFSET_TIME),
        Column("localdate", ColumnType.LOCAL_DATE),
        Column("localdatetime", ColumnType.LOCAL_DATE_TIME),
        Column("offsetdatetime", ColumnType.OFFSET_DATE_TIME),
    ]
    line = (
        "true,42,foo bar,13:59:58,01:02:03+04:00,2019-12-31,"
        "2019-12-31T23:59:59,2019-12-31T23:59:59+04:00"
    )
    engine.csv_create_sink().consume("supportedtypes", cols, csv_bytes(line))
    r = engine.table("supportedtypes").collect()[0]
    assert r["boolean"] is True
    assert r["number"] == decimal.Decimal(42)
    assert r["string"] == "foo bar"
    assert r["localtime"] == "13:59:58"
    assert r["offsettime"] == "01:02:03+04:00"
    assert r["localdate"] == datetime.date(2019, 12, 31)
    assert r["localdatetime"] == datetime.datetime(2019, 12, 31, 23, 59, 59)
    # session tz = UTC: 23:59:59+04:00 == 19:59:59 UTC
    assert r["offsetdatetime"] == datetime.datetime(2019, 12, 31, 19, 59, 59)


# -- F3/F4 long + unicode strings (spec :146-174) -------------------------


def test_million_char_string(engine):
    big = "q" * 1_000_000
    engine.csv_create_sink().consume("longstrings", [Column("string", S)], csv_bytes(big))
    assert engine.table("longstrings").collect()[0]["string"] == big


def test_unicode_string(engine):
    val = "На берегу пустынных волн"
    engine.csv_create_sink().consume("specialchars", [Column("string", S)], csv_bytes(val))
    assert engine.table("specialchars").collect()[0]["string"] == val


def test_quoted_field_with_comma_and_doubled_quote(engine):
    engine.csv_create_sink().consume(
        "quoting", [Column("x", S), Column("y", N)], csv_bytes('"a,""b""",7')
    )
    r = engine.table("quoting").collect()[0]
    assert r["x"] == 'a,"b"'
    assert r["y"] == decimal.Decimal(7)


# -- F5 injection hardening (spec :176-207) --------------------------------


def test_hostile_table_name(engine):
    hostile = "foobar; drop table really_important; create table haha"
    engine.csv_create_sink().consume(hostile, [Column("x", N)], csv_bytes("1"))
    assert engine.table(hostile).collect()[0]["x"] == decimal.Decimal(1)


def test_hostile_table_name_with_quotes(engine):
    hostile = 'the "table" name'
    engine.csv_create_sink().consume(hostile, [Column("x", N)], csv_bytes("2"))
    assert engine.table(hostile).collect()[0]["x"] == decimal.Decimal(2)


def test_hostile_column_names(engine):
    c1 = "from nowhere; drop table super_mission_critical; select *"
    c2 = 'the "column" name'
    engine.csv_create_sink().consume(
        "hostilecols", [Column(c1, N), Column(c2, N)], csv_bytes("42,76")
    )
    r = engine.table("hostilecols").collect()[0]
    assert r[c1] == decimal.Decimal(42)
    assert r[c2] == decimal.Decimal(76)


# -- F6 empty input (spec :210-219) ----------------------------------------


def test_empty_input_creates_empty_table(engine):
    cols = [Column("a", S), Column("b", N), Column("c", ColumnType.LOCAL_DATE)]
    engine.csv_create_sink().consume("emptyinput", cols, b"")
    df = engine.table("emptyinput")
    assert df.count() == 0
    assert df.columns == ["a", "b", "c"]


# -- F7 multirow (spec :221-224) --------------------------------------------


def test_multirow(engine):
    cols = [Column("foo", N), Column("bar", S), Column("quux", N)]
    engine.csv_create_sink().consume(
        "multirow", cols, csv_bytes("1,baz1,34.34234", "2,baz2,35.34234", "3,baz3,36.34234")
    )
    rows = sorted(engine.table("multirow").collect(), key=lambda r: r["foo"])
    assert [r["bar"] for r in rows] == ["baz1", "baz2", "baz3"]
    assert rows[2]["quux"] == decimal.Decimal("36.34234")


# -- F8 overwrite (spec :226-237) -------------------------------------------


def test_overwrite_replaces_schema_and_data(engine):
    sink = engine.csv_create_sink()
    sink.consume(
        "overwrite",
        [Column("x", N), Column("y", S), Column("z", N)],
        csv_bytes("1,two,3.00001"),
    )
    assert engine.table("overwrite").columns == ["x", "y", "z"]
    sink.consume("overwrite", [Column("a", S), Column("c", S)], csv_bytes("b,d"))
    df = engine.table("overwrite")
    assert df.columns == ["a", "c"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["a"] == "b" and rows[0]["c"] == "d"


# -- F9 per-type extremes (spec :239-288) ------------------------------------


def test_roundtrip_integer_extremes(engine):
    sink = engine.csv_create_sink()
    sink.consume(
        "rt_long",
        [Column("min", N), Column("max", N)],
        csv_bytes("-9223372036854775808,9223372036854775807"),
    )
    r = engine.table("rt_long").collect()[0]
    assert r["min"] == decimal.Decimal("-9223372036854775808")
    assert r["max"] == decimal.Decimal("9223372036854775807")


def test_roundtrip_double_extremes_double_carrier(engine):
    from quasar_destination_h2_spark.sources.sink import CsvCreateSink

    sink = CsvCreateSink(engine.spark, TypeOptions(number_carrier="double"))
    sink.consume(
        "rt_double",
        [Column("min", N), Column("max", N)],
        csv_bytes("-1.7976931348623157E308,1.7976931348623157E308"),
    )
    import sys

    r = sink.table("rt_double").collect()[0]
    assert r["min"] == -sys.float_info.max
    assert r["max"] == sys.float_info.max


def test_roundtrip_bigdecimal_string_carrier(engine):
    """BigDecimal(Long.MaxValue)^5 ≈ 95 digits (spec :245) — beyond
    DecimalType(38); string carrier preserves it exactly."""
    from quasar_destination_h2_spark.sources.sink import CsvCreateSink

    big = str(9223372036854775807**5)
    sink = CsvCreateSink(engine.spark, TypeOptions(number_carrier="string"))
    sink.consume("rt_bigdecimal", [Column("value", N)], csv_bytes(big))
    assert sink.table("rt_bigdecimal").collect()[0]["value"] == big
    assert int(sink.table("rt_bigdecimal").collect()[0]["value"]) == 9223372036854775807**5


def test_roundtrip_time_bounds(engine):
    """LocalTime/OffsetTime MIN/MAX (TemporalBounds.scala:22-32) —
    string carrier keeps ns precision H2 TIME(9) has."""
    sink = engine.csv_create_sink()
    sink.consume(
        "rt_localtime",
        [Column("min", ColumnType.LOCAL_TIME), Column("max", ColumnType.LOCAL_TIME)],
        csv_bytes("00:00,23:59:59.999999999"),
    )
    r = engine.table("rt_localtime").collect()[0]
    assert r["min"] == "00:00" and r["max"] == "23:59:59.999999999"
    sink.consume(
        "rt_offsettime",
        [Column("min", ColumnType.OFFSET_TIME), Column("max", ColumnType.OFFSET_TIME)],
        csv_bytes("00:00+18:00,23:59:59.999999999-18:00"),
    )
    r = engine.table("rt_offsettime").collect()[0]
    assert r["min"] == "00:00+18:00" and r["max"] == "23:59:59.999999999-18:00"


def test_roundtrip_date_bounds_string_carrier(engine):
    """LocalDate.MIN/MAX (year ±999999999) overflow Spark DateType —
    temporal_as_string carries them losslessly (SURVEY §7)."""
    from quasar_destination_h2_spark.sources.sink import CsvCreateSink

    sink = CsvCreateSink(engine.spark, TypeOptions(temporal_as_string=True))
    sink.consume(
        "rt_localdate",
        [Column("min", ColumnType.LOCAL_DATE), Column("max", ColumnType.LOCAL_DATE)],
        csv_bytes("-999999999-01-01,+999999999-12-31"),
    )
    r = sink.table("rt_localdate").collect()[0]
    assert r["min"] == "-999999999-01-01" and r["max"] == "+999999999-12-31"


# -- F10 empty string -> NULL (spec :253-263) ---------------------------------


def test_empty_fields_load_as_null(engine):
    engine.csv_create_sink().consume(
        "emptynull", [Column("x", S), Column("y", S)], csv_bytes(",")
    )
    r = engine.table("emptynull").collect()[0]
    assert r["x"] is None and r["y"] is None


def test_all_empty_single_column_row_dropped(engine):
    """A single-column all-empty row is a blank CSV line — not loaded
    (comment at spec :256-257)."""
    engine.csv_create_sink().consume(
        "blankline", [Column("x", S)], csv_bytes("a", "", "b")
    )
    vals = sorted(r["x"] for r in engine.table("blankline").collect())
    assert vals == ["a", "b"]


# -- F11 negatives -------------------------------------------------------------


def test_unsupported_types_rejected_aggregated(engine):
    with pytest.raises(ColumnTypesNotSupported) as ei:
        engine.csv_create_sink().consume(
            "bad",
            [
                Column("a", ColumnType.OFFSET_DATE),
                Column("b", S),
                Column("c", ColumnType.INTERVAL),
            ],
            b"",
        )
    assert ei.value.types == ["OffsetDate", "Interval"]


def test_bad_path_rejected_by_sink(engine):
    with pytest.raises(NotAResource):
        engine.csv_create_sink().consume("a/b", [Column("x", S)], b"x")
