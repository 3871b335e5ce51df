"""CSV wire-format edge cases: quoted embedded newlines (H2 CSVREAD
parity — the splittable scan falls back to whole-file reads), plus a
hypothesis property pinning the write→read round-trip for arbitrary
strings through the exact wire format."""

from __future__ import annotations

import json
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.sources import csv_format
from quasar_destination_h2_spark.types import Column, ColumnType


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


COLS = [Column("x", ColumnType.NUMBER), Column("y", ColumnType.STRING)]


def test_embedded_newline_in_quoted_value(engine):
    csv = b'1,"line1\r\nline2"\r\n2,"say ""hi"""\r\n3,plain\r\n'
    engine.csv_create_sink().consume("/nl_t", COLS, csv)
    rows = sorted((float(r.x), r.y) for r in engine.table("nl_t").collect())
    assert rows == [
        (1.0, "line1\r\nline2"),
        (2.0, 'say "hi"'),
        (3.0, "plain"),
    ]


def test_bare_lf_records_with_embedded_crlf(engine):
    """H2 CSVREAD accepts bare-\\n record separators too; a payload
    mixing them with quoted embedded \\r\\n must not collapse into one
    giant record under the multiLine retry (the retry sniffs the
    terminator instead of hard-coding \\r\\n)."""
    csv = b'1,"a\r\nb"\n2,c\n'
    engine.csv_create_sink().consume("/nl_lf", COLS, csv)
    rows = sorted((float(r.x), r.y) for r in engine.table("nl_lf").collect())
    assert rows == [(1.0, "a\r\nb"), (2.0, "c")]


def test_insert_into_embedded_newline(engine):
    """INSERT append accepts the same embedded-newline payloads as
    consume() — both route through the shared multiLine fallback."""
    engine.csv_create_sink().consume("/nl_ins", COLS, b"1,base\r\n")
    n = engine.insert_into("nl_ins", COLS, b'2,"x\r\ny"\r\n3,z\r\n')
    assert n == 2
    rows = sorted((float(r.x), r.y) for r in engine.table("nl_ins").collect())
    assert rows == [(1.0, "base"), (2.0, "x\r\ny"), (3.0, "z")]


# printable-ish strings incl. quotes, commas, newlines, unicode; no
# NUL (not representable in the wire format) and not all-empty (an
# empty field is NULL by spec, and a lone empty row is dropped).
# Bare CR is excluded: Spark's CSV writer quotes on LF but not on a
# lone CR, which is ambiguous against the \r\n record separator —
# a known wire-format tail limitation (pinned below).
_VALUE = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00\r"
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(_VALUE, min_size=1, max_size=5, unique=True))
def test_csv_roundtrip_property(spark, values):
    """write_csv → read_csv is the identity on arbitrary strings
    (modulo the spec'd empty→NULL rule, excluded by min_size=1)."""
    from pyspark.sql import Row, functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("k", StringType()), StructField("v", StringType())]
    )
    rows = [Row(k=str(i), v=v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, schema)
    out = tempfile.mkdtemp(prefix="csv-prop-") + "/data"
    csv_format.write_csv(df, out)
    back = csv_format.read_csv(spark, out, schema, multiLine="true")
    got = {r.k: r.v for r in back.collect()}
    want = {str(i): v for i, v in enumerate(values)}
    # wire format: whitespace-only values survive quoted; compare raw
    assert got == want


def test_csv_roundtrip_special_values(spark):
    """Deterministic battery for the quoting-sensitive cases."""
    from pyspark.sql import Row
    from pyspark.sql.types import StringType, StructField, StructType

    specials = [
        'quote " inside',
        "comma, inside",
        "newline\ninside",
        "  padded  ",
        "unicode ß 中文 🚀",
        '""',
        ",",
    ]
    schema = StructType(
        [StructField("k", StringType()), StructField("v", StringType())]
    )
    df = spark.createDataFrame(
        [Row(k=str(i), v=v) for i, v in enumerate(specials)], schema
    )
    out = tempfile.mkdtemp(prefix="csv-spec-") + "/data"
    csv_format.write_csv(df, out)
    back = csv_format.read_csv(spark, out, schema, multiLine="true")
    got = {r.k: r.v for r in back.collect()}
    assert got == {str(i): v for i, v in enumerate(specials)}
