"""H2 CSVREAD/CSVWRITE table functions at the statement surface
(csv_table_funcs.py). Reference anchor: H2 1.4.200 CSV functions
reachable through the reference's socket (H2Server.scala:60-84); the
reference's own spec reloads sink output with
CSVREAD(..., 'charset=UTF-8') (H2DestinationSpec.scala:253)."""

from __future__ import annotations

import json
import os

import pytest

from quasar_destination_h2_spark.csv_table_funcs import parse_csv_options
from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


def _write(tmp_path, name: str, text: str, encoding="utf-8") -> str:
    p = os.path.join(str(tmp_path), name)
    with open(p, "w", encoding=encoding, newline="") as f:
        f.write(text)
    return p


# ---------------------------------------------------------------- options


def test_option_string_parses_h2_forms():
    assert parse_csv_options(None) == {}
    assert parse_csv_options("UTF-8") == {"charset": "UTF-8"}  # legacy
    assert parse_csv_options("charset=UTF-8 fieldSeparator=|") == {
        "charset": "UTF-8",
        "fieldseparator": "|",
    }
    with pytest.raises(ValueError, match="unknown CSV option"):
        parse_csv_options("fieldSeperator=|")  # typo must be LOUD
    with pytest.raises(ValueError, match="unparseable"):
        parse_csv_options("charset=UTF-8 ???")


# ---------------------------------------------------------------- CSVREAD


def test_csvread_header_all_varchar_uppercase(engine, tmp_path):
    p = _write(tmp_path, "t.csv", "id,name\n1,alice\n2,bob\n")
    df = engine.execute_sql(f"SELECT * FROM CSVREAD('{p}') ORDER BY ID")
    # H2: names from the first line, UPPERCASED, every column VARCHAR
    assert df.columns == ["ID", "NAME"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]
    assert [(r.ID, r.NAME) for r in df.collect()] == [("1", "alice"), ("2", "bob")]


def test_csvread_explicit_columns_first_line_is_data(engine, tmp_path):
    p = _write(tmp_path, "t.csv", "1,alice\n2,bob\n")
    df = engine.execute_sql(
        f"SELECT ID, NAME FROM CSVREAD('{p}', 'id,name') ORDER BY ID"
    )
    assert df.count() == 2  # first line loaded as DATA
    assert df.columns == ["ID", "NAME"]


def test_csvread_case_sensitive_option_keeps_names(engine, tmp_path):
    p = _write(tmp_path, "t.csv", "Id,Name\n1,a\n")
    df = engine.execute_sql(
        f"SELECT * FROM CSVREAD('{p}', NULL, 'caseSensitiveColumnNames=true')"
    )
    assert df.columns == ["Id", "Name"]


def test_csvread_separator_null_token_and_trim(engine, tmp_path):
    p = _write(tmp_path, "t.csv", "a|b\n x |\\N\n")
    df = engine.execute_sql(
        f"SELECT * FROM CSVREAD('{p}', NULL, 'fieldSeparator=| null=\\N')"
    )
    row = df.collect()[0]
    assert row.A == "x"  # H2 default: unquoted whitespace trimmed
    assert row.B is None  # the null token loads as SQL NULL
    p2 = _write(tmp_path, "t2.csv", "a|b\n x |y\n")
    df2 = engine.execute_sql(
        f"SELECT * FROM CSVREAD('{p2}', NULL, "
        f"'fieldSeparator=| preserveWhitespace=true')"
    )
    assert df2.collect()[0].A == " x "


def test_csvread_in_subquery_join_and_insert_source(engine, tmp_path):
    p = _write(tmp_path, "dim.csv", "k,label\n1,one\n2,two\n")
    engine.csv_create_sink().consume(
        "/ctf_t",
        [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
        b"1,a\r\n2,b\r\n3,c\r\n",
    )
    physical = engine.sink.catalog["ctf_t"]
    df = engine.execute_sql(
        f"SELECT t.v, d.LABEL FROM {physical} t "
        f"JOIN CSVREAD('{p}') d ON CAST(d.K AS DOUBLE) = t.k "
        "ORDER BY t.v"
    )
    assert [(r.v, r.LABEL) for r in df.collect()] == [("a", "one"), ("b", "two")]
    # INSERT ... SELECT FROM CSVREAD (table-function as a DML source)
    n = engine.execute_sql(
        "INSERT INTO ctf_t (k, v) "
        f"SELECT CAST(K AS DOUBLE) + 10, LABEL FROM CSVREAD('{p}')"
    )
    assert n == 2
    assert engine.table("ctf_t").count() == 5


def test_csvread_literal_and_injection_guards(engine, tmp_path):
    with pytest.raises(ValueError, match="string literals"):
        engine.execute_sql("SELECT * FROM CSVREAD(some_ident)")
    with pytest.raises(ValueError, match="must not be NULL"):
        engine.execute_sql("SELECT * FROM CSVREAD(NULL)")
    # CSVREAD inside a string literal is never rewritten
    df = engine.execute_sql("SELECT 'use CSVREAD(x)' AS s")
    assert df.collect()[0].s == "use CSVREAD(x)"


def test_csvread_scan_is_lazy_pushdown_file_scan(engine, tmp_path):
    """The 100 TB posture: a CSVREAD view is a splittable FileScan csv
    with the projection pruned into the scan, not an eager load."""
    p = _write(tmp_path, "t.csv", "a,b,c\n1,2,3\n4,5,6\n")
    df = engine.execute_sql(f"SELECT A FROM CSVREAD('{p}') WHERE B = '2'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan csv" in plan
    # projection pruned into the scan (c never read; names are the
    # file's pre-rename spelling at the scan) and the filter pushed
    assert "ReadSchema: struct<a:string,b:string>" in plan
    assert "PushedFilters: [IsNotNull(b), EqualTo(b,2)]" in plan


# --------------------------------------------------------------- CSVWRITE


def test_csvwrite_roundtrip_header_count_and_null(engine, tmp_path):
    engine.csv_create_sink().consume(
        "/ctw_t",
        [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)],
        b"1,a\r\n2,\r\n3,c\r\n",  # row 2: empty field -> SQL NULL
    )
    out = os.path.join(str(tmp_path), "out.csv")
    physical = engine.sink.catalog["ctw_t"]
    n = engine.execute_sql(
        f"CALL CSVWRITE('{out}', 'SELECT k, v FROM {physical} ORDER BY k', "
        f"'null=\\N')"
    )
    assert n == 3  # H2 returns the written row count
    text = open(out, encoding="utf-8").read()
    lines = text.strip().split("\n")
    assert lines[0] == "K,V"  # writeColumnHeader default true
    assert lines[2].endswith("\\N")  # NULL written as the null token
    # ... and CSVREAD loads it back with the same option
    df = engine.execute_sql(
        f"SELECT * FROM CSVREAD('{out}', NULL, 'null=\\N') ORDER BY K"
    )
    got = [(float(r.K), r.V) for r in df.collect()]
    assert got == [(1.0, "a"), (2.0, None), (3.0, "c")]


def test_csvwrite_no_header_separator_one_file(engine, tmp_path):
    engine.csv_create_sink().consume(
        "/ctw_u", [Column("x", ColumnType.STRING)], b"p\r\nq\r\n"
    )
    out = os.path.join(str(tmp_path), "u.csv")
    physical = engine.sink.catalog["ctw_u"]
    n = engine.execute_sql(
        f"CALL CSVWRITE('{out}', 'SELECT x FROM {physical} ORDER BY x', "
        f"'writeColumnHeader=false fieldSeparator=|')"
    )
    assert n == 2
    assert os.path.isfile(out)  # ONE file, like H2
    assert open(out, encoding="utf-8").read() == "p\nq\n"


def test_csvwrite_query_uses_statement_surface(engine, tmp_path):
    """The embedded query runs through execute_sql: H2 grammar
    (SELECT TOP, CASEWHEN) works inside CSVWRITE."""
    engine.csv_create_sink().consume(
        "/ctw_v", [Column("k", ColumnType.NUMBER)], b"1\r\n2\r\n3\r\n"
    )
    out = os.path.join(str(tmp_path), "v.csv")
    physical = engine.sink.catalog["ctw_v"]
    n = engine.execute_sql(
        f"CALL CSVWRITE('{out}', 'SELECT TOP 2 k, "
        f"CASEWHEN(k = 1, ''one'', ''other'') AS w "
        f"FROM {physical} ORDER BY k')"
    )
    assert n == 2
    lines = open(out, encoding="utf-8").read().strip().split("\n")
    assert lines[0] == "K,W"
    assert [ln.split(",")[1] for ln in lines[1:]] == ["one", "other"]
    assert [float(ln.split(",")[0]) for ln in lines[1:]] == [1.0, 2.0]


def test_call_expression_form(engine):
    # H2's CALL <expr> evaluates to a one-row result
    df = engine.execute_sql("CALL 1 + 1")
    assert df.collect()[0][0] == 2
