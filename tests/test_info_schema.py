"""H2-spelled catalog introspection (info_schema.py): the
INFORMATION_SCHEMA views and SHOW commands every H2/JDBC/BI client
reads on connect through the reference's socket
(H2Server.scala:60-84). Driven through engine.execute_sql — the
exact statement path a wire client's SQL takes."""

from __future__ import annotations

import json

import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType

COLS = [
    Column("id", ColumnType.NUMBER),
    Column("name", ColumnType.STRING),
    Column("flag", ColumnType.BOOLEAN),
    Column("ts", ColumnType.LOCAL_DATE_TIME),
]


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


def test_information_schema_tables_and_columns(engine):
    engine.csv_create_sink().consume("/ist_a", COLS, b"")
    engine.csv_create_sink().consume(
        "/ist_b", [Column("x", ColumnType.STRING)], b""
    )
    df = engine.execute_sql(
        "SELECT TABLE_NAME, TABLE_SCHEMA, TABLE_TYPE, STORAGE_TYPE "
        "FROM INFORMATION_SCHEMA.TABLES "
        "WHERE TABLE_NAME IN ('ist_a', 'ist_b') ORDER BY TABLE_NAME"
    )
    assert [tuple(r) for r in df.collect()] == [
        ("ist_a", "PUBLIC", "TABLE", "PARQUET"),
        ("ist_b", "PUBLIC", "TABLE", "PARQUET"),
    ]
    df = engine.execute_sql(
        "SELECT COLUMN_NAME, ORDINAL_POSITION, TYPE_NAME, DATA_TYPE, "
        "IS_NULLABLE, NULLABLE FROM INFORMATION_SCHEMA.COLUMNS "
        "WHERE TABLE_NAME = 'ist_a' ORDER BY ORDINAL_POSITION"
    )
    rows = [tuple(r) for r in df.collect()]
    # H2 conventions: 1-based ordinals, java.sql.Types codes,
    # YES/NO beside the int NULLABLE
    assert [r[0] for r in rows] == ["id", "name", "flag", "ts"]
    assert [r[1] for r in rows] == [1, 2, 3, 4]
    by_name = {r[0]: r for r in rows}
    assert by_name["name"][2:4] == ("VARCHAR", 12)
    assert by_name["flag"][2:4] == ("BOOLEAN", 16)
    assert by_name["ts"][2:4] == ("TIMESTAMP", 93)
    assert by_name["id"][2] == "DECIMAL" and by_name["id"][3] == 3
    assert all(r[4] == "YES" and r[5] == 1 for r in rows)


def test_information_schema_reflects_ddl(engine):
    """The lazy refresh keeps the views current across catalog
    mutations: create, alter, drop are all visible on the next
    introspecting statement."""
    engine.csv_create_sink().consume(
        "/ist_m", [Column("a", ColumnType.STRING)], b""
    )
    q = (
        "SELECT COUNT(*) AS n FROM INFORMATION_SCHEMA.COLUMNS "
        "WHERE TABLE_NAME = 'ist_m'"
    )
    assert engine.execute_sql(q).collect()[0].n == 1
    engine.execute_sql("ALTER TABLE ist_m ADD COLUMN b DOUBLE")
    assert engine.execute_sql(q).collect()[0].n == 2
    engine.execute_sql("DROP TABLE ist_m")
    assert engine.execute_sql(q).collect()[0].n == 0
    assert (
        engine.execute_sql(
            "SELECT COUNT(*) AS n FROM INFORMATION_SCHEMA.TABLES "
            "WHERE TABLE_NAME = 'ist_m'"
        ).collect()[0].n
        == 0
    )


def test_information_schema_sequences(engine):
    engine.execute_sql("DROP SEQUENCE IF EXISTS isq")
    engine.execute_sql("CREATE SEQUENCE isq START WITH 7 INCREMENT BY 3")
    df = engine.execute_sql(
        "SELECT SEQUENCE_NAME, SEQUENCE_SCHEMA, CURRENT_VALUE, INCREMENT, "
        "IS_CYCLE FROM INFORMATION_SCHEMA.SEQUENCES "
        "WHERE SEQUENCE_NAME = 'ISQ'"
    )
    # H2: unquoted sequence names store uppercased; CURRENT_VALUE is
    # the last DISPENSED value (start - inc before any NEXTVAL)
    assert [tuple(r) for r in df.collect()] == [("ISQ", "PUBLIC", 4, 3, False)]
    engine.execute_sql("SELECT NEXTVAL('isq') AS v").collect()
    df = engine.execute_sql(
        "SELECT CURRENT_VALUE FROM INFORMATION_SCHEMA.SEQUENCES "
        "WHERE SEQUENCE_NAME = 'ISQ'"
    )
    assert df.collect()[0].CURRENT_VALUE == 7
    engine.execute_sql("DROP SEQUENCE isq")
    df = engine.execute_sql(
        "SELECT COUNT(*) AS n FROM INFORMATION_SCHEMA.SEQUENCES "
        "WHERE SEQUENCE_NAME = 'ISQ'"
    )
    assert df.collect()[0].n == 0


def test_show_commands(engine):
    engine.csv_create_sink().consume("/ist_s", COLS, b"")
    df = engine.execute_sql("SHOW TABLES")
    assert df.columns == ["TABLE_NAME", "TABLE_SCHEMA"]
    rows = [tuple(r) for r in df.collect()]
    assert ("ist_s", "PUBLIC") in rows
    assert rows == sorted(rows)
    df = engine.execute_sql("SHOW SCHEMAS")
    assert [r.SCHEMA_NAME for r in df.collect()] == [
        "INFORMATION_SCHEMA",
        "PUBLIC",
    ]
    # SHOW COLUMNS: H2's MySQL-style shape, case-insensitive lookup
    df = engine.execute_sql("SHOW COLUMNS FROM IST_S")
    assert df.columns == ["FIELD", "TYPE", "NULL", "KEY", "DEFAULT"]
    rows = [tuple(r) for r in df.collect()]
    assert rows[0][0] == "id" and rows[0][2] == "YES"
    assert rows[1][1] == "VARCHAR(2147483647)"
    with pytest.raises(ValueError, match="not found"):
        engine.execute_sql("SHOW COLUMNS FROM no_such_table")


def test_information_schema_hostile_names(engine):
    """Catalog entries with hostile characters surface as data, never
    as SQL — the literal-VALUES views must escape them."""
    hostile = "weird'table--x"
    engine.csv_create_sink().consume(
        "/" + hostile, [Column("c", ColumnType.STRING)], b""
    )
    df = engine.execute_sql(
        "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        "WHERE TABLE_NAME LIKE 'weird%'"
    )
    assert [r.TABLE_NAME for r in df.collect()] == [hostile]


def test_information_schema_backslash_names(engine):
    """r10 advisor: the literal-VALUES views are parsed with Spark's
    DEFAULT backslash-escaped string literals, so a catalog name
    carrying backslashes — including a TRAILING one, which would
    otherwise swallow the closing quote and splice the row — must be
    escaped as data, and one hostile name must not poison every
    INFORMATION_SCHEMA statement."""
    hostile = "weird\\table\\"
    engine.csv_create_sink().consume(
        "/" + hostile, [Column("c", ColumnType.STRING)], b""
    )
    names = [
        r.TABLE_NAME
        for r in engine.execute_sql(
            "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES"
        ).collect()
    ]
    assert hostile in names
    cols = [
        (r.TABLE_NAME, r.COLUMN_NAME)
        for r in engine.execute_sql(
            "SELECT TABLE_NAME, COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS"
        ).collect()
    ]
    assert (hostile, "c") in cols
