"""H2 SCRIPT / RUNSCRIPT / EXPLAIN statement surface + logical-name
resolution at execute_sql (script_stmt.py, sql_dml._resolve_sql).

The reference's users reach H2's script machinery through its socket
(H2Server.scala:60-84), and the reference itself boots through
h2.RunScript.execute (H2Server.scala:51)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    eng.execute_sql("DROP ALL OBJECTS")
    return eng


def _load(engine, path, cols, rows=b""):
    engine.csv_create_sink().consume(path, cols, rows)


def test_script_nodata_emits_recreating_ddl(engine):
    _load(
        engine,
        "/scr_a",
        [Column("id", ColumnType.NUMBER), Column("name", ColumnType.STRING)],
    )
    engine.execute_sql("DROP SEQUENCE IF EXISTS scr_seq")
    engine.execute_sql(
        "CREATE SEQUENCE scr_seq START WITH 5 INCREMENT BY 5 "
        "MAXVALUE 1000 CYCLE"
    )
    engine.execute_sql("SELECT NEXTVAL('scr_seq') AS v").collect()
    out = engine.execute_sql("SCRIPT NODATA")
    assert out.columns == ["SCRIPT"]
    lines = [r.SCRIPT for r in out.collect()]
    assert (
        'CREATE SEQUENCE "scr_seq" START WITH 10 INCREMENT BY 5 '
        "MINVALUE 1 MAXVALUE 1000 CYCLE;" in lines
    )
    assert (
        'CREATE CACHED TABLE "scr_a"("id" DECIMAL(38,18), '
        '"name" VARCHAR);' in lines
    )
    # sequences come first (restore order), then tables, both sorted
    kinds = ["SEQ" if "SEQUENCE" in ln else "TAB" for ln in lines]
    assert kinds == sorted(kinds, key=lambda k: k != "SEQ")


def test_script_roundtrip_restores_schema_and_sequence_position(engine):
    # SCRIPT dumps the WHOLE engine catalog — start from a clean one
    # so the restore below re-creates exactly this test's objects
    engine.execute_sql("DROP ALL OBJECTS")
    _load(
        engine,
        "/scr_rt",
        [
            Column("id", ColumnType.NUMBER),
            Column("flag", ColumnType.BOOLEAN),
            Column("ts", ColumnType.LOCAL_DATE_TIME),
        ],
    )
    engine.execute_sql("DROP SEQUENCE IF EXISTS scr_rt_seq")
    engine.execute_sql("CREATE SEQUENCE scr_rt_seq START WITH 7")
    engine.execute_sql("SELECT NEXTVAL('scr_rt_seq') AS v").collect()
    f = os.path.join(tempfile.mkdtemp(), "dump.sql")
    returned = [
        r.SCRIPT
        for r in engine.execute_sql(f"SCRIPT NODATA TO '{f}'").collect()
    ]
    assert open(f).read().splitlines() == returned
    before = [
        (fld.name, fld.dataType.simpleString())
        for fld in engine.table("scr_rt").schema.fields
    ]
    engine.execute_sql("DROP TABLE scr_rt")
    engine.execute_sql("DROP SEQUENCE scr_rt_seq")
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    after = [
        (fld.name, fld.dataType.simpleString())
        for fld in engine.table("scr_rt").schema.fields
    ]
    assert after == before
    assert engine.table("scr_rt").count() == 0  # NODATA: schema only
    # the restored sequence dispenses exactly where the old one would
    assert (
        engine.execute_sql("SELECT NEXTVAL('scr_rt_seq') AS v")
        .collect()[0]
        .v
        == 8
    )


def test_script_without_nodata_and_unknown_options_raise(engine):
    with pytest.raises(ValueError, match="NODATA"):
        engine.execute_sql("SCRIPT")
    with pytest.raises(ValueError, match="unsupported option"):
        engine.execute_sql("SCRIPT NODATA COMPRESSION ZIP")
    with pytest.raises(ValueError, match="unsupported option"):
        engine.execute_sql("RUNSCRIPT FROM '/tmp/x.sql' COMPRESSION ZIP")


def test_script_rejects_complex_typed_columns(engine, spark):
    engine.create_table_as(
        "scr_vec",
        spark.range(1).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
        ),
    )
    try:
        with pytest.raises(ValueError, match="cannot express"):
            engine.execute_sql("SCRIPT NODATA")
    finally:
        engine.drop_table_if_exists("scr_vec")


def test_create_cached_table_lands_in_engine_catalog(engine):
    engine.execute_sql("DROP TABLE IF EXISTS scr_cc")
    engine.execute_sql(
        'CREATE CACHED TABLE "scr_cc"("a" INTEGER NOT NULL, '
        '"b" VARCHAR(40), "c" DECIMAL(10,2))'
    )
    schema = engine.table("scr_cc").schema
    assert [(f.name, f.dataType.simpleString()) for f in schema.fields] == [
        ("a", "int"),
        ("b", "string"),
        ("c", "decimal(10,2)"),
    ]
    # r11: PRIMARY KEY is accepted-and-recorded (constraints.py);
    # r12: CHECK is accepted-and-enforced; r13: FK accept-and-record
    engine.execute_sql("DROP TABLE IF EXISTS scr_pk")
    engine.execute_sql("CREATE CACHED TABLE scr_pk(a INT, PRIMARY KEY (a))")
    assert [
        (e["type"], e["columns"])
        for e in engine.constraints.for_table("scr_pk")
    ] == [("PRIMARY KEY", ["a"])]
    engine.execute_sql("DROP TABLE IF EXISTS scr_ck")
    engine.execute_sql("CREATE CACHED TABLE scr_ck(a INT, CHECK (a > 0))")
    assert [
        e["type"] for e in engine.constraints.for_table("scr_ck")
    ] == ["CHECK"]
    # r13: FOREIGN KEY is accept-and-record, but DDL validation
    # still rejects a reference to a table that does not exist
    with pytest.raises(ValueError, match="referenced table not found"):
        engine.execute_sql(
            "CREATE CACHED TABLE scr_fk(a INT, "
            "FOREIGN KEY (a) REFERENCES other(b))"
        )
    engine.drop_table_if_exists("scr_pk")
    engine.drop_table_if_exists("scr_ck")
    engine.drop_table_if_exists("scr_cc")


def test_explain_returns_one_plan_row(engine):
    _load(engine, "/scr_ex", [Column("x", ColumnType.NUMBER)])
    rows = engine.execute_sql(
        "EXPLAIN SELECT COUNT(*) AS n FROM scr_ex"
    ).collect()
    assert len(rows) == 1 and rows[0].__fields__ == ["PLAN"]
    assert "Physical Plan" in rows[0].PLAN or "Scan" in rows[0].PLAN
    # ANALYZE executes first and explains the final plan
    rows = engine.execute_sql(
        "EXPLAIN ANALYZE SELECT COUNT(*) AS n FROM scr_ex"
    ).collect()
    assert len(rows) == 1
    # H2's PLAN FOR spelling
    rows = engine.execute_sql(
        "EXPLAIN PLAN FOR SELECT 1 AS one"
    ).collect()
    assert len(rows) == 1


def test_explain_rejects_dml_and_sequence_functions(engine):
    with pytest.raises(ValueError, match="query statements"):
        engine.execute_sql("EXPLAIN UPDATE scr_ex SET x = 1")
    engine.execute_sql("DROP SEQUENCE IF EXISTS scr_ex_seq")
    engine.execute_sql("CREATE SEQUENCE scr_ex_seq")
    with pytest.raises(ValueError, match="ALLOCATES"):
        engine.execute_sql("EXPLAIN SELECT NEXTVAL('scr_ex_seq') AS v")
    engine.execute_sql("DROP SEQUENCE scr_ex_seq")


def test_logical_name_resolution_in_plain_queries(engine):
    """H2 parity: SELECT by the LOADED name works even though the
    engine stores hostile-hygiene physical names — and a resolvable
    session name is never shadowed."""
    _load(
        engine,
        "/scr_sel",
        [Column("id", ColumnType.NUMBER), Column("s", ColumnType.STRING)],
        b"1,x\r\n2,y\r\n",
    )
    assert (
        engine.execute_sql("SELECT COUNT(*) AS n FROM scr_sel")
        .collect()[0]
        .n
        == 2
    )
    # multi-table: both names resolve in one statement
    _load(
        engine,
        "/scr_sel2",
        [Column("id", ColumnType.NUMBER)],
        b"1\r\n",
    )
    assert (
        engine.execute_sql(
            "SELECT COUNT(*) AS n FROM scr_sel a JOIN scr_sel2 b "
            "ON a.id = b.id"
        )
        .collect()[0]
        .n
        == 1
    )
    # INSERT ... SELECT across two logical names
    engine.execute_sql(
        "INSERT INTO scr_sel2 SELECT id FROM scr_sel WHERE id = 2"
    )
    assert engine.table("scr_sel2").count() == 2
    # the bind is transient: no temp view lingers to shadow later
    # same-name session objects
    assert not engine.spark.catalog.tableExists("scr_sel")


def test_resolution_does_not_shadow_existing_views(engine, spark):
    spark.range(5).toDF("id").createOrReplaceTempView("scr_shadow")
    _load(
        engine,
        "/scr_shadow",
        [Column("id", ColumnType.NUMBER)],
        b"1\r\n",
    )
    try:
        # the session view wins: it resolved, so it is never shadowed
        assert (
            engine.execute_sql("SELECT COUNT(*) AS n FROM scr_shadow")
            .collect()[0]
            .n
            == 5
        )
    finally:
        spark.catalog.dropTempView("scr_shadow")
        engine.drop_table_if_exists("scr_shadow")


def test_script_table_scoping(engine):
    """H2's SCRIPT ... TABLE t1, t2: only the named tables are
    dumped, sequences are omitted (H2 behavior), unknown names
    raise."""
    _load(engine, "/scr_t1", [Column("a", ColumnType.NUMBER)])
    _load(engine, "/scr_t2", [Column("b", ColumnType.STRING)])
    engine.execute_sql("DROP SEQUENCE IF EXISTS scr_t_seq")
    engine.execute_sql("CREATE SEQUENCE scr_t_seq")
    lines = [
        r.SCRIPT
        for r in engine.execute_sql(
            "SCRIPT NODATA TABLE scr_t1, scr_t2"
        ).collect()
    ]
    assert lines == [
        'CREATE CACHED TABLE "scr_t1"("a" DECIMAL(38,18));',
        'CREATE CACHED TABLE "scr_t2"("b" VARCHAR);',
    ]
    with pytest.raises(ValueError, match="table not found"):
        engine.execute_sql("SCRIPT NODATA TABLE no_such_table")
    engine.execute_sql("DROP SEQUENCE scr_t_seq")


def test_timestamp_with_time_zone_round_trips(engine, spark):
    """The H2 wall-clock/instant distinction survives the dump:
    timestamp_ntz emits TIMESTAMP, timestamp emits TIMESTAMP WITH
    TIME ZONE, and RUNSCRIPT restores both exactly."""
    engine.create_table_as(
        "scr_tz",
        spark.sql(
            "SELECT TIMESTAMP'2024-01-01 00:00:00' AS t_instant, "
            "TIMESTAMP_NTZ'2024-01-01 00:00:00' AS t_wall"
        ).limit(0),
    )
    lines = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE scr_tz").collect()
    ]
    assert lines == [
        'CREATE CACHED TABLE "scr_tz"("t_instant" TIMESTAMP WITH TIME '
        'ZONE, "t_wall" TIMESTAMP);'
    ]
    engine.execute_sql("DROP TABLE scr_tz")
    engine.execute_sql(lines[0].rstrip(";"))
    assert [
        (f.name, f.dataType.simpleString())
        for f in engine.table("scr_tz").schema.fields
    ] == [("t_instant", "timestamp"), ("t_wall", "timestamp_ntz")]
    engine.drop_table_if_exists("scr_tz")


def test_script_quotes_hostile_identifiers(engine, spark):
    """A logical name/column containing double quotes dumps with
    H2's doubled-quote escaping and restores through RUNSCRIPT —
    hostile identifiers are a first-class repo theme."""
    name = 'scr "odd" nm'
    engine.drop_table_if_exists(name)
    engine.create_table_as(
        name, spark.sql('SELECT CAST(1 AS INT) AS `a "q" col`').limit(0)
    )
    lines = [
        r.SCRIPT
        for r in engine.execute_sql(
            'SCRIPT NODATA TABLE "scr ""odd"" nm"'
        ).collect()
    ]
    assert lines == [
        'CREATE CACHED TABLE "scr ""odd"" nm"("a ""q"" col" INTEGER);'
    ]
    engine.drop_table_if_exists(name)
    engine.execute_sql(lines[0].rstrip(";"))
    assert [f.name for f in engine.table(name).schema.fields] == [
        'a "q" col'
    ]
    engine.drop_table_if_exists(name)


def test_explain_rejects_csvwrite_side_effect(engine, spark):
    """EXPLAIN never executes: CSVWRITE (a file-writing CALL) is
    rejected BEFORE its export runs — the same no-side-effect
    contract as the NEXTVAL guard."""
    import os
    import tempfile

    out = os.path.join(tempfile.mkdtemp(), "never_written.csv")
    spark.range(3).toDF("x").createOrReplaceTempView("scr_ev")
    with pytest.raises(ValueError, match="side effect"):
        engine.execute_sql(
            f"EXPLAIN CALL CSVWRITE('{out}', 'SELECT x FROM scr_ev')"
        )
    assert not os.path.exists(out)


def test_exhausted_sequence_round_trips(engine):
    """r10 advisor: an EXHAUSTED sequence's next value sits past
    MAXVALUE, which CREATE SEQUENCE rejects as a START WITH — the
    dump clamps the CREATE into bounds and carries the true position
    via ALTER ... RESTART WITH, so the restored sequence re-raises
    exhaustion instead of failing the restore (and never re-dispenses
    an already-dispensed value)."""
    from quasar_destination_h2_spark.sequences import SequenceError

    engine.execute_sql("DROP SEQUENCE IF EXISTS scr_exh")
    engine.execute_sql("CREATE SEQUENCE scr_exh START WITH 1 MAXVALUE 2")
    engine.execute_sql("SELECT NEXTVAL('scr_exh') AS v").collect()
    engine.execute_sql("SELECT NEXTVAL('scr_exh') AS v").collect()
    with pytest.raises(SequenceError, match="run out"):
        engine.execute_sql("SELECT NEXTVAL('scr_exh') AS v").collect()
    lines = [r.SCRIPT for r in engine.execute_sql("SCRIPT NODATA").collect()]
    assert (
        'CREATE SEQUENCE "scr_exh" START WITH 2 MINVALUE 1 MAXVALUE 2;'
        in lines
    )
    assert 'ALTER SEQUENCE "scr_exh" RESTART WITH 3;' in lines
    f = os.path.join(tempfile.mkdtemp(), "exh.sql")
    with open(f, "w") as fh:
        fh.write(
            "\n".join(ln for ln in lines if "scr_exh" in ln) + "\n"
        )
    engine.execute_sql("DROP SEQUENCE scr_exh")
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    with pytest.raises(SequenceError, match="run out"):
        engine.execute_sql("SELECT NEXTVAL('scr_exh') AS v").collect()
    engine.execute_sql("DROP SEQUENCE scr_exh")
