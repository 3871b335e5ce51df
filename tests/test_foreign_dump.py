"""End-to-end restore of a dump in the format a REAL H2 1.4.200
authors (r12 verdict task 1): preamble users/grants, qualified
spellings, count comments, multi-row INSERTs, NOCHECK constraint
lines, FORCE view — the exact script shape the reference feeds
through its embedded H2 (H2Server.scala:41-58). The checked-in
fixture reproduces H2 1.4.200 SCRIPT output conventions (no H2 jar
or network exists in this sandbox to capture a live dump; every
convention is documented in the battery docstring,
plans/ext.py::q_foreign_dump_battery)."""

from __future__ import annotations

import json
import os

import pytest

from quasar_destination_h2_spark.engine import Engine

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "quasar_destination_h2_spark",
    "plans",
    "h2_foreign_dump.sql",
)


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    eng.execute_sql("DROP ALL OBJECTS")
    return eng


def test_foreign_dump_restores_end_to_end(engine):
    engine.execute_sql(f"RUNSCRIPT FROM '{FIXTURE}'")
    # data landed through the comment-interleaved multi-row INSERTs
    assert engine.table("FDB_DEPT").count() == 3
    assert engine.table("FDB_EMP").count() == 4
    # literal fidelity: quote escapes and semicolons inside strings
    # survive the splitter
    got = engine.execute_sql(
        "SELECT ENAME FROM FDB_EMP WHERE EMP_ID = 4"
    ).collect()[0][0]
    assert got == "Smith, Jr; the 'quoted'"
    # the sequence dispenses from its dumped position
    assert (
        engine.execute_sql("SELECT NEXTVAL('FDB_ORDER_SEQ') AS v")
        .collect()[0]
        .v
        == 1007
    )
    # every constraint kind restored: PK/UNIQUE/FK recorded, CHECK
    # recorded AND enforced (NOCHECK skipped only the existing-row
    # validation)
    kinds = {
        (e["name"], e["type"])
        for e in engine.constraints.for_table("FDB_EMP")
    }
    assert kinds == {
        ("FDB_PK_EMP", "PRIMARY KEY"),
        ("FDB_UQ_ENAME", "UNIQUE"),
        ("FDB_CK_SALARY", "CHECK"),
        ("FDB_FK_EMP_DEPT", "FOREIGN KEY"),
    }
    from quasar_destination_h2_spark.constraints import CheckViolation

    with pytest.raises(CheckViolation, match="FDB_CK_SALARY"):
        engine.execute_sql(
            "INSERT INTO FDB_EMP VALUES "
            "(9, 'Turner', 10, -5.00, DATE '2020-01-01')"
        )
    # the FORCE view resolves against the restored table
    rich = sorted(
        r.ENAME
        for r in engine.execute_sql(
            "SELECT ENAME FROM FDB_V_RICH"
        ).collect()
    )
    assert rich == ["Blake", "Clark", "King"]
    # referential RESTRICT holds on the restored FK
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        engine.execute_sql("DROP TABLE FDB_DEPT")
    # STRINGDECODE literal restored with the REAL control chars
    # (H2 javaEncode wraps such strings in its dumps)
    body = engine.execute_sql(
        "SELECT BODY FROM FDB_NOTES WHERE ID = 1"
    ).collect()[0][0]
    assert body == "line1\nline2\ttab éclair \\backslash"
    # idempotent teardown (shared warehouse)
    engine.execute_sql("DROP VIEW FDB_V_RICH")
    engine.execute_sql("DROP TABLE FDB_EMP")
    engine.execute_sql("DROP TABLE FDB_DEPT")
    engine.execute_sql("DROP TABLE FDB_NOTES")
    engine.execute_sql("DROP SEQUENCE FDB_ORDER_SEQ")


def test_stringdecode_rewrite_rules(engine):
    """STRINGDECODE coverage beyond the fixture: '' quote escapes
    compose with java escapes, SELECT position works, a non-literal
    argument and a bad escape error loudly, and the spelling inside
    a string literal never rewrites."""
    got = engine.execute_sql(
        "SELECT STRINGDECODE('a\\u0041''\\tb') AS s"
    ).collect()[0].s
    assert got == "aA'\tb"
    kept = engine.execute_sql(
        "SELECT 'STRINGDECODE(''x'')' AS s"
    ).collect()[0].s
    assert kept == "STRINGDECODE('x')"
    with pytest.raises(ValueError, match="literal form"):
        engine.execute_sql("SELECT STRINGDECODE(BODY) FROM FDB_X")
    with pytest.raises(ValueError, match="unsupported escape"):
        engine.execute_sql("SELECT STRINGDECODE('bad \\q') AS s")


def test_runscript_replays_own_user_and_grant_lines(engine, tmp_path):
    """A re-authored script mixing preamble forms with engine DDL
    replays in one pass (the H2Server init-script path)."""
    f = tmp_path / "mix.sql"
    f.write_text(
        ";\n"
        "CREATE USER IF NOT EXISTS \"OP\" PASSWORD 'pw' ADMIN;\n"
        "CREATE ROLE IF NOT EXISTS APP_RW;\n"
        "-- a comment; with a semicolon\n"
        'CREATE CACHED TABLE "FDB_MIX"("n" INT);\n'
        "INSERT INTO FDB_MIX VALUES (1), (2);\n"
        'GRANT SELECT ON "FDB_MIX" TO APP_RW;\n'
        "REVOKE SELECT ON \"FDB_MIX\" FROM APP_RW;\n"
        "DROP ROLE APP_RW;\n"
        "DROP USER \"OP\";\n"
    )
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    assert engine.table("FDB_MIX").count() == 2
    engine.execute_sql("DROP TABLE FDB_MIX")
