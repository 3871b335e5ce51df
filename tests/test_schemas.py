"""Multi-schema support (r14, schemas.py + the schema-aware name
resolver in sql_dml): CREATE/DROP SCHEMA, SET SCHEMA, qualified and
current-schema name resolution across DDL/DML/SELECT, schema-scoped
sequences and identity backing, INFORMATION_SCHEMA.SCHEMATA and the
schema columns of the other views, SCRIPT/RUNSCRIPT round-trips with
CREATE SCHEMA lines and fully-qualified spellings, the checked-in
multi-schema H2-1.4.200-format dump fixture, and the documented
rejects for the H2 object kinds with no analogue here (ALIAS /
TRIGGER / DOMAIN / CONSTANT).

Reference behavior: a real H2 instance routinely keeps objects
outside PUBLIC and its dumps qualify every name; the reference
replays such dumps verbatim (H2Server.scala:41-58)."""

from __future__ import annotations

import json
import os

import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.schemas import SchemaError, split_logical

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "quasar_destination_h2_spark",
    "plans",
    "h2_multischema_dump.sql",
)


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    yield eng
    eng.current_schema = "public"
    for sc in eng.schemas.names():
        if sc != "PUBLIC":
            eng.execute_sql(f'DROP SCHEMA "{sc}" CASCADE')
    for logical in list(eng.sink.catalog):
        if str(logical).casefold().startswith("ms_"):
            eng.drop_table_if_exists(logical)


@pytest.fixture(autouse=True)
def _reset_schema(engine):
    yield
    engine.current_schema = "public"


def test_create_drop_schema_lifecycle(engine):
    engine.execute_sql('CREATE SCHEMA "S1"')
    assert engine.schemas.exists("s1")
    with pytest.raises(SchemaError, match="already exists"):
        engine.execute_sql('CREATE SCHEMA "S1"')
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "S1"')  # no-op
    engine.execute_sql('DROP SCHEMA "S1"')
    assert not engine.schemas.exists("s1")
    with pytest.raises(SchemaError, match="not found"):
        engine.execute_sql('DROP SCHEMA "S1"')
    engine.execute_sql('DROP SCHEMA IF EXISTS "S1"')  # no-op
    with pytest.raises(SchemaError, match="PUBLIC cannot be dropped"):
        engine.execute_sql("DROP SCHEMA PUBLIC")
    # AUTHORIZATION is accepted and discarded (single principal)
    engine.execute_sql('CREATE SCHEMA "S2" AUTHORIZATION "SA"')
    engine.execute_sql('DROP SCHEMA "S2"')


def test_schema_name_addressability_guard(engine):
    with pytest.raises(SchemaError, match="not addressable"):
        engine.execute_sql('CREATE SCHEMA "has space"')
    with pytest.raises(SchemaError, match="not addressable"):
        engine.execute_sql('CREATE SCHEMA "dotted.name"')


def test_qualified_ddl_dml_select(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."T1"')
    engine.execute_sql(
        'CREATE CACHED TABLE "APP"."T1"("k" INT, "v" VARCHAR(8))'
    )
    assert "app.T1" in {str(t) for t in engine.sink.catalog}
    engine.execute_sql(
        "INSERT INTO \"APP\".\"T1\" VALUES (1, 'a'), (2, 'b')"
    )
    # qualified SELECT resolves natively (database+view binding)
    rows = engine.execute_sql(
        "SELECT k, v FROM APP.T1 ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "a"), (2, "b")]
    engine.execute_sql("UPDATE \"APP\".\"T1\" SET v = 'z' WHERE k = 2")
    engine.execute_sql('DELETE FROM "APP"."T1" WHERE k = 1')
    rows = engine.execute_sql("SELECT k, v FROM APP.T1").collect()
    assert [(r.k, r.v) for r in rows] == [(2, "z")]
    # a same-named PUBLIC table is a DIFFERENT object
    engine.execute_sql('DROP TABLE IF EXISTS "T1"')
    engine.execute_sql('CREATE CACHED TABLE "T1"("k" INT)')
    engine.execute_sql("INSERT INTO T1 VALUES (9)")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM APP.T1"
    ).collect()[0].c == 1
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM T1"
    ).collect()[0].c == 1
    engine.execute_sql('DROP TABLE "T1"')
    engine.execute_sql('DROP TABLE "APP"."T1"')


def test_set_schema_resolution(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    with pytest.raises(ValueError, match="unknown schema"):
        engine.execute_sql("SET SCHEMA GHOST")
    engine.execute_sql("SET SCHEMA APP")
    engine.execute_sql('DROP TABLE IF EXISTS "T2"')  # app.T2
    engine.execute_sql('CREATE CACHED TABLE "T2"("k" INT)')
    assert "app.T2" in {str(t) for t in engine.sink.catalog}
    engine.execute_sql("INSERT INTO T2 VALUES (1), (2)")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM T2"
    ).collect()[0].c == 2
    # PUBLIC-qualified names still reach PUBLIC from inside APP
    engine.execute_sql('DROP TABLE IF EXISTS "PUBLIC"."MS_P"')
    engine.execute_sql('CREATE CACHED TABLE "PUBLIC"."MS_P"("a" INT)')
    assert "MS_P" in {str(t) for t in engine.sink.catalog}
    engine.execute_sql("SET SCHEMA PUBLIC")
    engine.execute_sql('DROP TABLE "MS_P"')
    engine.execute_sql('DROP TABLE "APP"."T2"')


def test_unknown_schema_errors_precisely(engine):
    for stmt in (
        'CREATE CACHED TABLE "GHOST"."T"("a" INT)',
        'INSERT INTO "GHOST"."T" VALUES (1)',
        'DROP TABLE "GHOST"."T"',
        'CREATE SEQUENCE "GHOST"."S"',
    ):
        with pytest.raises(ValueError, match="unknown schema 'GHOST'"):
            engine.execute_sql(stmt)


def test_schema_scoped_sequences_and_identity(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."T3"')
    engine.execute_sql(
        'CREATE CACHED TABLE "APP"."T3"("id" INT AUTO_INCREMENT, "x" INT)'
    )
    backing = [
        s for s in engine.sequences.names() if s.startswith("app.")
    ]
    assert backing == ["app.system_sequence_t3_id"]
    engine.execute_sql('INSERT INTO "APP"."T3" ("x") VALUES (7)')
    assert engine.execute_sql(
        "SELECT id FROM APP.T3"
    ).collect()[0].id == 1
    # user sequence in the schema; NEXTVAL resolves under SET SCHEMA
    engine.execute_sql('DROP SEQUENCE IF EXISTS "APP"."US1"')
    engine.execute_sql('CREATE SEQUENCE "APP"."US1" START WITH 40')
    engine.execute_sql("SET SCHEMA APP")
    r = engine.execute_sql("SELECT NEXTVAL('US1') AS nv").collect()[0]
    assert r.nv == 40
    r = engine.execute_sql("SELECT NEXT VALUE FOR US1 AS nv").collect()[0]
    assert r.nv == 41
    engine.execute_sql("SET SCHEMA PUBLIC")
    r = engine.execute_sql(
        "SELECT NEXT VALUE FOR \"APP\".\"US1\" AS nv"
    ).collect()[0]
    assert r.nv == 42
    engine.execute_sql('DROP SEQUENCE "APP"."US1"')
    engine.execute_sql('DROP TABLE "APP"."T3"')
    assert not [
        s for s in engine.sequences.names() if s.startswith("app.")
    ]


def test_drop_schema_restrict_and_cascade(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "DS"')
    engine.execute_sql('CREATE CACHED TABLE "DS"."T"("a" INT)')
    engine.execute_sql('CREATE SEQUENCE "DS"."SQ"')
    with pytest.raises(SchemaError, match="not empty"):
        engine.execute_sql('DROP SCHEMA "DS"')
    with pytest.raises(SchemaError, match="not empty"):
        engine.execute_sql('DROP SCHEMA "DS" RESTRICT')
    engine.execute_sql('DROP SCHEMA "DS" CASCADE')
    assert not engine.schemas.exists("ds")
    assert "ds.T" not in {str(t) for t in engine.sink.catalog}
    assert not [
        s for s in engine.sequences.names() if s.startswith("ds.")
    ]


def test_drop_schema_cascade_guards_external_sequence_owner(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "DX"')
    engine.execute_sql('CREATE SEQUENCE "DX"."SHARED"')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_OUT"')
    engine.execute_sql(
        'CREATE CACHED TABLE "MS_OUT"("n" INT DEFAULT '
        "(NEXT VALUE FOR \"DX\".\"SHARED\"))"
    )
    with pytest.raises(SchemaError, match="outside the schema"):
        engine.execute_sql('DROP SCHEMA "DX" CASCADE')
    engine.execute_sql('DROP TABLE "MS_OUT"')
    engine.execute_sql('DROP SCHEMA "DX" CASCADE')


def test_dropping_current_schema_resets_to_public(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "CUR"')
    engine.execute_sql("SET SCHEMA CUR")
    engine.execute_sql('DROP SCHEMA "CUR"')
    assert engine.current_schema == "public"


def test_information_schema_surfaces(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."T4"')
    engine.execute_sql(
        'CREATE CACHED TABLE "APP"."T4"("k" INT PRIMARY KEY)'
    )
    rows = {
        (r.SCHEMA_NAME, r.IS_DEFAULT)
        for r in engine.execute_sql(
            "SELECT SCHEMA_NAME, IS_DEFAULT FROM "
            "INFORMATION_SCHEMA.SCHEMATA"
        ).collect()
    }
    assert ("PUBLIC", "YES") in rows and ("APP", "NO") in rows
    t = engine.execute_sql(
        "SELECT TABLE_SCHEMA, TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        "WHERE TABLE_NAME = 'T4'"
    ).collect()
    assert [(r.TABLE_SCHEMA, r.TABLE_NAME) for r in t] == [("APP", "T4")]
    c = engine.execute_sql(
        "SELECT TABLE_SCHEMA, COLUMN_NAME FROM "
        "INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'T4'"
    ).collect()
    assert [(r.TABLE_SCHEMA, r.COLUMN_NAME) for r in c] == [("APP", "k")]
    k = engine.execute_sql(
        "SELECT TABLE_SCHEMA FROM INFORMATION_SCHEMA.CONSTRAINTS "
        "WHERE TABLE_NAME = 'T4'"
    ).collect()
    assert [r.TABLE_SCHEMA for r in k] == ["APP"]
    shows = {tuple(r) for r in engine.execute_sql("SHOW SCHEMAS").collect()}
    assert ("APP",) in shows
    tabs = {tuple(r) for r in engine.execute_sql("SHOW TABLES").collect()}
    assert ("T4", "APP") in tabs
    cols = engine.execute_sql("SHOW COLUMNS FROM APP.T4").collect()
    assert cols[0].FIELD == "k" and cols[0].KEY == "PRI"
    engine.execute_sql('DROP TABLE "APP"."T4"')


def test_script_roundtrip_multischema(engine, tmp_path):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "RT"')
    engine.execute_sql('DROP TABLE IF EXISTS "RT"."T5"')
    engine.execute_sql(
        'CREATE CACHED TABLE "RT"."T5"("id" INT AUTO_INCREMENT, '
        '"v" VARCHAR(8))'
    )
    engine.execute_sql('INSERT INTO "RT"."T5" ("v") VALUES (\'a\')')
    engine.execute_sql('COMMENT ON TABLE "RT"."T5" IS \'rt table\'')
    # scoped dump (the shared test warehouse holds vector-typed index
    # tables H2 DDL cannot express, so an unscoped SCRIPT would raise)
    lines = [
        r.SCRIPT
        for r in engine.execute_sql(
            "SCRIPT NODATA TABLE RT.T5"
        ).collect()
    ]
    assert any(
        ln.startswith('CREATE SCHEMA IF NOT EXISTS "RT"') for ln in lines
    )
    assert any('CREATE CACHED TABLE "RT"."T5"' in ln for ln in lines)
    assert any(
        'COMMENT ON TABLE "RT"."T5" IS \'rt table\'' in ln
        for ln in lines
    )
    # scoped dump by qualified name carries the schema + sequence
    scoped = [
        r.SCRIPT
        for r in engine.execute_sql(
            "SCRIPT NODATA TABLE RT.T5"
        ).collect()
    ]
    assert scoped[0].startswith('CREATE SCHEMA IF NOT EXISTS "RT"')
    assert any("BELONGS_TO_TABLE" in ln for ln in scoped)
    # full round-trip into the same engine after dropping everything
    dump = tmp_path / "ms_dump.sql"
    dump.write_text("\n".join(lines) + "\n")
    engine.execute_sql('DROP SCHEMA "RT" CASCADE')
    assert not engine.schemas.exists("rt")
    engine.execute_sql(f"RUNSCRIPT FROM '{dump}'")
    assert engine.schemas.exists("rt")
    engine.execute_sql('INSERT INTO "RT"."T5" ("v") VALUES (\'b\')')
    # identity dispenses from the dumped position (row 'a' used 1)
    assert engine.execute_sql(
        "SELECT id FROM RT.T5 WHERE v = 'b'"
    ).collect()[0].id == 2
    engine.execute_sql('DROP SCHEMA "RT" CASCADE')


def test_multischema_fixture_restores(engine):
    engine.current_schema = "public"
    if engine.schemas.exists("INVENTORY"):
        engine.execute_sql('DROP SCHEMA "INVENTORY" CASCADE')
    engine.execute_sql('DROP TABLE IF EXISTS "TAGS"')
    engine.execute_sql(f"RUNSCRIPT FROM '{FIXTURE}'")
    assert engine.schemas.exists("INVENTORY")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM INVENTORY.ITEMS"
    ).collect()[0].c == 2
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM TAGS"
    ).collect()[0].c == 1
    # identity dispenses from the dumped position
    engine.execute_sql(
        "INSERT INTO \"INVENTORY\".\"ITEMS\" (\"SKU\") VALUES ('C-300')"
    )
    r = engine.execute_sql(
        "SELECT ID, QTY FROM INVENTORY.ITEMS WHERE SKU = 'C-300'"
    ).collect()[0]
    assert (r.ID, r.QTY) == (3, 0)
    # FK recorded with schema-aware table display
    x = engine.execute_sql(
        "SELECT PKTABLE_SCHEMA, PKTABLE_NAME, FKTABLE_SCHEMA, "
        "FKTABLE_NAME FROM INFORMATION_SCHEMA.CROSS_REFERENCES "
        "WHERE FK_NAME = 'MOVES_ITEM_FK'"
    ).collect()
    assert [tuple(r) for r in x] == [
        ("INVENTORY", "ITEMS", "INVENTORY", "MOVES")
    ]
    # remarks restored
    assert (
        engine.colmeta.for_table("inventory.ITEMS")["remarks"]
        == "stock levels"
    )
    engine.execute_sql('DROP SCHEMA "INVENTORY" CASCADE')
    engine.execute_sql('DROP TABLE "TAGS"')


def test_h2_object_kinds_reject_precisely(engine):
    with pytest.raises(ValueError, match="CREATE ALIAS: not supported"):
        engine.execute_sql(
            'CREATE ALIAS MYF FOR "org.example.Funcs.myf"'
        )
    with pytest.raises(ValueError, match="CREATE TRIGGER: not supported"):
        engine.execute_sql(
            'CREATE TRIGGER TRG BEFORE INSERT ON T FOR EACH ROW '
            'CALL "org.example.Trg"'
        )
    with pytest.raises(ValueError, match="CREATE DOMAIN: not supported"):
        engine.execute_sql("CREATE DOMAIN EMAIL AS VARCHAR(255)")
    with pytest.raises(
        ValueError, match="CREATE CONSTANT: not supported"
    ):
        engine.execute_sql("CREATE CONSTANT ONE VALUE 1")
    with pytest.raises(ValueError, match="DROP ALIAS: not supported"):
        engine.execute_sql("DROP ALIAS MYF")


def test_views_reject_non_public_schema(engine):
    from quasar_destination_h2_spark.views import ViewError

    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    with pytest.raises(ViewError, match="PUBLIC only"):
        engine.execute_sql(
            'CREATE VIEW "APP"."V1" AS SELECT 1 AS one'
        )
    engine.execute_sql("SET SCHEMA APP")
    with pytest.raises(ViewError, match="PUBLIC only"):
        engine.execute_sql("CREATE VIEW V2 AS SELECT 1 AS one")
    engine.execute_sql("SET SCHEMA PUBLIC")


def test_rename_stays_in_schema(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."R1"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."R2"')
    engine.execute_sql('CREATE CACHED TABLE "APP"."R1"("a" INT)')
    engine.execute_sql('ALTER TABLE "APP"."R1" RENAME TO "R2"')
    cat = {str(t) for t in engine.sink.catalog}
    assert "app.R2" in cat and "app.R1" not in cat
    with pytest.raises(ValueError, match="between schemas"):
        engine.execute_sql(
            'ALTER TABLE "APP"."R2" RENAME TO "PUBLIC"."R3"'
        )
    engine.execute_sql('DROP TABLE "APP"."R2"')


def test_split_logical_hostile_dotted_public_name(engine):
    # a PUBLIC table whose name merely CONTAINS a dot is never
    # misread as schema-qualified (split gates on the registry)
    assert split_logical("no.such", frozenset()) == ("public", "no.such")
    assert split_logical("app.T", frozenset({"app"})) == ("app", "T")


def test_prebind_index_current_schema_wins_collision(engine):
    """r14 task 3: the memoized pre-bind index resolves an
    unqualified mention to the CURRENT schema's table when a
    same-spelled PUBLIC table exists (H2 resolution order), and
    invalidates when the catalog or the current schema changes."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_C"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."MS_C"')
    engine.execute_sql('CREATE CACHED TABLE "MS_C"("a" INT)')
    engine.execute_sql("INSERT INTO MS_C VALUES (1)")
    engine.execute_sql('CREATE CACHED TABLE "APP"."MS_C"("a" INT)')
    engine.execute_sql('INSERT INTO "APP"."MS_C" VALUES (1), (2), (3)')
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM MS_C"
    ).collect()[0].c == 1
    engine.execute_sql("SET SCHEMA APP")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM MS_C"
    ).collect()[0].c == 3
    engine.execute_sql("SET SCHEMA PUBLIC")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM MS_C"
    ).collect()[0].c == 1
    engine.execute_sql('DROP TABLE "APP"."MS_C"')
    engine.execute_sql('DROP TABLE "MS_C"')


def test_session_shadow_memo_stays_correct_across_ddl(engine, spark):
    """The negative-memo tableExists check must not leave the engine
    blind after DDL: a table dropped and recreated still resolves,
    and a PRE-EXISTING session view is still never shadowed."""
    spark.range(7).toDF("a").createOrReplaceTempView("ms_shadowed")
    try:
        engine.execute_sql('DROP TABLE IF EXISTS "ms_shadowed"')
        engine.execute_sql('CREATE CACHED TABLE "ms_shadowed"("a" INT)')
        engine.execute_sql("INSERT INTO ms_shadowed VALUES (1)")
        # the session view wins: it resolved, so it is never shadowed
        assert engine.execute_sql(
            "SELECT count(*) AS c FROM ms_shadowed"
        ).collect()[0].c == 7
    finally:
        spark.catalog.dropTempView("ms_shadowed")
    # with the session view gone, the engine table resolves (the
    # memo only ever caches ABSENCE, so un-shadowing is prompt)
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM ms_shadowed"
    ).collect()[0].c == 1
    engine.execute_sql('DROP TABLE "ms_shadowed"')


# --- review-r14 regression pins --------------------------------------------


def test_view_over_schema_table_blocks_and_cascades_drop(engine):
    """review r14: dependency tracking sees views over
    schema-qualified tables — DROP TABLE RESTRICTs, CASCADE drops."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP VIEW IF EXISTS "MSV1"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."VT1"')
    engine.execute_sql('CREATE CACHED TABLE "APP"."VT1"("a" INT)')
    engine.execute_sql('INSERT INTO "APP"."VT1" VALUES (1)')
    engine.execute_sql("CREATE VIEW MSV1 AS SELECT a FROM APP.VT1")
    assert engine.execute_sql("SELECT a FROM MSV1").collect()[0].a == 1
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql('DROP TABLE "APP"."VT1"')
    engine.execute_sql('DROP TABLE "APP"."VT1" CASCADE')
    assert engine.views.get("MSV1") is None


def test_drop_schema_cascade_reclaims_views_and_fk_records(engine):
    """review r14: DROP SCHEMA CASCADE applies the DROP TABLE CASCADE
    discipline per table — outside views drop, inbound FK records
    from outside the schema are reclaimed, nothing dangles."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "DC"')
    engine.execute_sql('DROP VIEW IF EXISTS "MSV2"')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_FKOUT"')
    engine.execute_sql(
        'CREATE CACHED TABLE "DC"."T"("id" INT PRIMARY KEY)'
    )
    engine.execute_sql("CREATE VIEW MSV2 AS SELECT id FROM DC.T")
    engine.execute_sql(
        'CREATE CACHED TABLE "MS_FKOUT"("r" INT, CONSTRAINT "MS_FK1" '
        'FOREIGN KEY("r") REFERENCES "DC"."T"("id"))'
    )
    engine.execute_sql('DROP SCHEMA "DC" CASCADE')
    assert engine.views.get("MSV2") is None
    assert not any(
        e["name"] == "MS_FK1"
        for e in engine.constraints.for_table("MS_FKOUT")
    )
    engine.execute_sql('DROP TABLE "MS_FKOUT"')


def test_drop_schema_cascade_external_owner_check_is_pre_drop(engine):
    """review r14: the external-sequence-owner refusal fires BEFORE
    anything drops — the schema survives intact."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "DX2"')
    engine.execute_sql('CREATE CACHED TABLE "DX2"."KEEP"("a" INT)')
    engine.execute_sql('CREATE SEQUENCE "DX2"."SH"')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_OWN"')
    engine.execute_sql(
        'CREATE CACHED TABLE "MS_OWN"("n" INT DEFAULT '
        "(NEXT VALUE FOR \"DX2\".\"SH\"))"
    )
    with pytest.raises(SchemaError, match="outside the schema"):
        engine.execute_sql('DROP SCHEMA "DX2" CASCADE')
    # nothing was destroyed
    assert "dx2.KEEP" in {str(t) for t in engine.sink.catalog}
    assert engine.sequences.exists("dx2.SH")
    engine.execute_sql('DROP TABLE "MS_OWN"')
    engine.execute_sql('DROP SCHEMA "DX2" CASCADE')


def test_set_schema_is_strict_no_public_fallback(engine):
    """review r14: under SET SCHEMA, an unqualified PUBLIC table
    neither reads nor writes (H2 has no search path) — both paths
    agree; PUBLIC-qualified spellings still reach it, and registered
    views stay session-global (documented deviation: views are
    modeled in PUBLIC only and a qualified view reference cannot
    bind, so making them schema-strict would strand them)."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP VIEW IF EXISTS "MSV3"')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_STRICT"')
    engine.execute_sql('CREATE CACHED TABLE "MS_STRICT"("a" INT)')
    engine.execute_sql("INSERT INTO MS_STRICT VALUES (1)")
    engine.execute_sql(
        "CREATE VIEW MSV3 AS SELECT a FROM MS_STRICT"
    )
    engine.execute_sql("SET SCHEMA APP")
    with pytest.raises(Exception):
        engine.execute_sql("SELECT a FROM MS_STRICT").collect()
    assert (
        engine.execute_sql(
            "SELECT a FROM PUBLIC.MS_STRICT"
        ).collect()[0].a
        == 1
    )
    # views resolve regardless of current schema (deviation above);
    # their definitions resolve in PUBLIC, the view's own schema
    assert engine.execute_sql("SELECT a FROM MSV3").collect()[0].a == 1
    engine.execute_sql("SET SCHEMA PUBLIC")
    engine.execute_sql("DROP VIEW MSV3")
    engine.execute_sql('DROP TABLE "MS_STRICT"')


def test_stale_shadow_memo_never_destroys_user_view(engine, spark):
    """review r14: a user temp view created AFTER the memo recorded
    absence is neither replaced nor dropped — createTempView raises,
    the stale entry evicts, the user's view wins and SURVIVES."""
    engine.execute_sql('DROP TABLE IF EXISTS "MS_MEMO"')
    engine.execute_sql('CREATE CACHED TABLE "MS_MEMO"("a" INT)')
    engine.execute_sql("INSERT INTO MS_MEMO VALUES (1)")
    # first resolution memoizes absence of a session object
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM MS_MEMO"
    ).collect()[0].c == 1
    spark.range(5).toDF("a").createOrReplaceTempView("MS_MEMO")
    try:
        # the user's view wins...
        assert engine.execute_sql(
            "SELECT count(*) AS c FROM MS_MEMO"
        ).collect()[0].c == 5
        # ...and SURVIVES the statement (nothing dropped it)
        assert spark.catalog.tableExists("MS_MEMO")
        assert spark.table("MS_MEMO").count() == 5
    finally:
        spark.catalog.dropTempView("MS_MEMO")
    engine.execute_sql('DROP TABLE "MS_MEMO"')


def test_qualified_binding_never_shadows_user_database_view(
    engine, spark
):
    """review r14: a user's own session object under schema.name wins
    over the engine's qualified binding and is never REPLACEd."""
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "QB"')
    engine.execute_sql('DROP TABLE IF EXISTS "QB"."X"')
    engine.execute_sql('CREATE CACHED TABLE "QB"."X"("a" INT)')
    engine.execute_sql('INSERT INTO "QB"."X" VALUES (1)')
    spark.sql("CREATE DATABASE IF NOT EXISTS qb")
    spark.sql("CREATE OR REPLACE VIEW qb.x AS SELECT 42 AS a")
    try:
        # the user's view resolves; the engine does not shadow it
        assert engine.execute_sql(
            "SELECT a FROM QB.X"
        ).collect()[0].a == 42
        # and it survives the statement
        assert spark.sql("SELECT a FROM qb.x").collect()[0].a == 42
    finally:
        spark.sql("DROP VIEW IF EXISTS qb.x")
    engine.execute_sql('DROP SCHEMA "QB" CASCADE')


def test_comment_on_view_and_sequence_roundtrip(engine):
    """r14: COMMENT ON VIEW / SEQUENCE record, surface through
    INFORMATION_SCHEMA REMARKS, dump as COMMENT lines, and restore;
    a view remark spelled COMMENT ON TABLE (H2's table namespace)
    routes to the view."""
    engine.execute_sql('DROP VIEW IF EXISTS "MSCV"')
    engine.execute_sql('DROP TABLE IF EXISTS "MSCT"')
    engine.execute_sql('DROP SEQUENCE IF EXISTS "MSCS"')
    engine.execute_sql("CREATE SEQUENCE MSCS START WITH 3")
    # bind the sequence to a column so the SCOPED dump emits it (a
    # standalone user sequence is out of a TABLE-scoped dump, and the
    # shared test warehouse makes unscoped SCRIPT impossible here)
    engine.execute_sql(
        'CREATE CACHED TABLE "MSCT"("a" INT DEFAULT '
        "(NEXT VALUE FOR \"MSCS\"))"
    )
    engine.execute_sql("CREATE VIEW MSCV AS SELECT a FROM MSCT")
    engine.execute_sql("COMMENT ON VIEW MSCV IS 'view remark'")
    engine.execute_sql("COMMENT ON SEQUENCE MSCS IS 'seq remark'")
    assert (
        engine.execute_sql(
            "SELECT REMARKS FROM INFORMATION_SCHEMA.VIEWS "
            "WHERE TABLE_NAME = 'MSCV'"
        ).collect()[0][0]
        == "view remark"
    )
    assert (
        engine.execute_sql(
            "SELECT REMARKS FROM INFORMATION_SCHEMA.SEQUENCES "
            "WHERE SEQUENCE_NAME = 'MSCS'"
        ).collect()[0][0]
        == "seq remark"
    )
    lines = [
        r.SCRIPT
        for r in engine.execute_sql(
            "SCRIPT NODATA TABLE MSCT"
        ).collect()
    ]
    assert any(
        ln == "COMMENT ON VIEW \"MSCV\" IS 'view remark';"
        for ln in lines
    )
    assert any(
        ln.startswith("COMMENT ON SEQUENCE")
        and ln.casefold() == "comment on sequence \"mscs\" is "
        "'seq remark';"
        for ln in lines
    )
    # H2's table-namespace spelling routes to the view
    engine.execute_sql("COMMENT ON TABLE MSCV IS 'via table'")
    assert engine.views.get("MSCV")["remarks"] == "via table"
    # IS NULL clears
    engine.execute_sql("COMMENT ON SEQUENCE MSCS IS NULL")
    assert engine.sequences.describe("MSCS").get("remarks") is None
    engine.execute_sql("DROP VIEW MSCV")
    engine.execute_sql('DROP TABLE "MSCT"')
    engine.execute_sql("DROP SEQUENCE MSCS")


def test_show_tables_from_schema_filter(engine):
    engine.execute_sql('CREATE SCHEMA IF NOT EXISTS "APP"')
    engine.execute_sql('DROP TABLE IF EXISTS "APP"."SHF"')
    engine.execute_sql('CREATE CACHED TABLE "APP"."SHF"("a" INT)')
    rows = {
        tuple(r)
        for r in engine.execute_sql("SHOW TABLES FROM APP").collect()
    }
    assert rows == {("SHF", "APP")}
    assert not any(
        r.TABLE_SCHEMA == "APP"
        for r in engine.execute_sql("SHOW TABLES FROM PUBLIC").collect()
    )
    with pytest.raises(ValueError, match="unknown schema"):
        engine.execute_sql("SHOW TABLES FROM GHOST")
    engine.execute_sql('DROP TABLE "APP"."SHF"')


def test_set_schema_search_path_resolution(engine):
    """r16 (was a loud reject through r15): SET SCHEMA_SEARCH_PATH
    implements H2's first-match-wins lookup for query-position
    relations — current schema first, then path entries in order;
    PUBLIC participates only when current or on the path; a path
    entry naming no registered schema is skipped at lookup."""

    def one(sql):
        return engine.execute_sql(sql).collect()[0][0]

    try:
        engine.execute_sql('CREATE SCHEMA "SPA"')
        engine.execute_sql('CREATE SCHEMA "SPB"')
        engine.execute_sql('CREATE CACHED TABLE "SPA"."SP_T"("v" VARCHAR(2))')
        engine.execute_sql("INSERT INTO \"SPA\".\"SP_T\" VALUES ('a')")
        engine.execute_sql('CREATE CACHED TABLE "SPB"."SP_T"("v" VARCHAR(2))')
        engine.execute_sql("INSERT INTO \"SPB\".\"SP_T\" VALUES ('b')")
        engine.execute_sql('CREATE CACHED TABLE "SPB"."SP_U"("v" VARCHAR(2))')
        engine.execute_sql("INSERT INTO \"SPB\".\"SP_U\" VALUES ('u')")
        engine.execute_sql('CREATE CACHED TABLE "SP_P"("v" VARCHAR(2))')
        engine.execute_sql("INSERT INTO \"SP_P\" VALUES ('p')")
        # empty path (H2 default): strict current-schema
        with pytest.raises(Exception):
            engine.execute_sql("SELECT v FROM SP_U").collect()
        # path consulted after the current schema, in order
        engine.execute_sql("SET SCHEMA_SEARCH_PATH SPB")
        assert one("SELECT v FROM SP_U") == "u"
        assert one("SELECT v FROM SP_T") == "b"
        engine.execute_sql("SET SCHEMA SPA")
        assert one("SELECT v FROM SP_T") == "a"  # current wins
        assert one("SELECT v FROM SP_U") == "u"
        # PUBLIC is NOT implicit: from SPA with path [SPB], a PUBLIC
        # bare name does not bind ...
        with pytest.raises(Exception):
            engine.execute_sql("SELECT v FROM SP_P").collect()
        # ... until PUBLIC is on the path; unknown entries skipped
        engine.execute_sql("SET SCHEMA_SEARCH_PATH GHOST, PUBLIC")
        assert one("SELECT v FROM SP_P") == "p"
        # first-match-wins order among path entries
        engine.execute_sql("SET SCHEMA PUBLIC")
        engine.execute_sql("SET SCHEMA_SEARCH_PATH SPB, SPA")
        assert one("SELECT v FROM SP_T") == "b"
        engine.execute_sql("SET SCHEMA_SEARCH_PATH SPA, SPB")
        assert one("SELECT v FROM SP_T") == "a"
        # review r16: DML targets consult the path too (H2 resolves
        # them through the same readTableOrView) — reads and writes
        # must agree
        engine.execute_sql("INSERT INTO SP_U VALUES ('w')")
        assert one("SELECT COUNT(*) FROM SPB.SP_U") == 2
        engine.execute_sql("DELETE FROM SP_U WHERE v = 'w'")
        assert one("SELECT COUNT(*) FROM SPB.SP_U") == 1
        # ... and ANALYZE resolves its unqualified name the same way
        # (pre-fix it pre-qualified to the CURRENT schema and missed
        # what SELECT in the same session found — review r16)
        engine.execute_sql("SET SCHEMA SPA")
        engine.execute_sql("ANALYZE TABLE SP_U")  # via the path
        engine.execute_sql("SET SCHEMA_SEARCH_PATH SPA")
        with pytest.raises(ValueError, match="table not found"):
            engine.execute_sql("ANALYZE TABLE SP_U")
        # grammar guard (a bare `SET SCHEMA_SEARCH_PATH` is Spark's
        # conf-read form and passes through like every valueless SET)
        with pytest.raises(ValueError, match="trailing"):
            engine.execute_sql("SET SCHEMA_SEARCH_PATH SPA SPB")
    finally:
        engine.schema_search_path = []
        engine.current_schema = "public"
        engine.execute_sql('DROP TABLE IF EXISTS "SP_P"')
        engine.execute_sql('DROP SCHEMA IF EXISTS "SPA" CASCADE')
        engine.execute_sql('DROP SCHEMA IF EXISTS "SPB" CASCADE')


# -- ALTER SCHEMA ... RENAME TO (r15: r14 verdict missing #3) -----------


def test_alter_schema_rename_end_to_end(engine):
    """The rename re-keys every registry: table catalog (data +
    spelling preserved), identity backing sequence (position
    preserved — the next auto-id continues, never re-dispenses),
    standalone sequences, constraints, column metadata (COMMENT)."""
    engine.execute_sql('DROP SCHEMA IF EXISTS "RN1" CASCADE')
    engine.execute_sql('DROP SCHEMA IF EXISTS "RN2" CASCADE')
    engine.execute_sql('CREATE SCHEMA "RN1"')
    engine.execute_sql(
        'CREATE CACHED TABLE "RN1"."T"('
        '"id" INT AUTO_INCREMENT PRIMARY KEY, "x" INT)'
    )
    engine.execute_sql('INSERT INTO "RN1"."T" ("x") VALUES (10), (20)')
    engine.execute_sql('CREATE SEQUENCE "RN1"."US" START WITH 70')
    assert engine.execute_sql(
        "SELECT NEXT VALUE FOR \"RN1\".\"US\" AS nv"
    ).collect()[0].nv == 70
    engine.execute_sql('COMMENT ON TABLE "RN1"."T" IS \'moved table\'')

    engine.execute_sql('ALTER SCHEMA "RN1" RENAME TO "RN2"')

    assert engine.schemas.exists("rn2") and not engine.schemas.exists("rn1")
    cat = {str(t) for t in engine.sink.catalog}
    assert "rn2.T" in cat and "rn1.T" not in cat
    rows = engine.execute_sql(
        "SELECT id, x FROM RN2.T ORDER BY id"
    ).collect()
    assert [(r.id, r.x) for r in rows] == [(1, 10), (2, 20)]
    # identity continues from the pre-rename position
    engine.execute_sql('INSERT INTO "RN2"."T" ("x") VALUES (30)')
    assert engine.execute_sql(
        "SELECT max(id) AS m FROM RN2.T"
    ).collect()[0].m == 3
    # user sequence moved with its position
    assert engine.execute_sql(
        "SELECT NEXT VALUE FOR \"RN2\".\"US\" AS nv"
    ).collect()[0].nv == 71
    assert not [
        s for s in engine.sequences.names() if s.startswith("rn1.")
    ]
    # constraint + colmeta records moved with the table key
    assert any(
        e["type"] == "PRIMARY KEY"
        for e in engine.constraints.all().get("rn2.t", [])
    )
    assert engine.colmeta.for_table("rn2.T").get("remarks") == "moved table"
    # the old qualifier errors precisely (schema gone)
    with pytest.raises(ValueError, match="unknown schema"):
        engine.execute_sql('INSERT INTO "RN1"."T" ("x") VALUES (99)')
    engine.execute_sql('DROP SCHEMA "RN2" CASCADE')


def test_alter_schema_rename_rewrites_external_sequence_binding(engine):
    """A PUBLIC column drawing its DEFAULT from an in-schema sequence
    keeps working after the schema renames (colmeta.rename_sequences
    rewrites the recorded binding)."""
    engine.execute_sql('DROP SCHEMA IF EXISTS "RX1" CASCADE')
    engine.execute_sql('DROP SCHEMA IF EXISTS "RX2" CASCADE')
    engine.execute_sql('DROP TABLE IF EXISTS "MS_RXOUT"')
    engine.execute_sql('CREATE SCHEMA "RX1"')
    engine.execute_sql('CREATE SEQUENCE "RX1"."S" START WITH 5')
    engine.execute_sql(
        'CREATE CACHED TABLE "MS_RXOUT"("n" INT DEFAULT '
        "(NEXT VALUE FOR \"RX1\".\"S\"), \"y\" INT)"
    )
    engine.execute_sql('INSERT INTO "MS_RXOUT" ("y") VALUES (1)')
    engine.execute_sql('ALTER SCHEMA "RX1" RENAME TO "RX2"')
    meta = engine.colmeta.columns_of("MS_RXOUT")
    # sequence registry keys are casefolded, so the rewritten binding
    # is the casefolded dotted name
    assert meta["n"]["sequence"] == "rx2.s"
    engine.execute_sql('INSERT INTO "MS_RXOUT" ("y") VALUES (2)')
    rows = engine.execute_sql(
        "SELECT n FROM MS_RXOUT ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [5, 6]
    engine.execute_sql('DROP TABLE "MS_RXOUT"')
    engine.execute_sql('DROP SCHEMA "RX2" CASCADE')


def test_alter_schema_rename_guards(engine):
    engine.execute_sql('DROP SCHEMA IF EXISTS "RG1" CASCADE')
    engine.execute_sql('DROP SCHEMA IF EXISTS "RG2" CASCADE')
    engine.execute_sql('CREATE SCHEMA "RG1"')
    engine.execute_sql('CREATE SCHEMA "RG2"')
    with pytest.raises(SchemaError, match="PUBLIC cannot be renamed"):
        engine.execute_sql('ALTER SCHEMA PUBLIC RENAME TO "P2"')
    with pytest.raises(SchemaError, match="not found"):
        engine.execute_sql('ALTER SCHEMA "GHOST" RENAME TO "G2"')
    with pytest.raises(SchemaError, match="already exists"):
        engine.execute_sql('ALTER SCHEMA "RG1" RENAME TO "RG2"')
    with pytest.raises(SchemaError, match="not addressable"):
        engine.execute_sql('ALTER SCHEMA "RG1" RENAME TO "has space"')
    with pytest.raises(ValueError, match="only supported form"):
        engine.execute_sql('ALTER SCHEMA "RG1" OWNER TO "SA"')
    with pytest.raises(ValueError, match="trailing"):
        engine.execute_sql('ALTER SCHEMA "RG1" RENAME TO "RG3" EXTRA')
    # dependent PUBLIC view blocks the rename (RESTRICT discipline)
    engine.execute_sql('CREATE CACHED TABLE "RG1"."T"("a" INT)')
    engine.execute_sql(
        'CREATE VIEW "MS_RGV" AS SELECT a FROM "RG1"."T"'
    )
    with pytest.raises(SchemaError, match="depend on"):
        engine.execute_sql('ALTER SCHEMA "RG1" RENAME TO "RG3"')
    engine.execute_sql('DROP VIEW "MS_RGV"')
    engine.execute_sql('ALTER SCHEMA "RG1" RENAME TO "RG3"')
    assert engine.schemas.exists("rg3")
    engine.execute_sql('DROP SCHEMA "RG3" CASCADE')
    engine.execute_sql('DROP SCHEMA "RG2" CASCADE')


def test_alter_schema_rename_case_only_respell(engine):
    engine.execute_sql('DROP SCHEMA IF EXISTS "rsp" CASCADE')
    engine.execute_sql('CREATE SCHEMA "rsp"')
    engine.execute_sql('CREATE CACHED TABLE "rsp"."T"("a" INT)')
    engine.execute_sql('ALTER SCHEMA "rsp" RENAME TO "RSP"')
    assert engine.schemas.display("rsp") == "RSP"
    # same key: objects untouched and still addressable
    assert "rsp.T" in {str(t) for t in engine.sink.catalog}
    engine.execute_sql('DROP SCHEMA "RSP" CASCADE')


def test_alter_schema_rename_follows_current_schema(engine):
    engine.execute_sql('DROP SCHEMA IF EXISTS "RC1" CASCADE')
    engine.execute_sql('DROP SCHEMA IF EXISTS "RC2" CASCADE')
    engine.execute_sql('CREATE SCHEMA "RC1"')
    engine.execute_sql("SET SCHEMA RC1")
    engine.execute_sql('CREATE CACHED TABLE "T"("a" INT)')  # rc1.T
    engine.execute_sql('ALTER SCHEMA "RC1" RENAME TO "RC2"')
    assert engine.current_schema == "rc2"
    # unqualified resolution keeps working in the renamed schema
    engine.execute_sql("INSERT INTO T VALUES (1)")
    assert engine.execute_sql(
        "SELECT count(*) AS c FROM T"
    ).collect()[0].c == 1
    engine.execute_sql("SET SCHEMA PUBLIC")
    engine.execute_sql('DROP SCHEMA "RC2" CASCADE')
