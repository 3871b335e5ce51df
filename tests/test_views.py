"""H2 views as first-class engine objects (views.py + sql_dml +
info_schema + script_stmt; r11 verdict task 1): H2's own SCRIPT
spells every view ``CREATE FORCE VIEW PUBLIC."V"(..) AS SELECT ..``
— the reference's init-script path (H2Server.scala:41-58) runs
arbitrary user DDL including views — so the engine must parse H2's
spellings, resolve engine-catalog logical names inside definitions,
answer queries THROUGH views (with the definition inlined so
Catalyst pushes filters into the scans), round-trip SCRIPT ->
RUNSCRIPT, and surface views in INFORMATION_SCHEMA / SHOW TABLES."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.views import ViewError


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


@pytest.fixture()
def base(engine):
    """A small engine-catalog table for definitions to read."""
    engine.execute_sql("DROP ALL OBJECTS")
    engine.execute_sql('CREATE CACHED TABLE "vw_base"("k" INT, "v" VARCHAR)')
    engine.execute_sql(
        "INSERT INTO vw_base VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')"
    )
    return engine


def _vals(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_select_drop_roundtrip(base):
    engine = base
    engine.execute_sql(
        "CREATE VIEW vw_even AS SELECT k, v FROM vw_base WHERE k % 2 = 0"
    )
    assert _vals(engine.execute_sql("SELECT * FROM vw_even")) == [
        (2, "b"),
        (4, "d"),
    ]
    # views compose into arbitrary queries (joins, aggregates)
    assert _vals(
        engine.execute_sql(
            "SELECT COUNT(*) FROM vw_even e JOIN vw_base b ON e.k = b.k"
        )
    ) == [(2,)]
    engine.execute_sql("DROP VIEW vw_even")
    assert engine.views.get("vw_even") is None


def test_h2_spellings_and_force(base):
    """The motivating case: H2-SCRIPT spellings — FORCE, PUBLIC
    qualifier, double-quoted identifiers — parse and resolve."""
    engine = base
    engine.execute_sql(
        'CREATE FORCE VIEW PUBLIC."vw_h2"("kk", "vv") AS '
        'SELECT "k", "v" FROM PUBLIC."vw_base" WHERE "k" > 2'
    )
    assert _vals(engine.execute_sql("SELECT kk, vv FROM vw_h2")) == [
        (3, "c"),
        (4, "d"),
    ]
    # FORCE over a missing relation: created now, errors at query
    engine.execute_sql(
        'CREATE FORCE VIEW "vw_ghost" AS SELECT * FROM "no_such_t"'
    )
    with pytest.raises(ViewError, match="does not resolve"):
        engine.execute_sql("SELECT * FROM vw_ghost").collect()
    # ... and starts working the moment the relation appears
    engine.execute_sql('CREATE CACHED TABLE "no_such_t"("z" INT)')
    engine.execute_sql("INSERT INTO no_such_t VALUES (9)")
    assert _vals(engine.execute_sql("SELECT * FROM vw_ghost")) == [(9,)]
    # non-FORCE validates at CREATE
    with pytest.raises(ViewError, match="does not resolve"):
        engine.execute_sql(
            'CREATE VIEW "vw_bad" AS SELECT * FROM "also_missing"'
        )


def test_views_over_views_and_cycles(base):
    engine = base
    engine.execute_sql(
        "CREATE VIEW vw_l1 AS SELECT k * 10 AS k10 FROM vw_base"
    )
    engine.execute_sql(
        "CREATE VIEW vw_l2 AS SELECT SUM(k10) AS total FROM vw_l1"
    )
    assert _vals(engine.execute_sql("SELECT total FROM vw_l2")) == [(100,)]
    # self-reference rejected even under FORCE
    with pytest.raises(ViewError, match="references itself"):
        engine.execute_sql(
            "CREATE FORCE VIEW vw_self AS SELECT * FROM vw_self"
        )
    # a FORCE-built mutual cycle errors loudly at query time
    engine.execute_sql("CREATE FORCE VIEW vw_a AS SELECT * FROM vw_b")
    engine.execute_sql("CREATE FORCE VIEW vw_b AS SELECT * FROM vw_a")
    with pytest.raises(ViewError, match="cyclic|does not resolve"):
        engine.execute_sql("SELECT * FROM vw_a").collect()


def test_or_replace_if_not_exists_and_collisions(base):
    engine = base
    engine.execute_sql("CREATE VIEW vw_r AS SELECT k FROM vw_base")
    with pytest.raises(ViewError, match="already exists"):
        engine.execute_sql("CREATE VIEW vw_r AS SELECT v FROM vw_base")
    engine.execute_sql(
        "CREATE VIEW IF NOT EXISTS vw_r AS SELECT v FROM vw_base"
    )  # skipped, old definition stands
    assert _vals(engine.execute_sql("SELECT * FROM vw_r")) == [
        (1,), (2,), (3,), (4,),
    ]
    engine.execute_sql(
        "CREATE OR REPLACE VIEW vw_r AS SELECT v FROM vw_base WHERE k = 1"
    )
    assert _vals(engine.execute_sql("SELECT * FROM vw_r")) == [("a",)]
    # one namespace per schema: view/table name clashes error
    with pytest.raises(ValueError, match="already exists"):
        engine.execute_sql("CREATE VIEW vw_base AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="view named"):
        engine.execute_sql("CREATE CACHED TABLE vw_r(x INT)")
    with pytest.raises(ValueError, match="view named"):
        engine.execute_sql(
            "CREATE TABLE vw_r AS SELECT * FROM vw_base"
        )


def test_views_are_read_only(base):
    engine = base
    engine.execute_sql("CREATE VIEW vw_ro AS SELECT k, v FROM vw_base")
    for stmt in (
        "INSERT INTO vw_ro VALUES (9, 'z')",
        "UPDATE vw_ro SET v = 'z' WHERE k = 1",
        "DELETE FROM vw_ro WHERE k = 1",
        "MERGE INTO vw_ro (k, v) KEY (k) VALUES (9, 'z')",
        "MERGE INTO vw_ro USING (SELECT 1 AS a) s ON vw_ro.k = s.a "
        "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.a)",
        "TRUNCATE TABLE vw_ro",
        "ALTER TABLE vw_ro ADD COLUMN x INT",
    ):
        with pytest.raises(ValueError, match="is a view"):
            engine.execute_sql(stmt)
    with pytest.raises(ValueError, match="use DROP VIEW"):
        engine.execute_sql("DROP TABLE vw_ro")


def test_restrict_and_cascade(base):
    engine = base
    engine.execute_sql("CREATE VIEW vw_d1 AS SELECT k FROM vw_base")
    engine.execute_sql("CREATE VIEW vw_d2 AS SELECT k FROM vw_d1")
    # RESTRICT default: dependents block both view and table drops
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql("DROP VIEW vw_d1")
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql("DROP TABLE vw_base")
    # CASCADE drops the chain
    engine.execute_sql("DROP TABLE vw_base CASCADE")
    assert engine.views.get("vw_d1") is None
    assert engine.views.get("vw_d2") is None
    assert "vw_base" not in engine.sink.catalog


def test_script_runscript_roundtrip(base):
    """An engine-authored dump carries its views (CREATE FORCE VIEW,
    H2's own spelling) and restores them with resolution intact."""
    engine = base
    engine.execute_sql(
        'CREATE VIEW "vw_s"("big_k") AS SELECT "k" FROM "vw_base" '
        "WHERE \"k\" >= 3"
    )
    lines = [r.SCRIPT for r in engine.execute_sql("SCRIPT NODATA").collect()]
    assert (
        'CREATE FORCE VIEW "vw_s"("big_k") AS '
        'SELECT "k" FROM "vw_base" WHERE "k" >= 3;' in lines
    )
    f = os.path.join(tempfile.mkdtemp(), "views.sql")
    with open(f, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    engine.execute_sql("DROP ALL OBJECTS")
    assert engine.views.names() == []
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    engine.execute_sql("INSERT INTO vw_base VALUES (7, 'x')")
    assert _vals(engine.execute_sql("SELECT big_k FROM vw_s")) == [(7,)]
    # TABLE-scoped SCRIPT: views whose dependency CLOSURE lies within
    # the scoped tables are included (documented extension — scoped
    # dumps are the only kind a warehouse holding vector-typed
    # tables can produce); views reading outside the scope are not
    engine.execute_sql('CREATE CACHED TABLE "vw_other"("z" INT)')
    engine.execute_sql(
        "CREATE VIEW vw_on_other AS SELECT z FROM vw_other"
    )
    scoped = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE vw_base").collect()
    ]
    assert any('FORCE VIEW "vw_s"' in s for s in scoped)
    assert not any("vw_on_other" in s for s in scoped)


def test_views_introspection_surfaces(base):
    engine = base
    engine.execute_sql(
        "CREATE VIEW vw_i AS SELECT k AS kk FROM vw_base WHERE k < 3"
    )
    rows = [
        tuple(r)
        for r in engine.execute_sql(
            "SELECT TABLE_NAME, VIEW_DEFINITION, STATUS "
            "FROM INFORMATION_SCHEMA.VIEWS WHERE TABLE_NAME = 'vw_i'"
        ).collect()
    ]
    assert rows == [
        ("vw_i", 'SELECT k AS kk FROM vw_base WHERE k < 3', "VALID")
    ]
    # TABLES carries the VIEW row; SHOW TABLES lists it
    ttype = [
        r.TABLE_TYPE
        for r in engine.execute_sql(
            "SELECT TABLE_TYPE FROM INFORMATION_SCHEMA.TABLES "
            "WHERE TABLE_NAME = 'vw_i'"
        ).collect()
    ]
    assert ttype == ["VIEW"]
    names = {
        r.TABLE_NAME for r in engine.execute_sql("SHOW TABLES").collect()
    }
    assert {"vw_base", "vw_i"} <= names
    cols = [
        (r.FIELD, r.TYPE)
        for r in engine.execute_sql("SHOW COLUMNS FROM vw_i").collect()
    ]
    assert cols == [("kk", "INTEGER")]
    # ALTER VIEW RECOMPILE is the natural no-op (re-analyzed per query)
    assert engine.execute_sql("ALTER VIEW vw_i RECOMPILE") is None
    with pytest.raises(ValueError, match="RECOMPILE"):
        engine.execute_sql("ALTER VIEW vw_i RENAME TO vw_j")


def test_view_plan_inlines_with_pushdown(base):
    """The 100 TB contract: a filter on a view reaches the parquet
    scan — the definition inlines at analysis, so Catalyst pushes
    predicates through (a view adds zero I/O of its own)."""
    engine = base
    engine.execute_sql("CREATE VIEW vw_p AS SELECT k, v FROM vw_base")
    df = engine.execute_sql("SELECT v FROM vw_p WHERE k = 2")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "IsNotNull(k)" in plan
    assert _vals(df) == [("b",)]


def test_review_fixes_views(base):
    """r12 self-review regressions: (a) DROP VIEW IF EXISTS must
    still drop a SESSION temp view (the registry miss cannot swallow
    the statement); (b) a wire CSV push under a registered view's
    name errors; (c) ALTER TABLE RENAME blocks on dependent views
    like DROP does; (d) the FORCE self-reference guard does not
    false-positive on a mere column sharing the view's name."""
    from quasar_destination_h2_spark.types import Column, ColumnType

    engine = base
    # (a) session temp view drops through the statement surface
    engine.spark.createDataFrame([(1,)], "x int").createOrReplaceTempView(
        "vw_tmp_sess"
    )
    engine.execute_sql("DROP VIEW IF EXISTS vw_tmp_sess")
    assert not engine.spark.catalog.tableExists("vw_tmp_sess")
    engine.execute_sql("DROP VIEW IF EXISTS vw_tmp_sess")  # absent: no-op
    # (b) the sink respects the view namespace
    engine.execute_sql("CREATE VIEW vw_owned AS SELECT k FROM vw_base")
    with pytest.raises(ValueError, match="view with this name"):
        engine.csv_create_sink().consume(
            "/vw_owned", [Column("a", ColumnType.NUMBER)], b"1\r\n"
        )
    # (c) rename is observationally a drop for dependent views
    with pytest.raises(ValueError, match="depend"):
        engine.execute_sql('ALTER TABLE "vw_base" RENAME TO "vw_base2"')
    # (d) a column named like the view is not a self-reference...
    engine.execute_sql(
        "CREATE FORCE VIEW vw_total AS SELECT k AS vw_total FROM vw_base"
    )
    assert _vals(engine.execute_sql("SELECT vw_total FROM vw_total")) == [
        (1,), (2,), (3,), (4,),
    ]
    # ...but a quoted H2-dump self-reference IS caught at create
    with pytest.raises(ViewError, match="references itself"):
        engine.execute_sql(
            'CREATE FORCE VIEW "vw_sq" AS SELECT * FROM "vw_sq"'
        )


def test_view_names_prebind_without_failed_analysis(base, monkeypatch):
    """r13 (advisor r12 / verdict task 2): a statement referencing a
    registered view binds it in _resolve_sql's mention pre-scan —
    the common path no longer pays the failed-analysis ->
    materialize -> rebind retry (a measured ~0.27 s/query constant,
    VIEWS_PROBE_r12.json). Pinned by counting backstop entries: the
    retry loop consults _missing_relation only after an
    AnalysisException, so zero calls = zero failed analyses."""
    from quasar_destination_h2_spark import sql_dml

    base.execute_sql('CREATE VIEW "vw_pb" AS SELECT k, v FROM vw_base')
    base.execute_sql(
        'CREATE VIEW "vw_pb2" AS SELECT k FROM vw_pb WHERE k > 1'
    )
    calls = []
    orig = sql_dml._missing_relation
    monkeypatch.setattr(
        sql_dml,
        "_missing_relation",
        lambda e: calls.append(1) or orig(e),
    )
    got = sorted(
        r.k
        for r in base.execute_sql(
            "SELECT k FROM vw_pb2 WHERE k < 4"
        ).collect()
    )
    assert got == [2, 3]
    assert calls == []  # chain of two views: still zero retries
    # a broken FORCE view's name used as a MERE COLUMN must not trip
    # the pre-bind (the backstop only errors in relation position)
    base.execute_sql(
        'CREATE FORCE VIEW "vw_broken" AS SELECT * FROM "vw_gone"'
    )
    base.execute_sql('CREATE CACHED TABLE "vw_colt"("vw_broken" INT)')
    base.execute_sql('INSERT INTO vw_colt VALUES (7)')
    assert [
        r[0]
        for r in base.execute_sql(
            "SELECT vw_broken FROM vw_colt"
        ).collect()
    ] == [7]


def test_drop_all_objects_clears_view_chains_any_depth(base):
    """DROP ALL OBJECTS wipes a view-over-view chain regardless of
    dependency order (r12 verdict stretch: the ordering gotcha was
    only documented in the probe) — the registry clears wholesale,
    so no RESTRICT ordering applies, and re-creating the base table
    afterwards starts from a truly empty namespace."""
    base.execute_sql('CREATE VIEW "vw_c1" AS SELECT k FROM vw_base')
    base.execute_sql('CREATE VIEW "vw_c2" AS SELECT k FROM vw_c1')
    base.execute_sql('CREATE VIEW "vw_c3" AS SELECT k FROM vw_c2')
    assert len(base.views.names()) == 3
    base.execute_sql("DROP ALL OBJECTS")
    assert base.views.names() == []
    assert list(base.sink.catalog) == []
    # nothing lingers: the same names create cleanly again
    base.execute_sql('CREATE CACHED TABLE "vw_base"("k" INT)')
    base.execute_sql('CREATE VIEW "vw_c1" AS SELECT k FROM vw_base')
    base.execute_sql("DROP ALL OBJECTS")


def test_view_table_usage_surfaces_dependency_edges(base):
    """INFORMATION_SCHEMA.VIEW_TABLE_USAGE (SQL-standard shape; H2
    1.4.200 does not expose it — documented extension) lists one row
    per (view, relation read), restricted to RELATION positions: the
    introspectable CASCADE preview. A column merely spelled like a
    table is not an edge; a FORCE view's dangling reference invents
    no row."""
    base.execute_sql(
        'CREATE VIEW "vw_u1" AS SELECT k, v AS vw_base FROM vw_base'
    )
    base.execute_sql('CREATE VIEW "vw_u2" AS SELECT k FROM vw_u1')
    base.execute_sql(
        'CREATE FORCE VIEW "vw_u3" AS SELECT * FROM vw_missing'
    )
    rows = {
        (r.VIEW_NAME, r.TABLE_NAME)
        for r in base.execute_sql(
            "SELECT VIEW_NAME, TABLE_NAME FROM "
            "INFORMATION_SCHEMA.VIEW_TABLE_USAGE"
        ).collect()
    }
    assert rows == {("vw_u1", "vw_base"), ("vw_u2", "vw_u1")}


def test_relation_names_unit(base):
    """Unit pins for views.relation_names (review r13): JOIN-family
    keywords CONTINUE a FROM-list scan (the comma-continued relation
    after an explicit join is a real dependency), subqueries /
    table functions record nothing, CTE aliases do record (use sites
    intersect with known names). r14: TWO-part qualified names record
    their dotted casefolded form (schema-qualified names map to
    engine logicals now), PUBLIC qualifiers also record the bare
    logical, deeper qualification records nothing."""
    from quasar_destination_h2_spark.views import relation_names

    cases = [
        ("SELECT * FROM a JOIN b ON a.x=b.x, c", {"a", "b", "c"}),
        ("SELECT * FROM a LEFT JOIN b ON a.i=b.i, c", {"a", "b", "c"}),
        ("SELECT * FROM a JOIN b USING (k), c", {"a", "b", "c"}),
        (
            "WITH recent AS (SELECT * FROM t) SELECT 1 FROM recent",
            {"t", "recent"},
        ),
        ("SELECT * FROM (SELECT * FROM inner_t) s", {"inner_t"}),
        ("SELECT * FROM range(10)", set()),
        ("SELECT * FROM db.t", {"db.t"}),
        ("SELECT * FROM PUBLIC.t", {"public.t", "t"}),
        ("SELECT * FROM `APP`.`T`", {"app.t"}),
        ("SELECT * FROM cat.db.t", set()),
        ("SELECT a, mytable FROM x", {"x"}),
        ("SELECT * FROM t ORDER BY a, b", {"t"}),
    ]
    for sql, want in cases:
        assert relation_names(sql) == want, sql


def test_relation_comma_after_join_blocks_drop(base):
    """The comma-continued relation after an explicit JOIN is a REAL
    dependency: dropping it must hit RESTRICT, not orphan the view
    (review r13 — the first stop-set draft ended the scan at JOIN)."""
    base.execute_sql('CREATE CACHED TABLE "vw_jc"("k" INT)')
    base.execute_sql(
        'CREATE VIEW "vw_jx" AS SELECT b.k AS bk FROM vw_base b '
        "JOIN vw_jc j ON b.k = j.k, vw_jc extra WHERE extra.k = 1"
    )
    with pytest.raises(ValueError, match="depend"):
        base.execute_sql("DROP TABLE vw_jc")
    base.execute_sql("DROP TABLE vw_jc CASCADE")


def test_scoped_dump_keeps_cte_views(base):
    """A view whose definition opens a CTE must still be emitted into
    a TABLE-scoped dump: the CTE alias is a relation-position token
    but names no catalog object, so it cannot count as an
    out-of-scope dependency (review r13 — the unintersected scan
    silently dropped such views from scoped dumps)."""
    base.execute_sql(
        'CREATE VIEW "vw_cte" AS WITH recent AS '
        "(SELECT k FROM vw_base WHERE k > 1) "
        "SELECT count(*) AS n FROM recent"
    )
    base.execute_sql(
        'CREATE VIEW "vw_exf" AS SELECT k FROM vw_base '
        "WHERE length(string(k)) > 0"
    )
    lines = [
        r.SCRIPT
        for r in base.execute_sql("SCRIPT NODATA TABLE vw_base").collect()
    ]
    assert any('"vw_cte"' in ln for ln in lines)
    assert any('"vw_exf"' in ln for ln in lines)
