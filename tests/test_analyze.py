"""H2 ``ANALYZE [TABLE t] [SAMPLE_SIZE n]`` (r15): computed
per-column SELECTIVITY recorded in the column-metadata registry and
surfaced through INFORMATION_SCHEMA.COLUMNS and SCRIPT — the columns
an ANALYZEd real H2 1.4.200 re-emits. Reference route: the reference
replays arbitrary user scripts through RUNSCRIPT
(/root/reference/core/src/main/scala/quasar/destination/h2/server/
H2Server.scala:41-58), and an ANALYZEd database's dump carries
``SELECTIVITY n`` on every column definition."""

from __future__ import annotations

import json

import pytest

from quasar_destination_h2_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    yield eng
    for logical in list(eng.sink.catalog):
        if str(logical).casefold().startswith("az_"):
            eng.drop_table_if_exists(logical)


def _mk(engine, name: str, n: int = 20) -> None:
    engine.execute_sql(f'DROP TABLE IF EXISTS "{name}"')
    engine.execute_sql(
        f'CREATE CACHED TABLE "{name}"('
        '"k" INT, "grp" VARCHAR(4), "const" INT, "nl" INT)'
    )
    rows = ", ".join(
        f"({i}, 'g{i % 4}', 7, {'NULL' if i < n // 2 else i})"
        for i in range(n)
    )
    engine.execute_sql(f'INSERT INTO "{name}" VALUES {rows}')


def _selectivities(engine, name: str) -> dict:
    return {
        c: e.get("selectivity")
        for c, e in engine.colmeta.columns_of(name).items()
    }


def test_analyze_table_computes_selectivity(engine):
    """selectivity = max(1, min(100, 100 * distinct // rows)); NULL
    counts as one distinct value (H2's hash-set iteration)."""
    _mk(engine, "AZ_BASIC")
    engine.execute_sql('ANALYZE TABLE "AZ_BASIC"')
    # k: 20 distinct / 20 rows = 100; grp: 4/20 = 20; const: 1/20 = 5;
    # nl: 10 values + NULL = 11/20 = 55
    assert _selectivities(engine, "AZ_BASIC") == {
        "k": 100,
        "grp": 20,
        "const": 5,
        "nl": 55,
    }


def test_analyze_surfaces_in_columns_view_and_script(engine):
    _mk(engine, "AZ_SURF")
    pre = {
        r.COLUMN_NAME: r.SELECTIVITY
        for r in engine.execute_sql(
            "SELECT COLUMN_NAME, SELECTIVITY FROM "
            "INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'AZ_SURF'"
        ).collect()
    }
    assert set(pre.values()) == {50}  # H2's default before ANALYZE
    engine.execute_sql('ANALYZE TABLE "AZ_SURF"')
    post = {
        r.COLUMN_NAME: r.SELECTIVITY
        for r in engine.execute_sql(
            "SELECT COLUMN_NAME, SELECTIVITY FROM "
            "INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'AZ_SURF'"
        ).collect()
    }
    assert post == {"k": 100, "grp": 20, "const": 5, "nl": 55}
    line = next(
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE AZ_SURF").collect()
        if "CREATE CACHED TABLE" in r.SCRIPT
    )
    assert line.count("SELECTIVITY") == 4 and "SELECTIVITY 55" in line


def test_analyze_script_roundtrips_selectivity(engine, tmp_path):
    """An ANALYZEd dump restores with the statistics intact — the
    exact dump shape a real ANALYZEd H2 produces."""
    _mk(engine, "AZ_RT")
    engine.execute_sql('ANALYZE TABLE "AZ_RT"')
    dump = tmp_path / "az_rt.sql"
    engine.execute_sql(f"SCRIPT NODATA TO '{dump}' TABLE AZ_RT")
    engine.execute_sql('DROP TABLE "AZ_RT"')
    engine.execute_sql(f"RUNSCRIPT FROM '{dump}'")
    assert _selectivities(engine, "AZ_RT") == {
        "k": 100,
        "grp": 20,
        "const": 5,
        "nl": 55,
    }


def test_analyze_sample_size_accepted_ignored(engine):
    _mk(engine, "AZ_SS")
    engine.execute_sql('ANALYZE TABLE "AZ_SS" SAMPLE_SIZE 3')
    # exact statistics regardless of the requested sample (documented
    # divergence: one distributed pass, deterministic)
    assert _selectivities(engine, "AZ_SS")["k"] == 100


def test_analyze_bare_covers_catalog_and_spark_form_falls_through(engine):
    """Bare ANALYZE stamps the whole (session-shared) catalog — so
    this test snapshots every OTHER table's selectivity first and
    restores it after, or a later module's exact SCRIPT-line
    assertion would see SELECTIVITY tokens it never wrote (review
    r15: the suite must pass under any module order)."""
    before = {
        t: {
            c: e.get("selectivity")
            for c, e in te.get("columns", {}).items()
        }
        for t, te in engine.colmeta.all().items()
    }
    _mk(engine, "AZ_ALL1")
    _mk(engine, "AZ_ALL2")
    try:
        engine.execute_sql("ANALYZE")
        assert _selectivities(engine, "AZ_ALL1")["grp"] == 20
        assert _selectivities(engine, "AZ_ALL2")["grp"] == 20
        # Spark's ANALYZE TABLE ... COMPUTE STATISTICS leaves a tail
        # this grammar doesn't consume and falls through to Spark SQL
        # (which errors on the unknown SESSION table — proof it got
        # there); a Spark-DATABASE-qualified spelling must fall
        # through the same way, never die on "unknown schema"
        for stmt in (
            'ANALYZE TABLE "AZ_ALL1" COMPUTE STATISTICS',
            "ANALYZE TABLE sparkdb.t COMPUTE STATISTICS",
        ):
            with pytest.raises(Exception) as ei:
                engine.execute_sql(stmt)
            assert "ANALYZE:" not in str(ei.value)
            assert "unknown schema" not in str(ei.value)
    finally:
        for t, te in engine.colmeta.all().items():
            if t.startswith("az_"):
                continue
            prev = before.get(t, {})
            restore = {
                c: {"selectivity": prev.get(c)}
                for c, e in te.get("columns", {}).items()
                if e.get("selectivity") != prev.get(c)
            }
            if restore:
                engine.colmeta.update_columns(t, restore)


def test_analyze_guards(engine):
    with pytest.raises(ValueError, match="table not found"):
        engine.execute_sql("ANALYZE TABLE AZ_GHOST")
    # empty table: statistics untouched (H2 leaves them alone)
    engine.execute_sql('DROP TABLE IF EXISTS "AZ_EMPTY"')
    engine.execute_sql('CREATE CACHED TABLE "AZ_EMPTY"("a" INT)')
    engine.execute_sql('ANALYZE TABLE "AZ_EMPTY"')
    assert _selectivities(engine, "AZ_EMPTY") == {}


def test_analyze_skips_non_atomic_columns(engine, spark):
    """Vector index tables (array columns) must not break ANALYZE —
    H2 has no such types and DISTINCT over them is undefined here."""
    from quasar_destination_h2_spark import idents
    from quasar_destination_h2_spark.sources.sink import prepare_replace

    engine.execute_sql('DROP TABLE IF EXISTS "AZ_VEC"')
    df = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])],
        "vid bigint, emb array<double>",
    )
    physical = idents.storage_safe_name("AZ_VEC")
    prepare_replace(spark, physical)
    df.write.mode("overwrite").format("parquet").saveAsTable(
        idents.hygienic_ident(physical)
    )
    engine.sink.catalog["AZ_VEC"] = physical
    engine.sink._persist_catalog()
    engine.execute_sql('ANALYZE TABLE "AZ_VEC"')
    sel = _selectivities(engine, "AZ_VEC")
    assert sel.get("vid") == 100 and "emb" not in sel


def test_analyze_sample_size_bounds_the_scan(engine):
    """SAMPLE_SIZE n is HONORED with H2's LIMIT-bounded-scan
    semantics (Analyze.java; r16 verdict task 4). Probes are
    subset-invariant so no 3-row choice can change them: the
    all-distinct column reads 100 under ANY 3-row sample (3 distinct
    / 3 rows) and the constant column reads 100*1//3 = 33 — vs 5
    exact, the behavioral proof the aggregate saw ONLY the bounded
    prefix. SAMPLE_SIZE 0 forces exact statistics (H2)."""
    _mk(engine, "AZ_SAMPLE")
    engine.execute_sql('ANALYZE TABLE "AZ_SAMPLE" SAMPLE_SIZE 3')
    sel = _selectivities(engine, "AZ_SAMPLE")
    assert sel["k"] == 100
    assert sel["const"] == 33
    engine.execute_sql('ANALYZE TABLE "AZ_SAMPLE" SAMPLE_SIZE 0')
    assert _selectivities(engine, "AZ_SAMPLE") == {
        "k": 100,
        "grp": 20,
        "const": 5,
        "nl": 55,
    }


def test_analyze_direct_api_casefolds(engine):
    """analyze_tables('az_case') must bind the catalog's 'AZ_CASE'
    through the same casefolded lookup every sibling surface uses
    (rename_table/_logical) — advice r16."""
    _mk(engine, "AZ_CASE")
    assert engine.analyze_tables("az_case") == 1
    assert _selectivities(engine, "AZ_CASE")["k"] == 100
    with pytest.raises(ValueError, match="table not found"):
        engine.analyze_tables("az_case_ghost")
