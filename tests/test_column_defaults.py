"""Column DEFAULT / identity / NOT NULL / SELECTIVITY / COMMENT
metadata (colmeta.py): the H2 column options a real 1.4.200 dump
spells inside ``CREATE CACHED TABLE`` definitions and the reference
replays through RUNSCRIPT (H2Server.scala:41-58). Covers: option
parsing, INSERT default application (omitted columns, the DEFAULT
keyword, NULL_TO_DEFAULT conversion, exact-size identity sequence
allocation), NOT NULL enforcement on the DML write paths, the
ALTER COLUMN family, COMMENT ON, the INFORMATION_SCHEMA /
SHOW COLUMNS surfaces, SCRIPT round-trips, and the checked-in
H2-1.4.200-format identity dump fixture."""

from __future__ import annotations

import json
import os

import pytest

from quasar_destination_h2_spark.colmeta import NullViolation
from quasar_destination_h2_spark.engine import Engine

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "quasar_destination_h2_spark",
    "plans",
    "h2_identity_dump.sql",
)


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    yield eng
    # drop this module's tables so the shared warehouse's
    # SCHEMA-SCOPED auto-constraint-name counter resets — later
    # suites (test_constraints) pin generated CONSTRAINT_<n> names
    for logical in list(eng.sink.catalog):
        if str(logical).casefold().startswith(("cd_", "idd_")):
            eng.drop_table_if_exists(logical)


def _fresh(engine, name: str, ddl: str) -> None:
    engine.execute_sql(f'DROP TABLE IF EXISTS "{name}"')
    engine.execute_sql(ddl)


def test_defaults_fill_omitted_columns(engine):
    _fresh(
        engine,
        "cd_t1",
        'CREATE CACHED TABLE "cd_t1"("k" INT, '
        "\"s\" VARCHAR(8) DEFAULT 'none', \"n\" INT DEFAULT 7)",
    )
    engine.execute_sql("INSERT INTO cd_t1 (k) VALUES (1)")
    row = engine.execute_sql("SELECT * FROM cd_t1").collect()[0]
    assert (row.k, row.s, row.n) == (1, "none", 7)


def test_default_keyword_in_values(engine):
    _fresh(
        engine,
        "cd_t2",
        'CREATE CACHED TABLE "cd_t2"("k" INT, "n" INT DEFAULT 5)',
    )
    engine.execute_sql("INSERT INTO cd_t2 VALUES (1, DEFAULT), (2, 9)")
    got = {
        (r.k, r.n)
        for r in engine.execute_sql("SELECT * FROM cd_t2").collect()
    }
    assert got == {(1, 5), (2, 9)}


def test_default_keyword_without_recorded_default_is_null(engine):
    _fresh(engine, "cd_t3", 'CREATE CACHED TABLE "cd_t3"("a" INT, "b" INT DEFAULT 1)')
    engine.execute_sql("INSERT INTO cd_t3 VALUES (DEFAULT, DEFAULT)")
    row = engine.execute_sql("SELECT * FROM cd_t3").collect()[0]
    assert (row.a, row.b) == (None, 1)


def test_identity_auto_increment_allocates_per_row(engine):
    _fresh(
        engine,
        "cd_id1",
        'CREATE CACHED TABLE "cd_id1"("id" INT AUTO_INCREMENT(100, 5), '
        '"x" VARCHAR(4))',
    )
    engine.execute_sql("INSERT INTO cd_id1 (x) VALUES ('p'), ('q'), ('r')")
    ids = [
        r.id
        for r in engine.execute_sql(
            "SELECT id FROM cd_id1 ORDER BY id"
        ).collect()
    ]
    assert ids == [100, 105, 110]
    # the backing sequence is engine-visible and BELONGS_TO_TABLE
    seqs = [
        s
        for s in engine.sequences.names()
        if s.startswith("system_sequence_cd_id1")
    ]
    assert len(seqs) == 1
    assert engine.sequences.describe(seqs[0])["belongs_to_table"]
    # ... and dies with the table
    engine.execute_sql('DROP TABLE "cd_id1"')
    assert not [
        s
        for s in engine.sequences.names()
        if s.startswith("system_sequence_cd_id1")
    ]


def test_identity_type_is_bigint_pk(engine):
    _fresh(
        engine, "cd_id2", 'CREATE CACHED TABLE "cd_id2"("id" IDENTITY, "y" INT)'
    )
    engine.execute_sql("INSERT INTO cd_id2 (y) VALUES (7), (8)")
    assert engine.table("cd_id2").schema["id"].dataType.simpleString() == (
        "bigint"
    )
    assert any(
        e["type"] == "PRIMARY KEY" and e["columns"] == ["id"]
        for e in engine.constraints.for_table("cd_id2")
    )
    ids = sorted(
        r.id for r in engine.execute_sql("SELECT id FROM cd_id2").collect()
    )
    assert ids == [1, 2]


def test_null_to_default_converts_only_null_rows(engine):
    _fresh(
        engine,
        "cd_id3",
        'CREATE CACHED TABLE "cd_id3"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    # provided non-NULL ids burn no sequence values, but DO advance
    # the sequence past themselves (H2 1.4.200's
    # Column.updateSequenceIfRequired, advice r14) — the NULL row
    # then converts to the post-advance next value
    engine.execute_sql("INSERT INTO cd_id3 (id, x) VALUES (50, 1)")
    engine.execute_sql("INSERT INTO cd_id3 (id, x) VALUES (NULL, 2)")
    got = {
        (r.id, r.x)
        for r in engine.execute_sql("SELECT * FROM cd_id3").collect()
    }
    assert got == {(50, 1), (51, 2)}


def test_identity_fill_over_table_driven_insert(engine):
    _fresh(engine, "cd_src", 'CREATE CACHED TABLE "cd_src"("v" INT)')
    engine.execute_sql("INSERT INTO cd_src VALUES (10), (20), (30)")
    _fresh(
        engine,
        "cd_id4",
        'CREATE CACHED TABLE "cd_id4"("id" INT AUTO_INCREMENT, "v" INT)',
    )
    engine.execute_sql("INSERT INTO cd_id4 (v) SELECT v FROM cd_src")
    rows = engine.execute_sql("SELECT id, v FROM cd_id4 ORDER BY v").collect()
    assert [r.v for r in rows] == [10, 20, 30]
    assert sorted(r.id for r in rows) == [1, 2, 3]


def test_not_null_enforced_on_all_dml_paths(engine):
    _fresh(
        engine,
        "cd_nn",
        'CREATE CACHED TABLE "cd_nn"("a" INT NOT NULL, "b" INT)',
    )
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_nn VALUES (NULL, 1)")
    engine.execute_sql("INSERT INTO cd_nn VALUES (1, 1)")
    with pytest.raises(NullViolation):
        engine.execute_sql("UPDATE cd_nn SET a = NULL WHERE b = 1")
    with pytest.raises(NullViolation):
        engine.execute_sql(
            "MERGE INTO cd_nn (a, b) KEY (b) VALUES (NULL, 1)"
        )
    # nothing landed from the rejected statements
    assert engine.table("cd_nn").count() == 1


def test_pk_column_not_null_enforced_from_create(engine):
    _fresh(
        engine,
        "cd_pk",
        'CREATE CACHED TABLE "cd_pk"("k" INT PRIMARY KEY, "v" INT)',
    )
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_pk VALUES (NULL, 1)")


def test_alter_column_set_drop_default(engine):
    _fresh(engine, "cd_a1", 'CREATE CACHED TABLE "cd_a1"("a" INT, "b" INT)')
    engine.execute_sql('ALTER TABLE "cd_a1" ALTER COLUMN "b" SET DEFAULT 42')
    engine.execute_sql("INSERT INTO cd_a1 (a) VALUES (1)")
    engine.execute_sql('ALTER TABLE "cd_a1" ALTER COLUMN "b" DROP DEFAULT')
    engine.execute_sql("INSERT INTO cd_a1 (a) VALUES (2)")
    got = {
        (r.a, r.b)
        for r in engine.execute_sql("SELECT * FROM cd_a1").collect()
    }
    assert got == {(1, 42), (2, None)}


def test_alter_column_set_not_null_validates_existing(engine):
    _fresh(engine, "cd_a2", 'CREATE CACHED TABLE "cd_a2"("a" INT, "b" INT)')
    engine.execute_sql("INSERT INTO cd_a2 VALUES (NULL, 1)")
    with pytest.raises(NullViolation):
        engine.execute_sql('ALTER TABLE "cd_a2" ALTER COLUMN "a" SET NOT NULL')
    engine.execute_sql("DELETE FROM cd_a2 WHERE a IS NULL")
    engine.execute_sql('ALTER TABLE "cd_a2" ALTER COLUMN "a" SET NOT NULL')
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_a2 VALUES (NULL, 2)")
    # DROP NOT NULL lifts it again
    engine.execute_sql('ALTER TABLE "cd_a2" ALTER COLUMN "a" DROP NOT NULL')
    engine.execute_sql("INSERT INTO cd_a2 VALUES (NULL, 3)")
    assert engine.table("cd_a2").count() == 1


def test_alter_column_set_data_type_rejects_lossy(engine):
    _fresh(engine, "cd_a3", 'CREATE CACHED TABLE "cd_a3"("a" VARCHAR(8))')
    engine.execute_sql("INSERT INTO cd_a3 VALUES ('12'), ('x9')")
    with pytest.raises(ValueError, match="do not convert"):
        engine.execute_sql(
            'ALTER TABLE "cd_a3" ALTER COLUMN "a" SET DATA TYPE INT'
        )
    engine.execute_sql("DELETE FROM cd_a3 WHERE a = 'x9'")
    engine.execute_sql('ALTER TABLE "cd_a3" ALTER COLUMN "a" SET DATA TYPE INT')
    assert engine.table("cd_a3").schema["a"].dataType.simpleString() == "int"
    assert engine.execute_sql("SELECT a FROM cd_a3").collect()[0].a == 12


def test_alter_column_rename_migrates_metadata(engine):
    _fresh(
        engine,
        "cd_a4",
        'CREATE CACHED TABLE "cd_a4"("a" INT DEFAULT 3, "b" INT)',
    )
    engine.execute_sql('ALTER TABLE "cd_a4" ALTER COLUMN "a" RENAME TO "aa"')
    assert engine.table("cd_a4").columns == ["aa", "b"]
    engine.execute_sql("INSERT INTO cd_a4 (b) VALUES (1)")
    assert engine.execute_sql("SELECT aa FROM cd_a4").collect()[0].aa == 3


def test_alter_column_restart_with(engine):
    _fresh(
        engine,
        "cd_a5",
        'CREATE CACHED TABLE "cd_a5"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    engine.execute_sql('ALTER TABLE "cd_a5" ALTER COLUMN "id" RESTART WITH 500')
    engine.execute_sql("INSERT INTO cd_a5 (x) VALUES (1)")
    assert engine.execute_sql("SELECT id FROM cd_a5").collect()[0].id == 500


def test_comment_on_roundtrip_and_clear(engine):
    _fresh(engine, "cd_c1", 'CREATE CACHED TABLE "cd_c1"("a" INT)')
    engine.execute_sql("COMMENT ON TABLE cd_c1 IS 'tbl ''doc'''")
    engine.execute_sql('COMMENT ON COLUMN cd_c1."a" IS \'col doc\'')
    meta = engine.colmeta.for_table("cd_c1")
    assert meta["remarks"] == "tbl 'doc'"
    assert meta["columns"]["a"]["remarks"] == "col doc"
    engine.execute_sql("COMMENT ON COLUMN cd_c1.a IS NULL")
    assert "a" not in engine.colmeta.columns_of("cd_c1")
    # SEQUENCE/VIEW remarks are supported since r14 (an unknown
    # sequence errors precisely); the remaining H2 comment kinds
    # keep the documented reject naming the class
    with pytest.raises(ValueError, match="sequence not found"):
        engine.execute_sql("COMMENT ON SEQUENCE no_such_seq IS 'x'")
    with pytest.raises(ValueError, match="only TABLE, COLUMN"):
        engine.execute_sql("COMMENT ON CONSTANT c IS 'x'")


def test_script_roundtrip_preserves_column_metadata(engine, tmp_path):
    _fresh(
        engine,
        "cd_rt",
        'CREATE CACHED TABLE "cd_rt"("id" IDENTITY, '
        "\"v\" VARCHAR(8) DEFAULT 'none' NOT NULL, \"n\" INT)",
    )
    engine.execute_sql("COMMENT ON TABLE cd_rt IS 'rt'")
    engine.execute_sql("INSERT INTO cd_rt (v, n) VALUES ('a', 1), ('b', 2)")
    lines = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE cd_rt").collect()
    ]
    text = "\n".join(lines)
    assert "BELONGS_TO_TABLE" in text
    assert "NULL_TO_DEFAULT" in text
    assert "DEFAULT 'none' NOT NULL" in text
    assert "COMMENT ON TABLE \"cd_rt\" IS 'rt';" in text
    f = tmp_path / "cd_rt.sql"
    f.write_text(text + "\n")
    engine.execute_sql('DROP TABLE "cd_rt"')
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    # identity resumes from the dumped position; defaults still fill
    engine.execute_sql("INSERT INTO cd_rt (n) VALUES (3)")
    row = engine.execute_sql(
        "SELECT id, v FROM cd_rt WHERE n = 3"
    ).collect()[0]
    assert (row.id, row.v) == (3, "none")
    # NOT NULL still enforces after restore
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_rt (v, n) VALUES (NULL, 4)")
    engine.execute_sql('DROP TABLE "cd_rt"')


def test_identity_dump_fixture_restores(engine):
    engine.execute_sql('DROP TABLE IF EXISTS "IDD_ITEM"')
    engine.execute_sql(
        'DROP SEQUENCE IF EXISTS '
        '"SYSTEM_SEQUENCE_5BD9E2E7_5CF1_4D5A_9E3F_0A1B2C3D4E5F"'
    )
    engine.execute_sql(f"RUNSCRIPT FROM '{FIXTURE}'")
    assert engine.table("IDD_ITEM").count() == 3
    # identity dispenses from the dumped position
    engine.execute_sql("INSERT INTO IDD_ITEM (SKU) VALUES ('D-400')")
    row = engine.execute_sql(
        "SELECT ID, STATUS, QTY FROM IDD_ITEM WHERE SKU = 'D-400'"
    ).collect()[0]
    assert (row.ID, row.STATUS, row.QTY) == (4, "new", 0)
    # remarks restored through the COMMENT ON lines
    meta = engine.colmeta.for_table("IDD_ITEM")
    assert meta["remarks"] == "inventory items"
    assert meta["columns"]["qty"]["remarks"] == "on-hand count"
    # selectivity recorded from the dump spelling
    assert meta["columns"]["status"]["selectivity"] == 35
    engine.execute_sql('DROP TABLE "IDD_ITEM"')


def test_rename_table_migrates_colmeta(engine):
    _fresh(
        engine, "cd_rn", 'CREATE CACHED TABLE "cd_rn"("a" INT DEFAULT 9)'
    )
    engine.execute_sql('DROP TABLE IF EXISTS "cd_rn2"')
    engine.execute_sql('ALTER TABLE "cd_rn" RENAME TO "cd_rn2"')
    engine.execute_sql("INSERT INTO cd_rn2 (a) VALUES (DEFAULT)")
    assert engine.execute_sql("SELECT a FROM cd_rn2").collect()[0].a == 9
    engine.execute_sql('DROP TABLE "cd_rn2"')


def test_add_column_with_default_backfills(engine):
    _fresh(engine, "cd_ac", 'CREATE CACHED TABLE "cd_ac"("a" INT)')
    engine.execute_sql("INSERT INTO cd_ac VALUES (1), (2)")
    engine.execute_sql(
        "ALTER TABLE cd_ac ADD COLUMN \"s\" VARCHAR(8) DEFAULT 'bk' NOT NULL"
    )
    got = {
        (r.a, r.s)
        for r in engine.execute_sql("SELECT * FROM cd_ac").collect()
    }
    assert got == {(1, "bk"), (2, "bk")}
    # the default keeps applying to later inserts, NOT NULL enforces
    engine.execute_sql("INSERT INTO cd_ac (a) VALUES (3)")
    assert (
        engine.execute_sql("SELECT s FROM cd_ac WHERE a = 3").collect()[0].s
        == "bk"
    )
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_ac (a, s) VALUES (4, NULL)")


def test_add_column_not_null_without_default_rejected_on_rows(engine):
    _fresh(engine, "cd_ac2", 'CREATE CACHED TABLE "cd_ac2"("a" INT)')
    engine.execute_sql("INSERT INTO cd_ac2 VALUES (1)")
    with pytest.raises(ValueError, match="no DEFAULT"):
        engine.execute_sql('ALTER TABLE cd_ac2 ADD COLUMN "b" INT NOT NULL')
    # ... but is fine on an empty table
    engine.execute_sql("DELETE FROM cd_ac2 WHERE a = 1")
    engine.execute_sql('ALTER TABLE cd_ac2 ADD COLUMN "b" INT NOT NULL')
    with pytest.raises(NullViolation):
        engine.execute_sql("INSERT INTO cd_ac2 VALUES (1, NULL)")


def test_add_column_identity_rejected(engine):
    _fresh(engine, "cd_ac3", 'CREATE CACHED TABLE "cd_ac3"("a" INT)')
    with pytest.raises(ValueError, match="only at CREATE TABLE"):
        engine.execute_sql(
            'ALTER TABLE cd_ac3 ADD COLUMN "id" INT AUTO_INCREMENT'
        )


# --- review-r13 regression pins ------------------------------------------


def test_merge_preserves_matched_identity(engine):
    """MERGE must never reassign a matched row's identity value —
    the omitted identity column keeps the TARGET's value on matched
    rows and draws fresh values only for inserted rows."""
    _fresh(
        engine,
        "cd_mg",
        'CREATE CACHED TABLE "cd_mg"("id" INT AUTO_INCREMENT, '
        '"sku" VARCHAR(8), "qty" INT)',
    )
    engine.execute_sql("INSERT INTO cd_mg (sku, qty) VALUES ('A', 1)")
    assert engine.execute_sql(
        "SELECT id FROM cd_mg WHERE sku = 'A'"
    ).collect()[0].id == 1
    engine.execute_sql(
        "MERGE INTO cd_mg (sku, qty) KEY (sku) VALUES ('A', 5), ('B', 7)"
    )
    got = {
        (r.sku, r.id, r.qty)
        for r in engine.execute_sql("SELECT sku, id, qty FROM cd_mg").collect()
    }
    assert ("A", 1, 5) in got  # matched row kept id=1, qty updated
    b = next(t for t in got if t[0] == "B")
    assert b[1] is not None and b[1] != 1  # inserted row got a fresh id


def test_set_null_on_pk_member_refused(engine):
    _fresh(
        engine,
        "cd_pknn",
        'CREATE CACHED TABLE "cd_pknn"("k" INT PRIMARY KEY, "v" INT)',
    )
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        engine.execute_sql('ALTER TABLE cd_pknn ALTER COLUMN "k" SET NULL')


def test_add_column_default_null_not_null_rejected_on_rows(engine):
    _fresh(engine, "cd_dnn", 'CREATE CACHED TABLE "cd_dnn"("a" INT)')
    engine.execute_sql("INSERT INTO cd_dnn VALUES (1)")
    with pytest.raises(ValueError, match="no DEFAULT"):
        engine.execute_sql(
            'ALTER TABLE cd_dnn ADD COLUMN "b" INT DEFAULT NULL NOT NULL'
        )


# --- advice-r14 regression pins -------------------------------------------


def test_explicit_identity_insert_advances_sequence(engine):
    """H2 1.4.200 Column.updateSequenceIfRequired: an explicit value
    at/above the sequence position moves the sequence past it, so
    mixed explicit/auto statements never re-dispense a used id."""
    _fresh(
        engine,
        "cd_adv",
        'CREATE CACHED TABLE "cd_adv"("id" INT AUTO_INCREMENT, '
        '"x" VARCHAR(4))',
    )
    engine.execute_sql("INSERT INTO cd_adv (id, x) VALUES (4, 'a')")
    engine.execute_sql("INSERT INTO cd_adv (x) VALUES ('b')")
    got = {
        (r.id, r.x)
        for r in engine.execute_sql("SELECT * FROM cd_adv").collect()
    }
    assert got == {(4, "a"), (5, "b")}
    # a LOWER explicit value (below the last dispensed) never rewinds
    engine.execute_sql("INSERT INTO cd_adv (id, x) VALUES (2, 'c')")
    engine.execute_sql("INSERT INTO cd_adv (x) VALUES ('d')")
    ids = {
        r.id for r in engine.execute_sql("SELECT id FROM cd_adv").collect()
    }
    assert ids == {4, 5, 2, 6}
    # one statement mixing explicit and NULL rows: explicit max wins
    # BEFORE the statement's own fill range allocates
    engine.execute_sql(
        "INSERT INTO cd_adv (id, x) VALUES (20, 'e'), (NULL, 'f')"
    )
    got = dict(
        (r.x, r.id)
        for r in engine.execute_sql("SELECT id, x FROM cd_adv").collect()
    )
    assert got["e"] == 20 and got["f"] == 21


def test_explicit_identity_advance_h2_gap_rule(engine):
    """H2 compares against the LAST DISPENSED value, not the next:
    with increment 5 a provided value INSIDE the gap still bumps."""
    _fresh(
        engine,
        "cd_adv2",
        'CREATE CACHED TABLE "cd_adv2"("id" INT AUTO_INCREMENT(10, 5), '
        '"x" INT)',
    )
    engine.execute_sql("INSERT INTO cd_adv2 (x) VALUES (1)")  # id=10
    # 12 > last dispensed (10) → sequence restarts at 12+5=17 (H2's
    # exact rule), even though 12 < the pending next value 15
    engine.execute_sql("INSERT INTO cd_adv2 (id, x) VALUES (12, 2)")
    engine.execute_sql("INSERT INTO cd_adv2 (x) VALUES (3)")
    got = {
        (r.id, r.x)
        for r in engine.execute_sql("SELECT * FROM cd_adv2").collect()
    }
    assert got == {(10, 1), (12, 2), (17, 3)}


def test_identity_fill_select_source_is_partition_local(engine):
    """Bulk INSERT ... SELECT into an identity table assigns a
    contiguous 1..n range without a global single-partition window
    (advice r14) — ids are exactly the range, and mixed explicit-NULL
    sources convert only the NULL rows."""
    _fresh(engine, "cd_bsrc", 'CREATE CACHED TABLE "cd_bsrc"("v" INT)')
    vals = ", ".join(f"({i})" for i in range(200))
    engine.execute_sql(f"INSERT INTO cd_bsrc VALUES {vals}")
    _fresh(
        engine,
        "cd_bid",
        'CREATE CACHED TABLE "cd_bid"("id" INT AUTO_INCREMENT, "v" INT)',
    )
    engine.execute_sql("INSERT INTO cd_bid (v) SELECT v FROM cd_bsrc")
    rows = engine.execute_sql("SELECT id, v FROM cd_bid").collect()
    assert sorted(r.id for r in rows) == list(range(1, 201))
    assert sorted(r.v for r in rows) == list(range(200))
    # NULL_TO_DEFAULT over a SELECT source: only NULL rows draw
    _fresh(
        engine,
        "cd_bid2",
        'CREATE CACHED TABLE "cd_bid2"("id" INT AUTO_INCREMENT, "v" INT)',
    )
    engine.execute_sql(
        "INSERT INTO cd_bid2 (id, v) "
        "SELECT CASE WHEN v % 3 = 0 THEN NULL ELSE v + 1000 END, v "
        "FROM cd_bsrc"
    )
    rows = engine.execute_sql("SELECT id, v FROM cd_bid2").collect()
    explicit = sorted(r.id for r in rows if r.v % 3 != 0)
    filled = sorted(r.id for r in rows if r.v % 3 == 0)
    assert explicit == sorted(
        v + 1000 for v in range(200) if v % 3 != 0
    )
    # the explicit max (1199) advanced the sequence first, then the
    # 67 NULL rows drew a contiguous range after it
    assert filled == list(range(1200, 1200 + 67))
    assert len(set(filled) | set(explicit)) == 200


def test_drop_table_keeps_sequence_other_table_draws_from(engine):
    """advice r14: dropping a table whose identity sequence a SECOND
    table's column draws from must keep the sequence alive."""
    _fresh(
        engine,
        "cd_sh1",
        'CREATE CACHED TABLE "cd_sh1"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    seq = engine.colmeta.columns_of("cd_sh1")["id"]["sequence"]
    _fresh(engine, "cd_sh2", 'CREATE CACHED TABLE "cd_sh2"("k" INT, "n" INT)')
    engine.execute_sql(
        f'ALTER TABLE cd_sh2 ALTER COLUMN "n" SET DEFAULT '
        f"(NEXT VALUE FOR \"{seq}\")"
    )
    engine.execute_sql('DROP TABLE "cd_sh1"')
    assert engine.sequences.exists(seq)  # survived: cd_sh2 draws
    engine.execute_sql("INSERT INTO cd_sh2 (k) VALUES (1)")
    assert (
        engine.execute_sql("SELECT n FROM cd_sh2").collect()[0].n
        is not None
    )
    # once the LAST owner unbinds, the BELONGS_TO_TABLE drop proceeds
    engine.execute_sql('ALTER TABLE cd_sh2 ALTER COLUMN "n" DROP DEFAULT')
    assert not engine.sequences.exists(seq)
    engine.execute_sql('DROP TABLE "cd_sh2"')


def test_add_column_default_null_in_parens_not_null_rejected(engine):
    """advice r14: DEFAULT (NULL) — any parenthesized NULL spelling —
    hits the same no-lawful-fill guard as DEFAULT NULL."""
    _fresh(engine, "cd_dnp", 'CREATE CACHED TABLE "cd_dnp"("a" INT)')
    engine.execute_sql("INSERT INTO cd_dnp VALUES (1)")
    with pytest.raises(ValueError, match="no DEFAULT"):
        engine.execute_sql(
            'ALTER TABLE cd_dnp ADD COLUMN "b" INT DEFAULT (NULL) NOT NULL'
        )
    with pytest.raises(ValueError, match="no DEFAULT"):
        engine.execute_sql(
            "ALTER TABLE cd_dnp ADD COLUMN \"b\" INT "
            "DEFAULT (( null )) NOT NULL"
        )


def test_empty_remarks_roundtrip_through_dump(engine):
    """advice r14: COMMENT '' is recordable and must survive a dump
    (truthiness dropped it before)."""
    _fresh(engine, "cd_er", 'CREATE CACHED TABLE "cd_er"("a" INT)')
    engine.execute_sql("COMMENT ON TABLE cd_er IS ''")
    engine.execute_sql("COMMENT ON COLUMN cd_er.a IS ''")
    lines = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE cd_er").collect()
    ]
    assert any(
        "COMMENT ON TABLE" in ln and "IS ''" in ln for ln in lines
    )
    assert any(
        "COMMENT ON COLUMN" in ln and "IS ''" in ln for ln in lines
    )
    # IS NULL still clears (None-removes) — no COMMENT line dumps
    engine.execute_sql("COMMENT ON TABLE cd_er IS NULL")
    engine.execute_sql("COMMENT ON COLUMN cd_er.a IS NULL")
    lines = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE cd_er").collect()
    ]
    assert not any("COMMENT ON" in ln for ln in lines)


def test_default_keyword_on_metadata_free_table(engine):
    _fresh(engine, "cd_nfm", 'CREATE CACHED TABLE "cd_nfm"("a" INT, "b" INT)')
    engine.execute_sql("INSERT INTO cd_nfm VALUES (DEFAULT, 1)")
    row = engine.execute_sql("SELECT * FROM cd_nfm").collect()[0]
    assert (row.a, row.b) == (None, 1)


def test_identity_backing_sequence_reclaimed(engine):
    _fresh(
        engine,
        "cd_orp",
        'CREATE CACHED TABLE "cd_orp"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    mine = lambda: [  # noqa: E731
        s
        for s in engine.sequences.names()
        if s.startswith("system_sequence_cd_orp")
    ]
    assert len(mine()) == 1
    engine.execute_sql('ALTER TABLE cd_orp ALTER COLUMN "id" DROP DEFAULT')
    assert mine() == []  # DROP DEFAULT reclaimed the owned sequence
    _fresh(
        engine,
        "cd_orp",
        'CREATE CACHED TABLE "cd_orp"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    engine.execute_sql('ALTER TABLE cd_orp DROP COLUMN "id"')
    assert mine() == []  # DROP COLUMN reclaimed it too


def test_drop_sequence_with_dependent_column_refused(engine):
    engine.execute_sql('DROP TABLE IF EXISTS "cd_sd"')
    engine.execute_sql('DROP SEQUENCE IF EXISTS "cd_sd_seq"')
    engine.execute_sql('CREATE SEQUENCE "cd_sd_seq" START WITH 1')
    engine.execute_sql(
        'CREATE CACHED TABLE "cd_sd"("id" INT DEFAULT '
        "(NEXT VALUE FOR \"cd_sd_seq\"), \"x\" INT)"
    )
    with pytest.raises(ValueError, match="draw their default"):
        engine.execute_sql('DROP SEQUENCE "cd_sd_seq"')
    engine.execute_sql('DROP TABLE "cd_sd"')
    # the USER sequence survives the table (not BELONGS_TO_TABLE) and
    # is droppable once no column draws from it
    engine.execute_sql('DROP SEQUENCE "cd_sd_seq"')


def test_selectivity_zero_recorded_at_create(engine):
    _fresh(
        engine, "cd_s0", 'CREATE CACHED TABLE "cd_s0"("a" INT SELECTIVITY 0)'
    )
    assert engine.colmeta.columns_of("cd_s0")["a"]["selectivity"] == 0


def test_create_if_not_exists_skips_validation(engine):
    _fresh(engine, "cd_ine", 'CREATE CACHED TABLE "cd_ine"("a" INT)')
    # references a sequence that does NOT exist — H2 skips the whole
    # statement when the table already exists, so no error
    engine.execute_sql(
        'CREATE CACHED TABLE IF NOT EXISTS "cd_ine"('
        '"id" BIGINT DEFAULT (NEXT VALUE FOR "cd_ine_ghost") '
        'SEQUENCE "cd_ine_ghost")'
    )
    assert engine.table("cd_ine").columns == ["a"]


def test_auto_increment_zero_start_and_zero_increment(engine):
    _fresh(
        engine,
        "cd_z",
        'CREATE CACHED TABLE "cd_z"("id" INT AUTO_INCREMENT(0), "x" INT)',
    )
    engine.execute_sql("INSERT INTO cd_z (x) VALUES (1)")
    assert engine.execute_sql("SELECT id FROM cd_z").collect()[0].id == 0
    with pytest.raises(ValueError, match="must not be 0"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cd_z2"("id" INT AUTO_INCREMENT(1, 0))'
        )
    assert "cd_z2" not in engine.sink.catalog


def test_plain_add_column_is_metadata_only(engine):
    """NULL-filled ADD COLUMN must not rewrite the table: the 100 TB
    case is one catalog statement. Old parquet files never carry the
    column (the reader fills NULL from the declared schema); the
    declared type is recorded so a fresh process re-applies it."""
    import os as _os

    from quasar_destination_h2_spark.sources.sink import warehouse_path

    _fresh(engine, "cd_mo", 'CREATE CACHED TABLE "cd_mo"("a" INT)')
    engine.execute_sql("INSERT INTO cd_mo VALUES (1), (2)")
    path = warehouse_path(engine.spark, engine.sink.catalog["cd_mo"])
    files_before = sorted(
        f for f in _os.listdir(path) if f.endswith(".parquet")
    )
    engine.execute_sql('ALTER TABLE cd_mo ADD COLUMN "b" BIGINT')
    files_after = sorted(
        f for f in _os.listdir(path) if f.endswith(".parquet")
    )
    assert files_before == files_after  # zero data moved
    # the raw files still lack the column; the TABLE schema has it
    assert "b" not in engine.spark.read.parquet(path).columns
    assert engine.table("cd_mo").columns == ["a", "b"]
    got = {
        (r.a, r.b)
        for r in engine.execute_sql("SELECT * FROM cd_mo").collect()
    }
    assert got == {(1, None), (2, None)}
    # the declared type is recorded for fresh-process re-registration
    assert (
        engine.colmeta.columns_of("cd_mo")["b"]["added_type"] == "bigint"
    )
    # appends carry the column; old files keep reading NULL
    engine.execute_sql("INSERT INTO cd_mo VALUES (3, 30)")
    got = {
        (r.a, r.b)
        for r in engine.execute_sql("SELECT * FROM cd_mo").collect()
    }
    assert got == {(1, None), (2, None), (3, 30)}


def test_values_identity_assigned_in_statement_order(engine):
    _fresh(
        engine,
        "cd_ord",
        'CREATE CACHED TABLE "cd_ord"("id" INT AUTO_INCREMENT, '
        '"x" VARCHAR(4))',
    )
    # non-monotonic VALUES: H2 assigns in statement row order
    engine.execute_sql("INSERT INTO cd_ord (x) VALUES ('z'), ('a'), ('m')")
    got = {
        (r.x, r.id)
        for r in engine.execute_sql("SELECT x, id FROM cd_ord").collect()
    }
    assert got == {("z", 1), ("a", 2), ("m", 3)}


def test_merge_using_not_matched_fills_defaults(engine):
    _fresh(
        engine,
        "cd_mu",
        'CREATE CACHED TABLE "cd_mu"("id" INT AUTO_INCREMENT, '
        "\"sku\" VARCHAR(8), \"qty\" INT DEFAULT 3 NOT NULL)",
    )
    engine.execute_sql("INSERT INTO cd_mu (sku) VALUES ('A')")
    engine.execute_sql(
        "MERGE INTO cd_mu tg USING (SELECT 'B' AS s) src ON tg.sku = src.s "
        "WHEN NOT MATCHED THEN INSERT (sku) VALUES (src.s)"
    )
    row = engine.execute_sql(
        "SELECT id, qty FROM cd_mu WHERE sku = 'B'"
    ).collect()[0]
    assert row.id == 2 and row.qty == 3  # identity + default filled


def test_merge_keeps_matched_explicit_null(engine):
    _fresh(
        engine,
        "cd_mnul",
        'CREATE CACHED TABLE "cd_mnul"("k" INT, '
        "\"status\" VARCHAR(8) DEFAULT 'new', \"v\" INT)",
    )
    engine.execute_sql(
        "INSERT INTO cd_mnul (k, status, v) VALUES (1, NULL, 0)"
    )
    engine.execute_sql("MERGE INTO cd_mnul (k, v) KEY (k) VALUES (1, 9)")
    row = engine.execute_sql(
        "SELECT status, v FROM cd_mnul WHERE k = 1"
    ).collect()[0]
    # the matched row's explicit NULL survives — never re-defaulted
    assert (row.status, row.v) == (None, 9)


def test_set_default_same_sequence_keeps_it(engine):
    _fresh(
        engine,
        "cd_sseq",
        'CREATE CACHED TABLE "cd_sseq"("id" INT AUTO_INCREMENT, "x" INT)',
    )
    seq = engine.colmeta.columns_of("cd_sseq")["id"]["sequence"]
    engine.execute_sql(
        f'ALTER TABLE cd_sseq ALTER COLUMN "id" SET DEFAULT '
        f"(NEXT VALUE FOR \"{seq}\")"
    )
    # the binding's backing sequence must still exist and dispense
    engine.execute_sql("INSERT INTO cd_sseq (x) VALUES (1)")
    assert engine.execute_sql("SELECT id FROM cd_sseq").collect()[0].id == 1


def test_comment_on_stringdecode_literal(engine):
    _fresh(engine, "cd_sd2", 'CREATE CACHED TABLE "cd_sd2"("a" INT)')
    engine.execute_sql(
        "COMMENT ON TABLE cd_sd2 IS STRINGDECODE('line1\\nline2')"
    )
    assert engine.colmeta.for_table("cd_sd2")["remarks"] == "line1\nline2"


def test_add_column_sequence_binding_rejected(engine):
    _fresh(engine, "cd_acsq", 'CREATE CACHED TABLE "cd_acsq"("a" INT)')
    engine.execute_sql('DROP SEQUENCE IF EXISTS "cd_acsq_s"')
    engine.execute_sql('CREATE SEQUENCE "cd_acsq_s"')
    with pytest.raises(ValueError, match="only at CREATE TABLE"):
        engine.execute_sql(
            'ALTER TABLE cd_acsq ADD COLUMN "b" INT SEQUENCE "cd_acsq_s"'
        )
    with pytest.raises(ValueError, match="only at CREATE TABLE"):
        engine.execute_sql(
            'ALTER TABLE cd_acsq ADD COLUMN "c" INT NULL_TO_DEFAULT'
        )
