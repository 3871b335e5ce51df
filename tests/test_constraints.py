"""H2 PRIMARY KEY / UNIQUE constraints as recorded catalog metadata
(constraints.py + sql_dml + info_schema + script_stmt): a dump
authored by a REAL H2 instance — inline column constraints,
table-level clauses, schema-qualified ALTER ... ADD CONSTRAINT lines
(the shapes H2's own SCRIPT emits; the reference's init-script path,
H2Server.scala:41-58, runs arbitrary user DDL) — must restore, be
introspectable where H2 spells it, and round-trip through SCRIPT.
CHECK is accepted AND ENFORCED on every DML write path (r11 verdict
task 2); FOREIGN KEY is accept-and-record since r13 (r12 verdict
task 1 — enforcement documented as not provided)."""

from __future__ import annotations

import json
import os
import re
import tempfile

import pytest

from quasar_destination_h2_spark.constraints import ConstraintError
from quasar_destination_h2_spark.engine import Engine


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


def test_foreign_h2_dump_restores(engine):
    """The motivating case: a constraint-bearing H2-authored dump —
    inline PK, named table-level UNIQUE, and a schema-qualified
    ALTER ADD CONSTRAINT — restores instead of erroring, and every
    constraint lands in the registry."""
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_users"("id" INT NOT NULL PRIMARY KEY, '
        '"email" VARCHAR(64), "org" VARCHAR(16), '
        'CONSTRAINT "uq_email" UNIQUE("email"))'
    )
    engine.execute_sql(
        'ALTER TABLE PUBLIC."cn_users" ADD CONSTRAINT PUBLIC."uq_org" '
        'UNIQUE("org")'
    )
    got = {
        (e["name"], e["type"], tuple(e["columns"]))
        for e in engine.constraints.for_table("cn_users")
    }
    # the unnamed inline PK's GENERATED name is schema-scoped (any
    # earlier suite's leftovers shift the counter) — pin its shape,
    # not its number
    pk = next(t for t in got if t[1] == "PRIMARY KEY")
    assert re.fullmatch(r"(?i)constraint_\d+", pk[0]) and pk[2] == ("id",)
    assert got - {pk} == {
        ("uq_email", "UNIQUE", ("email",)),
        ("uq_org", "UNIQUE", ("org",)),
    }


def test_constraints_surface_in_information_schema_and_show(engine):
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_t"("a" INT, "b" INT, "c" VARCHAR, '
        'CONSTRAINT "pk_ab" PRIMARY KEY("a", "b"), UNIQUE("c"))'
    )
    rows = [
        tuple(r)
        for r in engine.execute_sql(
            "SELECT CONSTRAINT_NAME, CONSTRAINT_TYPE, TABLE_NAME, "
            "COLUMN_LIST FROM INFORMATION_SCHEMA.CONSTRAINTS "
            "WHERE TABLE_NAME = 'cn_t' ORDER BY CONSTRAINT_NAME"
        ).collect()
    ]
    # the unnamed UNIQUE's generated name is schema-scoped — shape,
    # not number (the test_foreign_h2_dump_restores rationale)
    uq = next(r for r in rows if r[1] == "UNIQUE")
    assert re.fullmatch(r"(?i)constraint_\d+", uq[0])
    assert uq[2:] == ("cn_t", "c")
    assert [r for r in rows if r[1] != "UNIQUE"] == [
        ("pk_ab", "PRIMARY KEY", "cn_t", "a,b")
    ]
    # H2/MySQL KEY spelling in SHOW COLUMNS: PRI beats UNI
    key = {
        r.FIELD: r.KEY
        for r in engine.execute_sql('SHOW COLUMNS FROM "cn_t"').collect()
    }
    assert key == {"a": "PRI", "b": "PRI", "c": "UNI"}


def test_script_roundtrip_preserves_constraints(engine):
    engine.execute_sql("DROP ALL OBJECTS")
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_rt"("id" INT PRIMARY KEY, "u" VARCHAR, '
        'CONSTRAINT "uq_u" UNIQUE("u"))'
    )
    lines = [r.SCRIPT for r in engine.execute_sql("SCRIPT NODATA").collect()]
    # PK member spells NOT NULL (H2's own dump shape) even though
    # Spark's parquet storage forces nullable — the registry is the
    # authoritative carrier
    assert (
        'CREATE CACHED TABLE "cn_rt"("id" INTEGER NOT NULL, "u" VARCHAR);'
        in lines
    )
    assert (
        'ALTER TABLE "cn_rt" ADD CONSTRAINT "CONSTRAINT_1" '
        'PRIMARY KEY("id");' in lines
    )
    assert 'ALTER TABLE "cn_rt" ADD CONSTRAINT "uq_u" UNIQUE("u");' in lines
    f = os.path.join(tempfile.mkdtemp(), "cons.sql")
    with open(f, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    engine.execute_sql('DROP TABLE "cn_rt"')
    assert engine.constraints.for_table("cn_rt") == []  # died with table
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    got = {
        (e["name"], e["type"], tuple(e["columns"]))
        for e in engine.constraints.for_table("cn_rt")
    }
    assert got == {
        ("CONSTRAINT_1", "PRIMARY KEY", ("id",)),
        ("uq_u", "UNIQUE", ("u",)),
    }


def test_foreign_key_accept_and_record(engine):
    """FOREIGN KEY is accept-and-record since r13 (r12 verdict task
    1: real H2 dumps carry ``ALTER ... FOREIGN KEY ... NOCHECK``
    lines and the loud reject killed foreign-dump restore).
    Enforcement is documented as not provided; the record must
    surface in INFORMATION_SCHEMA (REFERENTIAL + CROSS_REFERENCES),
    round-trip through SCRIPT, honor DROP RESTRICT/CASCADE, and
    survive RENAME in both directions."""
    ex = engine.execute_sql
    for t in ("cn_fkc", "cn_fkp2", "cn_fkp"):
        ex(f'DROP TABLE IF EXISTS "{t}" CASCADE')
    ex('CREATE CACHED TABLE "cn_fkp"("id" INT NOT NULL, "v" VARCHAR(8))')
    ex('ALTER TABLE "cn_fkp" ADD CONSTRAINT "cn_pk" PRIMARY KEY("id")')
    # referenced table must EXIST (H2 validates referential DDL)
    with pytest.raises(ValueError, match="referenced table not found"):
        ex(
            'CREATE CACHED TABLE "cn_fkc"("x" INT, '
            'FOREIGN KEY ("x") REFERENCES "nowhere"("y"))'
        )
    # table-level at create (explicit columns + rules), column-level
    # inline (defaults to the referenced PK), ALTER ADD with H2's
    # dump spellings (PUBLIC qualifiers + trailing NOCHECK)
    ex(
        'CREATE CACHED TABLE "cn_fkc"("x" INT, "y" INT, '
        'CONSTRAINT "cn_fk1" FOREIGN KEY ("x") REFERENCES '
        '"cn_fkp"("id") ON DELETE CASCADE ON UPDATE SET NULL)'
    )
    ex('CREATE CACHED TABLE "cn_fkp2"("z" INT REFERENCES "cn_fkp")')
    ex(
        'ALTER TABLE "PUBLIC"."cn_fkc" ADD CONSTRAINT '
        '"PUBLIC"."cn_fk2" FOREIGN KEY("y") REFERENCES '
        '"PUBLIC"."cn_fkp"("id") NOCHECK'
    )
    ents = {
        e["name"]: e for e in engine.constraints.for_table("cn_fkc")
    }
    assert ents["cn_fk1"]["ref_table"] == "cn_fkp"
    assert ents["cn_fk1"]["ref_columns"] == ["id"]
    assert ents["cn_fk1"]["delete_rule"] == "CASCADE"
    assert ents["cn_fk1"]["update_rule"] == "SET NULL"
    assert ents["cn_fk2"]["ref_columns"] == ["id"]
    inline = engine.constraints.for_table("cn_fkp2")[0]
    assert inline["ref_columns"] == ["id"]  # defaulted to the PK
    # INFORMATION_SCHEMA: REFERENTIAL type + CROSS_REFERENCES rows
    # with JDBC rule codes (CASCADE=0, RESTRICT(default)=1,
    # SET NULL=2) and the referenced PK's name
    got = {
        tuple(r)
        for r in ex(
            "SELECT FK_NAME, PKTABLE_NAME, PKCOLUMN_NAME, "
            "FKCOLUMN_NAME, UPDATE_RULE, DELETE_RULE, PK_NAME "
            "FROM INFORMATION_SCHEMA.CROSS_REFERENCES "
            "WHERE FKTABLE_NAME = 'cn_fkc'"
        ).collect()
    }
    assert got == {
        ("cn_fk1", "cn_fkp", "id", "x", 2, 0, "cn_pk"),
        ("cn_fk2", "cn_fkp", "id", "y", 1, 1, "cn_pk"),
    }
    types = {
        r[0]: r[1]
        for r in ex(
            "SELECT CONSTRAINT_NAME, CONSTRAINT_TYPE FROM "
            "INFORMATION_SCHEMA.CONSTRAINTS "
            "WHERE TABLE_NAME = 'cn_fkc'"
        ).collect()
    }
    assert types == {"cn_fk1": "REFERENTIAL", "cn_fk2": "REFERENTIAL"}
    # SCRIPT: FK lines come AFTER every table (H2's restore order),
    # spelled with the trailing NOCHECK, and RUNSCRIPT restores them
    lines = [r[0] for r in ex("SCRIPT NODATA").collect()]
    fk1 = next(ln for ln in lines if '"cn_fk1"' in ln)
    assert (
        'FOREIGN KEY("x") REFERENCES "cn_fkp"("id") '
        "ON DELETE CASCADE ON UPDATE SET NULL NOCHECK;" in fk1
    )
    last_create = max(
        i for i, ln in enumerate(lines) if ln.startswith("CREATE CACHED")
    )
    assert all(
        i > last_create
        for i, ln in enumerate(lines)
        if "FOREIGN KEY" in ln
    )
    import os
    import tempfile

    f = os.path.join(tempfile.mkdtemp(), "fk.sql")
    scoped = [
        r[0]
        for r in ex(
            'SCRIPT NODATA TABLE "cn_fkp", "cn_fkc", "cn_fkp2"'
        ).collect()
    ]
    with open(f, "w") as fh:
        fh.write("\n".join(scoped) + "\n")
    ex('DROP TABLE "cn_fkc"')
    ex('DROP TABLE "cn_fkp2"')
    ex('DROP TABLE "cn_fkp" CASCADE')
    ex(f"RUNSCRIPT FROM '{f}'")
    rest = {
        e["name"]: e for e in engine.constraints.for_table("cn_fkc")
    }
    assert rest["cn_fk1"]["delete_rule"] == "CASCADE"
    assert rest["cn_fk2"]["ref_table"] == "cn_fkp"
    # DROP RESTRICT blocks on inbound FKs; CASCADE drops the FK
    # RECORDS (never the referencing tables); RENAME migrates refs
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        ex('DROP TABLE "cn_fkp"')
    ex('ALTER TABLE "cn_fkp" RENAME TO "cn_fkp_rn"')
    assert (
        engine.constraints.for_table("cn_fkc")[0]["ref_table"]
        == "cn_fkp_rn"
    )
    ex('DROP TABLE "cn_fkp_rn" CASCADE')
    assert engine.constraints.for_table("cn_fkc") == []
    assert engine.constraints.for_table("cn_fkp2") == []
    for t in ("cn_fkc", "cn_fkp2"):
        ex(f'DROP TABLE IF EXISTS "{t}"')


def test_check_constraints_accepted_and_enforced(engine):
    """CHECK is accept-and-ENFORCE (r11 verdict task 2): column-level
    and table-level forms record; every DML write path — INSERT,
    UPDATE, legacy MERGE, ANSI MERGE — evaluates the predicate over
    the rows it is about to write and rejects violations BEFORE
    anything lands; NULL passes (SQL three-valued semantics)."""
    from quasar_destination_h2_spark.constraints import CheckViolation

    engine.execute_sql('DROP TABLE IF EXISTS "cn_ck"')
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_ck"("x" INT CHECK ("x" > 0), '
        '"v" VARCHAR(8), '
        'CONSTRAINT "ck_len" CHECK (LENGTH("v") < 5))'
    )
    ents = engine.constraints.for_table("cn_ck")
    assert {(e["type"], e.get("predicate")) for e in ents} == {
        ("CHECK", "LENGTH(`v`) < 5"),
        ("CHECK", "`x` > 0"),
    }
    # the column-level CHECK got a generated (schema-wide unique)
    # name; capture it for the violation-message assertions below
    gen_ck = next(
        e["name"] for e in ents if e.get("predicate") == "`x` > 0"
    )
    assert gen_ck.startswith("CONSTRAINT_")
    assert {e["name"] for e in ents} == {gen_ck, "ck_len"}
    # valid rows land; NULL passes (unknown is not a violation)
    assert engine.execute_sql(
        "INSERT INTO cn_ck VALUES (1, 'ab'), (2, NULL), (NULL, 'c')"
    ) == 3
    # violating INSERT raises with the constraint name, writes nothing
    with pytest.raises(CheckViolation, match=gen_ck):
        engine.execute_sql("INSERT INTO cn_ck VALUES (-1, 'ab')")
    with pytest.raises(CheckViolation, match="ck_len"):
        engine.execute_sql("INSERT INTO cn_ck VALUES (4, 'toolong')")
    assert engine.table("cn_ck").count() == 3
    # UPDATE: enforcement sees the post-assignment values
    with pytest.raises(CheckViolation, match=gen_ck):
        engine.execute_sql("UPDATE cn_ck SET x = -5 WHERE v = 'ab'")
    assert engine.execute_sql("UPDATE cn_ck SET x = 7 WHERE v = 'ab'") == 1
    # legacy MERGE and ANSI MERGE both enforce on the incoming rows
    with pytest.raises(CheckViolation, match=gen_ck):
        engine.execute_sql(
            "MERGE INTO cn_ck (x, v) KEY (v) VALUES (-9, 'ab')"
        )
    with pytest.raises(CheckViolation, match="ck_len"):
        engine.execute_sql(
            "MERGE INTO cn_ck USING (SELECT 3 AS sx, 'wayloong' AS sv) s "
            "ON cn_ck.v = s.sv "
            "WHEN NOT MATCHED THEN INSERT (x, v) VALUES (s.sx, s.sv)"
        )
    assert engine.table("cn_ck").count() == 3


def test_alter_add_check_validates_existing_rows(engine):
    """ALTER ... ADD CONSTRAINT CHECK scans the EXISTING rows (H2's
    behavior) — violating data rejects the DDL; a predicate that
    does not analyze rejects too; once added, DML enforces it."""
    from quasar_destination_h2_spark.constraints import CheckViolation

    engine.execute_sql('DROP TABLE IF EXISTS "cn_ac"')
    engine.execute_sql('CREATE CACHED TABLE "cn_ac"("n" INT)')
    engine.execute_sql("INSERT INTO cn_ac VALUES (1), (2), (30)")
    with pytest.raises(CheckViolation, match="existing row"):
        engine.execute_sql(
            'ALTER TABLE "cn_ac" ADD CONSTRAINT "ck_n" CHECK ("n" < 10)'
        )
    with pytest.raises(ValueError, match="does not analyze"):
        engine.execute_sql(
            'ALTER TABLE "cn_ac" ADD CONSTRAINT "ck_bad" '
            'CHECK ("no_such_col" < 10)'
        )
    engine.execute_sql(
        'ALTER TABLE "cn_ac" ADD CONSTRAINT "ck_n" CHECK ("n" < 100)'
    )
    with pytest.raises(CheckViolation, match="ck_n"):
        engine.execute_sql("INSERT INTO cn_ac VALUES (150)")
    engine.execute_sql('ALTER TABLE "cn_ac" DROP CONSTRAINT "ck_n"')
    assert engine.execute_sql("INSERT INTO cn_ac VALUES (150)") == 1


def test_check_constraints_script_roundtrip(engine):
    """The restore-failure class the r11 verdict queued: an
    H2-authored dump carrying CHECK constraints (double-quoted
    identifiers) restores, SCRIPT re-emits the constraint in H2
    spelling, and enforcement survives the round-trip."""
    from quasar_destination_h2_spark.constraints import CheckViolation

    engine.execute_sql('DROP TABLE IF EXISTS "cn_sc"')
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_sc"("q" INT, '
        'CONSTRAINT "ck_q" CHECK ("q" BETWEEN 0 AND 9))'
    )
    lines = [
        r.SCRIPT
        for r in engine.execute_sql("SCRIPT NODATA TABLE cn_sc").collect()
    ]
    assert (
        'ALTER TABLE "cn_sc" ADD CONSTRAINT "ck_q" '
        'CHECK("q" BETWEEN 0 AND 9);' in lines
    )
    # INFORMATION_SCHEMA carries the H2-spelled CHECK_EXPRESSION
    expr = engine.execute_sql(
        "SELECT CHECK_EXPRESSION FROM INFORMATION_SCHEMA.CONSTRAINTS "
        "WHERE CONSTRAINT_NAME = 'ck_q'"
    ).collect()
    assert [r[0] for r in expr] == ['"q" BETWEEN 0 AND 9']
    f = os.path.join(tempfile.mkdtemp(), "ck.sql")
    with open(f, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    engine.execute_sql('DROP TABLE "cn_sc"')
    engine.execute_sql(f"RUNSCRIPT FROM '{f}'")
    assert engine.execute_sql("INSERT INTO cn_sc VALUES (5)") == 1
    with pytest.raises(CheckViolation, match="ck_q"):
        engine.execute_sql("INSERT INTO cn_sc VALUES (11)")


def test_constraint_validation_and_lifecycle(engine):
    # undeclared column in the table-level clause
    with pytest.raises(ValueError, match="undeclared"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cn_bad"("a" INT, PRIMARY KEY("zz"))'
        )
    engine.execute_sql('CREATE CACHED TABLE "cn_l"("a" INT PRIMARY KEY, "b" INT)')
    # the generated PK name is schema-wide unique (H2's scope), so
    # its counter depends on what earlier tests left in the shared
    # registry — capture it rather than pinning CONSTRAINT_1
    gen_pk = {e["name"] for e in engine.constraints.for_table("cn_l")}
    assert len(gen_pk) == 1 and next(iter(gen_pk)).startswith("CONSTRAINT_")
    # one PK per table, H2 parity
    with pytest.raises(ConstraintError, match="already has a PRIMARY KEY"):
        engine.execute_sql('ALTER TABLE "cn_l" ADD PRIMARY KEY("b")')
    # ALTER ADD over a column the table doesn't have
    with pytest.raises(ValueError, match="column not found"):
        engine.execute_sql('ALTER TABLE "cn_l" ADD UNIQUE("nope")')
    # duplicate constraint names per table
    engine.execute_sql('ALTER TABLE "cn_l" ADD CONSTRAINT "u1" UNIQUE("b")')
    with pytest.raises(ConstraintError, match="already exists"):
        engine.execute_sql('ALTER TABLE "cn_l" ADD CONSTRAINT "u1" UNIQUE("a")')
    # DROP CONSTRAINT removes exactly one
    engine.execute_sql('ALTER TABLE "cn_l" DROP CONSTRAINT "u1"')
    assert {e["name"] for e in engine.constraints.for_table("cn_l")} == gen_pk
    with pytest.raises(ConstraintError, match="not found"):
        engine.execute_sql('ALTER TABLE "cn_l" DROP CONSTRAINT "u1"')
    # RENAME migrates the registry
    engine.execute_sql('ALTER TABLE "cn_l" RENAME TO "cn_l2"')
    assert engine.constraints.for_table("cn_l") == []
    assert {e["name"] for e in engine.constraints.for_table("cn_l2")} == gen_pk
    # IF NOT EXISTS on an existing table skips the WHOLE statement —
    # no duplicate constraint recording
    engine.execute_sql(
        'CREATE CACHED TABLE IF NOT EXISTS "cn_l2"("z" INT PRIMARY KEY)'
    )
    assert {e["name"] for e in engine.constraints.for_table("cn_l2")} == gen_pk


def test_sink_replace_clears_constraints(engine):
    """A CSV-sink push REPLACES its table (the reference's
    one-transaction drop+create, H2CsvCreateSink.scala:55-58) — the
    old table's recorded constraints must die with it, or the new
    schema would surface keys it never declared."""
    from quasar_destination_h2_spark.types import Column, ColumnType

    engine.execute_sql(
        'CREATE CACHED TABLE "cn_rep"("id" INT PRIMARY KEY)'
    )
    assert engine.constraints.for_table("cn_rep") != []
    # overwrite via the sink path (new schema, no declared keys)
    engine.csv_create_sink().consume(
        "/cn_rep", [Column("x", ColumnType.STRING)], b"a\r\n"
    )
    assert engine.constraints.for_table("cn_rep") == []


def test_review_findings_hardened(engine):
    """r11 self-review regressions: PRIMARY KEY HASH at table/ALTER
    level, constraint-before-NOT-NULL column order, atomic statement
    validation (no half-constrained table left behind), duplicate
    columns in one key rejected, DROP CONSTRAINT IF EXISTS, and
    recorded column spellings follow the TABLE's case."""
    # PRIMARY KEY HASH — valid H2 1.4.200 grammar at every position
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_h"("id" INT, "u" VARCHAR, '
        'PRIMARY KEY HASH("id"))'
    )
    engine.execute_sql('ALTER TABLE "cn_h" ADD CONSTRAINT "uh" UNIQUE("u")')
    assert {e["type"] for e in engine.constraints.for_table("cn_h")} == {
        "PRIMARY KEY",
        "UNIQUE",
    }
    # constraint BEFORE NOT NULL in the column def (both valid in H2)
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_o"("id" INT PRIMARY KEY NOT NULL, '
        '"u" VARCHAR UNIQUE NOT NULL)'
    )
    got = {
        (e["type"], tuple(e["columns"]))
        for e in engine.constraints.for_table("cn_o")
    }
    assert got == {("PRIMARY KEY", ("id",)), ("UNIQUE", ("u",))}
    # atomicity: a second PK fails BEFORE the table is created
    with pytest.raises(ValueError, match="more than one PRIMARY KEY"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cn_2pk"("a" INT PRIMARY KEY, "b" INT, '
            'PRIMARY KEY("b"))'
        )
    assert "cn_2pk" not in engine.sink.catalog  # nothing half-created
    with pytest.raises(ValueError, match="duplicate constraint name"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cn_dn"("a" INT, "b" INT, '
            'CONSTRAINT "x" UNIQUE("a"), CONSTRAINT "x" UNIQUE("b"))'
        )
    assert "cn_dn" not in engine.sink.catalog
    # duplicate column inside one key
    with pytest.raises(ValueError, match="listed twice"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cn_dc"("a" INT, UNIQUE("a", "a"))'
        )
    # recorded spellings follow the TABLE's case, so SCRIPT dumps
    # emit identifiers that name real columns
    engine.execute_sql('CREATE CACHED TABLE "cn_cs"("val" INT)')
    engine.execute_sql('ALTER TABLE "cn_cs" ADD CONSTRAINT "uv" UNIQUE(VAL)')
    assert engine.constraints.for_table("cn_cs")[0]["columns"] == ["val"]
    # DROP CONSTRAINT IF EXISTS: silent on absence, real on presence
    engine.execute_sql('ALTER TABLE "cn_cs" DROP CONSTRAINT IF EXISTS "ghost"')
    engine.execute_sql('ALTER TABLE "cn_cs" DROP CONSTRAINT IF EXISTS "uv"')
    assert engine.constraints.for_table("cn_cs") == []


def test_bq_query_codes_rejects_wrong_width(spark):
    """r11 self-review: an external query vector with the wrong
    dimensionality must REFUSE loudly, not silently pack zero bits
    and return confidently wrong rankings."""
    from quasar_destination_h2_spark.operators import similarity

    q = spark.createDataFrame(
        [(1, [0.5] * 32)], "query_id bigint, qv array<double>"
    )
    with pytest.raises(ValueError, match="32 dims, expected 64"):
        similarity.bq_query_codes(q)
    with pytest.raises(ValueError, match="dim=16"):
        similarity.bq_query_codes(q, dim=16)


def test_review_fixes_constraints(engine):
    """r12 self-review regressions: (a) EVERY CHECK clause on one
    column records and enforces (not just the last); (b) a
    schema-wide duplicate constraint name rejects the CREATE CACHED
    TABLE statement BEFORE the table is created (statement
    atomicity)."""
    from quasar_destination_h2_spark.constraints import CheckViolation

    engine.execute_sql('DROP TABLE IF EXISTS "cn_multi"')
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_multi"('
        '"x" INT CHECK ("x" > 0) CHECK ("x" < 10))'
    )
    preds = {
        e["predicate"] for e in engine.constraints.for_table("cn_multi")
    }
    assert preds == {"`x` > 0", "`x` < 10"}
    with pytest.raises(CheckViolation):
        engine.execute_sql("INSERT INTO cn_multi VALUES (-1)")
    with pytest.raises(CheckViolation):
        engine.execute_sql("INSERT INTO cn_multi VALUES (15)")
    assert engine.execute_sql("INSERT INTO cn_multi VALUES (5)") == 1
    # (b) the duplicate name is detected BEFORE create_table_as
    engine.execute_sql('DROP TABLE IF EXISTS "cn_dup1"')
    engine.execute_sql('DROP TABLE IF EXISTS "cn_dup2"')
    engine.execute_sql(
        'CREATE CACHED TABLE "cn_dup1"("a" INT, '
        'CONSTRAINT "shared_nm" UNIQUE("a"))'
    )
    with pytest.raises(ValueError, match="duplicate constraint name"):
        engine.execute_sql(
            'CREATE CACHED TABLE "cn_dup2"("b" INT, '
            'CONSTRAINT "shared_nm" UNIQUE("b"))'
        )
    assert "cn_dup2" not in engine.sink.catalog  # nothing half-created


def test_cross_references_pk_name_matches_referenced_columns(engine):
    """PK_NAME is filled only when the FK references the PK's column
    set — an FK onto a UNIQUE/plain column list carries NULL, never
    a constraint that does not cover the referenced columns
    (review r13)."""
    ex = engine.execute_sql
    for t in ("cn_pkn_c", "cn_pkn_p"):
        ex(f'DROP TABLE IF EXISTS "{t}" CASCADE')
    ex(
        'CREATE CACHED TABLE "cn_pkn_p"("id" INT, "code" INT, '
        'CONSTRAINT "cn_pkn_pk" PRIMARY KEY ("id"), '
        'CONSTRAINT "cn_pkn_uq" UNIQUE ("code"))'
    )
    ex(
        'CREATE CACHED TABLE "cn_pkn_c"("a" INT, "b" INT, '
        'CONSTRAINT "cn_pkn_f1" FOREIGN KEY ("a") '
        'REFERENCES "cn_pkn_p"("id"), '
        'CONSTRAINT "cn_pkn_f2" FOREIGN KEY ("b") '
        'REFERENCES "cn_pkn_p"("code"))'
    )
    got = {
        r[0]: r[1]
        for r in ex(
            "SELECT FK_NAME, PK_NAME FROM "
            "INFORMATION_SCHEMA.CROSS_REFERENCES "
            "WHERE FKTABLE_NAME = 'cn_pkn_c'"
        ).collect()
    }
    assert got == {"cn_pkn_f1": "cn_pkn_pk", "cn_pkn_f2": None}
    ex('DROP TABLE "cn_pkn_c"')
    ex('DROP TABLE "cn_pkn_p" CASCADE')


def test_rename_column_migrates_constraint_members(engine):
    """ALTER .. RENAME COLUMN keeps the registry restorable (r13):
    PK/UNIQUE member lists and inbound FK ref_columns follow the
    rename; a CHECK whose stored predicate TEXT mentions the column
    refuses the rename (this engine cannot rewrite predicate text
    the way H2 rewrites its parsed tree)."""
    ex = engine.execute_sql
    ex('DROP TABLE IF EXISTS "cn_rc_c" CASCADE')
    ex('DROP TABLE IF EXISTS "cn_rc_p" CASCADE')
    ex(
        'CREATE CACHED TABLE "cn_rc_p"("pid" INT, "u" INT, '
        'CONSTRAINT "cn_rc_pk" PRIMARY KEY ("pid"), '
        'CONSTRAINT "cn_rc_uq" UNIQUE ("u"))'
    )
    ex(
        'CREATE CACHED TABLE "cn_rc_c"("cid" INT, CONSTRAINT "cn_rc_fk" '
        'FOREIGN KEY ("cid") REFERENCES "cn_rc_p"("pid"))'
    )
    ex('ALTER TABLE "cn_rc_p" RENAME COLUMN "pid" TO "pid2"')
    own = {e["name"]: e["columns"] for e in engine.constraints.for_table("cn_rc_p")}
    assert own["cn_rc_pk"] == ["pid2"]
    fk = next(
        e
        for e in engine.constraints.for_table("cn_rc_c")
        if e["name"] == "cn_rc_fk"
    )
    assert fk["ref_columns"] == ["pid2"]
    # the dump now spells the renamed column — and restores
    lines = "\n".join(
        r.SCRIPT for r in ex("SCRIPT NODATA TABLE cn_rc_p").collect()
    )
    assert 'PRIMARY KEY("pid2")' in lines
    # CHECK blocks the rename of a column its predicate mentions
    ex('ALTER TABLE "cn_rc_p" ADD CONSTRAINT "cn_rc_ck" CHECK ("u" >= 0)')
    with pytest.raises(ValueError, match="cn_rc_ck"):
        ex('ALTER TABLE "cn_rc_p" RENAME COLUMN "u" TO "u2"')
    ex('DROP TABLE "cn_rc_c"')
    ex('DROP TABLE "cn_rc_p" CASCADE')


def test_drop_column_refuses_constrained_members(engine):
    """DROP COLUMN on a constraint member (own PK/UNIQUE/CHECK or an
    inbound FK's referenced column) refuses loudly, H2's behavior —
    a silent drop would dump unrestorable SCRIPTs."""
    ex = engine.execute_sql
    ex('DROP TABLE IF EXISTS "cn_dc_c" CASCADE')
    ex('DROP TABLE IF EXISTS "cn_dc_p" CASCADE')
    ex(
        'CREATE CACHED TABLE "cn_dc_p"("pid" INT, "x" INT, "y" INT, '
        'CONSTRAINT "cn_dc_pk" PRIMARY KEY ("pid"), '
        'CONSTRAINT "cn_dc_ck" CHECK ("x" > 0))'
    )
    ex(
        'CREATE CACHED TABLE "cn_dc_c"("cid" INT, CONSTRAINT "cn_dc_fk" '
        'FOREIGN KEY ("cid") REFERENCES "cn_dc_p"("pid"))'
    )
    with pytest.raises(ValueError, match="cn_dc_pk"):
        ex('ALTER TABLE "cn_dc_p" DROP COLUMN "pid"')
    with pytest.raises(ValueError, match="cn_dc_ck"):
        ex('ALTER TABLE "cn_dc_p" DROP COLUMN "x"')
    ex('ALTER TABLE "cn_dc_p" DROP COLUMN "y"')  # unconstrained: fine
    assert engine.table("cn_dc_p").columns == ["pid", "x"]
    ex('DROP TABLE "cn_dc_c"')
    ex('DROP TABLE "cn_dc_p" CASCADE')
