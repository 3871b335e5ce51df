"""Differential DDL statement fuzzer: ALTER TABLE ADD/DROP/RENAME
COLUMN, CTAS, and DROP TABLE statements — including hostile
identifiers drawn from the reference's injection corpus
(H2DestinationSpec.scala:176-207: table/column names embedding
``; drop table ...``, doubled quotes, spaces, bare keywords) —
applied to the SAME table on both engines through the full
statement path (``engine.execute_sql``), with the complete table
state (column-name list AND row values) compared after EVERY
statement.

The DuckDB side runs the equivalent statements verbatim (the ALTER /
CTAS grammar is dialect-neutral under double-quoted identifiers), so
a quoting bug, a silently-executed injection payload, or a
schema-evolution divergence shows up as a state mismatch on the very
statement that caused it.

Statement count is env-tunable: SPARK_GRAFT_DDL_FUZZ (default 40;
the per-round gate log runs >= 100). Deterministic: seeded RNG, so
any failure replays exactly.
"""

from __future__ import annotations

import json
import os
import random

import duckdb
import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.idents import hygienic_ident
from quasar_destination_h2_spark.types import Column, ColumnType

N_STATEMENTS = int(os.environ.get("SPARK_GRAFT_DDL_FUZZ", "40"))

#: Hostile identifiers — the reference's injection corpus plus the
#: classic quoting traps. Each must round-trip as DATA (a quoted
#: identifier), never execute as SQL.
HOSTILE_NAMES = (
    'the "column" name',
    "from nowhere; drop table super_mission_critical; select *",
    "foobar; drop table really_important; create table haha",
    "a b",
    "select",
    "'; --",
)

COLS = [
    Column("k", ColumnType.NUMBER),
    Column("g", ColumnType.STRING),
    Column("n", ColumnType.NUMBER),
    Column("v", ColumnType.STRING),
]

#: H2 ALTER ADD column types exercised, with the DuckDB rendering.
ADD_TYPES = (("INT", "INTEGER"), ("DOUBLE", "DOUBLE"), ("VARCHAR", "VARCHAR"))


def _q(name: str) -> str:
    """H2/ANSI double-quoted identifier (both engines' grammar)."""
    return '"' + name.replace('"', '""') + '"'


def _initial_rows():
    return [
        (k, "xyz"[(k * 7) % 3], (k * 13) % 97, f"v{(k * 31) % 11}")
        for k in range(1, 21)
    ]


@pytest.fixture(scope="module")
def ddl_engine(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("ddlfuzz-wh")
    return Engine.from_config(
        json.dumps({"connectionUri": str(wh)}), spark=spark
    )


def _reset(engine, con):
    csv = "".join(f"{k},{g},{n},{v}\r\n" for k, g, n, v in _initial_rows())
    engine.csv_create_sink().consume("/ddlfuzz", COLS, csv.encode())
    con.execute('DROP TABLE IF EXISTS ddlfuzz')
    con.execute(
        "CREATE TABLE ddlfuzz (k DOUBLE, g VARCHAR, n DOUBLE, v VARCHAR)"
    )
    con.execute(
        "INSERT INTO ddlfuzz VALUES "
        + ", ".join(f"({k}, '{g}', {n}, '{v}')" for k, g, n, v in _initial_rows())
    )


def _norm(rows):
    out = []
    for row in rows:
        out.append(
            tuple(
                int(x) if isinstance(x, float) and x.is_integer() else x
                for x in row
            )
        )
    return sorted(out, key=lambda t: [(x is None, str(x)) for x in t])


def _state(engine, con, logical="ddlfuzz"):
    df = engine.table(logical)
    got_cols = list(df.columns)
    got = _norm(tuple(r) for r in df.collect())
    duck_name = _q(logical) if logical != "ddlfuzz" else "ddlfuzz"
    cur = con.execute(f"SELECT * FROM {duck_name}")
    # cursor description (not DESCRIBE, whose identifier parsing
    # trips over names containing doubled quotes) carries the
    # column order
    want_cols = [d[0] for d in cur.description]
    want = _norm(cur.fetchall())
    return got_cols, got, want_cols, want


def _gen_statements(rng: random.Random, n: int):
    """Yield (engine_render_fn, duck_sql_or_fn, description) specs as
    a schema-aware deterministic stream. The generator tracks the
    live column list so every statement is valid when issued."""
    cols = ["k", "g", "n", "v"]  # k is protected (predicates use it)
    numeric = {"k", "n"}
    fresh = 0
    stmts = []
    for _ in range(n):
        op = rng.choices(
            ("add", "drop", "rename", "update", "ctas"),
            weights=(30, 15, 20, 20, 15),
        )[0]
        if op == "add":
            if rng.random() < 0.5:
                cand = [h for h in HOSTILE_NAMES if h not in cols]
                name = rng.choice(cand) if cand else f"c{(fresh := fresh + 1)}"
            else:
                fresh += 1
                name = f"c{fresh}"
            if name in cols:
                fresh += 1
                name = f"c{fresh}"
            h2t, duckt = rng.choice(ADD_TYPES)
            stmts.append(
                (
                    f"ALTER TABLE ddlfuzz ADD COLUMN {_q(name)} {h2t}",
                    f"ALTER TABLE ddlfuzz ADD COLUMN {_q(name)} {duckt}",
                )
            )
            cols.append(name)
            if h2t != "VARCHAR":
                numeric.add(name)
        elif op == "drop":
            droppable = [c for c in cols if c != "k"]
            if len(droppable) < 2:
                continue
            name = rng.choice(droppable)
            stmts.append(
                (
                    f"ALTER TABLE ddlfuzz DROP COLUMN {_q(name)}",
                    f"ALTER TABLE ddlfuzz DROP COLUMN {_q(name)}",
                )
            )
            cols.remove(name)
            numeric.discard(name)
        elif op == "rename":
            renamable = [c for c in cols if c != "k"]
            if not renamable:
                continue
            old = rng.choice(renamable)
            if rng.random() < 0.4:
                cand = [h for h in HOSTILE_NAMES if h not in cols]
                new = rng.choice(cand) if cand else f"c{(fresh := fresh + 1)}"
            else:
                fresh += 1
                new = f"c{fresh}"
            if new in cols:
                fresh += 1
                new = f"c{fresh}"
            stmts.append(
                (
                    f"ALTER TABLE ddlfuzz RENAME COLUMN {_q(old)} TO {_q(new)}",
                    f"ALTER TABLE ddlfuzz RENAME COLUMN {_q(old)} TO {_q(new)}",
                )
            )
            cols[cols.index(old)] = new
            if old in numeric:
                numeric.discard(old)
                numeric.add(new)
        elif op == "update":
            target = rng.choice([c for c in cols if c != "k"])
            if target in numeric:
                expr = f"k + {rng.randint(1, 9)}"
            else:
                expr = f"'u{rng.randint(0, 9)}'"
            pred = f"k % {rng.randint(2, 5)} = {rng.randint(0, 1)}"
            sql = f"UPDATE ddlfuzz SET {_q(target)} = {expr} WHERE {pred}"
            stmts.append((sql, sql))
        else:  # ctas with a hostile TABLE name, then drop it
            tname = rng.choice(HOSTILE_NAMES[:3])
            pred = f"k > {rng.randint(0, 15)}"
            stmts.append(("ctas", (tname, pred)))
    return stmts


def test_random_ddl_statements_agree_between_engine_and_duckdb(ddl_engine):
    rng = random.Random(0xC0FFEE)
    con = duckdb.connect()
    mismatches = []
    try:
        _reset(ddl_engine, con)
        for spec in _gen_statements(rng, N_STATEMENTS):
            if spec[0] == "ctas":
                tname, pred = spec[1]
                phys = hygienic_ident(ddl_engine.sink.catalog["ddlfuzz"])
                ddl_engine.execute_sql(
                    f"CREATE TABLE {_q(tname)} AS "
                    f"SELECT * FROM {phys} WHERE {pred}"
                )
                con.execute(
                    f"CREATE TABLE {_q(tname)} AS "
                    f"SELECT * FROM ddlfuzz WHERE {pred}"
                )
                gc, g, wc, w = _state(ddl_engine, con, tname)
                if gc != wc or g != w:
                    mismatches.append(("ctas", tname, gc, wc, g[:3], w[:3]))
                ddl_engine.execute_sql(f"DROP TABLE {_q(tname)}")
                con.execute(f"DROP TABLE {_q(tname)}")
                continue
            eng_sql, duck_sql = spec
            ddl_engine.execute_sql(eng_sql)
            con.execute(duck_sql)
            gc, g, wc, w = _state(ddl_engine, con)
            if gc != wc or g != w:
                mismatches.append((eng_sql, gc, wc, g[:3], w[:3]))
                _reset(ddl_engine, con)  # stop divergence cascading
    finally:
        con.close()
    assert not mismatches, mismatches[:3]


def test_hostile_identifiers_never_execute(ddl_engine):
    """After ADDing a column whose name embeds a DROP TABLE payload
    and CTAS-ing into a table whose name embeds one, the base table
    still exists with its data intact — the payloads were treated as
    names, not statements."""
    con = duckdb.connect()
    try:
        _reset(ddl_engine, con)
        payload_col = HOSTILE_NAMES[1]
        ddl_engine.execute_sql(
            f"ALTER TABLE ddlfuzz ADD COLUMN {_q(payload_col)} INT"
        )
        payload_tbl = HOSTILE_NAMES[2]
        phys = hygienic_ident(ddl_engine.sink.catalog["ddlfuzz"])
        ddl_engine.execute_sql(
            f"CREATE TABLE {_q(payload_tbl)} AS SELECT * FROM {phys}"
        )
        assert payload_col in ddl_engine.table("ddlfuzz").columns
        assert ddl_engine.table("ddlfuzz").count() == len(_initial_rows())
        assert ddl_engine.table(payload_tbl).count() == len(_initial_rows())
        ddl_engine.execute_sql(f"DROP TABLE {_q(payload_tbl)}")
        ddl_engine.execute_sql(
            f"ALTER TABLE ddlfuzz DROP COLUMN {_q(payload_col)}"
        )
        assert ddl_engine.table("ddlfuzz").columns == ["k", "g", "n", "v"]
    finally:
        con.close()


def test_random_constraint_statements_match_model(ddl_engine):
    """Constraint-statement fuzz (r10 verdict task 3): a seeded
    stream of ADD CONSTRAINT PRIMARY KEY/UNIQUE (named — including
    hostile names from the injection corpus — and unnamed) and DROP
    CONSTRAINT statements through execute_sql, compared after EVERY
    statement against an independent Python model of the registry
    AND the INFORMATION_SCHEMA.CONSTRAINTS surface. DuckDB can't
    replay ALTER ADD CONSTRAINT, so the model is the oracle here;
    expected-error statements (duplicate PK, duplicate name, unknown
    name) must raise on both sides. r13 extends the stream with
    FOREIGN KEY adds (accept-and-record: named/unnamed, explicit or
    PK-defaulted referenced columns, ON DELETE/UPDATE rules, H2's
    trailing NOCHECK) and H2 preamble noise (GRANT/REVOKE/CREATE
    USER/ROLE no-ops that must never touch the registry)."""
    import random as _random

    from quasar_destination_h2_spark.constraints import ConstraintError

    rng = _random.Random(0xBEEF11)
    con = duckdb.connect()
    try:
        _reset(ddl_engine, con)
    finally:
        con.close()
    # a referenced table with a recorded PK for the FK branch —
    # CASCADE clears any stale inbound FK records from a prior run
    ddl_engine.execute_sql('DROP TABLE IF EXISTS "ddlfuzz_ref" CASCADE')
    ddl_engine.execute_sql(
        'CREATE CACHED TABLE "ddlfuzz_ref"("rid" INT, "rk" INT, '
        'CONSTRAINT "ddlfuzz_ref_pk" PRIMARY KEY ("rid"))'
    )
    model: list[dict] = []  # [{name, type, columns}]
    # constraint names are schema-wide unique (H2's scope, advisor
    # r11) — other tables' recorded names in the shared registry
    # participate in both duplicate detection and name generation
    foreign_taken = {
        e["name"].casefold()
        for tkey, es in ddl_engine.constraints.all().items()
        if tkey != "ddlfuzz"
        for e in es
    }
    cols = ["k", "g", "n", "v"]
    # CHECK predicate pool with KNOWN truth over the static fuzz
    # rows (k in 1..20, n = (k*13)%97, g in xyz): ALTER ADD CHECK
    # validates existing data, so the model must predict pass/fail
    check_pool = [
        ('"k" > 0', True),
        ('"n" < 100', True),
        ('LENGTH("v") <= 3', True),
        ('"k" < 10', False),   # rows 10..20 violate
        ('"n" > 50', False),
    ]
    # r13 column-metadata branch: ALTER COLUMN SET/DROP DEFAULT,
    # SELECTIVITY and COMMENT ON against an independent model of the
    # colmeta registry (defaults are stored in the Spark expression
    # dialect; the pool is literal-only so both spellings agree)
    cm_model: dict = {}  # col -> {default?, selectivity?, remarks?}
    default_pool = ["7", "-1", "'zz'", "NULL"]
    for step in range(N_STATEMENTS):
        op = rng.choices(
            ("add", "addck", "addfk", "drop", "noise", "colmeta"),
            weights=(36, 12, 15, 26, 5, 10),
        )[0]
        if op == "colmeta":
            col = rng.choice(cols)
            sub = rng.choice(
                ("set_default", "drop_default", "selectivity", "comment")
            )
            entry = cm_model.setdefault(col, {})
            if sub == "set_default":
                d = rng.choice(default_pool)
                ddl_engine.execute_sql(
                    f"ALTER TABLE ddlfuzz ALTER COLUMN {_q(col)} "
                    f"SET DEFAULT {d}"
                )
                entry["default"] = d
            elif sub == "drop_default":
                ddl_engine.execute_sql(
                    f"ALTER TABLE ddlfuzz ALTER COLUMN {_q(col)} "
                    "DROP DEFAULT"
                )
                entry.pop("default", None)
            elif sub == "selectivity":
                s = rng.randint(0, 100)
                ddl_engine.execute_sql(
                    f"ALTER TABLE ddlfuzz ALTER COLUMN {_q(col)} "
                    f"SELECTIVITY {s}"
                )
                entry["selectivity"] = s
            else:
                if rng.random() < 0.75:
                    txt = f"c{rng.randint(0, 99)} 'q'"
                    ddl_engine.execute_sql(
                        "COMMENT ON COLUMN ddlfuzz."
                        f"{_q(col)} IS '{txt.replace(chr(39), chr(39) * 2)}'"
                    )
                    entry["remarks"] = txt
                else:
                    ddl_engine.execute_sql(
                        f"COMMENT ON COLUMN ddlfuzz.{_q(col)} IS NULL"
                    )
                    entry.pop("remarks", None)
            got = ddl_engine.colmeta.columns_of("ddlfuzz")
            for c, e in cm_model.items():
                ge = got.get(c.casefold(), {})
                assert ge.get("default") == e.get("default"), (c, ge, e)
                assert ge.get("selectivity") == e.get("selectivity")
                assert ge.get("remarks") == e.get("remarks")
            continue
        if op == "noise":
            # H2 preamble statements are accepted no-ops that must
            # never touch the registry (r12 verdict task 1)
            sql = rng.choice(
                [
                    "CREATE USER IF NOT EXISTS \"FZU\" PASSWORD 'x'",
                    "GRANT SELECT ON ddlfuzz TO \"FZU\"",
                    "REVOKE SELECT ON ddlfuzz FROM \"FZU\"",
                    "CREATE ROLE IF NOT EXISTS FZR",
                    "DROP ROLE FZR",
                    "DROP USER IF EXISTS \"FZU\"",
                ]
            )
            assert ddl_engine.execute_sql(sql) is None
        elif op == "addfk":
            ncols = rng.randint(1, 2)
            ccols = rng.sample(cols, ncols)
            named = rng.random() < 0.6
            name = f"fk_{rng.randint(0, 9)}" if named else None
            explicit = rng.random() < 0.5
            if explicit:
                refs = ["rid", "rk"][:ncols]
                ref_txt = f"ddlfuzz_ref({', '.join(refs)})"
            else:
                refs = ["rid"]
                ref_txt = "ddlfuzz_ref"  # defaults to the PK
            rule = rng.choice(
                ["", " ON DELETE CASCADE", " ON UPDATE SET NULL"]
            )
            nocheck = " NOCHECK" if rng.random() < 0.5 else ""
            head = (
                f"ALTER TABLE ddlfuzz ADD CONSTRAINT {_q(name)} "
                if name
                else "ALTER TABLE ddlfuzz ADD "
            )
            sql = (
                f"{head}FOREIGN KEY({', '.join(_q(c) for c in ccols)}) "
                f"REFERENCES {ref_txt}{rule}{nocheck}"
            )
            dup_name = name is not None and (
                name.casefold() in foreign_taken
                or any(
                    e["name"].casefold() == name.casefold() for e in model
                )
            )
            arity_bad = not explicit and ncols != 1
            # ORDER MATTERS: the engine resolves the FK (arity check,
            # plain ValueError) BEFORE the registry's duplicate-name
            # check (ConstraintError) — when both apply, arity wins
            if arity_bad:
                with pytest.raises(ValueError):
                    ddl_engine.execute_sql(sql)
            elif dup_name:
                with pytest.raises(ConstraintError):
                    ddl_engine.execute_sql(sql)
            else:
                ddl_engine.execute_sql(sql)
                if name is None:
                    taken = foreign_taken | {
                        e["name"].casefold() for e in model
                    }
                    i = len(model) + 1
                    while f"constraint_{i}" in taken:
                        i += 1
                    name = f"CONSTRAINT_{i}"
                model.append(
                    {"name": name, "type": "FOREIGN KEY", "columns": ccols}
                )
        elif op == "addck":
            pred, passes = rng.choice(check_pool)
            name = f"ck_{rng.randint(0, 9)}"
            sql = (
                f"ALTER TABLE ddlfuzz ADD CONSTRAINT {_q(name)} "
                f"CHECK ({pred})"
            )
            dup_name = name.casefold() in foreign_taken or any(
                e["name"].casefold() == name.casefold() for e in model
            )
            if not passes or dup_name:
                with pytest.raises(ConstraintError):
                    ddl_engine.execute_sql(sql)
            else:
                ddl_engine.execute_sql(sql)
                model.append(
                    {"name": name, "type": "CHECK", "columns": []}
                )
        elif op == "add":
            ctype = rng.choice(("PRIMARY KEY", "UNIQUE"))
            ncols = rng.randint(1, 2)
            ccols = rng.sample(cols, ncols)
            named = rng.random() < 0.6
            if named:
                name = rng.choice(
                    [f"fz_{rng.randint(0, 9)}", *HOSTILE_NAMES[:3]]
                )
                sql = (
                    f"ALTER TABLE ddlfuzz ADD CONSTRAINT {_q(name)} "
                    f"{ctype}({', '.join(_q(c) for c in ccols)})"
                )
            else:
                name = None
                sql = (
                    f"ALTER TABLE ddlfuzz ADD "
                    f"{ctype}({', '.join(_q(c) for c in ccols)})"
                )
            dup_pk = ctype == "PRIMARY KEY" and any(
                e["type"] == "PRIMARY KEY" for e in model
            )
            dup_name = name is not None and (
                name.casefold() in foreign_taken
                or any(
                    e["name"].casefold() == name.casefold() for e in model
                )
            )
            if dup_pk or dup_name:
                with pytest.raises(ConstraintError):
                    ddl_engine.execute_sql(sql)
            else:
                ddl_engine.execute_sql(sql)
                if name is None:
                    # replicate the registry's generator exactly:
                    # len+1, bumped past SCHEMA-wide taken names
                    taken = foreign_taken | {
                        e["name"].casefold() for e in model
                    }
                    i = len(model) + 1
                    while f"constraint_{i}" in taken:
                        i += 1
                    name = f"CONSTRAINT_{i}"
                model.append(
                    {"name": name, "type": ctype, "columns": ccols}
                )
        else:
            if model and rng.random() < 0.8:
                name = rng.choice(model)["name"]
            else:
                name = f"ghost_{rng.randint(0, 99)}"
            sql = f"ALTER TABLE ddlfuzz DROP CONSTRAINT {_q(name)}"
            live = [
                e
                for e in model
                if e["name"].casefold() == name.casefold()
            ]
            if live:
                ddl_engine.execute_sql(sql)
                model.remove(live[0])
            else:
                with pytest.raises(ConstraintError):
                    ddl_engine.execute_sql(sql)
        got = {
            (e["name"], e["type"], tuple(e["columns"]))
            for e in ddl_engine.constraints.for_table("ddlfuzz")
        }
        want = {
            (e["name"], e["type"], tuple(e["columns"])) for e in model
        }
        assert got == want, (step, sql, got ^ want)
    # the surface a wire client reads agrees with the registry
    rows = {
        (r.CONSTRAINT_NAME, r.CONSTRAINT_TYPE, r.COLUMN_LIST)
        for r in ddl_engine.execute_sql(
            "SELECT CONSTRAINT_NAME, CONSTRAINT_TYPE, COLUMN_LIST "
            "FROM INFORMATION_SCHEMA.CONSTRAINTS "
            "WHERE TABLE_NAME = 'ddlfuzz'"
        ).collect()
    }
    assert rows == {
        (
            e["name"],
            # H2's CONSTRAINTS view spells the FK type REFERENTIAL
            "REFERENTIAL" if e["type"] == "FOREIGN KEY" else e["type"],
            ",".join(e["columns"]),
        )
        for e in model
    }
    ddl_engine.execute_sql('DROP TABLE "ddlfuzz_ref" CASCADE')


def test_random_view_statements_match_duckdb(ddl_engine):
    """View-statement fuzz (r11 verdict task 1): a seeded stream of
    CREATE [OR REPLACE] VIEW (over the base table OR over live fuzz
    views — chains), DROP VIEW (live and ghost names, RESTRICT
    semantics), and SELECT-through-a-view statements, run against
    BOTH the engine and a DuckDB mirror carrying the same
    definitions; every SELECT's rows must agree and every
    expected-error statement (duplicate name, ghost drop,
    RESTRICT-blocked drop) must raise."""
    import random as _random

    from quasar_destination_h2_spark.views import ViewError

    rng = _random.Random(0xF12E)
    con = duckdb.connect()
    try:
        _reset(ddl_engine, con)
        for v in list(ddl_engine.views.names()):
            if v.startswith("vfz_"):
                # leftovers from a previous run in the shared
                # registry would desync the model
                try:
                    ddl_engine.views.drop(v)
                except ViewError:
                    pass
        model: dict[str, str] = {}  # view name -> parent relation
        preds = [
            "k > 5", "k <= 12", "n < 50", "n >= 20",
            "v LIKE 'v1%'", "g = 'x'", "k + n > 30",
        ]
        for step in range(120):
            op = rng.choices(
                ("create", "drop", "select"), weights=(40, 25, 35)
            )[0]
            if op == "create":
                name = f"vfz_{rng.randint(0, 7)}"
                parent = (
                    rng.choice(sorted(model))
                    if model and rng.random() < 0.4
                    else "ddlfuzz"
                )
                pred = rng.choice(preds)
                replace = rng.random() < 0.5
                stmt = (
                    f"CREATE {'OR REPLACE ' if replace else ''}VIEW "
                    f"{name} AS SELECT k, g, n, v FROM {parent} "
                    f"WHERE {pred}"
                )
                if parent == name:
                    # a definition that reads the view being created
                    # (possible only when the name is live) is a
                    # cycle — validation rejects it before create/
                    # replace could brick every future query
                    with pytest.raises(
                        ViewError, match="cyclic|does not resolve"
                    ):
                        ddl_engine.execute_sql(stmt)
                elif name in model and not replace:
                    with pytest.raises(ViewError, match="already exists"):
                        ddl_engine.execute_sql(stmt)
                elif name in {p for p in model.values()} and replace:
                    # replacing a view other views read would desync
                    # the DuckDB mirror's bound definition (DuckDB
                    # inlines at create) — skip this case
                    continue
                else:
                    ddl_engine.execute_sql(stmt)
                    con.execute(f"DROP VIEW IF EXISTS {name}")
                    con.execute(stmt.replace("OR REPLACE ", ""))
                    model[name] = parent
            elif op == "drop":
                live = bool(model) and rng.random() < 0.75
                name = (
                    rng.choice(sorted(model))
                    if live
                    else f"vfz_ghost_{rng.randint(0, 9)}"
                )
                stmt = f"DROP VIEW {name}"
                if not live:
                    with pytest.raises(Exception):
                        ddl_engine.execute_sql(stmt)
                elif any(p == name for p in model.values()):
                    with pytest.raises(ValueError, match="depend"):
                        ddl_engine.execute_sql(stmt)
                else:
                    ddl_engine.execute_sql(stmt)
                    con.execute(f"DROP VIEW {name}")
                    del model[name]
            else:
                if not model:
                    continue
                name = rng.choice(sorted(model))
                sql = f"SELECT k, g, n, v FROM {name}"
                got = _norm(
                    tuple(r) for r in ddl_engine.execute_sql(sql).collect()
                )
                want = _norm(con.execute(sql).fetchall())
                assert got == want, (step, name, got[:3], want[:3])
        # registry and model agree at the end
        assert {
            v for v in ddl_engine.views.names() if v.startswith("vfz_")
        } == set(model)
        # cleanup for the next fuzz session sharing this registry
        while model:
            leaves = [
                n for n in model if not any(p == n for p in model.values())
            ]
            for n in leaves:
                ddl_engine.execute_sql(f"DROP VIEW {n}")
                del model[n]
    finally:
        con.close()


def test_random_schema_statements_agree_with_duckdb(ddl_engine):
    """r14 schema branch: a deterministic random stream of
    CREATE SCHEMA / schema-qualified CREATE TABLE / INSERT / UPDATE /
    DROP TABLE / DROP SCHEMA CASCADE statements applied to BOTH
    engines (DuckDB has native schemas, so the differential is
    direct), with every live table's full state compared after each
    statement. SET SCHEMA is exercised engine-side by issuing a
    fraction of the statements unqualified under a current schema,
    while the DuckDB rendering stays explicitly qualified — a
    resolution bug shows up as a state mismatch on that statement."""
    engine = ddl_engine
    rng = random.Random(1414)
    con = duckdb.connect()
    n_stmts = max(20, N_STATEMENTS // 2)

    # world state: schema key -> display; tables: logical -> (skey, bare)
    schemas: dict = {}
    tables: dict = {}
    fresh = {"s": 0, "t": 0, "k": 0}

    def duck_name(skey: str, bare: str) -> str:
        return (_q(schemas[skey]) + "." if skey != "public" else "") + _q(
            bare
        )

    def eng_name(skey: str, bare: str) -> str:
        return (
            (_q(schemas[skey]) + "." if skey != "public" else "")
            + _q(bare)
        )

    def compare_all():
        for logical, (skey, bare) in tables.items():
            df = engine.table(logical)
            got = _norm(tuple(r) for r in df.collect())
            want = _norm(
                con.execute(
                    f"SELECT * FROM {duck_name(skey, bare)}"
                ).fetchall()
            )
            assert got == want, f"state diverged on {logical!r}"

    engine.current_schema = "public"
    for sc in list(engine.schemas.names()):
        if sc != "PUBLIC":
            engine.execute_sql(f'DROP SCHEMA "{sc}" CASCADE')
    for i in range(n_stmts):
        op = rng.choices(
            ("create_schema", "create_table", "insert", "update",
             "drop_table", "drop_schema"),
            weights=(15, 25, 25, 15, 10, 10),
        )[0]
        if op == "create_schema":
            fresh["s"] += 1
            disp = f"FZS{fresh['s']}"
            engine.execute_sql(f'CREATE SCHEMA "{disp}"')
            con.execute(f'CREATE SCHEMA "{disp}"')
            schemas[disp.casefold()] = disp
        elif op == "create_table":
            skey = rng.choice(["public", *schemas]) if schemas else "public"
            if skey != "public" and skey not in schemas:
                continue
            fresh["t"] += 1
            bare = f"FZT{fresh['t']}"
            logical = bare if skey == "public" else f"{skey}.{bare}"
            engine.execute_sql(
                f"CREATE CACHED TABLE {eng_name(skey, bare)}"
                '("k" INT, "v" VARCHAR(16))'
            )
            con.execute(
                f"CREATE TABLE {duck_name(skey, bare)} (k INT, v VARCHAR)"
            )
            tables[logical] = (skey, bare)
        elif op in ("insert", "update") and tables:
            logical = rng.choice(sorted(tables))
            skey, bare = tables[logical]
            if op == "insert":
                fresh["k"] += 1
                vals = f"({fresh['k']}, 'x{fresh['k'] % 7}')"
                duck_sql = (
                    f"INSERT INTO {duck_name(skey, bare)} VALUES {vals}"
                )
                if skey != "public" and rng.random() < 0.5:
                    # unqualified spelling under SET SCHEMA
                    engine.execute_sql(f"SET SCHEMA {schemas[skey]}")
                    engine.execute_sql(
                        f"INSERT INTO {_q(bare)} VALUES {vals}"
                    )
                    engine.execute_sql("SET SCHEMA PUBLIC")
                else:
                    engine.execute_sql(
                        f"INSERT INTO {eng_name(skey, bare)} VALUES {vals}"
                    )
                con.execute(duck_sql)
            else:
                pred = f"k % {rng.randint(2, 4)} = 0"
                sql_e = (
                    f"UPDATE {eng_name(skey, bare)} SET \"v\" = 'u' "
                    f"WHERE {pred}"
                )
                engine.execute_sql(sql_e)
                con.execute(
                    f"UPDATE {duck_name(skey, bare)} SET v = 'u' "
                    f"WHERE {pred}"
                )
        elif op == "drop_table" and tables:
            logical = rng.choice(sorted(tables))
            skey, bare = tables.pop(logical)
            engine.execute_sql(f"DROP TABLE {eng_name(skey, bare)}")
            con.execute(f"DROP TABLE {duck_name(skey, bare)}")
        elif op == "drop_schema" and schemas:
            skey = rng.choice(sorted(schemas))
            disp = schemas.pop(skey)
            engine.execute_sql(f'DROP SCHEMA "{disp}" CASCADE')
            con.execute(f'DROP SCHEMA "{disp}" CASCADE')
            tables = {
                lg: tb for lg, tb in tables.items() if tb[0] != skey
            }
        compare_all()
    # cleanup
    engine.current_schema = "public"
    for disp in list(schemas.values()):
        engine.execute_sql(f'DROP SCHEMA "{disp}" CASCADE')
    for logical in [lg for lg, tb in tables.items() if tb[0] == "public"]:
        engine.drop_table_if_exists(logical)
