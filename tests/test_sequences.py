"""H2 sequence objects at the statement surface (sequences.py +
sql_dml): CREATE/DROP/ALTER SEQUENCE, NEXTVAL / NEXT VALUE FOR /
CURRVAL substitution, durable same-warehouse state, and the
table-source guard. Reference anchor: H2 1.4.200 sequences reachable
through the reference's PG/TCP socket (H2Server.scala:60-84)."""

from __future__ import annotations

import json

import pytest

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.sequences import SequenceError
from quasar_destination_h2_spark.types import Column, ColumnType


@pytest.fixture()
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


COLS = [Column("k", ColumnType.NUMBER), Column("v", ColumnType.STRING)]


def test_sequence_lifecycle_and_insert_ids(engine):
    engine.execute_sql("CREATE SEQUENCE ids START WITH 10 INCREMENT BY 5")
    engine.csv_create_sink().consume("/seq_t", COLS, b"1,a\r\n")
    n = engine.execute_sql(
        "INSERT INTO seq_t (k, v) VALUES (NEXTVAL('ids'), 'x'), "
        "(NEXTVAL('ids'), 'y')"
    )
    assert n == 2
    got = sorted(
        (float(r.k), r.v) for r in engine.table("seq_t").collect()
    )
    assert got == [(1.0, "a"), (10.0, "x"), (15.0, "y")]
    # CURRVAL = last dispensed in this session; SELECT form works
    r = engine.execute_sql("SELECT CURRVAL('ids') AS c").collect()
    assert r[0].c == 15
    # NEXT VALUE FOR (ANSI spelling H2 also grammars)
    r = engine.execute_sql("SELECT NEXT VALUE FOR ids AS nv").collect()
    assert r[0].nv == 20


def test_sequence_restart_increment_and_drop(engine):
    engine.execute_sql("CREATE SEQUENCE s2")
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 1
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 2
    engine.execute_sql("ALTER SEQUENCE s2 RESTART WITH 100")
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 100
    engine.execute_sql("ALTER SEQUENCE s2 INCREMENT BY -10")
    # the stored next value (101) is dispensed as-is; the new
    # increment applies AFTER it (H2 keeps the position on ALTER)
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 101
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 91
    # bare RESTART resets to START WITH
    engine.execute_sql("ALTER SEQUENCE s2 RESTART")
    assert engine.execute_sql("SELECT NEXTVAL('s2') AS v").collect()[0].v == 1
    engine.execute_sql("DROP SEQUENCE s2")
    with pytest.raises(SequenceError, match="not found"):
        engine.execute_sql("SELECT NEXTVAL('s2') AS v")
    # IF EXISTS variants are silent
    assert engine.execute_sql("DROP SEQUENCE IF EXISTS s2") is None
    engine.execute_sql("CREATE SEQUENCE s2")
    assert engine.execute_sql("CREATE SEQUENCE IF NOT EXISTS s2") is None
    with pytest.raises(SequenceError, match="already exists"):
        engine.execute_sql("CREATE SEQUENCE s2")


def test_sequence_state_is_durable_across_engines(spark, warehouse_dir):
    a = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    a.execute_sql("CREATE SEQUENCE shared START WITH 7")
    assert a.execute_sql("SELECT NEXTVAL('shared') AS v").collect()[0].v == 7
    # a second engine over the same warehouse continues, never repeats
    b = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    assert b.execute_sql("SELECT NEXTVAL('shared') AS v").collect()[0].v == 8
    assert a.execute_sql("SELECT NEXTVAL('shared') AS v").collect()[0].v == 9
    # CURRVAL is SESSION-scoped like H2: engine b never called it
    # on... b did call nextval; a fresh third engine did not
    c = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    with pytest.raises(SequenceError, match="CURRVAL"):
        c.execute_sql("SELECT CURRVAL('shared') AS v")


def test_sequence_table_source_per_row(engine):
    """``INSERT INTO t SELECT NEXTVAL('s'), ... FROM u`` allocates
    per result row like H2 (r9 verdict task 2): the range is taken
    atomically and assigned by a deterministic row_number, so the
    inserted ids are exactly the dispensed range and the sequence
    advances by the row count."""
    engine.execute_sql("CREATE SEQUENCE g1")
    engine.csv_create_sink().consume("/seq_g", COLS, b"1,a\r\n2,b\r\n")
    physical = engine.sink.catalog["seq_g"]
    n = engine.execute_sql(
        f"INSERT INTO seq_g (k, v) SELECT NEXTVAL('g1'), v FROM {physical}"
    )
    assert n == 2
    got = sorted((float(r.k), r.v) for r in engine.table("seq_g").collect())
    # deterministic pairing: row_number over all source columns —
    # (1,a) sorts before (2,b), so a->1, b->2
    assert got == [(1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b")]
    # sequence advanced past the whole range
    assert engine.execute_sql("SELECT NEXTVAL('g1') AS v").collect()[0].v == 3
    # a bare SELECT ... FROM (not an INSERT source) still raises
    with pytest.raises(SequenceError, match="table-driven"):
        engine.execute_sql(f"SELECT NEXTVAL('g1') FROM {physical}")


def test_sequence_table_source_increment_and_expr(engine):
    """Per-row NEXTVAL composes inside expressions, respects
    INCREMENT BY != 1, gives same-row occurrences of the same
    sequence the SAME value (SQL-standard NEXT VALUE FOR), and
    distinct sequences independent ranges."""
    engine.execute_sql("CREATE SEQUENCE s7 START WITH 100 INCREMENT BY 7")
    engine.execute_sql("CREATE SEQUENCE s1")
    engine.csv_create_sink().consume(
        "/seq_e", COLS, b"1,a\r\n2,b\r\n3,c\r\n"
    )
    physical = engine.sink.catalog["seq_e"]
    three = [
        Column("k", ColumnType.NUMBER),
        Column("v", ColumnType.STRING),
        Column("w", ColumnType.NUMBER),
    ]
    engine.csv_create_sink().consume("/seq_e3", three, b"")
    n = engine.execute_sql(
        "INSERT INTO seq_e3 (k, v, w) "
        "SELECT NEXTVAL('s7') + 1000, CAST(NEXT VALUE FOR s7 AS STRING), "
        f"NEXTVAL('s1') FROM {physical} WHERE k >= 2"
    )
    assert n == 2
    got = sorted(
        (float(r.k), r.v, float(r.w))
        for r in engine.table("seq_e3").collect()
    )
    # rows (2,b) and (3,c): s7 dispenses 100,107; same-row NEXT
    # VALUE FOR s7 repeats the row's value; s1 dispenses 1,2
    assert got == [(1100.0, "100", 1.0), (1107.0, "107", 2.0)]
    assert engine.execute_sql("SELECT NEXTVAL('s7') AS v").collect()[0].v == 114
    assert engine.execute_sql("SELECT NEXTVAL('s1') AS v").collect()[0].v == 3


def test_sequence_table_source_star_and_empty(engine):
    """A bare ``*`` in the projection expands to the source columns
    (the injected row-number never leaks into the insert arity), and
    an empty source inserts nothing and advances nothing."""
    engine.execute_sql("CREATE SEQUENCE st START WITH 5")
    engine.csv_create_sink().consume("/seq_s", COLS, b"9,z\r\n")
    physical = engine.sink.catalog["seq_s"]
    three = [
        Column("i", ColumnType.NUMBER),
        Column("k", ColumnType.NUMBER),
        Column("v", ColumnType.STRING),
    ]
    engine.csv_create_sink().consume("/seq_s3", three, b"")
    n = engine.execute_sql(
        f"INSERT INTO seq_s3 (i, k, v) SELECT NEXTVAL('st'), * FROM {physical}"
    )
    assert n == 1
    got = [(float(r.i), float(r.k), r.v) for r in engine.table("seq_s3").collect()]
    assert got == [(5.0, 9.0, "z")]
    # empty source: no allocation
    n = engine.execute_sql(
        f"INSERT INTO seq_s3 (i, k, v) SELECT NEXTVAL('st'), * FROM {physical} "
        "WHERE k < 0"
    )
    assert n == 0
    assert engine.execute_sql("SELECT NEXTVAL('st') AS v").collect()[0].v == 6
    # unsupported source shapes raise loudly, never mis-allocate
    with pytest.raises(SequenceError, match="GROUP"):
        engine.execute_sql(
            f"INSERT INTO seq_s3 (i, k, v) SELECT NEXTVAL('st'), k, MAX(v) "
            f"FROM {physical} GROUP BY k"
        )
    with pytest.raises(SequenceError, match="plain SELECT"):
        engine.execute_sql(
            f"INSERT INTO seq_s3 (i) SELECT DISTINCT NEXTVAL('st') FROM {physical}"
        )


def test_sequence_concurrent_allocation_disjoint(spark, warehouse_dir):
    """Same-host multi-engine allocation under the flock: values are
    disjoint and gap-free in union."""
    import threading

    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    eng.execute_sql("CREATE SEQUENCE conc")
    got: list[int] = []
    lock = threading.Lock()

    def worker():
        e = Engine.from_config(
            json.dumps({"connectionUri": warehouse_dir}), spark=spark
        )
        vals = [e.sequences.nextval("conc")[0] for _ in range(25)]
        with lock:
            got.extend(vals)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == list(range(1, 101))


def test_sequence_literal_containing_nextval_untouched(engine):
    """A string literal spelling NEXTVAL( must not allocate."""
    engine.execute_sql("CREATE SEQUENCE lit1")
    r = engine.execute_sql("SELECT 'NEXTVAL(''lit1'')' AS s").collect()
    assert r[0].s == "NEXTVAL('lit1')"
    # nothing was dispensed
    assert engine.execute_sql("SELECT NEXTVAL('lit1') AS v").collect()[0].v == 1


def test_sequence_random_op_chains_match_model(spark, warehouse_dir):
    """Hypothesis differential: random CREATE / NEXTVAL / CURRVAL /
    ALTER RESTART / ALTER INCREMENT / DROP chains through
    engine.execute_sql, every dispensed value compared against a
    trivial Python reference model of H2's documented arithmetic."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )

    ops = st.lists(
        st.one_of(
            st.tuples(
                st.just("create"),
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=-5, max_value=5).filter(lambda x: x),
            ),
            st.tuples(st.just("next")),
            st.tuples(st.just("curr")),
            st.tuples(
                st.just("restart"),
                st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
            ),
            st.tuples(
                st.just("inc"),
                st.integers(min_value=-5, max_value=5).filter(lambda x: x),
            ),
            st.tuples(st.just("drop")),
        ),
        min_size=3,
        max_size=15,
    )

    case_n = [0]

    @given(ops)
    @settings(
        max_examples=25, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(chain):
        case_n[0] += 1
        name = f"fz{case_n[0]}"
        # model = [next, inc, start, min, max] or None when absent.
        # Bounds are fixed at CREATE time from H2's defaults (the
        # increment's direction clamps the near-side bound to the
        # start) and do NOT move when ALTER flips the increment —
        # so a flipped sequence can exhaust at its old near bound,
        # exactly like H2 (hypothesis found the divergence when the
        # model ignored bounds).
        model = None
        curr = None
        for op in chain:
            kind = op[0]
            if kind == "create":
                _, start, inc = op
                if model is None:
                    eng.execute_sql(
                        f"CREATE SEQUENCE {name} START WITH {start} "
                        f"INCREMENT BY {inc}"
                    )
                    if inc > 0:
                        mn, mx = min(1, start), 2**63 - 1
                    else:
                        mn, mx = -(2**63), max(-1, start)
                    model = [start, inc, start, mn, mx]
                else:
                    with pytest.raises(SequenceError):
                        eng.execute_sql(f"CREATE SEQUENCE {name}")
            elif model is None:
                with pytest.raises(SequenceError):
                    eng.execute_sql(
                        f"SELECT NEXTVAL('{name}') AS v"
                        if kind in ("next", "curr")
                        else f"ALTER SEQUENCE {name} RESTART"
                    ) if kind != "drop" else eng.sequences.drop(name)
            elif kind == "next":
                exhausted = (
                    model[0] > model[4]
                    if model[1] > 0
                    else model[0] < model[3]
                )
                if exhausted:
                    with pytest.raises(SequenceError, match="run out"):
                        eng.execute_sql(f"SELECT NEXTVAL('{name}') AS v")
                else:
                    v = eng.execute_sql(
                        f"SELECT NEXTVAL('{name}') AS v"
                    ).collect()[0].v
                    assert v == model[0], (v, model)
                    curr = model[0]
                    model[0] += model[1]
            elif kind == "curr":
                if curr is None:
                    with pytest.raises(SequenceError):
                        eng.execute_sql(f"SELECT CURRVAL('{name}') AS v")
                else:
                    v = eng.execute_sql(
                        f"SELECT CURRVAL('{name}') AS v"
                    ).collect()[0].v
                    assert v == curr
            elif kind == "restart":
                w = op[1]
                eng.execute_sql(
                    f"ALTER SEQUENCE {name} RESTART"
                    + (f" WITH {w}" if w is not None else "")
                )
                model[0] = model[2] if w is None else w
            elif kind == "inc":
                eng.execute_sql(f"ALTER SEQUENCE {name} INCREMENT BY {op[1]}")
                model[1] = op[1]
            elif kind == "drop":
                eng.execute_sql(f"DROP SEQUENCE {name}")
                model = None
                curr = None
        if model is not None:
            eng.execute_sql(f"DROP SEQUENCE IF EXISTS {name}")

    run()


def test_nextval_multi_row_statements_guarded(engine):
    """NEXTVAL in UPDATE/DELETE/MERGE (one textual occurrence, many
    affected rows) raises instead of handing every row one value;
    CURRVAL — a session constant — works in those same statements,
    and function-keyword FROMs (EXTRACT) never trip the guard (r9
    review round 2)."""
    engine.execute_sql("CREATE SEQUENCE mg")
    engine.csv_create_sink().consume("/seq_m", COLS, b"1,a\r\n2,b\r\n")
    with pytest.raises(SequenceError, match="UPDATE/DELETE"):
        engine.execute_sql("UPDATE seq_m SET k = NEXTVAL('mg') WHERE k > 0")
    with pytest.raises(SequenceError, match="UPDATE/DELETE"):
        engine.execute_sql("DELETE FROM seq_m WHERE k = NEXTVAL('mg')")
    # CURRVAL in a DELETE predicate is fine (session constant)
    engine.execute_sql("SELECT NEXTVAL('mg') AS v")  # currval := 1
    n = engine.execute_sql("DELETE FROM seq_m WHERE k = CURRVAL('mg')")
    assert n == 1
    # EXTRACT's FROM keyword is not a table source
    n = engine.execute_sql(
        "INSERT INTO seq_m (k, v) VALUES (NEXTVAL('mg'), "
        "CAST(EXTRACT(YEAR FROM TIMESTAMP '2020-01-01 00:00:00') AS STRING))"
    )
    assert n == 1
    got = sorted((float(r.k), r.v) for r in engine.table("seq_m").collect())
    assert (2.0, "2020") in got
    # r10 (advisor): a scalar subquery with its own FROM inside a
    # VALUES row no longer trips the guard — the NEXTVAL occurrence
    # still evaluates exactly once
    n = engine.execute_sql(
        "INSERT INTO seq_m (k, v) VALUES (NEXTVAL('mg'), "
        "CAST((SELECT MAX(id) FROM range(3)) AS STRING))"
    )
    assert n == 1
    got = sorted((float(r.k), r.v) for r in engine.table("seq_m").collect())
    assert (3.0, "2") in got


def test_sequence_corrupt_state_surfaces(spark, warehouse_dir, tmp_path):
    """Corrupt state must raise, never silently reset (re-dispensing
    already-allocated ids would break durable uniqueness)."""
    eng = Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )
    eng.execute_sql("CREATE SEQUENCE cr1")
    eng.execute_sql("SELECT NEXTVAL('cr1') AS v")
    try:
        with open(eng.sequences.path, "w") as f:
            f.write("{not json")
        with pytest.raises(SequenceError, match="unreadable"):
            eng.execute_sql("SELECT NEXTVAL('cr1') AS v")
    finally:
        # the sequence file is SHARED across the module's engines
        # (spark-warehouse scoped) — leave it readable for later tests
        with open(eng.sequences.path, "w") as f:
            f.write("{}")


def test_sequence_bounds_cycle_and_exhaustion(engine):
    """H2 1.4.200 bound semantics: CYCLE wraps to the opposite bound
    (phase restarts AT the bound, so an unaligned START changes
    phase after the first wrap); without CYCLE the sequence runs out
    with a loud error; CACHE is recorded but never changes values."""
    engine.execute_sql("DROP SEQUENCE IF EXISTS cyc")
    engine.execute_sql(
        "CREATE SEQUENCE cyc START WITH 3 INCREMENT BY 5 "
        "MINVALUE 1 MAXVALUE 10 CYCLE CACHE 20"
    )
    got = [
        engine.execute_sql("SELECT NEXTVAL('cyc') AS v").collect()[0].v
        for _ in range(6)
    ]
    # 3, 8, wrap -> 1, 6, wrap (11 > 10) -> 1, 6
    assert got == [3, 8, 1, 6, 1, 6], got
    engine.execute_sql("DROP SEQUENCE cyc")
    engine.execute_sql(
        "CREATE SEQUENCE cyc START WITH 9 MAXVALUE 10 NOCYCLE"
    )
    assert [
        engine.execute_sql("SELECT NEXTVAL('cyc') AS v").collect()[0].v
        for _ in range(2)
    ] == [9, 10]
    with pytest.raises(SequenceError, match="run out"):
        engine.execute_sql("SELECT NEXTVAL('cyc') AS v")
    engine.execute_sql("DROP SEQUENCE cyc")


def test_sequence_descending_defaults_and_alter_bounds(engine):
    """Descending sequences default to [-(2^63-1), -1] starting at
    MAXVALUE; ALTER adjusts bounds/cycle in place; the introspection
    surface reflects the real stored options."""
    engine.execute_sql("DROP SEQUENCE IF EXISTS dsc")
    engine.execute_sql("CREATE SEQUENCE dsc INCREMENT BY -2")
    assert (
        engine.execute_sql("SELECT NEXTVAL('dsc') AS v").collect()[0].v == -1
    )
    assert (
        engine.execute_sql("SELECT NEXTVAL('dsc') AS v").collect()[0].v == -3
    )
    df = engine.execute_sql(
        "SELECT MIN_VALUE, MAX_VALUE, IS_CYCLE, CACHE "
        "FROM INFORMATION_SCHEMA.SEQUENCES WHERE SEQUENCE_NAME = 'DSC'"
    )
    assert [tuple(r) for r in df.collect()] == [
        (-9223372036854775808, -1, False, 0)
    ]
    engine.execute_sql("ALTER SEQUENCE dsc MINVALUE -5 CYCLE")
    got = [
        engine.execute_sql("SELECT NEXTVAL('dsc') AS v").collect()[0].v
        for _ in range(3)
    ]
    # -5, wrap (-7 < -5) -> -1, -3
    assert got == [-5, -1, -3], got
    df = engine.execute_sql(
        "SELECT MIN_VALUE, IS_CYCLE FROM INFORMATION_SCHEMA.SEQUENCES "
        "WHERE SEQUENCE_NAME = 'DSC'"
    )
    assert [tuple(r) for r in df.collect()] == [(-5, True)]
    engine.execute_sql("DROP SEQUENCE dsc")
    # invalid bound combos are loud
    with pytest.raises(SequenceError, match="MINVALUE"):
        engine.execute_sql("CREATE SEQUENCE bad MINVALUE 10 MAXVALUE 5")
    with pytest.raises(SequenceError, match="outside"):
        engine.execute_sql(
            "CREATE SEQUENCE bad START WITH 99 MINVALUE 1 MAXVALUE 10"
        )
    # ALTER with CREATE-only grammar is loud, never a silent no-op
    engine.execute_sql("CREATE SEQUENCE alt1")
    with pytest.raises(ValueError, match="RESTART WITH"):
        engine.execute_sql("ALTER SEQUENCE alt1 START WITH 5")
    engine.execute_sql("DROP SEQUENCE alt1")
    # still-unknown options stay loud
    with pytest.raises(SequenceError, match="unsupported sequence option"):
        engine.execute_sql("CREATE SEQUENCE bad2 BELONGS_TO_TABLE x")


def test_sequence_table_source_cycle_guard(engine):
    """Per-row NEXTVAL over a table source needs a contiguous
    (affine) range: a CYCLE wrap inside the allocation raises
    loudly instead of assigning wrong values."""
    engine.execute_sql("DROP SEQUENCE IF EXISTS cg")
    engine.execute_sql(
        "CREATE SEQUENCE cg MINVALUE 1 MAXVALUE 2 CYCLE"
    )
    engine.csv_create_sink().consume(
        "/seq_cg", COLS, b"1,a\r\n2,b\r\n3,c\r\n"
    )
    physical = engine.sink.catalog["seq_cg"]
    with pytest.raises(SequenceError, match="CYCLEd inside"):
        engine.execute_sql(
            f"INSERT INTO seq_cg (k, v) SELECT NEXTVAL('cg'), v FROM {physical}"
        )
    engine.execute_sql("DROP SEQUENCE cg")


def test_sequence_legacy_merge_values(engine):
    """H2's legacy MERGE ... KEY VALUES spells one NEXTVAL per row —
    substitution is per-row-correct and now allowed (r10); the ANSI
    USING form and table-driven legacy SELECT sources still raise."""
    engine.execute_sql("DROP SEQUENCE IF EXISTS mg2")
    engine.execute_sql("CREATE SEQUENCE mg2 START WITH 50")
    engine.csv_create_sink().consume("/seq_mv", COLS, b"1,a\r\n")
    n = engine.execute_sql(
        "MERGE INTO seq_mv (k, v) KEY (k) VALUES (NEXTVAL('mg2'), 'm1'), "
        "(NEXTVAL('mg2'), 'm2')"
    )
    assert n == 2
    got = sorted((float(r.k), r.v) for r in engine.table("seq_mv").collect())
    assert got == [(1.0, "a"), (50.0, "m1"), (51.0, "m2")]
    physical = engine.sink.catalog["seq_mv"]
    with pytest.raises(SequenceError, match="MERGE"):
        engine.execute_sql(
            f"MERGE INTO seq_mv (k, v) KEY (k) SELECT NEXTVAL('mg2'), v "
            f"FROM {physical}"
        )
    with pytest.raises(SequenceError, match="MERGE"):
        engine.execute_sql(
            "MERGE INTO seq_mv tg USING (SELECT 1 AS sk) AS s ON tg.k = s.sk "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (NEXTVAL('mg2'), 'x')"
        )


def test_sequence_table_source_logical_name(engine):
    """r10 advisor: the NEXTVAL INSERT source's FROM tail goes through
    the same logical-name resolution as the non-NEXTVAL INSERT path —
    engine-catalog names (whose PHYSICAL storage names are
    fingerprint-suffixed) resolve in ``INSERT INTO t SELECT
    NEXTVAL(..), v FROM <logical>``."""
    engine.execute_sql("CREATE SEQUENCE lgn")
    engine.csv_create_sink().consume("/seq_lgn", COLS, b"1,a\r\n2,b\r\n")
    # the logical name is NOT natively resolvable (that's the point)
    assert not engine.spark.catalog.tableExists("seq_lgn")
    n = engine.execute_sql(
        "INSERT INTO seq_lgn (k, v) SELECT NEXTVAL('lgn'), v FROM seq_lgn"
    )
    assert n == 2
    got = sorted((float(r.k), r.v) for r in engine.table("seq_lgn").collect())
    assert got == [(1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b")]
    assert engine.execute_sql("SELECT NEXTVAL('lgn') AS v").collect()[0].v == 3
