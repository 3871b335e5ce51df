"""Differential DML statement fuzzer: hypothesis-generated UPDATE /
DELETE / ANSI MERGE...USING statements applied to the SAME table on
both engines, final table state compared row-for-row after EVERY
statement.

The engine side goes through ``engine.execute_sql`` — the full
statement path (parser -> rewrite -> staged overwrite commit), i.e.
the surface a reference user reaches through H2's server-side SQL
(``H2Server.scala:60-84``). The DuckDB side:

* UPDATE / DELETE run VERBATIM (the grammar is dialect-neutral by
  construction);
* MERGE (DuckDB 1.0 has no MERGE) is recomputed from the ANSI
  DEFINITION — final state = untouched-target ∪ branch-applied
  matches ∪ inserted non-matches, each leg plain SQL generated from
  the same random spec (not from the engine's rewrite), so the two
  sides remain independent implementations of the same semantics.

Also compared: the JDBC-style changed-row count each statement
returns. Statement count is env-tunable: SPARK_GRAFT_DML_FUZZ
(default 36; the per-round gate log runs >= 120).

Determinism notes mirrored from the query fuzzer: all numeric
columns are DOUBLE on both sides (the CSV sink types Number as
double) holding integer values, arithmetic is +/*/% on non-negative
operands, and comparisons normalize integral floats to int.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from quasar_destination_h2_spark.engine import Engine
from quasar_destination_h2_spark.types import Column, ColumnType

N_STATEMENTS = int(os.environ.get("SPARK_GRAFT_DML_FUZZ", "36"))
CHAIN_LEN = 6  # statements applied to one table load before reset

COLS = [
    Column("k", ColumnType.NUMBER),
    Column("g", ColumnType.STRING),
    Column("n", ColumnType.NUMBER),
    Column("v", ColumnType.STRING),
]

_GROUPS = ("x", "y", "z")


def _initial_rows() -> list[tuple[int, str, int, str]]:
    # deterministic 40-row table, k unique; n/g/v pseudo-random from k
    return [
        (k, _GROUPS[(k * 7) % 3], (k * 13) % 97, f"v{(k * 31) % 11}")
        for k in range(1, 41)
    ]


# --- statement specs (data, rendered per engine) ---------------------------


def _preds() -> st.SearchStrategy[str]:
    leaf = st.one_of(
        st.builds(
            lambda m, r: f"k % {m} = {r}",
            st.integers(min_value=2, max_value=7),
            st.integers(min_value=0, max_value=1),
        ),
        st.builds(
            lambda op, c: f"n {op} {c}",
            st.sampled_from(("<", ">", "<=", ">=")),
            st.integers(min_value=0, max_value=96),
        ),
        st.builds(lambda s: f"g = '{s}'", st.sampled_from(_GROUPS)),
        st.builds(
            lambda lo, hi: f"k BETWEEN {lo} AND {lo + hi}",
            st.integers(min_value=1, max_value=30),
            st.integers(min_value=0, max_value=15),
        ),
    )
    return st.builds(
        lambda a, j, b: f"({a} {j} {b})",
        leaf,
        st.sampled_from(("AND", "OR")),
        leaf,
    ) | leaf


_SET_EXPRS = (
    ("n", "n + {c}"),
    ("n", "n * 2"),
    ("v", "upper(v)"),
    ("v", "v || '_{c}'"),
    ("g", "'{s}'"),
    ("k", "k + 100"),  # key shift: keeps k unique (see proof below)
)
# k-uniqueness under `k = k + 100`: every key is base + 100*shifts
# with distinct bases (initial 1..40, merge-inserted 30..55, both
# < 100), so two keys collide only at equal base AND equal shift
# count — i.e. the same row. Duplicate keys can still arise when a
# merge re-inserts a base whose earlier copy was shifted; those
# duplicates live above 100 and below, never match a merge source
# (sk <= 55), so the ANSI cardinality guard cannot fire spuriously.


def _updates() -> st.SearchStrategy[tuple]:
    one = st.builds(
        lambda i, c, s: (
            _SET_EXPRS[i][0],
            _SET_EXPRS[i][1].format(c=c, s=s),
        ),
        st.integers(min_value=0, max_value=len(_SET_EXPRS) - 1),
        st.integers(min_value=1, max_value=9),
        st.sampled_from(_GROUPS),
    )
    return st.builds(
        lambda asg, pred: ("update", dict(asg), pred),
        st.lists(one, min_size=1, max_size=3, unique_by=lambda t: t[0]),
        _preds(),
    )


def _deletes() -> st.SearchStrategy[tuple]:
    return st.builds(lambda pred: ("delete", pred), _preds())


def _merges() -> st.SearchStrategy[tuple]:
    src_rows = st.lists(
        st.builds(
            lambda k, n, s: (k, _GROUPS[n % 3], n, f"s{s}"),
            st.integers(min_value=30, max_value=55),  # overlaps target keys
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda r: r[0],  # distinct source keys: cardinality-safe
    )
    matched = st.sampled_from(("update_n", "update_nv", "delete", None))
    return st.builds(
        lambda rows, m, ins: ("merge", rows, m, ins),
        src_rows,
        matched,
        st.booleans(),
    ).filter(lambda s: s[2] is not None or s[3])  # >= one branch


#: INSERT column-list variants: full row, NULL-filled tail, NULL key.
_INSERT_COLSETS = (("k", "g", "n", "v"), ("k", "n"), ("g", "v"))


def _inserts() -> st.SearchStrategy[tuple]:
    rows = st.lists(
        st.builds(
            lambda k, n, s: (k, _GROUPS[n % 3], n, f"i{s}"),
            st.integers(min_value=30, max_value=80),
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda r: r[0],
    )
    return st.builds(
        lambda r, ci: ("insert", r, _INSERT_COLSETS[ci]),
        rows,
        st.integers(min_value=0, max_value=len(_INSERT_COLSETS) - 1),
    )


def _legacy_merges() -> st.SearchStrategy[tuple]:
    rows = st.lists(
        st.builds(
            lambda k, n, s: (k, _GROUPS[n % 3], n, f"m{s}"),
            st.integers(min_value=30, max_value=55),
            st.integers(min_value=0, max_value=96),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda r: r[0],
    )
    return st.builds(lambda r: ("legacy_merge", r), rows)


def _insert_seqs() -> st.SearchStrategy[tuple]:
    """r10: per-row NEXTVAL over a table-driven INSERT source. Keys
    land at NEXTVAL + 1000 — above every merge-source key (<= 55) and
    above any +100-shift a chain can produce from the base rows, so
    the merge cardinality reasoning above is undisturbed."""
    return st.builds(
        lambda pred, tag: ("insert_seq", pred, tag),
        _preds(),
        st.integers(min_value=0, max_value=9),
    )


def _txn_noops() -> st.SearchStrategy[tuple]:
    """r12: transaction-control statements interleave with DML the
    way a pooled JDBC client emits them (H2Server.scala:60-84) —
    each must be a true no-op (None update count, table unchanged);
    ROLLBACK is excluded here because it raises loudly by design
    (covered in test_sql_dml)."""
    return st.builds(
        lambda s: ("txn", s),
        st.sampled_from([
            "COMMIT", "COMMIT WORK", "BEGIN", "BEGIN TRANSACTION",
            "START TRANSACTION", "SAVEPOINT fz_sp",
            "SET AUTOCOMMIT ON", "SET AUTOCOMMIT OFF",
        ]),
    )


def _statements() -> st.SearchStrategy[tuple]:
    return st.one_of(
        _updates(), _deletes(), _merges(), _inserts(), _legacy_merges(),
        _insert_seqs(), _txn_noops(),
    )


# --- rendering -------------------------------------------------------------


def _matched_set(kind: str, t: str, s: str) -> dict[str, str]:
    """The MATCHED UPDATE SET assignments, alias-parameterized so the
    engine statement (tg/s) and the DuckDB oracle (t/s) are generated
    from the same spec."""
    if kind == "update_n":
        return {"n": f"{s}.sn + {t}.n"}
    return {"n": f"{s}.sn", "v": f"upper({s}.sv)"}


def _insert_values(rows, colset) -> str:
    """Render VALUES tuples restricted to the column subset."""
    idx = {"k": 0, "g": 1, "n": 2, "v": 3}

    def lit(c, row):
        val = row[idx[c]]
        return str(val) if c in ("k", "n") else f"'{val}'"

    return ", ".join(
        "(" + ", ".join(lit(c, r) for c in colset) + ")" for r in rows
    )


#: Python-side replay model of the fuzz sequence counter (the oracle
#: side must be an INDEPENDENT implementation of the allocation
#: semantics, not a readback of the engine registry).
_SEQ_MODEL = {"next": 1}


def _engine_sql(spec: tuple, physical: str | None = None) -> str:
    if spec[0] == "txn":
        return spec[1]
    if spec[0] == "insert_seq":
        _, pred, tag = spec
        # the SELECT source must name the PHYSICAL table (Spark-SQL
        # resolvable); the INSERT target resolves logically
        return (
            "INSERT INTO dmlfuzz (k, g, n, v) "
            f"SELECT NEXTVAL('fzseq') + 1000, g, n, 'q{tag}' "
            f"FROM {physical} WHERE {pred}"
        )
    if spec[0] == "update":
        _, assignments, pred = spec
        sets = ", ".join(f"{c} = {e}" for c, e in assignments.items())
        return f"UPDATE dmlfuzz SET {sets} WHERE {pred}"
    if spec[0] == "delete":
        return f"DELETE FROM dmlfuzz WHERE {spec[1]}"
    if spec[0] == "insert":
        _, rows, colset = spec
        cols = ", ".join(colset)
        return (
            f"INSERT INTO dmlfuzz ({cols}) VALUES "
            + _insert_values(rows, colset)
        )
    if spec[0] == "legacy_merge":
        _, rows = spec
        return (
            "MERGE INTO dmlfuzz (k, g, n, v) KEY (k) VALUES "
            + _insert_values(rows, ("k", "g", "n", "v"))
        )
    _, rows, matched, insert = spec
    values = ", ".join(f"({k}, '{g}', {n}, '{v}')" for k, g, n, v in rows)
    sql = (
        f"MERGE INTO dmlfuzz tg USING (SELECT * FROM VALUES {values} "
        "AS v(sk, sg, sn, sv)) AS s ON tg.k = s.sk"
    )
    if matched == "delete":
        sql += " WHEN MATCHED THEN DELETE"
    elif matched is not None:
        sets = ", ".join(
            f"{c} = {e}" for c, e in _matched_set(matched, "tg", "s").items()
        )
        sql += f" WHEN MATCHED THEN UPDATE SET {sets}"
    if insert:
        sql += (
            " WHEN NOT MATCHED THEN INSERT (k, g, n, v) "
            "VALUES (s.sk, s.sg, s.sn, s.sv)"
        )
    return sql


def _duck_apply(con, spec: tuple) -> int:
    """Apply the spec to DuckDB's copy; return the changed-row count
    under the engine's JDBC semantics (UPDATE: rows matching the
    condition; DELETE: rows removed; MERGE: matched-with-branch +
    inserted)."""
    if spec[0] == "txn":
        return None  # transaction control: no-op on both sides
    if spec[0] == "insert_seq":
        # replay the per-row allocation from its DEFINITION: count the
        # matching rows, advance the model counter by that count, and
        # pair values by the engine's documented deterministic order —
        # row_number over ALL source columns, Spark's NULLS FIRST
        _, pred, tag = spec
        count = con.execute(
            f"SELECT count(*) FROM dmlfuzz WHERE {pred}"
        ).fetchone()[0]
        base = _SEQ_MODEL["next"]
        _SEQ_MODEL["next"] += count
        order = ", ".join(
            f"{c} ASC NULLS FIRST" for c in ("k", "g", "n", "v")
        )
        con.execute(
            "INSERT INTO dmlfuzz (k, g, n, v) "
            f"SELECT {base} + (ROW_NUMBER() OVER (ORDER BY {order}) - 1) "
            f"+ 1000, g, n, 'q{tag}' FROM dmlfuzz WHERE {pred}"
        )
        return count
    if spec[0] == "update":
        _, assignments, pred = spec
        sets = ", ".join(f"{c} = {e}" for c, e in assignments.items())
        return con.execute(
            f"UPDATE dmlfuzz SET {sets} WHERE {pred}"
        ).fetchone()[0]
    if spec[0] == "delete":
        return con.execute(f"DELETE FROM dmlfuzz WHERE {spec[1]}").fetchone()[0]
    if spec[0] == "insert":
        # dialect-neutral text: partial column lists NULL-fill on
        # both engines
        return con.execute(_engine_sql(spec)).fetchone()[0]
    if spec[0] == "legacy_merge":
        # H2 legacy MERGE ... KEY = replace-matched + insert, replayed
        # from the definition (target anti-join source keys ∪ source)
        _, rows = spec
        con.execute(
            "CREATE OR REPLACE TEMP TABLE __lsrc"
            "(sk DOUBLE, sg VARCHAR, sn DOUBLE, sv VARCHAR)"
        )
        con.execute(
            "INSERT INTO __lsrc VALUES "
            + ", ".join(f"({k}, '{g}', {n}, '{v}')" for k, g, n, v in rows)
        )
        con.execute(
            "CREATE OR REPLACE TEMP TABLE __res AS "
            "SELECT k, g, n, v FROM dmlfuzz t "
            "WHERE NOT EXISTS (SELECT 1 FROM __lsrc s WHERE t.k = s.sk) "
            "UNION ALL SELECT sk, sg, sn, sv FROM __lsrc"
        )
        con.execute("DELETE FROM dmlfuzz")
        con.execute("INSERT INTO dmlfuzz SELECT * FROM __res")
        return len(rows)

    _, rows, matched, insert = spec
    values = ", ".join(
        f"(CAST({k} AS DOUBLE), '{g}', CAST({n} AS DOUBLE), '{v}')"
        for k, g, n, v in rows
    )
    con.execute("CREATE OR REPLACE TEMP TABLE __src(sk DOUBLE, sg VARCHAR, sn DOUBLE, sv VARCHAR)")
    con.execute(f"INSERT INTO __src VALUES {values}")
    n_matched = con.execute(
        "SELECT count(*) FROM dmlfuzz t "
        "WHERE EXISTS (SELECT 1 FROM __src s WHERE t.k = s.sk)"
    ).fetchone()[0]
    n_inserted = con.execute(
        "SELECT count(*) FROM __src s "
        "WHERE NOT EXISTS (SELECT 1 FROM dmlfuzz t WHERE t.k = s.sk)"
    ).fetchone()[0]

    legs = []
    if matched is None:
        legs.append("SELECT k, g, n, v FROM dmlfuzz t")
    else:
        legs.append(
            "SELECT k, g, n, v FROM dmlfuzz t "
            "WHERE NOT EXISTS (SELECT 1 FROM __src s WHERE t.k = s.sk)"
        )
        if matched != "delete":
            sets = _matched_set(matched, "t", "s")
            cols = ", ".join(
                f"{sets.get(c, f't.{c}')} AS {c}" for c in ("k", "g", "n", "v")
            )
            legs.append(
                f"SELECT {cols} FROM dmlfuzz t "
                "JOIN __src s ON t.k = s.sk"
            )
    if insert:
        legs.append(
            "SELECT s.sk, s.sg, s.sn, s.sv FROM __src s "
            "WHERE NOT EXISTS (SELECT 1 FROM dmlfuzz t WHERE t.k = s.sk)"
        )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE __res AS " + " UNION ALL ".join(legs)
    )
    con.execute("DELETE FROM dmlfuzz")
    con.execute("INSERT INTO dmlfuzz SELECT * FROM __res")
    changed = n_inserted if insert else 0
    if matched is not None:
        changed += n_matched
    return changed


def _norm_rows(rows) -> list[tuple]:
    out = []
    for row in rows:
        out.append(
            tuple(
                int(v)
                if isinstance(v, float) and v.is_integer()
                else v
                for v in row
            )
        )
    return sorted(out, key=lambda t: [(v is None, str(v)) for v in t])


# --- harness ---------------------------------------------------------------


@pytest.fixture(scope="module")
def dml_engine(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("dmlfuzz-wh")
    return Engine.from_config(
        json.dumps({"connectionUri": str(wh)}), spark=spark
    )


def _reset(engine, con):
    engine.execute_sql("DROP SEQUENCE IF EXISTS fzseq")
    engine.execute_sql("CREATE SEQUENCE fzseq")
    _SEQ_MODEL["next"] = 1
    csv = "".join(
        f"{k},{g},{n},{v}\r\n" for k, g, n, v in _initial_rows()
    ).encode()
    engine.csv_create_sink().consume("/dmlfuzz", COLS, csv)
    con.execute("DROP TABLE IF EXISTS dmlfuzz")
    con.execute(
        "CREATE TABLE dmlfuzz (k DOUBLE, g VARCHAR, n DOUBLE, v VARCHAR)"
    )
    con.execute(
        "INSERT INTO dmlfuzz VALUES "
        + ", ".join(
            f"({k}, '{g}', {n}, '{v}')" for k, g, n, v in _initial_rows()
        )
    )


def test_random_dml_statements_agree_between_engine_and_duckdb(dml_engine):
    specs: list[tuple] = []

    @given(_statements())
    @settings(
        max_examples=N_STATEMENTS,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def collect(s):
        specs.append(s)

    collect()
    con = duckdb.connect()
    mismatches = []
    try:
        for i in range(0, len(specs), CHAIN_LEN):
            _reset(dml_engine, con)
            for spec in specs[i : i + CHAIN_LEN]:
                sql = _engine_sql(
                    spec, physical=dml_engine.sink.catalog["dmlfuzz"]
                )
                got_n = dml_engine.execute_sql(sql)
                want_n = _duck_apply(con, spec)
                got = _norm_rows(
                    tuple(r) for r in dml_engine.table("dmlfuzz").collect()
                )
                want = _norm_rows(
                    con.execute("SELECT k, g, n, v FROM dmlfuzz").fetchall()
                )
                if got_n != want_n or got != want:
                    mismatches.append(
                        (sql, got_n, want_n, got[:3], want[:3])
                    )
                    _reset(dml_engine, con)  # stop divergence cascading
    finally:
        con.close()
    assert not mismatches, mismatches[:3]


def test_dml_chain_hand_picked_edges(dml_engine):
    """Deterministic edge chain: empty-match MERGE, key-shift UPDATE
    followed by a MERGE that re-inserts a shifted base, full-table
    DELETE via always-true predicate."""
    con = duckdb.connect()
    try:
        _reset(dml_engine, con)
        chain = [
            # merge matching nothing (keys all > 55 after no shift? use
            # matched-delete with a non-overlapping... keys 30..55 DO
            # overlap; craft an empty match via n filter instead)
            ("update", {"k": "k + 100"}, "k BETWEEN 30 AND 55"),
            # re-insert shifted bases: sources 30..34 are now unmatched
            (
                "merge",
                [(30, "x", 5, "s1"), (31, "y", 6, "s2")],
                "update_n",
                True,
            ),
            ("update", {"v": "upper(v)", "n": "n * 2"}, "g = 'x'"),
            ("delete", "k % 2 = 0 OR k % 2 = 1"),
        ]
        for spec in chain:
            got_n = dml_engine.execute_sql(
                _engine_sql(spec, physical=dml_engine.sink.catalog["dmlfuzz"])
            )
            want_n = _duck_apply(con, spec)
            assert got_n == want_n, (spec, got_n, want_n)
            got = _norm_rows(
                tuple(r) for r in dml_engine.table("dmlfuzz").collect()
            )
            want = _norm_rows(
                con.execute("SELECT k, g, n, v FROM dmlfuzz").fetchall()
            )
            assert got == want, (spec, got[:5], want[:5])
        assert got == []  # the final DELETE cleared the table
    finally:
        con.close()
