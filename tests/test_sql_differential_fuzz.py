"""Differential SQL conformance fuzzer: hypothesis-generated queries
in a deliberately dialect-NEUTRAL grammar run VERBATIM on both Spark
SQL and DuckDB over the same parquet, results compared row-for-row.

This extends the 127 fixed oracle-paired conformance queries with a
randomized sweep of the projection/filter/aggregation/grouping core —
the surface a reference user exercises most. The grammar is restricted
to constructs whose semantics both engines pin down exactly:

* integer columns and integer arithmetic (no float-summation order
  dependence; SUM of int compares by value, DuckDB's HUGEINT vs
  Spark's BIGINT notwithstanding);
* COUNT/MIN/MAX/SUM aggregates, equality/range/modulo predicates,
  AND/OR composition, single-column GROUP BY over low-cardinality
  string columns, deterministic ORDER BY on the group key.

Every failing example is a real dialect/semantics divergence (or an
engine bug) by construction — there is no tolerance knob to hide one.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from conftest import SF_DIR

_PARQUET = f"{SF_DIR}/lineitem.parquet"

_INT_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
_STR_COLS = ("l_returnflag", "l_linestatus")
_FLAGS = ("A", "N", "R")
_STATUS = ("F", "O")


def _predicates() -> st.SearchStrategy[str]:
    int_pred = st.builds(
        lambda c, op, v: f"{c} {op} {v}",
        st.sampled_from(_INT_COLS),
        st.sampled_from(("=", "<", ">", "<=", ">=", "<>")),
        st.integers(min_value=0, max_value=1500),
    )
    mod_pred = st.builds(
        lambda c, k, r: f"{c} % {k} = {r}",
        st.sampled_from(_INT_COLS),
        st.integers(min_value=2, max_value=13),
        st.integers(min_value=0, max_value=1),
    )
    str_pred = st.builds(
        lambda c, v: f"{c} = '{v}'",
        st.sampled_from(_STR_COLS),
        st.sampled_from(_FLAGS + _STATUS),
    )
    leaf = st.one_of(int_pred, mod_pred, str_pred)
    return st.builds(
        lambda a, j, b: f"({a} {j} {b})",
        leaf,
        st.sampled_from(("AND", "OR")),
        leaf,
    ) | leaf


def _queries() -> st.SearchStrategy[str]:
    aggs = st.lists(
        st.builds(
            lambda f, c, i: f"{f}({c}) AS a{i}",
            st.sampled_from(("MIN", "MAX", "SUM", "COUNT")),
            st.sampled_from(_INT_COLS),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda s: s.split(" AS ")[1],
    )

    def build(group_col, agg_list, pred):
        select = ", ".join(agg_list)
        if group_col is None:
            return (
                f"SELECT COUNT(*) AS n, {select} FROM lineitem WHERE {pred}"
            )
        return (
            f"SELECT {group_col}, COUNT(*) AS n, {select} FROM lineitem "
            f"WHERE {pred} GROUP BY {group_col} ORDER BY {group_col}"
        )

    return st.builds(
        build,
        st.sampled_from((None,) + _STR_COLS),
        aggs,
        _predicates(),
    )


def _norm(rows) -> list[tuple]:
    out = []
    for row in rows:
        out.append(
            tuple(
                int(v) if isinstance(v, (int, bool)) or (
                    isinstance(v, float) and v.is_integer()
                ) else v
                for v in row
            )
        )
    return sorted(out)


_ORDERS_PARQUET = f"{SF_DIR}/orders.parquet"


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(_PARQUET).createOrReplaceTempView("lineitem")
    spark.read.parquet(_ORDERS_PARQUET).createOrReplaceTempView("orders")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{_PARQUET}')"
    )
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{_ORDERS_PARQUET}')"
    )
    yield spark, con
    con.close()


def test_random_queries_agree_between_spark_and_duckdb(engines):
    spark, con = engines
    cases: list[str] = []

    @given(_queries())
    @settings(
        max_examples=60, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def collect(q):
        cases.append(q)

    collect()
    # a few hand-picked edges on top of the random draw
    cases.extend(
        [
            "SELECT COUNT(*) AS n, SUM(l_orderkey) AS a0 FROM lineitem "
            "WHERE l_orderkey < 0",  # empty input: SUM -> NULL, COUNT -> 0
            "SELECT l_returnflag, COUNT(*) AS n, MIN(l_suppkey) AS a1 "
            "FROM lineitem WHERE (l_orderkey % 2 = 0 OR l_linestatus = 'F') "
            "GROUP BY l_returnflag ORDER BY l_returnflag",
        ]
    )

    mismatches = []
    for q in cases:
        got = _norm([tuple(r) for r in spark.sql(q).collect()])
        want = _norm(con.execute(q).fetchall())
        if got != want:
            mismatches.append((q, got[:3], want[:3]))
    assert not mismatches, mismatches[:3]


def _join_queries() -> st.SearchStrategy[str]:
    """Fact-to-dim join shell: INNER/LEFT lineitem->orders with the
    same dialect-neutral aggregate/filter/grouping core. LEFT join
    output includes NULL-extended groups — exactly the rows where the
    engines could diverge on join-vs-filter placement semantics."""

    def build(join_kind, group_col, agg_col, pred):
        return (
            f"SELECT {group_col}, COUNT(*) AS n, "
            f"COUNT(o_orderkey) AS n_matched, MIN({agg_col}) AS a0, "
            f"SUM(l_orderkey) AS a1 FROM lineitem "
            f"{join_kind} JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {pred} GROUP BY {group_col} ORDER BY {group_col}"
        )

    return st.builds(
        build,
        st.sampled_from(("INNER", "LEFT")),
        st.sampled_from(("l_returnflag", "l_linestatus")),
        st.sampled_from(("l_partkey", "l_suppkey", "o_custkey")),
        _predicates(),
    )


def test_random_join_queries_agree_between_spark_and_duckdb(engines):
    spark, con = engines
    cases: list[str] = []

    @given(_join_queries())
    @settings(
        max_examples=40, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def collect(q):
        cases.append(q)

    collect()
    mismatches = []
    for q in cases:
        got = _norm([tuple(r) for r in spark.sql(q).collect()])
        want = _norm(con.execute(q).fetchall())
        if got != want:
            mismatches.append((q, got[:3], want[:3]))
    assert not mismatches, mismatches[:3]
