"""Tier-B conformance catalog: the delegated SQL surface (SURVEY §2.2).

The reference exposes its loaded tables to full H2 1.4.200 SQL via the
embedded TCP/PG servers (`/root/reference/core/src/main/scala/quasar/
destination/h2/server/H2Server.scala:60-84`); this module re-expresses
that query surface as idiomatic Spark DataFrame/SQL plans over the
driver's TPC-H-ish parquet tables, each paired with an ANSI-SQL DuckDB
oracle. Categories covered (one or more entries each): projection /
filter / DISTINCT / CASE / COALESCE / IN / BETWEEN / LIKE / IS NULL,
aggregation (GROUP BY, HAVING, COUNT DISTINCT, GROUP_CONCAT, ROLLUP),
joins (inner broadcast, left, right, full, cross, semi, anti, theta),
window functions (ranking, lag/lead, ROWS and RANGE frames), sorts
with NULLS FIRST/LAST + LIMIT/OFFSET + top-k, set ops, subqueries
(scalar, correlated EXISTS) and CTEs, scalar string/date/math/cast
functions, and a batch query over the ns-timestamp `events` table.

Cross-engine determinism rules (see catalog.py docstring):

* Per-row arithmetic stays in IEEE doubles — identical inputs give
  bit-identical results in Spark and DuckDB.
* Aggregate sums over doubles go through ``CAST(x AS DECIMAL(38,6))``
  — decimal addition is exact, hence order-independent — then are
  cast back to ``DOUBLE`` so both engines hand pandas a float64.
* Integer-valued aggregates are cast to ``BIGINT`` (DuckDB widens
  integer SUM to HUGEINT, Spark to LONG).
* Transcendental functions (ln, pow, sqrt chains) are rounded to 6
  decimals — libm implementations may differ in the last ulp.
* Every LIMIT/OFFSET query carries a total tie-breaking ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..sources.tables import TableSet
from .catalog import query

#: Exact-sum carrier for double aggregates (order-independent). Six
#: fractional digits: source prices/discounts/taxes have ≤2 decimals,
#: so 2-factor products have ≤4 and 3-factor products ≤6 — the cast
#: recovers the exact decimal value on both engines (a 4-digit carrier
#: hits half-way rounding that Spark and DuckDB resolve differently).
DEC = "decimal(38,6)"


def _dsum(col, alias):
    """SUM(CAST(col AS DECIMAL(38,6))) cast back to DOUBLE — exact,
    order-independent aggregation of a double column."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Projection / filter / scalar predicates
# ---------------------------------------------------------------------------


@query(
    "filter_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_discount > 0.05
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_filter_projection(t: TableSet) -> DataFrame:
    """WHERE + arithmetic projection + total-ordered LIMIT."""
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_distinct(t: TableSet) -> DataFrame:
    """SELECT DISTINCT."""
    return t.lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "case_coalesce",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'MEDIUM') AS prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_case_coalesce(t: TableSet) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF."""
    return (
        t.orders.select(
            F.when(F.col("o_totalprice") > 300000, "big")
            .when(F.col("o_totalprice") > 150000, "mid")
            .otherwise("small")
            .alias("bucket"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("MEDIUM")
            ).alias("prio"),
        )
        .groupBy("bucket", "prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "in_between_like",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 250000
      AND o_orderstatus LIKE 'O%'
    GROUP BY o_orderpriority
    """,
)
def q_in_between_like(t: TableSet) -> DataFrame:
    """IN-list + BETWEEN + LIKE predicates."""
    return (
        t.orders.where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(50000, 250000)
            & F.col("o_orderstatus").like("O%")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("o_totalprice"), "total"))
    )


@query(
    "null_handling",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(NULLIF(l_returnflag, 'N')) AS n_not_null,
           CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null
    FROM lineitem
    """,
)
def q_null_handling(t: TableSet) -> DataFrame:
    """IS NULL / IS NOT NULL semantics (COUNT skips NULLs)."""
    nullable = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return t.lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nullable).alias("n_not_null"),
        F.sum(F.when(nullable.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(t: TableSet) -> DataFrame:
    """TPC-H Q1-style pricing summary (the flagship aggregation).

    Map-side partial aggregation + single shuffle on the group keys;
    at 100 TB this is the canonical scalable plan (no driver
    materialization, partials combine before exchange)."""
    li = t.lineitem.where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS volume
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
)
def q_agg_having(t: TableSet) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    return (
        t.lineitem.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("l_extendedprice"), "volume"))
        .where(F.col("n") > 550)
    )


@query(
    "count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_count_distinct(t: TableSet) -> DataFrame:
    """COUNT(DISTINCT) — expand-based multi-distinct in Spark."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "group_concat",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
)
def q_group_concat(t: TableSet) -> DataFrame:
    """GROUP_CONCAT parity: sorted collect_list + concat_ws (H2
    GROUP_CONCAT ... ORDER BY). Sort makes the cross-engine compare
    deterministic."""
    return (
        t.region.join(t.nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           ROUND(SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                                 * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                       - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                         * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                         / COUNT(*))
                      / (COUNT(*) - 1)), 6) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(t: TableSet) -> DataFrame:
    """MIN/MAX plus sample stddev computed from exact decimal sums
    (sum-of-squares formula) so the result is order-independent —
    a direct STDDEV over doubles is not bit-stable across engines."""
    q4 = F.col("l_quantity").cast("decimal(18,4)")
    sumx = F.sum(q4).cast("double")
    sumx2 = F.sum(q4 * q4).cast("double")
    n = F.count(F.lit(1))
    return t.lineitem.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.sqrt((sumx2 - sumx * sumx / n) / (n - 1)), 6).alias("stddev_qty"),
    )


@query(
    "rollup_grouping",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_grouping(t: TableSet) -> DataFrame:
    """ROLLUP hierarchy with GROUPING() disambiguation. grouping()
    must be evaluated inside the Aggregate node (Spark rejects it in
    a downstream Project), so it lives in .agg()."""
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("l_quantity"), "sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
            "sum_qty",
        )
    )


@query(
    "cube_grouping",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_grouping(t: TableSet) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets", oracle=_GROUPING_SETS)
def q_grouping_sets(t: TableSet) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE sugar
    over; SURVEY §2.2 aggregation). Planned as a single Expand +
    partial/final aggregate — one shuffle for all three sets."""
    return t.sql(_GROUPING_SETS)


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_inner_broadcast(t: TableSet) -> DataFrame:
    """Multi-way inner join, dims explicitly broadcast (the flagship
    join). At cluster scale the fact-fact join shuffles on its key
    once; nation/customer ride along as broadcast hash joins."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(
            t.orders, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left(t: TableSet) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders."""
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_right(t: TableSet) -> DataFrame:
    """RIGHT OUTER join."""
    return (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"), "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nk, COUNT(*) AS n_cust
      FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nk, COUNT(*) AS n_supp
      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def q_join_full_outer(t: TableSet) -> DataFrame:
    """FULL OUTER join of two aggregates with COALESCE fill."""
    cust = (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        t.supplier.where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.c_nk == supp.s_nk, "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def q_join_semi(t: TableSet) -> DataFrame:
    """LEFT SEMI join (EXISTS) — no row duplication, build side only
    carries the key."""
    big = t.orders.where(F.col("o_totalprice") > 400000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    """,
)
def q_join_anti(t: TableSet) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no large order."""
    big = t.orders.where(F.col("o_totalprice") > 350000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, f.l_returnflag
    FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
    """,
)
def q_join_cross(t: TableSet) -> DataFrame:
    """CROSS join (bounded: 5 regions x 3 flags)."""
    flags = t.lineitem.select("l_returnflag").distinct()
    return t.region.select("r_name").crossJoin(flags)


@query(
    "join_theta",
    oracle="""
    SELECT n1.n_regionkey AS regionkey, COUNT(*) AS n_pairs
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    GROUP BY n1.n_regionkey
    """,
)
def q_join_theta(t: TableSet) -> DataFrame:
    """Theta join: equi-key + inequality predicate (pairs within a
    region)."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("regionkey")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("r2")
    )
    return (
        n1.join(n2, (n1.regionkey == n2.r2) & (n1.k1 < n2.k2))
        .groupBy("regionkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_NATURAL_JOIN = """
SELECT n_name, r_name
FROM (SELECT n_name, n_regionkey AS regionkey FROM nation) n
NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region) r
"""


@query("join_natural", oracle=_NATURAL_JOIN)
def q_join_natural(t: TableSet) -> DataFrame:
    """NATURAL JOIN (H2 grammar; SURVEY §2.2 joins) — join columns
    inferred from the shared name. Identical SQL in both dialects."""
    return t.sql(_NATURAL_JOIN)


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_shipdate > TIMESTAMP '1996-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping_priority(t: TableSet) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into the
    fact-fact join, aggregate, top-10 by revenue. The customer filter
    prunes before the join; at scale the only big shuffle is
    lineitem-orders on the order key."""
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.where(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t.lineitem.where(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returned_items(t: TableSet) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-filtered
    orders and 'R'-flagged lineitems meet in the one big fact-fact
    shuffle; customer and nation broadcast; top-20 by lost revenue."""
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = t.customer.select("c_custkey", "c_name", "c_nationkey")
    nat = t.nation.select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18_large_orders(t: TableSet) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING subquery
    becomes an aggregate + semi-join on the fact key (never an
    IN-collect), then re-join to lineitem for the per-order quantity
    and broadcast the customer dim."""
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 300)
        .select("l_orderkey")
    )
    orders = t.orders.join(
        big, t.orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    li = t.lineitem.select("l_orderkey", "l_quantity")
    cust = t.customer.select("c_custkey", "c_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(_dsum(F.col("l_quantity"), "total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q5_region_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5_region_volume(t: TableSet) -> DataFrame:
    """TPC-H Q5 shape: six-way join with the local-supplier condition
    (customer and supplier share a nation). region/nation/supplier/
    customer are broadcast dims; lineitem-orders is the one big
    shuffle."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_volume_shipping(t: TableSet) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation pair filter lands on two broadcast dims (one
    per side of the trade); lineitem-orders is the only big shuffle —
    at 100 TB the pair predicate prunes through the broadcast hash
    join before any wide exchange."""
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name IN ('NATION_3', 'NATION_4')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q_tpch_q21_suppliers_who_kept_waiting(t: TableSet) -> DataFrame:
    """TPC-H Q21 shape (hardest decorrelation pattern): suppliers who
    were the SOLE late shipper on a finished multi-supplier order.
    Correlated EXISTS -> left-semi join, correlated NOT EXISTS (with
    an outer-reference lateness predicate) -> left-anti join; both
    carry the l_orderkey equality, so they plan as hash joins shuffled
    on orderkey — never a nested loop. Lateness is adapted to this
    schema (no receipt/commit dates): shipped >60 days after order.

    Ref: the reference delegates this whole decorrelation class to H2
    (SURVEY §2.2); this is the Spark-native rendering.

    Decorrelation: instead of a semi join (EXISTS other supplier) and
    an anti join (NOT EXISTS other late supplier) — each another scan
    and shuffle of lineitem — both subqueries collapse into ONE
    per-order aggregate: a late line qualifies iff its order has > 1
    distinct suppliers and exactly 1 distinct LATE supplier (that
    late supplier is necessarily itself). One lineitem scan, two
    orderkey shuffles; at 100 TB that's 3x less lineitem I/O than
    the literal semi+anti rendering (measured ~1.5x faster at sf0.1)."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("o_orderstatus") == "F")
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_okey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        lo.where(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_okey"))
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    nations = t.nation.where(F.col("n_name").isin("NATION_3", "NATION_4"))
    return (
        sole_late.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "tpch_q2_min_price_supplier",
    oracle="""
    SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE p_size BETWEEN 1 AND 15
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey)
    ORDER BY p_partkey, s_name
    LIMIT 100
    """,
)
def q_tpch_q2_min_price_supplier(t: TableSet) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar-MIN subquery): for each
    small-size part, the supplier(s) who shipped it at its minimum
    price. Decorrelation by hand: the per-part MIN is one groupBy
    shuffle on l_partkey, re-joined to lineitem on (partkey, price) —
    a hash equi-join, never a per-row subquery. part/supplier are
    broadcast dims."""
    minp = t.lineitem.groupBy(F.col("l_partkey").alias("mp_key")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    parts = t.part.where(F.col("p_size").between(1, 15))
    return (
        t.lineitem.join(
            minp,
            (F.col("l_partkey") == F.col("mp_key"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "min_price")
        .distinct()
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15_top_supplier(t: TableSet) -> DataFrame:
    """TPC-H Q15 shape (aggregate-over-aggregate): top supplier by
    quarterly revenue. The per-supplier revenue view (tiny: one row
    per supplier) is checkpointed once — without that, the MAX
    subtree and the join probe each re-derive it from lineitem (two
    fact scans; verified). The MAX-of-the-view scalar is then a 1-row
    aggregate broadcast back onto the view with an *equality*
    condition, so it plans as a BroadcastHashJoin — not the nested
    loop a bare scalar comparison would produce. Exact-decimal
    revenue on both engines makes the double equality safe."""
    rev = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
            )
        )
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#13'
      AND l1.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
                           AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q_tpch_q17_small_quantity_revenue(t: TableSet) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar-AVG subquery): revenue lost
    to small-quantity orders of one brand. The per-part average is
    decorrelated into a groupBy; semantically it only matters for the
    brand's parts, so the aggregate input is semi-joined to the
    broadcast brand dim FIRST — at 100 TB that prunes the shuffle to
    the brand's ~1/25 of lineitem instead of aggregating everything.
    The threshold is exact-decimal sum / count in IEEE doubles so the
    `<` boundary is bit-identical across engines."""
    brand = t.part.where(F.col("p_brand") == "Brand#13").select("p_partkey")
    branded = t.lineitem.join(
        F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avgq = (
        branded.groupBy(F.col("l_partkey").alias("aq_key"))
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty_sum"),
            F.count(F.lit(1)).alias("qty_cnt"),
        )
        .select(
            "aq_key",
            (F.lit(0.2) * (F.col("qty_sum") / F.col("qty_cnt"))).alias(
                "qty_thresh"
            ),
        )
    )
    return (
        branded.join(avgq, F.col("l_partkey") == F.col("aq_key"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_tpch_q22_dormant_customers(t: TableSet) -> DataFrame:
    """TPC-H Q22 shape (global scalar subquery + NOT EXISTS anti-join):
    above-average-balance customers with no recent orders, by market
    segment. The global average is expressed as an *uncorrelated
    scalar subquery* (SQL over a temp view): Spark plans it as a
    one-shot Subquery stage whose result is embedded into the filter
    — zero joins, strictly better than broadcasting a 1-row aggregate
    (which plans as a nested loop once constant keys fold away).
    NOT EXISTS -> left-anti on the date-pruned orders scan."""
    spark = t.customer.sparkSession
    t.customer.createOrReplaceTempView("q22_customer")
    rich = spark.sql(
        """
        SELECT c_custkey, c_mktsegment, c_acctbal FROM q22_customer c
        WHERE c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)
          FROM q22_customer c2 WHERE c2.c_acctbal > 0)
        """
    )
    recent = t.orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_order_priority(t: TableSet) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of orders with at least
    one late line. Correlated EXISTS (with the outer o_orderdate in
    the lateness predicate) -> left-semi hash join on orderkey; the
    quarter filter prunes orders before the join. Lateness adapted to
    this schema: shipped > 90 days after order."""
    orders = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t.lineitem.select(
        F.col("l_orderkey").alias("lk"), F.col("l_shipdate").alias("ls")
    )
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("lk"))
            & (F.col("ls") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT 100.0 * (
      CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
             AS DOUBLE)) AS promo_share
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14_promo_revenue(t: TableSet) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month —
    conditional aggregate over a broadcast dim join, both sums in the
    exact-decimal carrier so the double ratio is bit-identical."""
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    month = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return (
        month.join(
            F.broadcast(t.part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast("double")
            .alias("promo"),
            F.sum(rev).cast("double").alias("total"),
        )
        .select(
            (F.lit(100.0) * (F.col("promo") / F.col("total"))).alias(
                "promo_share"
            )
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_disjunctive_revenue(t: TableSet) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join
    sides. The part-only disjunction (brand+size) is applied BEFORE
    the broadcast — a manual pre-filter Catalyst cannot infer from
    the mixed residual — so only the three brands' parts ship with
    the broadcast; the full disjunction remains as the residual
    filter after the join."""
    b12 = (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
    b23 = (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
    b24 = (F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15)
    parts = t.part.where(b12 | b23 | b24).select("p_partkey", "p_brand", "p_size")
    full = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t.lineitem.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .where(full)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_customer_distribution(t: TableSet) -> DataFrame:
    """TPC-H Q13 shape (aggregate of an aggregate over a filtered
    LEFT JOIN): how many customers placed k qualifying orders, for
    each k — including k = 0, which only the outer join preserves
    (COUNT(col) skips the null-extended rows). Two shuffles: custkey,
    then the tiny c_count key."""
    qual = t.orders.where(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.join(qual, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
             AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 19, 23)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q_tpch_q16_supplier_count(t: TableSet) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group with
    a NOT IN exclusion subquery. s_suppkey is non-nullable here, so
    NOT IN == left-anti join (the null-poisoning hazard of NOT IN
    doesn't arise); the excluded-supplier set broadcasts. The
    part-supplier relation is derived from lineitem (this schema has
    no partsupp table)."""
    excluded = t.supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ex_key")
    )
    parts = t.part.where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("ex_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                    THEN CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8_market_share(t: TableSet) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's trade volume
    per order year — a conditional-numerator ratio inside a six-way
    join. All dims broadcast; lineitem-orders is the only big
    shuffle; both sums ride the exact-decimal carrier so the share
    divides bit-identically."""
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    asia_cust = (
        t.customer.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = t.supplier.join(
        F.broadcast(
            t.nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            rev.alias("rev"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(
                    F.lit(0).cast(DEC)
                )
            )
            .cast("double")
            .alias("num"),
            F.sum("rev").cast("double").alias("den"),
        )
        .select(
            "o_year", (F.col("num") / F.col("den")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-12-31'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast_revenue(t: TableSet) -> DataFrame:
    """TPC-H Q6 shape (pure filter + global aggregate — no joins): the
    revenue increase if small-quantity mid-discount discounts were
    dropped for a year. Every predicate reaches the parquet scan as a
    pushed filter, the projection prunes to three columns, and the
    aggregate is partial+final — the minimal possible plan, which is
    the point of the shape."""
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-12-31").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity
                         AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_product_profit(t: TableSet) -> DataFrame:
    """TPC-H Q9 shape (LIKE-filtered part, multi-way join, *signed*
    expression aggregate): profit on one product line by supplier
    nation and order year. This schema has no partsupp, so unit cost
    is proxied as 60% of p_retailprice — the signed profit expression
    (revenue − cost, can go negative) is the point of the shape. The
    LIKE-pruned part dim broadcasts FIRST so only ~1/8 of lineitem
    reaches the orders join (the one real shuffle); supplier→nation
    broadcast on the side."""
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    gear = t.part.where(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = t.supplier.join(
        F.broadcast(t.nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        t.lineitem.join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH vbp AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey)
    SELECT l_partkey, value FROM vbp
    WHERE value > (
      SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 0.001
      FROM vbp)
    ORDER BY value DESC, l_partkey
    """,
)
def q_tpch_q11_important_stock(t: TableSet) -> DataFrame:
    """TPC-H Q11 shape (group aggregate filtered by a *global scalar
    threshold subquery*): parts whose shipped value for two nations'
    suppliers exceeds 0.1% of that scope's total. The per-part
    aggregate (tiny: one row per part) is materialized ONCE with
    ``localCheckpoint`` — without it, Spark plans the scalar
    subquery and the main path as two independent subtrees and scans
    lineitem TWICE (verified: 6 FileScans, 0 ReusedExchange); with
    it, both read the stored rows and the fact table is touched once
    at any scale. The threshold is then an uncorrelated scalar
    subquery over the checkpointed view — a one-shot Subquery stage
    folded into the filter, no nested-loop join. Both the per-part
    and the grand total ride the exact-decimal carrier so the `>`
    boundary is bit-identical."""
    spark = t.lineitem.sparkSession
    nat = t.nation.where(F.col("n_name").isin("NATION_3", "NATION_7"))
    supp = t.supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    vbp = (
        t.lineitem.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
        )
        .groupBy("l_partkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "value"
            )
        )
        .localCheckpoint()
    )
    vbp.createOrReplaceTempView("q11_vbp")
    return spark.sql(
        """
        SELECT l_partkey, value FROM q11_vbp
        WHERE value > (
          SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 0.001
          FROM q11_vbp)
        ORDER BY value DESC, l_partkey
        """
    )


@query(
    "tpch_q12_priority_lateness",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q_tpch_q12_priority_lateness(t: TableSet) -> DataFrame:
    """TPC-H Q12 shape (CASE-bucketed counts over a join with an
    inter-table predicate): late shipments for a year, split into
    high- vs low-priority counts per line status (this schema has no
    l_shipmode; l_linestatus plays the grouping role). orders is not
    FORCED broadcast — at scale it is ~1/4 of lineitem, so the honest
    declared plan is a shuffled hash join on orderkey with the year
    filter pruning lineitem first (AQE is free to pick broadcast at
    small SF where orders fits the threshold — that is the point of
    leaving the strategy to the optimizer); the lateness predicate is
    a post-join filter because it references both sides."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(
            t.lineitem.where(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            ).select("l_orderkey", "l_shipdate", "l_linestatus"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q20_dominant_supplier",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l1.l_suppkey
      FROM lineitem l1
      WHERE l1.l_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE '%gear%')
        AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l1.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l1.l_suppkey, l1.l_partkey
      HAVING CAST(SUM(CAST(l1.l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 0.5 * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_3', 'NATION_7'))
    ORDER BY s_suppkey
    """,
)
def q_tpch_q20_dominant_supplier(t: TableSet) -> DataFrame:
    """TPC-H Q20 shape (nested IN subqueries + correlated
    half-quantity aggregate): suppliers in two nations who shipped
    more than half of some gear part's annual volume. The correlated
    per-part total is decorrelated, and — because exact-decimal sums
    re-aggregate losslessly — it is computed FROM the (supplier,
    part) aggregate rather than from lineitem again: the fact table
    is scanned once, the tiny group table is checkpointed and feeds
    both the probe side and the per-part re-aggregation (the naive
    two-aggregate form scans lineitem twice — verified before this
    shape was chosen). The nested part-IN is a broadcast semi-join,
    the supplier-IN a semi-join on the threshold-filtered group
    output, the nation-IN a broadcast semi-join on the dim."""
    gear = t.part.where(F.col("p_name").like("%gear%")).select("p_partkey")
    year_li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    by_supp_part = (
        year_li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("supp_qty_dec"))
        .localCheckpoint()  # tiny; shared by probe + re-aggregation
    )
    by_part = by_supp_part.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty_dec").cast("double").alias("part_qty")
    )
    dominant = (
        by_supp_part.select(
            "l_suppkey",
            "l_partkey",
            F.col("supp_qty_dec").cast("double").alias("supp_qty"),
        )
        .join(by_part, F.col("l_partkey") == F.col("pk"))
        .where(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = t.nation.where(F.col("n_name").isin("NATION_3", "NATION_7"))
    return (
        t.supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
        )
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 2
    """,
)
def q_window_rank(t: TableSet) -> DataFrame:
    """ROW_NUMBER / RANK / DENSE_RANK top-k per group — the scalable
    top-k-per-key idiom (single shuffle on the partition key; rank
    filter prunes before any further stage)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 2)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER w, 0.0) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_lead(t: TableSet) -> DataFrame:
    """LAG / LEAD over an ordered per-customer sequence."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


@query(
    "window_rows_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY l_suppkey
                               ORDER BY l_shipdate, l_orderkey, l_linenumber
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cnt_4
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
)
def q_window_rows_frame(t: TableSet) -> DataFrame:
    """ROWS frames: running total (unbounded preceding) + sliding
    count (3 preceding). Decimal accumulation keeps the running sum
    exact and order-stable under the total per-partition order."""
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_slide = Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-3, 0)
    return t.lineitem.where(F.col("l_suppkey") <= 10).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast(DEC)).over(w_run).cast("double").alias(
            "running_total"
        ),
        F.count(F.lit(1)).over(w_slide).cast("bigint").alias("cnt_4"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, price_floor,
           CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY price_floor
                               RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_in_band
    FROM (SELECT o_orderkey, o_orderstatus,
                 CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor
          FROM orders)
    """,
)
def q_window_range_frame(t: TableSet) -> DataFrame:
    """RANGE (value-based) frame over an exact integer ordering
    column — FLOOR to BIGINT keeps the band edges engine-agnostic."""
    base = t.orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("price_floor")
        .rangeBetween(-5000, 0)
    )
    return base.select(
        "o_orderkey",
        "price_floor",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_in_band"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT s_suppkey,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(s_suppkey) OVER w AS first_in_nation,
           LAST_VALUE(s_suppkey) OVER (PARTITION BY s_nationkey
                                       ORDER BY s_acctbal, s_suppkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING)
             AS last_in_nation,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_window_distribution(t: TableSet) -> DataFrame:
    """NTILE / FIRST_VALUE / LAST_VALUE / PERCENT_RANK / CUME_DIST
    (H2 window function set, SURVEY §2.2). LAST_VALUE uses the full
    frame (the default running frame would just echo the current
    row)."""
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.supplier.select(
        "s_suppkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("s_suppkey").over(w).alias("first_in_nation"),
        F.last("s_suppkey").over(w_full).alias("last_in_nation"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Sorts / LIMIT / OFFSET / top-k
# ---------------------------------------------------------------------------


@query(
    "orderby_nulls_offset",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '5-LOW') AS prio
    FROM orders
    ORDER BY prio NULLS FIRST, o_orderkey
    LIMIT 50 OFFSET 10
    """,
)
def q_orderby_nulls_offset(t: TableSet) -> DataFrame:
    """ORDER BY ... NULLS FIRST + LIMIT/OFFSET pagination with a
    total tie-breaking order."""
    return (
        t.orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("prio"),
        )
        .orderBy(F.col("prio").asc_nulls_first(), "o_orderkey")
        .offset(10)
        .limit(50)
    )


@query(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(t: TableSet) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), no full sort at scale."""
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


_TOPK_TIES = """
WITH banded AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice / 10000) AS BIGINT) * 10000 AS price_band
  FROM orders)
SELECT o_orderkey, price_band
FROM banded
WHERE price_band >= (
  SELECT MIN(price_band) FROM (
    SELECT price_band FROM banded ORDER BY price_band DESC LIMIT 10))
ORDER BY price_band DESC, o_orderkey
"""


@query("topk_with_ties", oracle=_TOPK_TIES)
def q_topk_with_ties(t: TableSet) -> DataFrame:
    """H2's `FETCH FIRST n ROWS WITH TIES` — peers of the k-th row are
    kept. Rendered scale-first: the tie threshold is min-of-top-k (a
    TakeOrderedAndProject over k rows feeding an uncorrelated scalar
    Subquery), then a plain filter — no single-partition global rank
    window. Banding uses FLOOR division, not ROUND (half-way rounding
    on doubles is cross-engine-hazardous). Identical SQL text runs on
    both engines."""
    return t.sql(_TOPK_TIES)


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
)
def q_set_union_all(t: TableSet) -> DataFrame:
    """UNION ALL (bag semantics)."""
    u = t.customer.select(F.col("c_nationkey").alias("nk")).unionAll(
        t.supplier.select(F.col("s_nationkey").alias("nk"))
    )
    return u.groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def q_set_intersect(t: TableSet) -> DataFrame:
    """INTERSECT (distinct set semantics)."""
    c = t.customer.where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    s = t.supplier.where(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT n_nationkey AS nk FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
    """,
)
def q_set_except(t: TableSet) -> DataFrame:
    """EXCEPT (set difference): nations with no high-balance supplier."""
    n = t.nation.select(F.col("n_nationkey").alias("nk"))
    s = t.supplier.where(F.col("s_acctbal") > 8000).select(
        F.col("s_nationkey").alias("nk")
    )
    return n.exceptAll(s).distinct()


@query(
    "set_intersect_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 7000
      INTERSECT ALL
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 2000
    ) GROUP BY nk
    """,
)
def q_set_intersect_all(t: TableSet) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of sides)."""
    c = t.customer.where(F.col("c_acctbal") > 7000).select(
        F.col("c_nationkey").alias("nk")
    )
    s = t.supplier.where(F.col("s_acctbal") > 2000).select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersectAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_except_all",
    oracle="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 7000
      EXCEPT ALL
      SELECT s_nationkey FROM supplier WHERE s_acctbal > 2000
    ) GROUP BY nk
    """,
)
def q_set_except_all(t: TableSet) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity = left minus right)."""
    c = t.customer.where(F.col("c_acctbal") > 7000).select(
        F.col("c_nationkey").alias("nk")
    )
    s = t.supplier.where(F.col("s_acctbal") > 2000).select(
        F.col("s_nationkey").alias("nk")
    )
    return c.exceptAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_events_sessionize(t: TableSet) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >30 min silence; session id = running count of starts.
    Two window passes over one shuffle on user_id — the batch twin of
    streaming session_window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap > 30 * 60, 1).otherwise(0).alias("is_new"),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Subqueries / CTEs (via the SQL surface)
# ---------------------------------------------------------------------------

_SCALAR_SUBQ = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                                        AS DOUBLE) / COUNT(*)
                            FROM orders)
GROUP BY o_orderpriority
"""


@query("subquery_scalar", oracle=_SCALAR_SUBQ)
def q_subquery_scalar(t: TableSet) -> DataFrame:
    """Uncorrelated scalar subquery (identical SQL text both engines;
    the average is an exact decimal sum so the threshold is
    bit-identical)."""
    return t.sql(_SCALAR_SUBQ)


_SCALAR_SELECT = """
SELECT n_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey) AS n_supp
FROM nation n
ORDER BY n_name
"""


@query("subquery_scalar_select", oracle=_SCALAR_SELECT)
def q_subquery_scalar_select(t: TableSet) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list (H2 grammar) —
    Catalyst decorrelates each into an aggregate + left outer join on
    the correlation key; COUNT(*) over the null-extended side still
    yields 0, matching the scalar-subquery semantics. Identical SQL
    text runs on both engines."""
    return t.sql(_SCALAR_SELECT)


_CORR_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
  AND c.c_acctbal > 0
"""


@query("subquery_correlated_exists", oracle=_CORR_EXISTS)
def q_subquery_correlated_exists(t: TableSet) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates to a left-semi
    join."""
    return t.sql(_CORR_EXISTS)


_CTE = """
WITH cust_orders AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey
),
segmented AS (
  SELECT c_mktsegment, n_orders, total
  FROM customer JOIN cust_orders ON c_custkey = o_custkey
)
SELECT c_mktsegment,
       CAST(SUM(n_orders) AS BIGINT) AS orders_total,
       CAST(SUM(CAST(total AS DECIMAL(38,6))) AS DOUBLE) AS revenue_total
FROM segmented
GROUP BY c_mktsegment
"""


@query("cte_multi", oracle=_CTE)
def q_cte_multi(t: TableSet) -> DataFrame:
    """Multi-step WITH chain (CTE → join → re-aggregate)."""
    return t.sql(_CTE)


_RECURSIVE_CTE = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1996-01-01'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '1996-12-01'
)
SELECT m AS month_start,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0)
         AS revenue
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
ORDER BY month_start
"""


@query("recursive_cte_sql", oracle=_RECURSIVE_CTE)
def q_recursive_cte_sql(t: TableSet) -> DataFrame:
    """WITH RECURSIVE as SQL *text* (H2 1.4.200 grammars it; Spark
    gained native recursive CTEs in 4.x, so the statement passes
    straight through ``spark.sql`` / ``engine.execute_sql`` — no
    rewrite): a 12-row calendar spine built by recursion, LEFT-joined
    to orders on the truncated month (hash equi-join, not a range
    NLJ) for a monthly revenue report. The identical statement is the
    DuckDB oracle. Data-dependent/cyclic fixpoints (connected
    components) still use ``operators.iterate.fixpoint`` — UNION ALL
    recursion cannot terminate on cycles."""
    return t.sql(_RECURSIVE_CTE)


_IN_SUBQ = """
SELECT p_brand, COUNT(*) AS n
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
GROUP BY p_brand
"""


@query("subquery_in", oracle=_IN_SUBQ)
def q_subquery_in(t: TableSet) -> DataFrame:
    """IN-subquery (planned as left-semi join)."""
    return t.sql(_IN_SUBQ)


@query(
    "subquery_derived",
    oracle="""
    SELECT d.n_orders, COUNT(*) AS n_customers
    FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY o_custkey) d
    WHERE d.n_orders >= 5
    GROUP BY d.n_orders
    """,
)
def q_subquery_derived(t: TableSet) -> DataFrame:
    """Derived table in FROM (SURVEY §2.2 subqueries): orders-per-
    customer histogram — inner agg feeds an outer filter + agg with
    no intermediate materialization (one plan, two shuffles)."""
    per_cust = t.orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_cust.where(F.col("n_orders") >= 5)
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS up,
           LOWER(p_type) AS lo,
           SUBSTRING(p_name, 1, 8) AS name8,
           REPLACE(p_type, ' ', '_') AS type_u,
           TRIM(CONCAT('  ', p_brand, '  ')) AS trimmed,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           POSITION('a' IN p_name) AS a_pos
    FROM part
    WHERE p_partkey <= 500
    """,
)
def q_scalar_string(t: TableSet) -> DataFrame:
    """String function battery: UPPER/LOWER/SUBSTRING/REPLACE/TRIM/
    LENGTH/CONCAT/POSITION."""
    return t.part.where(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.upper("p_brand").alias("up"),
        F.lower("p_type").alias("lo"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_u"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dy,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
           STRFTIME(o_orderdate, '%Y-%m') AS ym,
           DATE_TRUNC('month', o_orderdate) AS month_start
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def q_scalar_date(t: TableSet) -> DataFrame:
    """Date/time battery: EXTRACT, date arithmetic, DATEDIFF,
    FORMATDATETIME (H2) ≡ date_format, DATE_TRUNC."""
    return t.orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT s_suppkey,
           ABS(s_acctbal - 5000) AS centered,
           CAST(MOD(s_suppkey, 7) AS BIGINT) AS mod7,
           CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS rounded,
           CAST(CEIL(s_acctbal) AS BIGINT) AS up_int,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS down_int,
           ROUND(POWER(ABS(s_acctbal) + 1, 0.5), 6) AS p_half,
           ROUND(SQRT(ABS(s_acctbal)), 6) AS root,
           ROUND(LN(ABS(s_acctbal) + 1), 6) AS log_nat
    FROM supplier
    """,
)
def q_scalar_math(t: TableSet) -> DataFrame:
    """Math battery: ABS/MOD/ROUND/CEIL/FLOOR/POWER/SQRT/LN —
    transcendentals rounded to 6 decimals (libm ulp differences)."""
    bal = F.col("s_acctbal")
    return t.supplier.select(
        "s_suppkey",
        F.abs(bal - 5000).alias("centered"),
        F.pmod(F.col("s_suppkey"), F.lit(7)).cast("bigint").alias("mod7"),
        F.round(bal.cast("decimal(18,2)"), 1).cast("double").alias("rounded"),
        F.ceil(bal).alias("up_int"),
        F.floor(bal).alias("down_int"),
        F.round(F.pow(F.abs(bal) + 1, F.lit(0.5)), 6).alias("p_half"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("root"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("log_nat"),
    )


@query(
    "scalar_string_extended",
    oracle="""
    SELECT n_nationkey,
           lpad(n_name, 20, '.') AS padded_l,
           rpad(n_name, 20, '.') AS padded_r,
           left(n_name, 3) AS l3,
           right(n_name, 3) AS r3,
           repeat('ab', 3) AS rep,
           reverse(n_name) AS rev,
           translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels
    FROM nation
    """,
)
def q_scalar_string_extended(t: TableSet) -> DataFrame:
    """LPAD/RPAD/LEFT/RIGHT/REPEAT/REVERSE/TRANSLATE (H2 string
    function set round-out)."""
    n = F.col("n_name")
    return t.nation.select(
        "n_nationkey",
        F.lpad(n, 20, ".").alias("padded_l"),
        F.rpad(n, 20, ".").alias("padded_r"),
        F.left(n, F.lit(3)).alias("l3"),
        F.right(n, F.lit(3)).alias("r3"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.reverse(n).alias("rev"),
        F.translate(n, "AEIOU", "aeiou").alias("lowered_vowels"),
    )


@query(
    "scalar_date_extended",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           round(CAST(datediff('month', DATE '1995-01-01',
                               CAST(o_orderdate AS DATE)) AS DOUBLE), 6)
             AS months_since_int,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                AS VARCHAR) AS plus_3m,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def q_scalar_date_extended(t: TableSet) -> DataFrame:
    """LAST_DAY / month arithmetic / ADD_MONTHS / QUARTER / DAY_OF_WEEK
    (H2 DATEADD/EXTRACT round-out). Integer month difference (not
    Spark months_between's fractional form, which has no DuckDB
    equivalent); DOW normalized to DuckDB's 0=Sunday convention."""
    d = F.col("o_orderdate").cast("date")
    return t.orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.last_day(d).cast("string").alias("month_end"),
        (
            (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
        ).cast("double").alias("months_since_int"),
        F.add_months(d, 3).cast("string").alias("plus_3m"),
        F.quarter(d).alias("qtr"),
        (F.dayofweek(d) - 1).alias("dow"),
    )


@query(
    "scalar_cast",
    oracle="""
    SELECT n_nationkey,
           CAST(n_nationkey AS VARCHAR) AS key_str,
           CAST(CAST(n_nationkey AS VARCHAR) AS BIGINT) AS key_back,
           CAST(CAST(n_nationkey * 1.5 AS DECIMAL(10,2)) AS DOUBLE) AS key_dec,
           CAST(CAST(TIMESTAMP '2024-06-01 12:34:56' AS DATE) AS VARCHAR)
             AS fixed_date,
           CAST(n_nationkey AS DOUBLE) AS key_dbl
    FROM nation
    """,
)
def q_scalar_cast(t: TableSet) -> DataFrame:
    """CAST battery across int/string/decimal/date/double. Decimal
    and date results are surfaced as DOUBLE / VARCHAR so the
    cross-engine compare sees one canonical rendering (pandas maps
    Spark DATE→date and DuckDB DATE→datetime64, DECIMAL→object vs
    float64). Double→int CAST is intentionally absent — Spark
    truncates where other engines round; the surface exposes
    FLOOR/CEIL for that conversion instead."""
    k = F.col("n_nationkey")
    return t.nation.select(
        "n_nationkey",
        k.cast("string").alias("key_str"),
        k.cast("string").cast("bigint").alias("key_back"),
        (k * 1.5).cast("decimal(10,2)").cast("double").alias("key_dec"),
        F.lit("2024-06-01 12:34:56")
        .cast("timestamp")
        .cast("date")
        .cast("string")
        .alias("fixed_date"),
        k.cast("double").alias("key_dbl"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                FILTER (WHERE l_tax > 0.03) AS DOUBLE) AS taxed_price,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_filter_clause(t: TableSet) -> DataFrame:
    """Aggregate FILTER clauses (H2 1.4.200 grammar): per-aggregate
    predicates in one pass — one shuffle, no self-joins."""
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.sum(
            F.when(
                F.col("l_tax") > 0.03, F.col("l_extendedprice").cast(DEC)
            )
        )
        .cast("double")
        .alias("taxed_price"),
        F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
    )


@query(
    "values_inline_table",
    oracle="""
    SELECT v.tier, COUNT(*) AS n_nations
    FROM nation n
    JOIN (VALUES (0, 'americas'), (1, 'emea'), (2, 'apac'),
                 (3, 'emea'), (4, 'apac'))
         AS v(r_key, tier)
      ON n.n_regionkey = v.r_key
    GROUP BY v.tier
    """,
)
def q_values_inline_table(t: TableSet) -> DataFrame:
    """VALUES inline table (H2 grammar) joined to a real table — the
    literal lookup-table pattern; the VALUES side broadcasts."""
    spark = t.nation.sparkSession
    tiers = spark.sql(
        "SELECT * FROM VALUES (0, 'americas'), (1, 'emea'), (2, 'apac'), "
        "(3, 'emea'), (4, 'apac') AS v(r_key, tier)"
    )
    return (
        t.nation.join(
            F.broadcast(tiers), F.col("n_regionkey") == F.col("r_key")
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_bool(t: TableSet) -> DataFrame:
    """BOOL_AND / BOOL_OR aggregates (H2 grammar, SURVEY §2.2)."""
    return t.orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "scalar_regex",
    oracle=r"""
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_extract(p_type, '^(\w+)', 1) AS first_word,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END
             AS starts_word,
           CAST(len(regexp_extract_all(p_name, ' ')) AS BIGINT) AS n_spaces
    FROM part
    WHERE p_partkey <= 300
    """,
)
def q_scalar_regex(t: TableSet) -> DataFrame:
    """REGEXP_REPLACE / REGEXP_EXTRACT / REGEXP_LIKE battery
    (H2 REGEXP_REPLACE etc.). DuckDB needs the 'g' flag where Spark
    replaces globally by default."""
    return t.part.where(F.col("p_partkey") <= 300).select(
        "p_partkey",
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract(F.col("p_type"), r"^(\w+)", 1).alias("first_word"),
        F.when(F.col("p_name").rlike("^[a-z]+ "), 1).otherwise(0).alias(
            "starts_word"
        ),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit(" "), 0))
        .cast("bigint")
        .alias("n_spaces"),
    )


# ---------------------------------------------------------------------------
# Events (ns-timestamp table)
# ---------------------------------------------------------------------------


@query(
    "events_hourly",
    oracle="""
    SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(t: TableSet) -> DataFrame:
    """Hourly tumbling aggregation over the ns-timestamp events table
    (batch form; the streaming form lives in streaming/). Exercises
    the nanosecond→microsecond load path end-to-end."""
    return (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "value_sum"))
    )


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_props(t: TableSet) -> DataFrame:
    """JSON property extraction from the string props column."""
    return (
        t.events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("k_sum"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# PIVOT / UNPIVOT (reshaping grammar — Spark-native pivot/unpivot
# operators, oracle expressed as portable FILTER aggregates / UNION)
# ---------------------------------------------------------------------------


@query(
    "pivot_status_matrix",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS cnt_f,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS cnt_o,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS cnt_p,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(38,6))
                         ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS rev_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status_matrix(t: TableSet) -> DataFrame:
    """PIVOT: order-status columns per priority via Spark's native
    groupBy().pivot() with an EXPLICIT value list — without it Spark
    runs an extra distinct-collection job, and unknown values at
    100 TB would explode the column count. Absent combinations
    coalesce to the oracle's FILTER-aggregate zeros."""
    p = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F_cnt", F.lit(0)).alias("cnt_f"),
        F.coalesce("O_cnt", F.lit(0)).alias("cnt_o"),
        F.coalesce("P_cnt", F.lit(0)).alias("cnt_p"),
        F.coalesce("F_rev", F.lit(0.0)).alias("rev_f"),
    )


@query(
    "unpivot_nation_metrics",
    oracle="""
    WITH base AS (
      SELECT n_name,
             CAST(COUNT(*) AS DOUBLE) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, 'n_cust' AS metric, n_cust AS value FROM base
    UNION ALL
    SELECT n_name, 'total_bal' AS metric, total_bal AS value FROM base
    """,
)
def q_unpivot_nation_metrics(t: TableSet) -> DataFrame:
    """UNPIVOT (wide → long): Spark's native DataFrame.unpivot
    (melt); per-row reshaping, no shuffle beyond the source
    aggregation."""
    base = (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )
    return base.unpivot(["n_name"], ["n_cust", "total_bal"], "metric", "value")


# --- LATERAL correlated subquery (top-N per group, SQL form) ---------------

_LATERAL_TOPN = """
SELECT n_name, c_name, c_acctbal
FROM nation,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) top_c
"""


@query("lateral_topn_per_group", oracle=_LATERAL_TOPN)
def q_lateral_topn_per_group(t: TableSet) -> DataFrame:
    """LATERAL correlated subquery — top-2 customers by balance per
    nation, expressed as SQL *text* (H2 1.4.200 grammars LATERAL;
    Spark 4.x plans the correlated LIMIT subquery natively, so the
    identical statement runs on both engines verbatim). Catalyst
    decorrelates the per-nation LIMIT into a partitioned window
    rank — no per-outer-row re-execution."""
    return t.sql(_LATERAL_TOPN)


# --- Quantified comparison subqueries (ALL / ANY / SOME) -------------------

_QUANTIFIED = """
SELECT n_nationkey, n_name,
       n_nationkey > ALL (SELECT r_regionkey FROM region) AS above_all_regions,
       n_regionkey <= ANY (SELECT r_regionkey FROM region
                           WHERE r_name LIKE 'A%') AS at_most_some_a,
       n_regionkey = ANY (SELECT r_regionkey FROM region
                          WHERE r_name LIKE 'E%') AS in_europeish,
       n_regionkey <> ALL (SELECT CASE WHEN r_regionkey > 2 THEN NULL
                                       ELSE r_regionkey END
                           FROM region) AS outside_nullable_set
FROM nation
"""


@query("quantified_subquery", oracle=_QUANTIFIED)
def q_quantified_subquery(t: TableSet) -> DataFrame:
    """Quantified comparison subqueries (H2 grammars ALL/ANY/SOME;
    Spark's parser does not): the engine's statement surface rewrites
    them into ANSI-equivalent CASE-over-aggregate scalar subqueries
    (sql_dml.rewrite_quantified — three-valued logic preserved,
    verified by a 90-case truth table incl. empty / NULL-bearing /
    all-NULL subqueries in tests/test_sql_dml.py). The oracle runs
    the ORIGINAL statement on DuckDB's native quantifier support, so
    this row cross-checks the rewrite's fidelity end-to-end. The
    fourth column exercises the NULL-degradation path on real data."""
    from .. import sql_dml

    return t.sql(sql_dml.rewrite_quantified(_QUANTIFIED))


# --- TRY_CAST / error-safe casts -------------------------------------------

_TRY_CAST = """
SELECT p_partkey,
       try_cast(CASE WHEN p_partkey % 3 = 0 THEN CAST(p_retailprice AS STRING)
                     WHEN p_partkey % 3 = 1 THEN p_name
                     ELSE '' END AS DOUBLE) AS num_val,
       CAST(try_cast(CASE WHEN p_partkey % 2 = 0
                          THEN '1996-' || lpad(CAST(p_partkey % 12 + 1
                                                    AS STRING), 2, '0')
                               || '-15'
                          ELSE p_brand END AS DATE) AS STRING) AS date_val
FROM part
"""


@query("try_cast_safety", oracle=_TRY_CAST)
def q_try_cast_safety(t: TableSet) -> DataFrame:
    """Error-safe casts (H2 delegates bad casts to errors; the ANSI
    escape hatch both Spark and DuckDB share is try_cast -> NULL):
    numeric strings, free text, empty strings, valid and garbage
    dates — identical statement text on both engines, NULL exactly
    where the cast cannot succeed."""
    return t.sql(_TRY_CAST)


# --- Null-safe comparison (IS [NOT] DISTINCT FROM) -------------------------

_NULL_SAFE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN NULLIF(o_orderkey % 4, 0)
                          IS DISTINCT FROM NULLIF(o_orderkey % 2, 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct_pairs,
       CAST(SUM(CASE WHEN NULLIF(o_orderkey % 4, 0)
                          IS NOT DISTINCT FROM NULLIF(o_orderkey % 2, 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_same_pairs
FROM orders
GROUP BY o_orderpriority
"""


@query("null_safe_compare", oracle=_NULL_SAFE)
def q_null_safe_compare(t: TableSet) -> DataFrame:
    """Null-safe comparison semantics: IS [NOT] DISTINCT FROM over
    NULLIF-derived nullable operands hitting all four quadrants
    (NULL/NULL, NULL/value, equal values, differing values, keyed by
    o_orderkey mod 4). Same statement text on both engines;
    counts prove NULL-vs-NULL compares 'not distinct' and NULL-vs-
    value 'distinct', which plain = can never assert."""
    return t.sql(_NULL_SAFE)


# --- Hopping (sliding) window aggregation ----------------------------------


@query(
    "events_hopping",
    oracle="""
    WITH e AS (
      SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800
                  AS BIGINT) AS b,
             event_type
      FROM events
    ),
    w AS (
      SELECT unnest([b, b - 1800]) AS window_start_epoch, event_type FROM e
    )
    SELECT window_start_epoch, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY window_start_epoch, event_type
    """,
)
def q_events_hopping(t: TableSet) -> DataFrame:
    """Hopping-window aggregation (1-hour windows sliding every 30
    minutes — each event lands in exactly two windows), the batch
    twin of the streaming sliding window. Spark's native window()
    generator does the two-way assignment JVM-side before ONE
    aggregation shuffle; the oracle replays the epoch-aligned window
    arithmetic with an unnest. Window starts compared as epoch
    seconds (BIGINT) so no engine timestamp-rendering drift."""
    return (
        t.events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )


# --- IGNORE NULLS window functions (LOCF gap-fill) -------------------------

_IGNORE_NULLS_SPARK = """
SELECT o_orderkey, o_orderpriority, gauge,
       last_value(gauge) IGNORE NULLS OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       lag(gauge) IGNORE NULLS OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_gauge
FROM (SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END AS gauge
      FROM orders)
"""

_IGNORE_NULLS_DUCK = """
SELECT o_orderkey, o_orderpriority, gauge,
       last_value(gauge IGNORE NULLS) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       lag(gauge IGNORE NULLS) OVER
         (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS prev_gauge
FROM (SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice END AS gauge
      FROM orders)
"""


@query("window_ignore_nulls", oracle=_IGNORE_NULLS_DUCK)
def q_window_ignore_nulls(t: TableSet) -> DataFrame:
    """IGNORE NULLS window functions — last-observation-carried-
    forward over a sparse gauge (every 7th order carries a value) and
    the previous-seen-value lag: the time-series gap-fill surface.
    Identical semantics both engines; the IGNORE NULLS token sits
    outside the call in Spark's grammar and inside DuckDB's, so the
    texts differ only in that placement."""
    return t.sql(_IGNORE_NULLS_SPARK)


# --- Gaps and islands ------------------------------------------------------

_GAPS_ISLANDS = """
WITH s AS (SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 150000),
g AS (SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM s)
SELECT CAST(MIN(k) AS BIGINT) AS island_start,
       CAST(MAX(k) AS BIGINT) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS island_len
FROM g GROUP BY grp
"""


@query("gaps_islands", oracle=_GAPS_ISLANDS)
def q_gaps_islands(t: TableSet) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive order keys
    inside a filtered subset (k - ROW_NUMBER() is constant within a
    run). The single-partition window runs over the FILTERED subset,
    not the corpus — the pattern's standard scale posture; at 100 TB
    you'd pre-bucket by a coarse key range and islands never span
    buckets wider than the data's gap structure."""
    return t.sql(_GAPS_ISLANDS)


# --- Event funnel (ordered-step completion) --------------------------------

_FUNNEL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1 FROM e),
w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2 FROM w1),
w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts
                      END)
                   OVER (PARTITION BY user_id) AS t3 FROM w2)
SELECT user_id,
       MIN(t1) AS view_ts, MIN(t2) AS click_ts, MIN(t3) AS purchase_ts,
       CAST(CAST(MIN(t1) IS NOT NULL AS INT)
            + CAST(MIN(t2) IS NOT NULL AS INT)
            + CAST(MIN(t3) IS NOT NULL AS INT) AS BIGINT)
         AS steps_completed
FROM w3 GROUP BY user_id
"""


@query("event_funnel", oracle=_FUNNEL)
def q_event_funnel(t: TableSet) -> DataFrame:
    """Ordered-funnel completion (view -> click -> purchase): each
    step's timestamp is the earliest qualifying event AFTER the
    previous step, computed with three chained per-user window
    minima — ONE shuffle on user_id total (the windows share the
    partitioning; no per-step self-joins, which is how funnel
    queries usually die at scale). MATCH_RECOGNIZE-style sequencing
    without the grammar; identical statement on both engines."""
    return t.sql(_FUNNEL)


# --- Retention cohorts -----------------------------------------------------


@query(
    "retention_cohorts",
    oracle="""
    WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
               FROM events),
    first AS (SELECT user_id, MIN(d) AS cohort_date FROM e GROUP BY user_id)
    SELECT CAST(f.cohort_date AS STRING) AS cohort_date,
           CAST(date_diff('day', f.cohort_date, e.d) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM e JOIN first f USING (user_id)
    GROUP BY f.cohort_date, day_offset
    """,
)
def q_retention_cohorts(t: TableSet) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-activity
    date, activity counted at each day offset — the
    (cohort, offset) -> distinct-actives view every growth dashboard
    draws. The per-user first day is a WINDOW min over the user_id
    partition — ONE pruned scan and one shuffle; the
    aggregate-then-join alternative scans events twice and must
    broadcast a |users|-sized frame, which at 100 TB is billions of
    rows (the plan-audit gate caught exactly that first draft).
    Engine date-diff spellings differ (Spark datediff vs DuckDB
    date_diff) so the Spark side is the DataFrame form."""
    e = t.events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    w = Window.partitionBy("user_id")
    return (
        e.withColumn("cohort_date", F.min("d").over(w))
        .select(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            "day_offset",
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT hour, event_type, n,
             CAST(COUNT(*) OVER w AS BIGINT) AS lookback_n,
             CAST(SUM(n) OVER w AS BIGINT) AS s1,
             CAST(SUM(n * n) OVER w AS BIGINT) AS s2
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(hour AS STRING) AS hour, event_type, n, lookback_n,
           CASE WHEN lookback_n >= 12
                 AND lookback_n * s2 > s1 * s1
                THEN CAST(CAST(round(
                       (n * lookback_n - s1) /
                       (sqrt(CAST(lookback_n * s2 - s1 * s1 AS DOUBLE))),
                       6) AS DECIMAL(28,10)) * 1000000 AS BIGINT)
           END AS z_micro,
           CASE WHEN lookback_n >= 12
                 AND lookback_n * s2 > s1 * s1
                THEN abs((n * lookback_n - s1) /
                     sqrt(CAST(lookback_n * s2 - s1 * s1 AS DOUBLE)))
                     >= 3.0
                ELSE NULL END AS is_anomaly
    FROM win
    """,
)
def q_events_anomaly_zscore(t: TableSet) -> DataFrame:
    """Rolling z-score anomaly flags over hourly event-type counts —
    the ops-dashboard "did traffic spike" question. The 24-hour
    lookback frame EXCLUDES the current hour (a spike must not
    dilute its own baseline) and needs >= 12 observed hours before
    judging. Determinism: z is a ratio of exact integer power sums
    ((n*cnt - s1) / sqrt(cnt*s2 - s1^2)) — both engines evaluate
    identical double operands, 6-rounded and DECIMAL-lifted to
    integer micro-units. Shape at 100 TB: one partial+final hourly
    aggregation [the only corpus shuffle]; the window runs over the
    |types| x |hours| aggregate frame, partitioned by type — never
    the raw corpus."""
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    win = hourly.select(
        "hour",
        "event_type",
        "n",
        F.count(F.lit(1)).over(w).cast("bigint").alias("lookback_n"),
        F.sum("n").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("bigint").alias("s2"),
    )
    ok = (F.col("lookback_n") >= 12) & (
        F.col("lookback_n") * F.col("s2") > F.col("s1") * F.col("s1")
    )
    z = F.expr(
        "(n * lookback_n - s1) /"
        " sqrt(CAST(lookback_n * s2 - s1 * s1 AS DOUBLE))"
    )
    z_micro = (F.round(z, 6).cast("decimal(28,10)") * 1000000).cast("bigint")
    return win.select(
        F.col("hour").cast("string").alias("hour"),
        "event_type",
        "n",
        "lookback_n",
        F.when(ok, z_micro).alias("z_micro"),
        F.when(ok, F.abs(z) >= 3.0).alias("is_anomaly"),
    )


_NAMED_WINDOW = """
SELECT o_custkey,
       o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
         AS running_spend,
       CAST(RANK() OVER w2 AS BIGINT) AS price_rank
FROM orders
WHERE o_custkey < 50
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@query("window_named_clause", oracle=_NAMED_WINDOW)
def q_window_named_clause(t: TableSet) -> DataFrame:
    """The named WINDOW clause (H2 1.4.200 grammars it; Spark SQL
    plans it natively) — two named specs shared across three window
    functions, exercised as SQL text so the grammar path itself is
    what's verified; the identical statement is the DuckDB oracle.
    Deterministic: both orderings tie-break on o_orderkey, the
    running sum is DECIMAL-exact."""
    return t.sql(_NAMED_WINDOW)


_ANSI_STRING = """
SELECT p_partkey,
       p_name,
       SUBSTRING(p_name FROM 2 FOR 3) AS mid3,
       TRIM(LEADING 'c' FROM p_name) AS no_lead_c,
       TRIM(TRAILING 't' FROM p_name) AS no_trail_t,
       CAST(POSITION('dg' IN p_name) AS BIGINT) AS dg_at,
       CONCAT(p_type, '%') LIKE '%O!%' ESCAPE '!' AS type_ends_o
FROM part
WHERE p_name LIKE '%widget%' OR POSITION('bolt' IN p_name) > 0
"""


@query("ansi_string_grammar", oracle=_ANSI_STRING)
def q_ansi_string_grammar(t: TableSet) -> DataFrame:
    """The ANSI keyword forms of the string battery — SUBSTRING FROM
    FOR, TRIM LEADING/TRAILING ... FROM, POSITION(x IN y), LIKE ...
    ESCAPE — exercised as SQL text so the GRAMMAR path is what is
    verified (the function-call spellings are covered by
    scalar_string/_extended); identical statement on both engines.
    Per-row codegen, zero shuffle, pushed disjunctive filter."""
    return t.sql(_ANSI_STRING)
