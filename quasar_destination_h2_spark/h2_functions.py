"""H2 1.4.200 function-compat layer: SQL-defined function aliases.

The reference exposes full H2 SQL through its PG/TCP servers
(``/root/reference/core/src/main/scala/quasar/destination/h2/server/
H2Server.scala:60-84``), so an H2 client may emit function spellings
Spark's builtin registry lacks. The engine closes the gap with
Spark 4 SQL-defined functions (``CREATE OR REPLACE TEMPORARY
FUNCTION ... RETURN <expr>``) — these inline into the Catalyst plan
as ordinary expressions (whole-stage codegen, ZERO Python; pinned by
``tests/test_h2_functions.py`` asserting no BatchEvalPython), unlike
a ``spark.udf.register`` alias which would drop every call onto the
row-at-a-time Python path.

Registered here (all verified against H2 1.4.200 documented
semantics; differential-fuzzed against DuckDB equivalents):

* ``BITAND/BITOR/BITXOR(a, b)`` — H2's spelled bitwise ops.
* ``ISO_WEEK(d)`` — ISO-8601 week (Spark ``weekofyear`` is ISO).
* ``WEEK(d)`` — H2's WEEK is locale-dependent; this engine pins it
  to the ISO week (the only portable choice — documented divergence
  for locales whose week starts Sunday).
* ``DAY_OF_WEEK(d)`` — 1 = Sunday .. 7 = Saturday (H2 and Spark's
  ``dayofweek`` agree).
* ``ISO_DAY_OF_WEEK(d)`` — 1 = Monday .. 7 = Sunday.
* ``DAY_OF_MONTH/DAY_OF_YEAR(d)`` — underscore spellings of
  ``dayofmonth``/``dayofyear``.
* ``TRUNCATE(x, d)`` — numeric truncation toward zero to ``d``
  decimal places (H2's two-argument TRUNCATE; the TRUNCATE TABLE
  statement is dispatched by the verb parser long before function
  resolution, so the name cannot collide).

Quoted-unit and boundary-semantics rewrites for DATEADD/DATEDIFF
live in ``sql_dml.rewrite_h2_dialect`` — they are grammar, not
functions.
"""

from __future__ import annotations

_H2_FUNCTION_DEFS: tuple[str, ...] = (
    "CREATE OR REPLACE TEMPORARY FUNCTION BITAND(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a & b",
    "CREATE OR REPLACE TEMPORARY FUNCTION BITOR(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a | b",
    "CREATE OR REPLACE TEMPORARY FUNCTION BITXOR(a BIGINT, b BIGINT) "
    "RETURNS BIGINT RETURN a ^ b",
    "CREATE OR REPLACE TEMPORARY FUNCTION ISO_WEEK(d TIMESTAMP) "
    "RETURNS INT RETURN weekofyear(d)",
    "CREATE OR REPLACE TEMPORARY FUNCTION WEEK(d TIMESTAMP) "
    "RETURNS INT RETURN weekofyear(d)",
    "CREATE OR REPLACE TEMPORARY FUNCTION DAY_OF_WEEK(d TIMESTAMP) "
    "RETURNS INT RETURN dayofweek(d)",
    "CREATE OR REPLACE TEMPORARY FUNCTION ISO_DAY_OF_WEEK(d TIMESTAMP) "
    "RETURNS INT RETURN (dayofweek(d) + 5) % 7 + 1",
    "CREATE OR REPLACE TEMPORARY FUNCTION DAY_OF_MONTH(d TIMESTAMP) "
    "RETURNS INT RETURN dayofmonth(d)",
    "CREATE OR REPLACE TEMPORARY FUNCTION DAY_OF_YEAR(d TIMESTAMP) "
    "RETURNS INT RETURN dayofyear(d)",
    # truncation toward zero via exact decimal mod: x - (x % 10^-d)
    # (Spark's decimal % carries the DIVIDEND's sign, which IS
    # toward-zero for both signs). All arithmetic runs in DECIMAL,
    # not double: a double scale-up re-rounds (1.2 * 10 =
    # 11.999999999999998 would truncate to 1.1), while the
    # double->decimal cast goes through the double's SHORTEST decimal
    # rendering (BigDecimal.valueOf). Scale 18 so even the longest
    # shortest-renderings of |x| >= 0.1 (17 fractional digits, e.g.
    # 0.09999999999999999) survive the cast EXACTLY — a scale-12 cast
    # would HALF_UP them across the truncation boundary (H2 setScale
    # DOWN returns 0.0 there, not 0.1). H2 accepts NEGATIVE scales
    # (TRUNCATE(12345.678, -2) = 12300.0) — the mod form handles them
    # natively. Domain guards keep ANSI mode from aborting where H2
    # returns a value: DECIMAL(38,18) carries 20 integer digits, so
    # |x| >= 1e19 or d >= 18 -> identity (such doubles are integral /
    # sub-ulp truncation), d <= -20 -> 0 (10^20 > |x|).
    "CREATE OR REPLACE TEMPORARY FUNCTION TRUNCATE(x DOUBLE, d INT) "
    "RETURNS DOUBLE RETURN "
    "CASE WHEN x IS NULL OR d IS NULL THEN CAST(NULL AS DOUBLE) "
    "WHEN abs(x) >= 1e19 OR d >= 18 THEN x "
    "WHEN d <= -20 THEN 0.0d "
    "ELSE CAST(CAST(x AS DECIMAL(38,18)) "
    "- (CAST(x AS DECIMAL(38,18)) "
    "% CAST(power(10, -d) AS DECIMAL(38,18))) AS DOUBLE) END",
)


def register_h2_functions(spark) -> int:
    """Register the H2 function aliases on ``spark``'s session
    (temporary functions — session-scoped, CREATE OR REPLACE makes
    re-registration idempotent). Called by Engine construction so
    every ``execute_sql``/``engine.sql`` statement sees them.
    Returns the number of functions registered."""
    for stmt in _H2_FUNCTION_DEFS:
        spark.sql(stmt)
    return len(_H2_FUNCTION_DEFS)
