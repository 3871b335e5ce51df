"""H2 function-compat layer (h2_functions.py) + the r9 date-grammar
rewrites: spelled function aliases registered as Spark SQL-defined
functions (JVM-side, zero Python), and H2's quoted-unit / boundary-
semantics DATEADD/DATEDIFF forms at the execute_sql surface."""

from __future__ import annotations

import json

import pytest

from quasar_destination_h2_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark, warehouse_dir):
    return Engine.from_config(
        json.dumps({"connectionUri": warehouse_dir}), spark=spark
    )


def _one(engine, expr):
    return engine.execute_sql(f"SELECT {expr} AS r").collect()[0].r


def test_bitwise_aliases(engine):
    assert _one(engine, "BITAND(12, 10)") == 8
    assert _one(engine, "BITOR(12, 10)") == 14
    assert _one(engine, "BITXOR(12, 10)") == 6


def test_week_and_dow_aliases(engine):
    # 2020-01-01 is a Wednesday, ISO week 1
    assert _one(engine, "ISO_WEEK(DATE '2020-01-01')") == 1
    assert _one(engine, "WEEK(DATE '2020-01-01')") == 1
    # H2 DAY_OF_WEEK: 1 = Sunday .. 7 = Saturday -> Wednesday = 4
    assert _one(engine, "DAY_OF_WEEK(DATE '2020-01-01')") == 4
    # ISO: 1 = Monday .. 7 = Sunday -> Wednesday = 3
    assert _one(engine, "ISO_DAY_OF_WEEK(DATE '2020-01-01')") == 3
    assert _one(engine, "ISO_DAY_OF_WEEK(DATE '2020-01-05')") == 7  # Sunday
    assert _one(engine, "DAY_OF_MONTH(DATE '2020-01-31')") == 31
    assert _one(engine, "DAY_OF_YEAR(DATE '2020-02-01')") == 32


def test_truncate_toward_zero(engine):
    assert _one(engine, "TRUNCATE(1.567, 1)") == 1.5
    assert _one(engine, "TRUNCATE(-1.567, 1)") == -1.5  # toward zero
    assert _one(engine, "TRUNCATE(-1.999, 2)") == -1.99
    assert _one(engine, "TRUNCATE(1.999, 0)") == 1.0
    # the double-arithmetic trap: 1.2 * 10 = 11.999999999999998 in
    # binary — a naive floor(x*10)/10 yields 1.1; H2 returns 1.2.
    # The decimal-based scale-up must hold the user-visible value.
    assert _one(engine, "TRUNCATE(1.2, 1)") == 1.2
    assert _one(engine, "TRUNCATE(-1.2, 1)") == -1.2
    assert _one(engine, "TRUNCATE(1.2345, 3)") == 1.234
    assert _one(engine, "TRUNCATE(1234567.89, 1)") == 1234567.8


def test_sql_defined_functions_stay_jvm_side(engine):
    """The aliases must inline into codegen — a spark.udf.register
    alias would put BatchEvalPython (row-at-a-time Python) into
    every calling plan."""
    df = engine.sql("SELECT BITAND(id, 3) AS r FROM range(10)")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_dateadd_quoted_and_short_units(engine):
    assert _one(
        engine, "DATEADD('DAY', 3, TIMESTAMP '2020-01-01 00:00:00')"
    ).day == 4
    assert _one(
        engine, "DATEADD(DD, 3, TIMESTAMP '2020-01-01 00:00:00')"
    ).day == 4
    assert _one(
        engine, "DATEADD('MONTH', 1, TIMESTAMP '2020-01-31 00:00:00')"
    ).month == 2


def test_datediff_boundary_semantics(engine):
    """H2's DATEDIFF counts crossed unit boundaries, not complete
    elapsed units: 23:00 -> next-day 01:00 is DATEDIFF('DAY') = 1
    (raw Spark timestampdiff would say 0)."""
    assert _one(
        engine,
        "DATEDIFF('DAY', TIMESTAMP '2020-01-01 23:00:00',"
        " TIMESTAMP '2020-01-02 01:00:00')",
    ) == 1
    # same instant boundary-wise
    assert _one(
        engine,
        "DATEDIFF('MONTH', TIMESTAMP '2020-01-31 23:59:59',"
        " TIMESTAMP '2020-02-01 00:00:00')",
    ) == 1
    # negative direction
    assert _one(
        engine,
        "DATEDIFF(DAY, TIMESTAMP '2020-01-02 01:00:00',"
        " TIMESTAMP '2020-01-01 23:00:00')",
    ) == -1
    # bare Spark-native TIMESTAMPDIFF keeps elapsed-units semantics
    assert _one(
        engine,
        "TIMESTAMPDIFF(DAY, TIMESTAMP '2020-01-01 23:00:00',"
        " TIMESTAMP '2020-01-02 01:00:00')",
    ) == 0
    # ... while the H2-only quoted form gets H2 semantics
    assert _one(
        engine,
        "TIMESTAMPDIFF('DAY', TIMESTAMP '2020-01-01 23:00:00',"
        " TIMESTAMP '2020-01-02 01:00:00')",
    ) == 1


def test_two_arg_datediff_untouched(engine):
    """Spark's own datediff(end, start) must pass through unchanged."""
    assert _one(
        engine, "datediff(DATE '2020-01-05', DATE '2020-01-01')"
    ) == 4


def test_registration_idempotent(spark):
    from quasar_destination_h2_spark.h2_functions import register_h2_functions

    n1 = register_h2_functions(spark)
    n2 = register_h2_functions(spark)
    assert n1 == n2 > 0


def test_truncate_negative_and_extreme_scales(engine):
    """H2 accepts negative TRUNCATE scales (BigDecimal.setScale) and
    never aborts on extreme d — the r9 review found DIVIDE_BY_ZERO
    for d < 0 and decimal overflow for d >= 10 under ANSI mode."""
    assert _one(engine, "TRUNCATE(12345.678, -2)") == 12300.0
    assert _one(engine, "TRUNCATE(-12345.678, -2)") == -12300.0
    assert _one(engine, "TRUNCATE(12345.678, -5)") == 0.0
    assert _one(engine, "TRUNCATE(3.7, 15)") == 3.7
    assert _one(engine, "TRUNCATE(0.5, -30)") == 0.0
    assert _one(engine, "TRUNCATE(CAST(NULL AS DOUBLE), 2)") is None


def test_truncate_boundaries_and_long_renderings(engine):
    """r9 review round 2: the decimal domain is [|x| < 1e19,
    -20 < d < 18] with identity/zero outside (no ANSI aborts at the
    former d=-26 overflow boundary), and 17-fractional-digit shortest
    renderings truncate DOWN like H2's BigDecimal.setScale — a
    scale-12 cast would HALF_UP 0.09999999999999999 to 0.1."""
    assert _one(engine, "TRUNCATE(0.09999999999999999, 1)") == 0.0
    assert _one(engine, "TRUNCATE(5.0, -19)") == 0.0
    assert _one(engine, "TRUNCATE(5.0, -20)") == 0.0
    assert _one(engine, "TRUNCATE(5.0, -26)") == 0.0
    assert _one(engine, "TRUNCATE(1.23456, 17)") == 1.23456
    assert _one(engine, "TRUNCATE(3.7, 18)") == 3.7
    assert _one(engine, "TRUNCATE(1e19, 2)") == 1e19
