"""[EXT] Statistical analytics — correlation, trend fitting, and
histograms as ONE-PASS aggregations.

Spark ships corr()/covar as built-in aggregates, but their running
double accumulation is summation-order-dependent — different
partitionings (or engines) give different last bits, which a
hash-strict conformance gate rejects. Every operator here instead
reduces to EXACT decimal power sums (n, Σx, Σy, Σx², Σy², Σxy) —
order-independent by construction — and derives the statistic with
pure double arithmetic on those exact sums: identical operands ->
identical IEEE result on every engine and every partitioning. The
shuffle carries one tiny row per (group/pair); the corpus is scanned
once however many statistics are requested.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F

#: Exact decimal carrier for ELEMENT values (plain sums).
DEC = "decimal(18,6)"
#: Carrier for MULTIPLICATION operands: 28 digits forces DuckDB onto
#: its int128 decimal path (18-digit operands multiply in int64 and
#: overflow), while Spark caps the product type at (38, 6). The two
#: engines therefore keep product scales 12 and 6 respectively —
#: identical sums as long as element values carry <= 3 fractional
#: digits (true for every profiled fixture column: integers and
#: 2-dp currency), which is the documented operating envelope.
PROD_DEC = "decimal(28,6)"


def _power_sums(df: DataFrame, x: str, y: str) -> DataFrame:
    xd = F.col(x).cast(PROD_DEC)
    yd = F.col(y).cast(PROD_DEC)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every column pair, one corpus scan.

    All pairs' power sums are computed in a single aggregation (the
    map side does all the work; the shuffle carries one row), then
    each r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)(n·Σy² − Σy²))
    derives in double from the exact sums, rounded to 6.

    Output: (col_a, col_b, n, corr) for a < b."""
    if len(cols) < 2:  # no pairs: empty result, contract schema
        return df.sparkSession.createDataFrame(
            [], "col_a string, col_b string, n bigint, corr double"
        )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        d = F.col(c).cast(DEC)
        dp = F.col(c).cast(PROD_DEC)
        aggs.append(F.sum(d).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(dp * dp).cast("double").alias(f"ss_{c}"))
    for a, b in combinations(cols, 2):
        da, db = F.col(a).cast(PROD_DEC), F.col(b).cast(PROD_DEC)
        aggs.append(F.sum(da * db).cast("double").alias(f"sp_{a}_{b}"))
    wide = df.agg(*aggs)
    arms = []
    for a, b in combinations(cols, 2):
        arms.append(
            f"'{a}', '{b}', `n`, round("
            f"(`n` * `sp_{a}_{b}` - `s_{a}` * `s_{b}`) / "
            f"sqrt((`n` * `ss_{a}` - `s_{a}` * `s_{a}`)"
            f" * (`n` * `ss_{b}` - `s_{b}` * `s_{b}`)), 6)"
        )
    n_pairs = len(arms)
    stack = ", ".join(arms)
    return wide.selectExpr(
        f"stack({n_pairs}, {stack}) AS (col_a, col_b, n, corr)"
    ).select(
        "col_a", "col_b", F.col("n").cast("bigint").alias("n"), "corr"
    )


def group_ols(
    df: DataFrame, group_col: str, x: str, y: str, round6: bool = True
) -> DataFrame:
    """Per-group simple linear regression y = slope·x + intercept —
    one aggregation shuffle keyed on the group, closed-form from the
    exact power sums (never an iterative solver, never a collect).

    Output: (group, n, slope, intercept, r2), rounded to 6 by
    default. ``round6=False`` returns the raw doubles — for callers
    whose statistics can land on a round-half boundary where Spark
    (BigDecimal HALF_UP on the exact binary expansion) and DuckDB
    (multiply-round-divide) disagree by one ulp; those callers floor
    to integer micro-units instead (zipf_fit)."""
    xd = F.col(x).cast(PROD_DEC)
    yd = F.col(y).cast(PROD_DEC)
    sums = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / vx
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = (cov * cov) / (vx * vy)
    if not round6:
        return sums.select(
            "grp",
            F.col("n").cast("bigint").alias("n"),
            slope.alias("slope"),
            intercept.alias("intercept"),
            r2.alias("r2"),
        )
    return sums.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def fixed_width_histogram(
    df: DataFrame, col: str, width: float
) -> DataFrame:
    """Equi-width histogram with epoch-anchored bins (bin k covers
    [k·width, (k+1)·width)): a single aggregation on the bin key —
    no global min/max pre-pass, so ONE scan and map-side combine do
    everything. floor() (not round/cast) for engine-identical bin
    edges.

    Output: (bin, lo, hi, n_rows, sum_value)."""
    b = F.floor(F.col(col) / F.lit(width)).cast("bigint")
    return (
        df.select(b.alias("bin"), F.col(col).cast(DEC).alias("v"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select(
            "bin",
            (F.col("bin") * width).alias("lo"),
            ((F.col("bin") + 1) * width).alias("hi"),
            "n_rows",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def key_skew_profile(df: DataFrame, key_col: str, topn: int = 10) -> DataFrame:
    """Pre-join skew diagnostic: the heavy-hitter keys and how far
    the key distribution departs from uniform — the question every
    big join/groupBy should ask BEFORE shuffling 100 TB on a key
    (its answer decides between plain hash join, AQE skew handling,
    and explicit salting; the engine's salted_join_agg is the
    downstream consumer).

    All ratios are integer parts-per-million via integer DIVISION so
    both engines compute bit-identical values: share_ppm = this
    key's row share; skew_ppm = max_count x n_keys / total — exactly
    1,000,000 for a perfectly uniform key, k-million when the
    hottest key carries k-times its uniform share. The skew_ppm
    numerator goes through DECIMAL(38,0): at diagnostic scale
    (~1e9 keys with a ~1e5-row hot key) max_cnt * n_keys * 1e6
    exceeds bigint, where ANSI engines raise and non-ANSI ones wrap
    silently negative — exactly where the diagnostic matters most.
    The quotient itself is a small multiple of 1e6 and always fits.

    Shape: one partial+final count aggregation on the key [the only
    corpus shuffle], TakeOrderedAndProject for the top-N (per-
    partition heap, no global sort), and a one-row global-stats
    aggregate broadcast onto the N winners.

    Output: (key, cnt, share_ppm, n_keys, total_rows, skew_ppm).
    """
    from .. import cache

    # the per-key count frame feeds BOTH the top-N and the global
    # stats aggregate — persist it (|keys| rows, 2 columns) so the
    # corpus is scanned once, not once per subtree; registered with
    # cache.release() so long-lived sessions can drop it between
    # queries
    counts = cache.persisted(
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(topn)
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        F.expr("CAST(cnt * 1000000 DIV total_rows AS BIGINT)").alias(
            "share_ppm"
        ),
        "n_keys",
        "total_rows",
        F.expr(
            "CAST(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000"
            " DIV total_rows AS BIGINT)"
        ).alias("skew_ppm"),
    )
