"""Hard scale gates over EVERY registered query's physical plan.

tools/plan_audit.py renders the reviewed-plan record (PLANS.md); this
test enforces the same gates red: a future query that plans a
CartesianProduct, a row-at-a-time Python UDF, an undeclared
BroadcastNestedLoopJoin, or a NEW repeated big-table scan (the classic
100 TB killer — a scalar-subquery / union / self-join shape silently
re-deriving a fact-scan chain per subtree) fails the suite instead of
merely appearing in a report. Reviewed repeats live in
tools/plan_audit.RESCAN_REVIEWED with per-entry justifications.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from conftest import SF_DIR


def test_every_plan_passes_scale_gates(spark):
    from plan_audit import sweep_violations

    from quasar_destination_h2_spark import plans

    violations = sweep_violations(spark, SF_DIR, plans.all_queries())
    assert violations == {
        "cartesian": [],
        "row_python_udf": [],
        "unexpected_nlj": [],
        "new_repeated_big_scans": [],
    }, violations


def test_no_global_window_on_dml_write_paths():
    """Verdict r14 #3 / r15 task 3: a ``Window.orderBy`` with no
    ``partitionBy`` funnels every row through ONE task — forbidden on
    any DML write path that can carry an unbounded (table-driven)
    source. The identity-fill and per-row-NEXTVAL paths share the
    partition-local-rank + broadcast-prefix-offset protocol instead
    (sql_dml._prefix_rank_state). The only allowed global windows in
    the statement modules are the bounded VALUES-literal sites, each
    tagged ``# bounded: VALUES rows`` on the Window.orderBy line."""
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "quasar_destination_h2_spark",
    )
    offenders = []
    for mod in ("sql_dml.py", "engine.py", os.path.join("sources", "sink.py")):
        path = os.path.join(pkg, mod)
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line:
                continue  # prose mentions lack the call parenthesis
            stripped = line.strip()
            if stripped.startswith("#"):
                continue  # commentary, not code
            window = "\n".join(lines[i : i + 3])
            if re.search(r"#\s*bounded: VALUES rows", window):
                continue
            if ".partitionBy(" in window or "Window.partitionBy" in line:
                continue
            offenders.append(f"{mod}:{i + 1}: {stripped}")
    assert not offenders, (
        "global Window.orderBy on a DML write path (use "
        "sql_dml._prefix_rank_state, or tag a genuinely bounded "
        "VALUES-literal site with '# bounded: VALUES rows'):\n"
        + "\n".join(offenders)
    )


def test_scan_schema_counter_reports_pruned_columns(spark):
    """Regression for the r6 PLANS.md cosmetic bug: column counts came
    from comma-splitting the truncated plan string (decimal(p,s)
    commas + truncation made tpch_q7's 5-column lineitem scan report
    as 19). scan_schemas must read each scan node's requiredSchema —
    q7's widest scan is exactly the 5 pruned lineitem columns."""
    from plan_audit import scan_schemas

    from quasar_destination_h2_spark import plans

    df = plans.all_queries()["tpch_q7_volume_shipping"](spark, SF_DIR)
    scans = scan_schemas(df._jdf.queryExecution().executedPlan())
    assert scans, "no scan leaves found"
    widest = max(scans, key=lambda s: s[0])
    assert widest == (
        5,
        "l_orderkey,l_suppkey,l_extendedprice,l_discount,l_shipdate",
    )
    # every scan is pruned: nothing reads the full 11-column lineitem
    assert all(n <= 5 for n, _ in scans)


def test_serving_probes_render_dynamic_partition_pruning(spark):
    """r10 VERDICT task 4: the composed-index serving queries'
    pruned-scan shapes are the proof of design at 100x — their
    executed plans must carry dynamicpruningexpression on the
    partitioned index scans (the marker PLANS.md now counts), or a
    regression silently turns every probe into a full-index scan."""
    from quasar_destination_h2_spark import cache, plans

    qs = plans.all_queries()
    for name in ("ivfpq_index_search", "ivfbq_index_search"):
        p = (
            qs[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        cache.release()
        assert "dynamicpruningexpression" in p, name
