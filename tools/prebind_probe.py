"""Statement-overhead probe vs catalog size (r14 task 3).

The r13 verdict measured the statement pre-bind scan at O(catalog x
statement) per statement — a 10k-table warehouse paid 10k regex scans
plus tableExists RPCs per wire statement. r14 replaced it with one
token scan per statement against a memoized catalog index
(sql_dml._prebind_index) and a negative-memo session-shadow check
(engine._session_shadow_exists). This probe pins the result: the
per-statement wall of the driver-side metadata path must stay FLAT as
the catalog grows 100x.

Method: one real table with a handful of rows; FAKE catalog entries
injected in memory (never touched by the probed statements, exactly
like a big warehouse's unrelated tables); per catalog size
{100, 1k, 10k}, median wall over N repetitions of three statement
classes — a catalog-table SELECT (pre-bind hit), an INSERT ...
VALUES (DML parse + write path), and a constant SELECT (no relation).
Writes ONE JSON line; run from the repo root:

    python tools/prebind_probe.py [--reps 15]
    # -> tools/gatelogs/PREBIND_PROBE_r14.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "gatelogs",
            "PREBIND_PROBE_r14.json",
        ),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quasar_destination_h2_spark.engine import Engine

    eng = Engine.from_config(
        json.dumps({"connectionUri": tempfile.mkdtemp()}), spark=spark
    )
    eng.execute_sql('DROP TABLE IF EXISTS "pp_t"')
    eng.execute_sql('CREATE CACHED TABLE "pp_t"("k" INT, "v" VARCHAR(8))')
    eng.execute_sql("INSERT INTO pp_t VALUES (1, 'a'), (2, 'b')")

    statements = {
        "select_catalog_table": "SELECT count(*) AS c FROM pp_t",
        "insert_values": "INSERT INTO pp_t (k, v) VALUES (9, 'z')",
        "select_constant": "SELECT 1 AS one",
    }

    def run_once(sql: str) -> float:
        t0 = time.perf_counter()
        r = eng.execute_sql(sql)
        if r is not None and not isinstance(r, int):
            r.collect()
        return time.perf_counter() - t0

    results: dict = {}
    injected: list = []
    for size in (100, 1_000, 10_000):
        # grow the in-memory catalog with fake entries the probed
        # statements never mention — a big warehouse's other tables
        while len(injected) < size:
            i = len(injected)
            name = f"pp_fake_{i:05d}"
            eng.sink.catalog[name] = f"pp_fake_{i:05d}_phys"
            injected.append(name)
        # warm-up (JIT, index build) then measure
        for sql in statements.values():
            run_once(sql)
        per_stmt: dict = {}
        for label, sql in statements.items():
            walls = [run_once(sql) for _ in range(args.reps)]
            per_stmt[label] = {
                "median_s": round(statistics.median(walls), 4),
                "p90_s": round(sorted(walls)[int(0.9 * len(walls))], 4),
            }
        results[str(size)] = per_stmt

    # flatness verdict: 10k median within 1.5x of 100 median per class
    flat = all(
        results["10000"][k]["median_s"]
        <= max(1.5 * results["100"][k]["median_s"], 0.05)
        for k in statements
    )
    out = {
        "probe": "prebind_overhead_vs_catalog_size",
        "reps": args.reps,
        "sizes": results,
        "flat_10k_vs_100": flat,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    # cleanup the fakes so a reused warehouse stays sane
    for name in injected:
        eng.sink.catalog.pop(name, None)
    eng.execute_sql('DROP TABLE IF EXISTS "pp_t"')


if __name__ == "__main__":
    main()
