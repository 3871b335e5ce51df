"""Round-over-round bench comparison per the BASELINE.md protocol.

Usage: python tools/bench_compare.py NEW_PAIR.json OLD_A.json [OLD_B.json]

NEW_PAIR.json is an interleaved-pair bench output
(SPARK_GRAFT_BENCH_PAIR=1): its A series is ``queries_norm_cpu`` and
its B series ``queries_norm_cpu_pair_b``. OLD may be one or two
sequential pair files (the r11/r12 convention). Compares best-of-pair
cpu-normalized times over the files' COMMON comparison basis and
prints the median ratio, the per-entry spread bar, and every entry
beyond 1.25x either way.
"""

from __future__ import annotations

import json
import statistics
import sys


def best_of(files: list[dict], key: str = "queries_norm_cpu") -> dict:
    out: dict = {}
    for f in files:
        for series in (f.get(key) or {},) + (
            (f.get(f"{key}_pair_b") or {},)
        ):
            for k, v in series.items():
                if v and (k not in out or v < out[k]):
                    out[k] = v
    return out


def main() -> int:
    new = json.load(open(sys.argv[1]))
    olds = [json.load(open(p)) for p in sys.argv[2:]]
    nb = best_of([new])
    ob = best_of(olds)
    basis = [
        k
        for k in (new.get("common_set") or sorted(nb))
        if k in nb and k in ob and ob[k] > 0
    ]
    ratios = sorted((nb[k] / ob[k], k) for k in basis)
    med = statistics.median(r for r, _ in ratios)
    print(f"basis={len(basis)} median_ratio={med:.3f}")
    print(
        "new_pair_median_delta="
        f"{new.get('pair_median_delta')}  (same-tree noise bar)"
    )
    for r, k in ratios:
        if r > 1.25 or r < 0.8:
            print(f"  {r:5.2f}x  {k}  new={nb[k]} old={ob[k]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
