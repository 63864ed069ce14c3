"""Full per-query round-over-round bench diff (r13 VERDICT item 6).

The driver's PERF_r*.json per-query table covers only each round's five
slowest queries (the compact stdout line), which r13 proved can
manufacture phantom "dropped" rows (a query that merely improved out of
the top-5) while hiding real movers. This tool diffs the FULL committed
per-query records instead:

    python tools/perf_compare.py BENCH_LOCAL_r13.json BENCH_LOCAL_r14.json \
        --out=PERF_LOCAL_r14.json [--threshold=1.10]

Prints and writes: queries dropped (in prev, not in now), new (in now,
not in prev), regressed (now/prev > threshold, above a 0.5 s floor —
sub-floor walls are protocol noise on this host), improved (prev/now >
threshold above the same floor), plus totals and the geomean speedup
over common queries. Keep in mind the host's documented wall swing
(~1.5-2x day to day): regressions flagged here are probe candidates for
tools/ab_auto.py, not verdicts.
"""

from __future__ import annotations

import argparse
import json
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("now")
    ap.add_argument("--out", default=None)
    ap.add_argument("--threshold", type=float, default=1.10)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore ratio on queries under this many seconds on both sides")
    args = ap.parse_args()

    prev = json.load(open(args.prev))["queries"]
    now = json.load(open(args.now))["queries"]

    dropped = sorted(set(prev) - set(now))
    new = sorted(set(now) - set(prev))
    common = sorted(set(prev) & set(now))

    regressed, improved = {}, {}
    ratios = []
    for q in common:
        p, n = prev[q], now[q]
        if p <= 0 or n <= 0:
            continue
        ratios.append(p / n)  # speedup: >1 means faster now
        if max(p, n) < args.floor:
            continue
        if n / p > args.threshold:
            regressed[q] = {"prev": p, "now": n, "ratio": round(n / p, 3)}
        elif p / n > args.threshold:
            improved[q] = {"prev": p, "now": n, "speedup": round(p / n, 3)}

    geomean = (
        math.exp(sum(math.log(r) for r in ratios) / len(ratios)) if ratios else None
    )
    rec = {
        "prev_file": args.prev,
        "now_file": args.now,
        "n_prev": len(prev),
        "n_now": len(now),
        "n_common": len(common),
        "total_prev": round(sum(prev.values()), 3),
        "total_now": round(sum(now.values()), 3),
        "geomean_speedup_common": round(geomean, 4) if geomean else None,
        "threshold": args.threshold,
        "floor_sec": args.floor,
        "queries_dropped": dropped,
        "queries_new": new,
        "n_regressed": len(regressed),
        "n_improved": len(improved),
        "regressed": dict(sorted(regressed.items(), key=lambda kv: -kv[1]["ratio"])),
        "improved": dict(sorted(improved.items(), key=lambda kv: -kv[1]["speedup"])),
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=False)
    print(json.dumps({k: rec[k] for k in (
        "n_prev", "n_now", "n_common", "total_prev", "total_now",
        "geomean_speedup_common", "n_regressed", "n_improved",
        "queries_dropped", "queries_new")}))


if __name__ == "__main__":
    main()
