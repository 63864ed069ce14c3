"""Synthesize a per-query-minimum bench anchor from N bench files.

The r13-opt sandbox host swings individual query walls up to ~5x
between back-to-back full-bench runs with NO code change (measured:
m11 8.1 s / 42.6 s across two same-day runs of the same tree). A
per-query MIN over repeated runs is a far lower-variance anchor than
any single run, because the noise is strictly additive (CPU steal /
clock throttling can only slow a query down). Used to build the
same-host before/after pair in OPTIMIZATION_r13.md.

    python tools/min_bench.py OUT.json IN1.json IN2.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, *ins = sys.argv[1:]
    assert ins, "need at least one input bench file"
    loaded = [json.load(open(p)) for p in ins]
    names = set(loaded[0]["queries"])
    for d in loaded[1:]:
        assert set(d["queries"]) == names, "bench files cover different queries"
    qmin = {k: min(d["queries"][k] for d in loaded) for k in names}
    steady_keys = set()
    for d in loaded:
        steady_keys |= set(d.get("steady_state", {}))
    smin = {
        k: min(d["steady_state"][k] for d in loaded if k in d.get("steady_state", {}))
        for k in steady_keys
    }
    rec = {
        "metric": "catalog_total_runtime_min_of_runs",
        "value": round(sum(qmin.values()), 3),
        "unit": "sec",
        "queries": {k: qmin[k] for k in sorted(qmin)},
        "steady_state": {k: smin[k] for k in sorted(smin)},
        "sf": loaded[0]["sf"],
        "inputs": ins,
    }
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({"file": out, "value": rec["value"], "n": len(qmin)}))


if __name__ == "__main__":
    main()
