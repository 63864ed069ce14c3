"""Catalog-wide physical-plan smell audit.

Builds every registered query at sf0.001 and flags the two plan shapes
that silently melt a 100 TB cluster no matter how small the test data:

- ``CartesianProduct`` — an unconditioned all-pairs join (a broadcast
  nested-loop join from an intentional small-side crossJoin is fine and
  NOT flagged);
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan (the
  Arrow-batched paths show up as ArrowEvalPython / MapInPandas
  instead and are the sanctioned escape hatch).

The targeted per-pattern assertions live in tests/test_plans.py; this
sweep is the catch-all for queries nobody wrote a pin for. ~2 min
(some builds eagerly fit models / run availableNow streams), so it runs
per-round via this tool rather than inside the default pytest run.

    python tools/plan_audit.py          # prints one JSON line
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402
from synthetic_datagen_spark.session import get_spark  # noqa: E402

SMELLS = {
    "CartesianProduct": "unconditioned all-pairs join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    flagged: dict[str, list[str]] = {}
    audited = 0
    for name, spec in sorted(REGISTRY.items()):
        audited += 1
        try:
            plan = spec.build(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            flagged[name] = [f"build-error: {str(e)[:80]}"]
            continue
        hits = [s for s in SMELLS if s in plan]
        if hits:
            flagged[name] = hits
    # catalog-count cross-check (r12 VERDICT item 5): a query landing
    # after the sweep ran must not be able to read as "audited" — the
    # output pins the catalog size the sweep actually covered, and the
    # assert fails loudly if the loop ever skips entries
    assert audited == len(REGISTRY), (audited, len(REGISTRY))
    print(
        json.dumps(
            {
                "audited": audited,
                "catalog": len(REGISTRY),
                "seconds": round(time.time() - t0, 1),
                "flagged": flagged,
            }
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
