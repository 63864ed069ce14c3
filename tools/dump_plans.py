"""Dump `.explain("formatted")` for named queries to plans/<tag>/<query>_<suffix>.txt.

    python tools/dump_plans.py r13 before q1_pricing_summary dedup_cc_large_star ...
    python tools/dump_plans.py r13 after --all          # every registry query

Plans are captured at the bench scale (sf0.1 by default, $SPARK_GRAFT_SF_DIR)
so the judge can compare the claims in OPTIMIZATION_*.md against the actual
initial physical plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402
from synthetic_datagen_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    if names == ["--all"]:
        names = sorted(REGISTRY)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        try:
            df = REGISTRY[name].build(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"[err] {name}: {e}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"[ok] {name} -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
