"""Time a list of queries (bench methodology: one session, noop sink,
warmup flagship run, clearCache between queries) in the given order.

    python tools/time_queries.py q1 q2 q3 [--sf=/root/testdata/sf0.1]

Prints one line per query plus a total. Fresh process per invocation so
session memos start cold — the same state the driver's bench sees.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402
from synthetic_datagen_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    for a in args:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    # same isolation as bench.py: artifact caches must not leak warm
    # fits from prior runs into the timings
    import atexit
    import shutil
    import tempfile

    adir = tempfile.mkdtemp(prefix="sdg-probe-artifacts-")
    os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = adir
    atexit.register(shutil.rmtree, adir, ignore_errors=True)

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    run("flagship_series_panel")  # warmup
    total = 0.0
    for name in names:
        dt = run(name)
        total += dt
        print(f"{dt:8.3f}  {name}", flush=True)
        spark.catalog.clearCache()
    print(f"{total:8.3f}  TOTAL")


if __name__ == "__main__":
    main()
