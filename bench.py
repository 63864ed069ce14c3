"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to a noop sink (full computation, no collect cost).
A warmup flagship run absorbs JVM/codegen startup so per-query numbers
measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402
from synthetic_datagen_spark.session import get_spark  # noqa: E402

# headline set: every registered query (the driver compares totals round
# over round; keep names stable).
EXCLUDE: set[str] = set()

# Queries whose first run pays a ONE-TIME session build (LSH pair
# memos, pHash signatures, converged CC labels, fitted regime models)
# that sibling queries then memo-hit. bench re-runs each immediately
# after its cold run and records the steady-state time, so the bench
# file separates "cost of building the artifact once" from "cost of
# the query's own plan" (VERDICT r7/r8 task 4). Memos live Python-side
# on localCheckpoint blocks, which clearCache does not evict.
MEMO_BUILDERS = (
    "corpus_curation_pipeline",
    "dedup_connected_components",
    "dedup_cc_large_star",
    "embedding_dedup_clusters",
    "embedding_dedup_clusters_strict",
    "embedding_dedup_clusters_scaled",
    "embedding_near_dup_pairs",
    "multimodal_phash_neardup",
    "multimodal_audio_fingerprint_neardup",
    "multimodal_cross_dedup_clusters",
    # r14: the two heaviest replay parities stage their feed once per
    # session (_staged_feed) and share the regime-fit session memo, so
    # cold - steady splits the one-time builds from the per-trigger
    # availableNow floor (measured ~1.4 s/trigger on this host)
    "stream_funnel_parity",
    "stream_regime_generate_parity",
)


def main() -> None:
    # r13 optimization-round measurement fix: a handful of model-fit
    # families (g7/g8/m9 regime fits, SemDeDup centroids) persist their
    # deterministic fit artifacts across sessions under
    # $SPARK_GRAFT_ARTIFACT_DIR (S5/S6 save->load flow). Correct for
    # production, but it made BENCH numbers depend on whether a prior
    # run had warmed /tmp: the r13 anchor recorded g7 at 0.56 s (warm)
    # where a cold host pays ~15 s. The bench's contract is "every
    # invocation computes from the parquet inputs", so point the
    # artifact cache at a fresh per-invocation directory — every fit
    # happens inside the timed run, every run is comparable.
    import atexit
    import shutil
    import tempfile

    adir = tempfile.mkdtemp(prefix="sdg-bench-artifacts-")
    os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = adir
    atexit.register(shutil.rmtree, adir, ignore_errors=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("flagship_series_panel")  # warmup, not recorded

    times: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in sorted(REGISTRY):
        if name in EXCLUDE:
            continue
        times[name] = round(run(name), 3)
        if name in MEMO_BUILDERS:
            # immediate warm re-run: the session memo now holds the
            # pair/label artifact, so this measures the query's own
            # steady-state plan; cold - steady = the one-time build
            steady[name] = round(run(name), 3)
        # measure each query from a clean cache state: a handful of
        # operators persist scaffolding frames (ECDF counts, token
        # tables, fitted-model streams) that would otherwise accumulate
        # across the 111-query sweep and bleed storage memory into later
        # queries' timings
        spark.catalog.clearCache()

    full = {
        "metric": "catalog_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        # steady-state re-runs of the memo-building queries: the delta
        # times[q] - steady_state[q] is the one-time artifact build
        # shared by the query's whole family, not per-query plan cost
        "steady_state": steady,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver captures a bounded slice of stdout, so the 119-query
    # dict must live in a file; stdout gets ONE compact JSON line the
    # driver can actually json.loads (metric/value/unit/sf + the five
    # slowest queries + a pointer to the full record).
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_latest.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:5])
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "n_queries": len(times),
        "queries": slowest,
        "file": detail_path,
        "sf": full["sf"],
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
