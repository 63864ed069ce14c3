"""r14 100x guard probes (r13 VERDICT item 7) -> SCALE_SWEEP_r14.json.

Two guards introduced/extended by the optimization rounds had not been
exercised on their far side:

1. The kNN panel memo's narrow-conf scope must DISENGAGE above the
   SPARK_GRAFT_LSH_TINY_ROWS cutoff (20k): at the 100x embeddings
   fixture (200k rows) the truth/LSH panel builds must run with AQE on
   and the session confs untouched, and still complete. Verified by
   instrumenting narrow_build_confs.apply and checking the session's
   adaptive conf inside the build.

2. The _staged_feed session memo (extended to the funnel feed and the
   regime tick grid this round) must rebuild per application and never
   serve a prior session's directory: two sequential subprocesses run
   the same parity query; each must stage its own feed under its own
   applicationId-keyed scratch root and hash-match its oracle.

Usage: python tools/r14_guard_probes.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KNN_PROBE = r"""
import os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = tempfile.mkdtemp()
from synthetic_datagen_spark.session import get_spark
from synthetic_datagen_spark.functions import execution as X
from synthetic_datagen_spark.operators import REGISTRY
spark = get_spark("knn-guard"); spark.sparkContext.setLogLevel("ERROR")
applied = []
orig_enter = X.narrow_build_confs.__enter__
def spy_enter(self):
    applied.append(bool(self.apply))
    return orig_enter(self)
X.narrow_build_confs.__enter__ = spy_enter
sf = %(sf)r
t0 = time.perf_counter()
n_truth = REGISTRY["knn_brute_force"].build(spark, sf).count()
t1 = time.perf_counter()
n_lsh = REGISTRY["knn_lsh_bucketed"].build(spark, sf).count()
t2 = time.perf_counter()
aqe = spark.conf.get("spark.sql.adaptive.enabled")
print("KNNPROBE " + __import__("json").dumps({
    "applied_flags": applied, "truth_rows": n_truth, "lsh_rows": n_lsh,
    "truth_sec": round(t1 - t0, 2), "lsh_sec": round(t2 - t1, 2),
    "adaptive_after": aqe}))
"""

_FEED_PROBE = r"""
import os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = tempfile.mkdtemp()
from synthetic_datagen_spark.session import get_spark
import synthetic_datagen_spark.operators.source_queries as SQ
from synthetic_datagen_spark.operators import REGISTRY
spark = get_spark("feed-guard"); spark.sparkContext.setLogLevel("ERROR")
stage = {}
orig = SQ._staged_feed
def timed(spark_, kind, sf_dir, build):
    t0 = time.perf_counter()
    out = orig(spark_, kind, sf_dir, build)
    stage.setdefault(kind, []).append(
        {"path": out, "sec": round(time.perf_counter() - t0, 3)})
    return out
SQ._staged_feed = timed
sf = "/root/testdata/sf0.01"
import duckdb
spec = REGISTRY["stream_funnel_parity"]
got = sorted(tuple(r) for r in spec.build(spark, sf).collect())
con = duckdb.connect()
for t in ("events",):
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
print("FEEDPROBE " + __import__("json").dumps({
    "app": spark.sparkContext.applicationId,
    "stage": stage, "oracle_match": got == want}))
"""


def main() -> None:
    out = {
        "round": "14-opt",
        "note": (
            "100x guard probes for the r14-touched scopes: (1) kNN panel "
            "memo narrow-conf gate at the 200k-row embeddings fixture "
            "(must disengage: applied_flags all false, AQE untouched); "
            "(2) _staged_feed memo across two applications (each must "
            "stage its own applicationId-keyed feed and hash-match the "
            "funnel oracle; no cross-session leak)."
        ),
    }

    p = subprocess.run(
        [sys.executable, "-c", _KNN_PROBE % {"repo": REPO, "sf": REPO + "/.scratch/sfemb100"}],
        capture_output=True, text=True, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("KNNPROBE "):
            out["knn_panel_memo_above_cutoff"] = json.loads(line[9:])
            break
    else:
        out["knn_panel_memo_above_cutoff"] = {"error": p.stderr[-1500:]}

    feeds = []
    for i in range(2):
        p = subprocess.run(
            [sys.executable, "-c", _FEED_PROBE % {"repo": REPO}],
            capture_output=True, text=True, cwd=REPO,
        )
        for line in p.stdout.splitlines():
            if line.startswith("FEEDPROBE "):
                feeds.append(json.loads(line[10:]))
                break
        else:
            feeds.append({"error": p.stderr[-1500:]})
    out["staged_feed_multi_session"] = feeds
    if all("stage" in f for f in feeds):
        paths = [f["stage"]["stream_funnel"][0]["path"] for f in feeds]
        out["staged_feed_multi_session_verdict"] = {
            "distinct_paths": len(set(paths)) == 2,
            "both_rebuilt": all(
                f["stage"]["stream_funnel"][0]["sec"] > 0.05 for f in feeds
            ),
            "both_oracle_match": all(f["oracle_match"] for f in feeds),
        }

    with open(os.path.join(REPO, "SCALE_SWEEP_r14.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
