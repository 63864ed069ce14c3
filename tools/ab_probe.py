"""Same-window A/B probe for bench drift triage (VERDICT r6 item 5).

Times the named queries under two repo snapshots (e.g. the working tree
vs an extracted earlier round) in INTERLEAVED fresh processes — A, B,
A, B, ... — so slow-host windows hit both sides equally. Each trial is
bench-comparable: fresh JVM, flagship warmup, then one timed
build+noop-write per query with clearCache between.

    python tools/ab_probe.py /root/repo /tmp/repo_r5 \
        embedding_dedup_clusters ratio_sweep_panel --trials 3

Prints one JSON line: per-query median seconds per side + ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_TRIAL_SRC = r"""
import json, os, sys, tempfile, time
# artifact isolation per trial (same contract as bench.py): the regime/
# SemDeDup fit caches must not leak a prior trial's warm fit into a
# timed run on either side
import atexit, shutil
_adir = tempfile.mkdtemp(prefix="ab-probe-artifacts-")
os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = _adir
atexit.register(shutil.rmtree, _adir, ignore_errors=True)
repo = sys.argv[1]
names = sys.argv[2:]
sys.path.insert(0, repo)
from synthetic_datagen_spark.operators import REGISTRY
from synthetic_datagen_spark.session import get_spark
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-probe")
spark.sparkContext.setLogLevel("ERROR")

def run(name):
    t0 = time.perf_counter()
    REGISTRY[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

run("flagship_series_panel")  # warmup
spark.catalog.clearCache()
out = {}
for n in names:
    out[n] = round(run(n), 3)
    spark.catalog.clearCache()
print("ABPROBE " + json.dumps(out))
"""


def trial(repo: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _TRIAL_SRC, repo, *names],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABPROBE "):
            return json.loads(line[len("ABPROBE "):])
    raise RuntimeError(f"trial in {repo} failed:\n{p.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = 3
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--trials"):
            trials = int(a.split("=", 1)[1]) if "=" in a else trials
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    repo_a, repo_b, names = args[0], args[1], args[2:]
    runs: dict[str, list[dict]] = {repo_a: [], repo_b: []}
    for i in range(trials):
        for repo in (repo_a, repo_b):  # interleaved: drift hits both
            r = trial(repo, names)
            runs[repo].append(r)
            print(f"[trial {i}] {repo}: {r}", file=sys.stderr)
    out = {}
    for n in names:
        ma = statistics.median(r[n] for r in runs[repo_a])
        mb = statistics.median(r[n] for r in runs[repo_b])
        # per-trial ratio of the interleaved pair i — each pair shares
        # its host window, so the ratio list IS the noise distribution
        ratio_all = [
            round(ra[n] / rb[n], 3)
            for ra, rb in zip(runs[repo_a], runs[repo_b])
        ]
        out[n] = {
            "a_median": round(ma, 3), "b_median": round(mb, 3),
            "a_all": [r[n] for r in runs[repo_a]],
            "b_all": [r[n] for r in runs[repo_b]],
            "ratio_all": ratio_all,
            "ratio_median": round(statistics.median(ratio_all), 3),
            "a_over_b": round(ma / mb, 3),
        }
    rec = {"a": repo_a, "b": repo_b, "trials": trials, "queries": out}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
