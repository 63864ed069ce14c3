"""Self-exonerating bench movers (VERDICT r11 "What's wrong" #1).

The r11 committed anchors showed g2_conditional_train_generate at 2.24x
its r10 anchor; the builder's hand-picked A/B didn't cover it, so only
the judge's own re-extraction could exonerate it (ratio_median 0.94 —
host noise). This tool closes that gap mechanically: every query whose
current bench time exceeds ``threshold`` x its prior committed anchor
is AUTOMATICALLY probed with tools/ab_probe.py (interleaved fresh
processes, >= ``trials`` trials) against the prior round's extracted
git snapshot, plus a fixed control query whose code never changed — so
the round's own evidence contains the exoneration (or the regression)
for every apparent mover.

    python tools/ab_auto.py --current=BENCH_LOCAL_latest.json \
        --prior=BENCH_LOCAL_r11.json --out=BENCH_AB_r12.json

The prior snapshot commit defaults to the last commit that touched the
prior anchor file (i.e. the end of that round); override with
--snapshot=<commit>. New queries (absent from the prior anchor) have no
prior behavior to regress from and are skipped with a note.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONTROL = "q1_pricing_summary"  # stable TPC-H-style control, never a mover


def _arg(name: str, default: str | None = None) -> str | None:
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default


def main() -> None:
    current_path = _arg("current", os.path.join(REPO, "BENCH_LOCAL_latest.json"))
    prior_path = _arg("prior")
    out_path = _arg("out")
    threshold = float(_arg("threshold", "1.3"))
    trials = int(_arg("trials", "3"))
    if not prior_path or not out_path:
        sys.exit("usage: ab_auto.py --prior=BENCH_LOCAL_rN.json --out=BENCH_AB_rM.json [--current=...] [--snapshot=...] [--threshold=1.3] [--trials=3]")

    def _repo_rel(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(REPO, p)

    with open(_repo_rel(current_path)) as fh:
        cur = json.load(fh)["queries"]
    with open(_repo_rel(prior_path)) as fh:
        pri = json.load(fh)["queries"]

    snapshot = _arg("snapshot")
    if snapshot is None:
        snapshot = subprocess.check_output(
            ["git", "log", "--format=%H", "-n1", "--", os.path.basename(prior_path)],
            cwd=REPO, text=True,
        ).strip()
        if not snapshot:
            sys.exit(f"no commit found touching {prior_path}; pass --snapshot=")

    # sub-second prior rows are jitter, not regression signal: a 0.2 s
    # query "doubling" is scheduler noise the interleaved probe can't
    # resolve either — the floor keeps the probe set meaningful
    floor = float(_arg("floor", "0.5"))
    movers = {
        n: round(cur[n] / pri[n], 3)
        for n in cur
        if n in pri and pri[n] > floor and cur[n] / pri[n] > threshold
    }
    new_queries = sorted(set(cur) - set(pri))
    print(f"movers >{threshold}x vs {os.path.basename(prior_path)}: {movers}",
          file=sys.stderr)

    rec: dict = {
        "threshold": threshold,
        "prior_anchor": os.path.basename(prior_path),
        "snapshot": snapshot,
        "control": CONTROL,
        "anchor_ratios": movers,
        "new_queries_skipped": new_queries,
    }
    if not movers:
        rec["queries"] = {}
        rec["note"] = "no movers above threshold; control not probed"
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
        print(json.dumps({"movers": 0, "out": out_path}))
        return

    workdir = tempfile.mkdtemp(prefix="ab_snapshot_")
    try:
        subprocess.run(
            f"git archive {snapshot} | tar -x -C {workdir}",
            shell=True, check=True, cwd=REPO,
        )
        probe_names = sorted(movers) + [CONTROL]
        probe_out = out_path + ".probe"
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ab_probe.py"),
             REPO, workdir, *probe_names,
             f"--trials={trials}", f"--out={probe_out}"],
            check=True, cwd=REPO,
        )
        with open(probe_out) as fh:
            probe = json.load(fh)
        os.unlink(probe_out)
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    control_ratio = probe["queries"][CONTROL]["ratio_median"]
    # The PROBE's regression cutoff is NOT the anchor-screening
    # threshold: the interleaved same-window probe has a far lower
    # noise floor than cross-round anchors (control typically
    # 0.94-1.12), so reusing 1.3 here would label a reproducible 1.25x
    # regression "exonerated". Cutoff = 15% above the control's own
    # measured ratio — noise-adjusted, and never below 1.15 absolute.
    probe_cutoff = max(1.15, control_ratio * 1.15)
    rec.update({"a": probe["a"], "b": probe["b"], "trials": probe["trials"],
                "queries": probe["queries"],
                "probe_regression_cutoff": round(probe_cutoff, 3)})
    verdicts = {
        n: ("regression"
            if probe["queries"][n]["ratio_median"] > probe_cutoff
            else "exonerated")
        for n in movers
    }
    rec["verdicts"] = verdicts
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({"movers": len(movers), "verdicts": verdicts,
                      "control_ratio": control_ratio,
                      "probe_cutoff": round(probe_cutoff, 3),
                      "out": out_path}))


if __name__ == "__main__":
    main()
