"""Time the heaviest catalog queries at two fixture scales and report
the growth factor per query (VERDICT r3 item 5: the grade is linearity,
not absolute speed — CC/LSH/Hurst/ADF families must grow ≲ linearly
with rows and nothing may OOM).

    python tools/gen_scale_fixture.py .scratch/sf0.1eq --mult 1
    python tools/gen_scale_fixture.py .scratch/sf1 --mult 10
    python tools/scale_probe.py .scratch/sf0.1eq .scratch/sf1

Prints one JSON line: per-query seconds at each dir + ratio.
"""

from __future__ import annotations

import json
import sys
import time

HEAVY = [
    "dedup_connected_components",
    "corpus_curation_pipeline",
    "embedding_dedup_clusters",
    "embedding_near_dup_pairs",
    "dedup_word_ngram_jaccard",
    "boilerplate_ngram_coverage",
    "dedup_minhash_lsh",
    "d6_hurst_exponent",
    "d4_adf_stationarity",
    "m7_m8_segment_clusters",
    "knn_ivf",
    "d2_wasserstein",
]


def main() -> None:
    dirs = sys.argv[1:3]
    names = sys.argv[3:] or HEAVY
    if len(dirs) < 2:
        raise SystemExit("usage: scale_probe.py SMALL_DIR BIG_DIR [query ... | --all]")
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from synthetic_datagen_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    if names == ["--all"]:  # full-catalog sweep (VERDICT r4 item 2)
        names = sorted(qs)
    # JVM/session warmup so the first timed query isn't billed for it
    for d in dirs:
        spark.read.parquet(f"{d}/events.parquet").count()
    out: dict[str, dict] = {}
    for name in names:
        rec: dict[str, float] = {}
        for tag, d in zip(("small", "big"), dirs):
            spark.catalog.clearCache()  # same hygiene as bench.py: no
            # storage bleed between measurements (checkpoint blocks of
            # earlier queries otherwise crowd the local-mode heap)
            t0 = time.time()
            n = qs[name](spark, d).count()
            rec[tag] = round(time.time() - t0, 2)
            rec[f"{tag}_rows"] = n
        rec["ratio"] = round(rec["big"] / max(rec["small"], 1e-9), 2)
        out[name] = rec
        print(f"[probe] {name}: {rec}", file=sys.stderr)
    print(json.dumps({"dirs": dirs, "queries": out}))


if __name__ == "__main__":
    main()
