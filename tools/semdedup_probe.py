"""SemDeDup vs scaled-LSH candidate-volume probe (r12 VERDICT item 3).

Runs embedding_semdedup_clusters on a small and a big fixture and
records, for BOTH dedup paths on the SAME planted corpus:

- semdedup: wall seconds, Σ C(n_c, 2) (the pairwise-similarity flops
  its per-cluster gemms perform — SemDeDup's "candidate volume", never
  materialized as rows), clusters, drops;
- scaled LSH (embedding_dedup_clusters_scaled's config): bucket-join
  candidate volume Σ_tables Σ_buckets C(size, 2) (the join work the
  shuffle actually performs) under scaled_lsh_params(n).

The comparison the 100 TB story needs: SemDeDup's candidate work is
K·(n/K)² by construction — tunable with one knob (K) and perfectly
balanced across clusters — while LSH's depends on bucket geometry.

    python tools/semdedup_probe.py .scratch/sfd1 .scratch/sfemb100
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    dirs = sys.argv[1:3]
    if len(dirs) < 2:
        raise SystemExit("usage: semdedup_probe.py SMALL_DIR BIG_DIR")
    from pyspark.sql import functions as F

    from synthetic_datagen_spark.functions.vectors import (
        _with_sign_buckets_arrow,
        scaled_lsh_params,
    )
    from synthetic_datagen_spark.operators import REGISTRY
    from synthetic_datagen_spark.operators import vector_queries as VQ
    from synthetic_datagen_spark.session import get_spark

    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for tag, d in zip(("small", "big"), dirs):
        rec: dict = {}
        corpus = VQ._planted_corpus(spark, d)
        n = corpus.count()
        rec["n_corpus"] = n

        t0 = time.time()
        panel = REGISTRY["embedding_semdedup_clusters"].build(spark, d).collect()
        rec["semdedup_sec"] = round(time.time() - t0, 2)
        rec["semdedup_clusters"] = len(panel)
        rec["semdedup_candidates"] = sum(
            r["n_members"] * (r["n_members"] - 1) // 2 for r in panel
        )
        rec["semdedup_dropped"] = sum(r["n_dropped"] for r in panel)
        rec["semdedup_max_cluster"] = max(r["n_members"] for r in panel)

        # scaled-LSH candidate volume under the SAME corpus and the
        # config embedding_dedup_clusters_scaled would derive
        b, L = scaled_lsh_params(n, 0.9)
        rec["lsh_config"] = f"{L}x{b}"
        # arrow bucket kernel + a repartition off the single-row-group
        # parquet: the JVM nested-HOF fold falls back to interpreted
        # eval at the scaled plane counts and the un-spread scan puts
        # ALL rows in one task — measured as a 30+ min single-thread
        # straggler before this probe used the production kernel
        buckets = _with_sign_buckets_arrow(
            corpus.repartition(32), "vid", "v", "vec_id", "embedding",
            64, L, b, 42, with_vectors=False,
        )
        cand = (
            buckets.groupBy("tbl", "bucket")
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("cand"))
            .first()["cand"]
        )
        rec["lsh_candidates"] = int(cand)
        t0 = time.time()
        REGISTRY["embedding_dedup_clusters_scaled"].build(spark, d).count()
        rec["lsh_scaled_sec"] = round(time.time() - t0, 2)
        out[tag] = rec
        print(f"[probe] {tag}: {rec}", file=sys.stderr)

    s, g = out["small"], out["big"]
    out["growth"] = {
        "n": round(g["n_corpus"] / s["n_corpus"], 1),
        "semdedup_sec": round(g["semdedup_sec"] / max(s["semdedup_sec"], 1e-9), 2),
        "semdedup_candidates": round(
            g["semdedup_candidates"] / max(s["semdedup_candidates"], 1), 1
        ),
        "lsh_candidates": round(
            g["lsh_candidates"] / max(s["lsh_candidates"], 1), 1
        ),
    }
    print(json.dumps({"dirs": dirs, "semdedup_vs_lsh": out}))


if __name__ == "__main__":
    main()
