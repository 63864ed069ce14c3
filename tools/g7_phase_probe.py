"""Phase-split probe for the g7/g8/m9 regime chain (r14, guide §1).

Replays _fitted_model/_fitted_garch/g7 step by step with an ISOLATED
artifact dir and times each phase in a fresh session, so the ~11-14 s
cold g7 wall can be attributed before touching anything. The fit
arithmetic/layout is untouched — this is measurement only.

    python tools/g7_phase_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

os.environ["SPARK_GRAFT_ARTIFACT_DIR"] = tempfile.mkdtemp(prefix="g7probe-")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import numpy as np  # noqa: F401

    from pyspark.sql import functions as F
    from synthetic_datagen_spark.session import get_spark
    from synthetic_datagen_spark.regime import RegimeModel, fit_garch_grid, regime_features
    from synthetic_datagen_spark.regime.hmm import baum_welch, viterbi_label
    from synthetic_datagen_spark.operators.regime_queries import _click_series

    spark = get_spark("g7-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t: dict[str, float] = {}

    def clock(name):
        def deco(fn):
            t0 = time.perf_counter()
            out = fn()
            t[name] = round(time.perf_counter() - t0, 3)
            print(f"{name}: {t[name]}s", flush=True)
            return out
        return deco

    # warmup JVM with an unrelated tiny job
    spark.range(1000).count()

    ev = _click_series(spark, sf_dir)
    feats = regime_features(ev, "value", [], ["ts", "event_id"]).withColumn(
        "series", F.lit(0)
    ).persist()
    clock("1_feature_build_materialize")(lambda: feats.count())

    model = RegimeModel(n_regimes=3, seed=42)
    moms = clock("2_moments_agg")(lambda: feats.agg(
        *[F.mean(c).alias(f"mu_{c}") for c in model._FEATS],
        *[F.stddev_pop(c).alias(f"sd_{c}") for c in model._FEATS],
    ).first())

    d = feats
    scols = []
    for c in model._FEATS:
        sc_name = f"_s_{c}"
        d = d.withColumn(
            sc_name,
            (F.col(c) - F.lit(moms[f"mu_{c}"]))
            / F.lit((moms[f"sd_{c}"] or 0.0) + 1e-10),
        )
        scols.append(sc_name)

    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.clustering import GaussianMixture

    dv = VectorAssembler(inputCols=scols, outputCol="_fv").transform(d)
    gmm_model = clock("3_gmm_fit_30it")(lambda: GaussianMixture(
        k=3, seed=42, featuresCol="_fv", predictionCol="_gmm",
        maxIter=30, tol=1e-3).fit(dv))

    k = 3
    means0 = np.array([g.mean.toArray() for g in gmm_model.gaussians])
    covs0 = np.array([g.cov.toArray() for g in gmm_model.gaussians])
    w0 = np.asarray(gmm_model.weights)
    trans0 = np.tile(w0, (k, 1)) * 0.5 + 0.5 * np.eye(k)
    trans0 = trans0 / trans0.sum(axis=1, keepdims=True)
    start0 = w0 / w0.sum()

    d = d.persist()
    bw = clock("4_baum_welch_6it")(lambda: baum_welch(
        d, scols, ["series"], "idx", trans0, start0, means0, covs0, n_iter=6))
    trans, start, means, covs, _ll = bw
    labeled = viterbi_label(d, scols, ["series"], "idx", trans, start, means, covs).drop(*scols)
    labeled = labeled.persist()
    clock("5_viterbi_materialize")(lambda: labeled.count())

    from pyspark.sql import Window
    w = Window.partitionBy("series").orderBy("idx")
    clock("6_stats_collect")(lambda: (
        labeled.withColumn("_lr", F.lag("log_ret").over(w))
        .groupBy("regime")
        .agg(F.count("*").alias("n"), F.mean("log_ret").alias("mu"),
             F.stddev_pop("log_ret").alias("sigma"),
             F.skewness("log_ret").alias("skew"),
             F.corr("log_ret", "_lr").alias("ar1"))
        .collect()))
    clock("6b_glob_agg")(lambda: feats.agg(
        F.mean("log_ret").alias("mu"), F.stddev_pop("log_ret").alias("sigma")).first())

    adir = os.path.join(os.environ["SPARK_GRAFT_ARTIFACT_DIR"], "probe")
    clock("7_labeled_parquet_write")(lambda: labeled.write.mode("overwrite").parquet(
        os.path.join(adir, "labeled.parquet")))

    clock("8_garch_grid")(lambda: fit_garch_grid(
        spark, labeled.select("regime", "idx", "log_ret")))

    clock("9_p0_first")(lambda: ev.orderBy("ts", "event_id").select("value").first())

    # full query end-to-end (memo-warm at this point for fit pieces it reuses? —
    # no: the registry path builds its own model via _fitted_model; the module
    # cache is cold in this process for (sf_dir,3,42) only if we didn't populate
    # it. We did NOT call _fitted_model, so this is the real cold path minus JVM.
    from synthetic_datagen_spark.operators import REGISTRY
    clock("10_g7_query_cold")(lambda: REGISTRY["g7_regime_garch_generate"]
          .build(spark, sf_dir).write.format("noop").mode("overwrite").save())
    clock("11_g7_query_warm")(lambda: REGISTRY["g7_regime_garch_generate"]
          .build(spark, sf_dir).write.format("noop").mode("overwrite").save())

    total_fit = sum(v for k_, v in t.items() if k_[0] in "123456789")
    print(f"\nphases 1-9 total: {total_fit:.1f}s")
    import json
    print(json.dumps(t))


if __name__ == "__main__":
    main()
