"""Invariants for the model-based quality classifier
(functions/quality_clf.py + the quality_classifier_* catalog queries).

The pinned oracle checks exact values at sf0.01; these tests pin the
properties that make the pin trustworthy — fit determinism, layout
independence of the scores, a map-only inference plan — plus the one
quality claim the operator makes (the student actually learns the
weak-label teacher).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from synthetic_datagen_spark.functions import quality_clf as QC
from synthetic_datagen_spark.operators import REGISTRY


def _scored(spark, sf_dir):
    return REGISTRY["quality_classifier_score"].build(spark, sf_dir)


def test_fit_deterministic(spark, sf_smoke):
    d = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", QC.tokens(F.col("text")).alias("_toks"))
        .withColumn("_weak", QC.weak_label(F.col("_toks")))
        .withColumn("_fids", QC.features(F.col("_toks")))
    )
    p1, w1 = QC.fit_nb(d)
    p2, w2 = QC.fit_nb(d.repartition(7))
    assert p1 == p2
    assert w1 == w2  # exact float equality: integer counts → math.log


def test_scores_layout_independent(spark, sf_oracle):
    df = _scored(spark, sf_oracle)
    a = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        df.repartition(13)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b[a.columns])


def test_inference_plan_map_only(spark, sf_oracle):
    # the returned frame must be Scan → (spread) → Project: weights
    # are literals, no join, no hash/range shuffle — at 100 TB scoring
    # fuses into the scan (the one RoundRobin exchange is _docs_wide's
    # deliberate spread of the single-row-group fixture parquet; a
    # real multi-split table wouldn't need it)
    plan = _scored(spark, sf_oracle)._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert "hashpartitioning" not in low
    assert "rangepartitioning" not in low
    assert "join" not in low
    assert "BatchEvalPython" not in plan


def test_student_learns_teacher(spark, sf_oracle):
    # distillation claim: NB over hashed tokens + wc/mwl band features
    # must agree with the Gopher weak labels far above the majority
    # class (observed 0.90 at sf0.01; majority class is 0.58)
    rows = (
        _scored(spark, sf_oracle)
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("weak_label") == F.col("pred")).cast("long")
            ).alias("agree"),
            F.sum("weak_label").alias("pos"),
        )
        .first()
    )
    agreement = rows["agree"] / rows["n"]
    majority = max(rows["pos"], rows["n"] - rows["pos"]) / rows["n"]
    assert agreement >= 0.8
    assert agreement > majority + 0.1


def test_funnel_consistent_with_scores(spark, sf_oracle):
    s = _scored(spark, sf_oracle)
    f = REGISTRY["quality_classifier_funnel"].build(spark, sf_oracle)
    tot = f.agg(
        F.sum("total").alias("t"),
        F.sum("pred_pos").alias("p"),
        F.sum(F.col("h_lo") + F.col("h_neg") + F.col("h_pos") + F.col("h_hi")).alias("h"),
    ).first()
    assert tot["t"] == s.count()
    assert tot["p"] == s.filter(F.col("pred") == 1).count()
    assert tot["h"] == tot["t"]  # histogram bands partition the corpus
