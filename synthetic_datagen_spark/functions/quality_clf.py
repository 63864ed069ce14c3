"""Model-based document quality scoring — the FineWeb-Edu / DCLM-style
learned classifier filter (r12 VERDICT item 2).

The production pattern (Penedo et al. 2024 FineWeb-Edu; Li et al. 2024
DCLM): distill a slow/manual quality signal into a cheap linear
classifier over token features, then score every document in one
map-only pass. The reference repo has no counterpart (synthetic-datagen
is a series generator); this family models the curation stage between
the hand rules (gopher_quality_rules) and dedup. Here the teacher is
the corpus's own weak labels — the Gopher all-rules pass — and the
student is multinomial Naive Bayes over hashed token buckets.

Why Naive Bayes: the fit is CLOSED FORM from integer bucket×label
counts, so training is one map-side-combined hash aggregate (exact
integers, layout-independent by construction) plus a driver-side
log-odds computation over N_BUCKETS+1 bounded rows — the same
Spark-prep → driver-fit → broadcast-scores shape as M10/M11
(`predictive_evaluator.py:75-135` in the reference is the precedent
for splitting aggregation and fit this way). No IRLS loop, no
learning-rate schedule, nothing iterative to make deterministic.

Determinism contract (the repo-wide rule for anything a pinned oracle
checks): bucket×label counts are exact integers; ``math.log`` of
integer ratios is bit-deterministic per platform; inference folds the
per-token weights within the row in array order. Every score is a pure
function of the corpus SET — independent of partitioning, task order,
and shuffle fetch order (pinned across layouts in
tests/test_quality_clf.py).

Feature hashing uses the engine-portable md5-prefix trick
(global_shuffle_shards' hash): bucket = top-60-bits(md5(token)) mod
N_BUCKETS — deterministic, JVM-side, and reproducible in any engine
that has md5, unlike crc32/xxhash whose availability differs.

100 TB shape: training is one tokenize+explode pass into a 2·N_BUCKETS
-key hash aggregate (map-side combine does almost all the work; the
shuffle moves ~2·N_BUCKETS rows per task). Inference is Scan → Project
— the weights ride in the plan as literals, there is no join and no
shuffle, so scoring fuses into whatever scan feeds the curation funnel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

N_BUCKETS = 64

# Gopher-rule weak label (Rae et al. 2021 §A1.1 as adapted by
# gopher_quality_rules): word-count window, mean-word-length band,
# distinct-token ratio. Kept in one place so the classifier's teacher
# can never drift from the hand-rule query it distills.
WC_LO, WC_HI = 30, 90
MWL_LO, MWL_HI = 4.2, 5.0
DISTINCT_MIN = 0.4


def tokens(text: Column) -> Column:
    """The family-standard tokenization: whitespace split of the
    lowered, trimmed text (identical to gopher_quality_rules)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def weak_label(toks: Column) -> Column:
    """1 when the doc passes ALL Gopher rules, else 0 (int)."""
    wc = F.size(toks)
    len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0),
        lambda acc, x: acc + x,
    )
    mwl = len_sum.cast("double") / wc.cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / wc.cast("double")
    return (
        wc.between(WC_LO, WC_HI)
        & (mwl >= MWL_LO) & (mwl <= MWL_HI)
        & (distinct_ratio >= DISTINCT_MIN)
    ).cast("int")


def bucket(tok: Column) -> Column:
    """Hashed feature bucket of one token: top-60-bits(md5) mod
    N_BUCKETS (engine-portable, ASCII-stable)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint"),
        F.lit(N_BUCKETS),
    ).cast("int")


# Doc-stat band indicator features appended after the token buckets —
# the feature mix DCLM-style fastText quality filters actually use
# (hashed words + length statistics). 16 word-count bands (8-wide,
# clamped) and 16 mean-word-length bands (0.25-wide from 3.0): the
# teacher's wc/mwl rules become learnable band boundaries while the
# distinct-ratio rule must still come from the hashed vocabulary.
N_WC_BANDS = 16
N_MWL_BANDS = 16
N_FEATURES = N_BUCKETS + N_WC_BANDS + N_MWL_BANDS


def features(toks: Column) -> Column:
    """array<int> of feature ids for one doc: one hashed bucket per
    token, plus the doc's wc-band and mwl-band indicators. Built from
    the lambda variable / bound refs only (no outer expression leaks
    into the per-element lambda)."""
    wc = F.size(toks)
    len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0),
        lambda acc, x: acc + x,
    )
    mwl = len_sum.cast("double") / wc.cast("double")
    wc_band = F.least(wc / F.lit(8), F.lit(N_WC_BANDS - 1)).cast("int")
    mwl_band = F.greatest(
        F.lit(0),
        F.least(
            ((mwl - F.lit(3.0)) * F.lit(4.0)).cast("int"),
            F.lit(N_MWL_BANDS - 1),
        ),
    )
    return F.concat(
        F.transform(toks, bucket),
        F.array(
            (F.lit(N_BUCKETS) + wc_band).cast("int"),
            (F.lit(N_BUCKETS + N_WC_BANDS) + mwl_band).cast("int"),
        ),
    )


def fit_nb(docs: DataFrame) -> tuple[float, list[float]]:
    """Closed-form multinomial-NB fit: (log-prior, per-feature
    log-odds over N_FEATURES ids).

    ``docs`` must carry ``_fids`` (feature-id array from
    :func:`features`) and ``_weak`` (0/1). One exploded hash aggregate
    produces exact integer feature×label occurrence counts; add-one
    smoothing over N_FEATURES keeps every ratio finite. Returns
    driver-side floats (N_FEATURES+1 values) to be broadcast into the
    inference plan as literals.
    """
    fid_counts = (
        docs.select(F.explode("_fids").alias("_b"), "_weak")
        .groupBy("_b")
        .agg(
            F.sum("_weak").cast("long").alias("_pos"),
            F.count("*").alias("_n"),
        )
        .collect()  # ≤ N_FEATURES rows — model coefficients, not data
    )
    doc_counts = docs.agg(
        F.sum("_weak").cast("long").alias("_pos"), F.count("*").alias("_n")
    ).first()
    n_pos_docs = int(doc_counts["_pos"] or 0)
    n_neg_docs = int(doc_counts["_n"]) - n_pos_docs
    pos_b = {int(r["_b"]): int(r["_pos"] or 0) for r in fid_counts}
    tot_b = {int(r["_b"]): int(r["_n"]) for r in fid_counts}
    pos_tot = sum(pos_b.values())
    neg_tot = sum(tot_b.values()) - pos_tot
    weights = [
        math.log((pos_b.get(b, 0) + 1) / (pos_tot + N_FEATURES))
        - math.log((tot_b.get(b, 0) - pos_b.get(b, 0) + 1) / (neg_tot + N_FEATURES))
        for b in range(N_FEATURES)
    ]
    prior = math.log((n_pos_docs + 1) / (n_neg_docs + 1))
    return prior, weights


def score(fids: Column, w_arr: Column, prior: float) -> Column:
    """NB log-odds score of one doc: prior + Σ weight[feature_id].

    ``fids`` is the staged feature-id array; ``w_arr`` MUST be an
    attribute reference to a staged weights-array column (a
    ``.withColumn``/``.select`` projection of the literal array), NOT
    the literal array expression itself — a per-element lambda
    re-inlines any non-trivial outer expression per element (the
    repo's thrice-sighted O(n²) inlining trap), which for a 96-literal
    CreateArray would rebuild the array once per feature. The fold
    runs within the row in array order, so the double sum is
    layout-deterministic."""
    return F.lit(float(prior)) + F.aggregate(
        F.transform(fids, lambda fid: F.get(w_arr, fid)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# (applicationId, sf_dir) → (prior, weights): the fit is a per-corpus
# artifact, paid once per session (bench steady-state ≈ inference only)
_FIT_CACHE: dict = {}


def cached_fit(
    spark: SparkSession, sf_dir: str, docs: DataFrame
) -> tuple[float, list[float]]:
    from .memo import app_scoped_memo

    return app_scoped_memo(
        _FIT_CACHE, spark, ("qclf_nb", sf_dir), lambda: fit_nb(docs)
    )
