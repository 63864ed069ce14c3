"""M7/M8/J3 — change-point segmentation + segment clustering
(reference: regime_gan.py:36-99: ruptures PELT on rolling volatility,
then Ward agglomerative clustering of per-segment features; segments ×
cluster labels zipped positionally at :97-99).

Spark-first split:
- Change-point detection is inherently sequential per series → one
  grouped-map task per series (`applyInPandas`), numpy binary
  segmentation on the mean of |returns| (a deterministic PELT-lite with
  a BIC-style penalty — ruptures is not available here, and the
  reference's rbf-cost PELT serves the same purpose: volatility-shift
  segment boundaries). Thousands of series parallelize across the
  cluster while each series' DP stays a tight local loop.
- Per-segment features are a distributed groupBy (A8-shape), with
  exact decimal moment sums (functions.stats.dmean_dstd) so the
  feature matrix is layout-independent.
- Clustering is a DETERMINISTIC distributed Lloyd k-means
  (`deterministic_kmeans` below) — the scale substitute the survey
  names for driver-side sklearn Ward (M8). MLlib's KMeans is
  layout-sensitive even when seeded (k-means|| init samples by
  partition, and centroid updates merge float partials in task order);
  this kernel initializes from exact per-feature percentiles and
  updates centroids via associative decimal sums, so the labels are a
  pure function of the input set.
- The J3 "positional zip" of segments to labels is a proper equi-join
  on (series, segment_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.stats import dmean_dstd, dsum


def _pelt(
    x: np.ndarray, min_size: int = 30, jump: int = 5, penalty: float = 3.0
) -> list[int]:
    """PELT (Pruned Exact Linear Time) change-point detection with a
    Gaussian mean+variance cost — the exact DP the reference runs via
    ruptures (regime_gan.py:41-45: Pelt(model="rbf", jump=5,
    min_size=30).predict(pen=penalty)); the Gaussian NLL cost serves the
    rbf kernel's purpose on 1-D returns (both fire on volatility/mean
    shifts) and its cost differences are scale-invariant, so the same
    penalty scale applies. Candidate breakpoints live on the `jump`
    grid; the prune step drops any start that can no longer win,
    keeping the candidate set — and per-step vectorized cost evals —
    near-constant in practice.

    Returns sorted interior boundaries (indices into ``x``).
    """
    n = len(x)
    if n < 2 * min_size:
        return []
    c1 = np.concatenate([[0.0], np.cumsum(x)])
    c2 = np.concatenate([[0.0], np.cumsum(x * x)])

    def cost(starts: np.ndarray, end: int) -> np.ndarray:
        m = (end - starts).astype(np.float64)
        mu = (c1[end] - c1[starts]) / m
        var = (c2[end] - c2[starts]) / m - mu * mu
        return m * np.log(np.maximum(var, 1e-12))

    ends = [t for t in range(min_size, n) if t % jump == 0] + [n]
    F = np.full(n + 1, np.inf)
    F[0] = -penalty
    prev = np.zeros(n + 1, dtype=np.int64)
    cands = np.array([0], dtype=np.int64)
    for t in ends:
        ok = cands[(t - cands) >= min_size]
        if len(ok) == 0:
            continue
        tot = F[ok] + cost(ok, t) + penalty
        i = int(np.argmin(tot))
        F[t] = tot[i]
        prev[t] = ok[i]
        # prune: a start s with F[s] + c(s,t) > F[t] can never beat the
        # current optimum at any later end; never prune starts still too
        # young to have been evaluated (t - s < min_size)
        admissible = (t - cands) >= min_size
        cst = np.full(len(cands), -np.inf)
        cst[admissible] = cost(cands[admissible], t)
        cands = cands[F[cands] + cst <= F[t]]
        if t < n and np.isfinite(F[t]):
            cands = np.append(cands, t)
    if not np.isfinite(F[n]):
        return []
    bounds: list[int] = []
    t = n
    while t > 0:
        s = int(prev[t])
        if s > 0:
            bounds.append(s)
        t = s
    return sorted(bounds)


def _segment_features(lr: np.ndarray, switch_points: list[int]) -> np.ndarray:
    """Per-segment feature matrix exactly as the reference builds it
    (regime_gan.py:70-90): [mean, std, pandas-skew, lag-1 autocorr,
    log(len)], degenerate segments → zeros, then nan_to_num."""
    feats = []
    for i in range(len(switch_points) - 1):
        seg = lr[switch_points[i] : switch_points[i + 1]]
        m = len(seg)
        if m < 2:
            feats.append([0.0, 0.0, 0.0, 0.0, float(m)])
            continue
        skew = float(pd.Series(seg).skew()) if m > 2 else 0.0
        ac = float(np.corrcoef(seg[:-1], seg[1:])[0, 1]) if m > 2 else 0.0
        feats.append([float(seg.mean()), float(seg.std()), skew, ac, float(np.log(m))])
    return np.nan_to_num(np.asarray(feats, dtype=np.float64), nan=0.0)


def _ward(feats: np.ndarray, n_clusters: int) -> np.ndarray:
    """Ward agglomerative clustering (the reference's
    AgglomerativeClustering(linkage="ward"), regime_gan.py:91-93),
    implemented directly: repeatedly merge the pair minimizing the Ward
    variance increase (n_a·n_b)/(n_a+n_b)·‖c_a−c_b‖². Labels are
    relabeled by first-segment order so the output is deterministic.

    The global best pair comes from a per-row minimum cache (row_min /
    row_arg over the upper triangle) instead of a full-matrix argmin per
    merge: only rows invalidated by the merge (argmin pointed at a or b,
    or beaten by the refreshed column a) rescan — expected O(s²) total
    vs the naive O(s³), which at s≈2000 segments (change-sparse series
    at the sf1 probe) was ~20 s of pure argmin. Tie-breaking is
    identical to the row-major flat argmin (smallest i, then smallest
    j), so merge order — and labels — are bit-identical to the naive
    loop (property-tested)."""
    s = len(feats)
    if s == 0:
        return np.zeros(0, dtype=np.int64)
    mu = feats.mean(axis=0)
    sd = feats.std(axis=0) + 1e-10
    z = (feats - mu) / sd
    cent = z.astype(np.float64).copy()
    size = np.ones(s)
    # Ward distance matrix, upper triangle only; merged/lower cells
    # masked to +inf. One O(s) row+col refresh per merge.
    diff = cent[:, None, :] - cent[None, :, :]
    D = (diff * diff).sum(-1) * 0.5  # size product/(sum)=1/2 at start
    D[np.tril_indices(s)] = np.inf
    parent = np.arange(s)
    active = np.ones(s, dtype=bool)
    n_active = s
    row_min = D.min(axis=1)
    row_arg = D.argmin(axis=1)
    while n_active > max(n_clusters, 1):
        a = int(np.argmin(row_min))
        b = int(row_arg[a])
        cent[a] = (size[a] * cent[a] + size[b] * cent[b]) / (size[a] + size[b])
        size[a] += size[b]
        parent[parent == b] = a
        active[b] = False
        D[b, :] = np.inf
        D[:, b] = np.inf
        row_min[b] = np.inf
        idx = np.where(active & (np.arange(s) != a))[0]
        if len(idx):
            d2 = ((cent[idx] - cent[a]) ** 2).sum(-1)
            w = size[idx] * size[a] / (size[idx] + size[a])
            lo = np.minimum(idx, a)
            hi = np.maximum(idx, a)
            D[lo, hi] = w * d2
        # refresh caches: row a changed wholesale; any row whose cached
        # argmin pointed into column a or b must rescan; rows whose new
        # D[i, a] beats their cached min just update in place
        D[a, : a + 1] = np.inf  # keep the triangle invariant after refresh
        row_min[a] = D[a].min()
        row_arg[a] = D[a].argmin()
        stale = np.where(active & ((row_arg == b) | (row_arg == a)))[0]
        for i in stale:
            if i == a:
                continue
            row_min[i] = D[i].min()
            row_arg[i] = D[i].argmin()
        below = idx[idx < a]
        if len(below):
            dnew = D[below, a]
            # strict improvement, or an exact tie where column a is the
            # smaller j (duplicate feature rows make zero-distance ties
            # real) — matches the full-scan first-occurrence tie-break
            better = (dnew < row_min[below]) | (
                (dnew == row_min[below]) & (a < row_arg[below])
            )
            row_min[below[better]] = dnew[better]
            row_arg[below[better]] = a
        n_active -= 1
    roots = np.unique(parent)
    labels = np.zeros(s, dtype=np.int64)
    firsts = [(int(np.min(np.where(parent == r)[0])), r) for r in roots]
    for lbl, (_, r) in enumerate(sorted(firsts)):
        labels[parent == r] = lbl
    return labels


def pelt_regime_labels(
    df: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
    n_regimes: int = 4,
    min_size: int = 30,
    jump: int = 5,
    penalty: float = 3.0,
) -> DataFrame:
    """Reference-faithful M7+M8 regime detection per series
    (regime_gan.py:25-110 detect_regimes): log-returns → PELT
    change-points (penalty halved once if fewer segments than
    n_regimes, :56-68) → 5-feature segment matrix → Ward clustering →
    per-timestep regime labels. One grouped-map task per series; idx
    indexes the log-return sequence (row i is the return into price
    i+1), matching the reference's labels over log_ret."""
    fields = [df.schema[c] for c in series_cols]
    schema = T.StructType(
        list(fields)
        + [
            T.StructField("idx", T.LongType()),
            T.StructField("seg_id", T.IntegerType()),
            T.StructField("regime", T.IntegerType()),
        ]
    )
    cols = series_cols + [value_col] + order_cols

    def seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        lr = np.diff(np.log(np.clip(v, 1e-10, None)))
        bounds = _pelt(lr, min_size, jump, penalty)
        if len(bounds) + 1 < n_regimes:
            # reference retry: halve the penalty once when under-segmented
            bounds = _pelt(lr, min_size, jump, penalty * 0.5)
        sp = [0] + bounds + [len(lr)]
        feats = _segment_features(lr, sp)
        labels = _ward(feats, min(n_regimes, len(sp) - 1))
        seg_ids = np.zeros(len(lr), dtype=np.int32)
        regimes = np.zeros(len(lr), dtype=np.int32)
        for i in range(len(sp) - 1):
            seg_ids[sp[i] : sp[i + 1]] = i
            regimes[sp[i] : sp[i + 1]] = labels[i]
        head = pdf[series_cols].iloc[: len(lr)].copy().reset_index(drop=True)
        head["idx"] = np.arange(len(lr), dtype=np.int64)
        head["seg_id"] = seg_ids
        head["regime"] = regimes
        return head

    return df.select(*cols).groupBy(*series_cols).applyInPandas(seg, schema)


def _binseg(x: np.ndarray, min_size: int, penalty: float) -> list[int]:
    """Binary segmentation on mean shift: recursively split where the
    two-segment SSE drops below the one-segment SSE by > penalty."""
    bounds: list[int] = []

    def split(lo: int, hi: int) -> None:
        n = hi - lo
        if n < 2 * min_size:
            return
        seg = x[lo:hi]
        sse0 = float(((seg - seg.mean()) ** 2).sum())
        csum = np.cumsum(seg)
        csum2 = np.cumsum(seg * seg)
        # vectorized split search: SSE of both halves for every k at once
        ks = np.arange(min_size, n - min_size + 1)
        lsum, lsum2 = csum[ks - 1], csum2[ks - 1]
        rsum, rsum2 = csum[-1] - lsum, csum2[-1] - lsum2
        sse = (lsum2 - lsum * lsum / ks) + (rsum2 - rsum * rsum / (n - ks))
        gains = sse0 - sse
        bi = int(np.argmax(gains))
        best_gain, best_k = float(gains[bi]), int(ks[bi])
        if best_gain > penalty:
            split(lo, lo + best_k)
            bounds.append(lo + best_k)
            split(lo + best_k, hi)

    split(0, len(x))
    return sorted(bounds)


def detect_changepoints(
    df: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
    min_size: int = 30,
    penalty_scale: float = 8.0,
) -> DataFrame:
    """(series…, idx, seg_id): segment id per row, boundaries at
    volatility shifts of |log-returns|. One grouped-map task per series."""
    fields = [df.schema[c] for c in series_cols]
    schema = T.StructType(
        list(fields)
        + [T.StructField("idx", T.LongType()), T.StructField("seg_id", T.IntegerType())]
    )
    cols = series_cols + [value_col] + order_cols

    def seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        lr = np.abs(np.diff(np.log(np.clip(v, 1e-10, None)), prepend=np.log(max(v[0], 1e-10))))
        pen = penalty_scale * lr.var() * np.log(max(len(lr), 2))
        bounds = _binseg(lr, min_size, pen)
        seg_ids = np.zeros(len(lr), dtype=np.int32)
        for b in bounds:
            seg_ids[b:] += 1
        out = pdf[series_cols].copy()
        out["idx"] = np.arange(len(pdf), dtype=np.int64)
        out["seg_id"] = seg_ids
        return out

    return df.select(*cols).groupBy(*series_cols).applyInPandas(seg, schema)


def cluster_segments(
    df: DataFrame,
    labeled_rows: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
    k: int = 3,
) -> DataFrame:
    """M8: per-segment feature aggregation → deterministic-Lloyd
    labels → J3 join back. Returns (series…, seg_id, n, mean_v,
    std_v, cluster). No seed parameter: the r11 kernel initializes
    from exact per-feature percentiles, so the labels are a pure
    function of the input (the MLlib-era seed no longer exists)."""
    from pyspark.sql import Window

    win = Window.partitionBy(*series_cols).orderBy(*order_cols)
    rows = df.withColumn("idx", F.row_number().over(win) - 1).join(
        labeled_rows, series_cols + ["idx"]
    )
    # exact decimal moment sums: the segment feature matrix is a pure
    # function of the input set (raw avg/stddev_samp drift in the last
    # ulp with partition layout — the r11 cross-layout finding)
    feats = dmean_dstd(rows, value_col, [*series_cols, "seg_id"], sample=True)
    labels = deterministic_kmeans(feats, ["mean_v", "std_v"], k=k)
    return labels.withColumnRenamed("_cluster", "cluster")


def kmeans_assign(
    df: DataFrame,
    feature_cols: list[str],
    cents: list[tuple],
) -> DataFrame:
    """Label ``df`` with ``_cluster`` = argmin squared distance to the
    given centroids, ties broken by lowest centroid id — the (pure,
    deterministic) assignment step of deterministic_kmeans, exposed so
    a caller holding persisted centroids (the train-once-persist
    lifecycle) can label without re-running Lloyd.

    Centroids ride as ONE nested-array LITERAL folded by constant-size
    higher-order functions, NOT as k per-centroid struct expressions:
    the expression tree stays O(1) however large k×d gets (the
    per-centroid least-of-structs form cost ~9 s PER LLOYD ITERATION
    at k=46, d=16 on a 2.2 k-row frame — tree-size-bound, the same
    plan-scaling class the sign-bucket kernel hit; this form runs the
    identical arithmetic in ~1 s). Bit-equal to the struct form by
    construction: per-dim terms (x-c)² fold left-to-right over dims
    (0.0+t0 == t0 for non-negative t0), array_min + first
    array_position reproduces least(struct(d, cid))'s min-distance /
    lowest-cid tie-break — verified per-row identical, ties included.
    """
    carr = F.lit([[float(x) for x in cent] for cent in cents])
    staged = df.withColumn(
        "_fv", F.array(*[F.col(c).cast("double") for c in feature_cols])
    ).withColumn("_ca", carr)
    d2 = F.transform(
        F.col("_ca"),
        lambda cent: F.aggregate(
            F.zip_with(F.col("_fv"), cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
    )
    staged = staged.withColumn("_d2", d2)
    return staged.withColumn(
        "_cluster",
        (F.array_position(F.col("_d2"), F.array_min(F.col("_d2"))) - 1).cast("int"),
    ).drop("_fv", "_ca", "_d2")


def deterministic_kmeans(
    feats: DataFrame,
    feature_cols: list[str],
    k: int,
    max_iter: int = 25,
    return_centroids: bool = False,
):
    """Distributed Lloyd k-means whose labels are a pure function of
    the input SET — independent of partition layout, task order, and
    shuffle fetch order. Contrast MLlib KMeans, which is
    layout-sensitive even when seeded (k-means|| init samples per
    partition; centroid updates merge float partials in completion
    order).

    Determinism by construction at every step:
      * init — per-feature EXACT percentiles at (i+0.5)/k (order
        statistics, order-independent), forming a quantile grid;
      * assign — per-row argmin distance with ties broken by lowest
        centroid id (double math on broadcast literals);
      * update — per-cluster feature means via associative decimal
        sums (functions.stats.dsum);
      * stop — centroids bit-equal to the previous round, or max_iter.

    Each iteration is one map-side-combined hash aggregate over the
    (small) segment-feature frame; centroids live in the plan as
    literals, so at 100 TB this is max_iter linear passes with no
    driver-side data movement beyond k×d centroid values."""
    # the loop scans feats once per iteration (init + ≤max_iter
    # aggregates + the final labeled projection) — materialize the
    # upstream lineage (window join + grouped moments) exactly once;
    # localCheckpoint (not persist) so nothing leaks past the caller:
    # the ContextCleaner reclaims the blocks when the frame is GC'd.
    # SPREAD before materializing (r13): a single-row-group parquet
    # source (embeddings/documents) hands the whole loop ONE partition,
    # so every Lloyd pass runs single-threaded (the _docs_wide /
    # IvfIndex.build discipline). Unlike MLlib fits this kernel is
    # layout-INDEPENDENT by construction (exact percentiles, decimal
    # sums, literal-broadcast assignment), so respreading cannot change
    # a label — measured 27 s -> ~6 s on the sf0.1 SemDeDup fit.
    sc = feats.sparkSession.sparkContext
    feats = feats.repartition(sc.defaultParallelism).localCheckpoint(eager=True)
    p = [(i + 0.5) / k for i in range(k)]
    qrow = feats.agg(
        *[
            F.percentile(F.col(c), F.array(*[F.lit(x) for x in p])).alias(c)
            for c in feature_cols
        ]
    ).first()
    if qrow[feature_cols[0]] is None:  # empty input: no percentiles
        out = feats.withColumn("_cluster", F.lit(0))
        return (out, []) if return_centroids else out
    cents = [tuple(float(qrow[c][i]) for c in feature_cols) for i in range(k)]

    cents = _lloyd_iterate(feats, feature_cols, cents, k, max_iter)
    out = kmeans_assign(feats, feature_cols, cents)
    return (out, cents) if return_centroids else out


def _lloyd_iterate(
    feats: DataFrame,
    feature_cols: list[str],
    cents: list[tuple],
    k: int,
    max_iter: int,
) -> list[tuple]:
    """Run the Lloyd update loop and return the converged centroids.

    r13 optimization: the distributed loop's per-iteration cost at
    bench scale is NOT data (a few thousand rows) but driver-side plan
    compilation — every iteration re-analyzes/codegens a fresh k×d
    centroid-literal HOF plan (~1 s each even after the r13 nested-
    literal rewrite; the SemDeDup fit burned ~25 s in ~25 such plans).
    Both call sites are small-n by construction (the scaled embedding
    path switches to MLlib IVF above the fixed-config cutoff), so when
    the frame is ACTUALLY small — n·d below SPARK_GRAFT_KMEANS_DRIVER_MAX
    values (default 2M ≈ 16 MB of doubles), no nulls, all finite — the
    iterations run driver-side on one bounded collect with arithmetic
    replicated BIT-FOR-BIT from the distributed plan:

      * assignment — numpy elementwise ops in the exact fold order of
        kmeans_assign's aggregate (acc starts 0.0, (x-c) then square,
        accumulated left-to-right over dims; each elementwise op is one
        IEEE-correctly-rounded double op, same as codegen), argmin with
        first-position tie-break == array_position(array_min);
      * update — per-term cast double→DECIMAL(38,12) (shortest-repr
        parse + HALF_UP quantize, matching Spark's Cast), exact decimal
        sum (associative, so python sum order is irrelevant), correctly
        rounded back to double, divided by the member count in python —
        the exact sequence the distributed dsum path executes;
      * convergence / empty-cluster rules — unchanged.

    Anything outside the guard falls back to the distributed loop
    (identical results either way; tests pin driver-vs-distributed
    centroid equality)."""
    import os

    n = feats.count()
    guard = int(os.environ.get("SPARK_GRAFT_KMEANS_DRIVER_MAX", "2000000"))
    if n * len(feature_cols) <= guard:
        done = _lloyd_driver(feats, feature_cols, cents, k, max_iter, n)
        if done is not None:
            return done
    return _lloyd_distributed(feats, feature_cols, cents, k, max_iter)


def _lloyd_driver(
    feats: DataFrame,
    feature_cols: list[str],
    cents: list[tuple],
    k: int,
    max_iter: int,
    n: int,
) -> list[tuple] | None:
    """Driver-side Lloyd iterations (see _lloyd_iterate). Returns None
    when the data violates the bit-parity preconditions (nulls or
    non-finite values, whose NULL-skip semantics belong to the SQL
    engine) so the caller falls back to the distributed loop."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    rows = feats.select(*feature_cols).collect()
    d = len(feature_cols)
    for r in rows:
        for i in range(d):
            if r[i] is None:
                return None
    x = np.array([[float(r[i]) for i in range(d)] for r in rows])
    if not np.isfinite(x).all():
        return None
    # per-term decimal quantization is iteration-invariant: do it once.
    # Decimal(repr(v)) parses the shortest round-trip representation —
    # the same value Java's Double.toString hands Spark's Cast — and
    # quantize(1e-12, HALF_UP) is Cast's setScale.
    q = Decimal("1E-12")
    dx = [
        [Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP) for v in row]
        for row in x
    ]
    nr = x.shape[0]
    for _ in range(max_iter):
        dist = np.empty((nr, k))
        for j, cent in enumerate(cents):
            acc = np.zeros(nr)
            for i in range(d):
                t = x[:, i] - cent[i]
                acc = acc + t * t
            dist[:, j] = acc
        lab = np.argmin(dist, axis=1)
        new_cents = []
        for ci in range(k):
            members = np.flatnonzero(lab == ci)
            if members.size == 0:
                new_cents.append(cents[ci])  # empty cluster keeps its centroid
                continue
            new_cents.append(
                tuple(
                    float(sum(dx[int(r)][i] for r in members)) / int(members.size)
                    for i in range(d)
                )
            )
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def _lloyd_distributed(
    feats: DataFrame,
    feature_cols: list[str],
    cents: list[tuple],
    k: int,
    max_iter: int,
) -> list[tuple]:
    """The original distributed Lloyd loop: one map-side-combined hash
    aggregate per iteration, centroids as plan literals, decimal-exact
    updates — the path every 100 TB-scale caller takes."""
    for _ in range(max_iter):
        agg = (
            kmeans_assign(feats, feature_cols, cents)
            .groupBy("_cluster")
            .agg(
                F.count("*").alias("_n"),
                *[dsum(F.col(c)).alias(f"_s_{c}") for c in feature_cols],
            )
            .collect()  # k rows — centroid update, not data movement
        )
        by_cid = {r["_cluster"]: r for r in agg}
        new_cents = [
            tuple(
                float(by_cid[ci][f"_s_{c}"]) / by_cid[ci]["_n"]
                for c in feature_cols
            )
            if ci in by_cid
            else cents[ci]  # empty cluster keeps its centroid
            for ci in range(k)
        ]
        if new_cents == cents:
            break
        cents = new_cents
    return cents
