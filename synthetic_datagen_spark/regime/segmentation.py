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
- Per-segment features are a distributed groupBy (A8-shape).
- Clustering is MLlib KMeans (seed-pinned) — the scale substitute the
  survey names for driver-side sklearn Ward (M8).
- The J3 "positional zip" of segments to labels is a proper equi-join
  on (series, segment_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


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
    seed: int = 42,
) -> DataFrame:
    """M8: per-segment feature aggregation → KMeans labels → J3 join
    back. Returns (series…, seg_id, n, mean_v, std_v, cluster)."""
    from pyspark.sql import Window

    win = Window.partitionBy(*series_cols).orderBy(*order_cols)
    rows = df.withColumn("idx", F.row_number().over(win) - 1).join(
        labeled_rows, series_cols + ["idx"]
    )
    feats = rows.groupBy(*series_cols, "seg_id").agg(
        F.count("*").alias("n"),
        F.avg(value_col).alias("mean_v"),
        F.coalesce(F.stddev_samp(value_col), F.lit(0.0)).alias("std_v"),
    )
    va = VectorAssembler(inputCols=["mean_v", "std_v"], outputCol="_fv")
    km = KMeans(k=k, seed=seed, featuresCol="_fv", predictionCol="cluster")
    assembled = va.transform(feats)
    model = km.fit(assembled)
    return model.transform(assembled).drop("_fv")
