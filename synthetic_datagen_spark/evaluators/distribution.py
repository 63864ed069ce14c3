"""DistributionEvaluator (SURVEY §2.9) — the reference's evaluate-mode
metric battery as one Spark job graph.

reference: sdg_plugins/evaluator/distribution_evaluator.py:74-116 and
examples/scripts/composite_metric.py:66-153. Two input series → metric
dict: distribution distances (D1-D3), autocorrelation panel (W6/W7),
Hurst (D6), spectral distance (D5), moment ratios (D7).

Everything except the FFT runs as DataFrame aggregates over a
union-with-tag frame; the FFT (D5) is a per-series numpy kernel behind
applyInPandas (series are bounded samples, never raw fact tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from ..functions import distances as D
from ..functions import timeseries as TS


def spectral_distance(
    df: DataFrame,
    value_col: str,
    tag_col: str,
    tag_a: str,
    tag_b: str,
    order_cols: list[str],
) -> float:
    """D5 — RMSE between normalized FFT power spectra
    (reference: composite_metric.py:50-56). One grouped-map task per
    side computes its spectrum; the RMSE joins two tiny arrays."""
    schema = T.StructType(
        [
            T.StructField("tag", T.StringType()),
            T.StructField("k", T.LongType()),
            T.StructField("p", T.DoubleType()),
        ]
    )

    def spectrum(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values("_ord")[value_col].to_numpy(dtype=np.float64)
        if len(x) < 4:
            return pd.DataFrame(columns=["tag", "k", "p"])
        pw = np.abs(np.fft.rfft(x - x.mean())) ** 2
        tot = pw.sum()
        pw = pw / tot if tot > 0 else pw
        return pd.DataFrame(
            {"tag": pdf["_tag"].iloc[0], "k": np.arange(len(pw)), "p": pw}
        )

    w = Window.partitionBy(tag_col).orderBy(*order_cols)
    d = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .withColumn("_ord", F.row_number().over(w))
        .withColumnRenamed(tag_col, "_tag")
        .select("_tag", "_ord", value_col)
    )
    spec = d.groupBy("_tag").applyInPandas(spectrum, schema)
    a = spec.filter(F.col("tag") == tag_a).select("k", F.col("p").alias("pa"))
    b = spec.filter(F.col("tag") == tag_b).select("k", F.col("p").alias("pb"))
    j = a.join(b, "k", "inner")  # truncate to common spectrum length
    row = j.agg(F.sqrt(F.avg(F.pow(F.col("pa") - F.col("pb"), 2))).alias("sd")).first()
    return float(row["sd"]) if row["sd"] is not None else float("nan")


class DistributionEvaluator:
    """Compute the full metric panel between two tagged series."""

    def __init__(self, bins: int = 100, acf_lags: tuple[int, ...] = (1, 5, 10, 24)):
        self.bins = bins
        self.acf_lags = acf_lags

    def evaluate_reference(self, spark, synthetic=None, real=None) -> dict[str, float]:
        """The reference's exact call form
        (distribution_evaluator.py:73-83: ``evaluate(synthetic=…,
        real=…)`` with pandas DataFrames or CSV paths carrying
        DATE_TIME/typical_price) returning its exact key set — the full
        drop-in: only the import changes for a switching user."""
        import pandas as pd

        def to_spark(arg, tag):
            if isinstance(arg, str):
                from ..sources.csv_io import TYPICAL_PRICE, load_csv

                df = load_csv(spark, arg, schema=TYPICAL_PRICE)
            elif isinstance(arg, pd.DataFrame):
                df = spark.createDataFrame(arg)
            else:
                raise ValueError(f"provide a pandas DataFrame or CSV path for {tag!r}")
            return df.select(
                F.col("DATE_TIME").alias("ts"),
                F.col("typical_price").cast("double").alias("value"),
            ).withColumn("tag", F.lit(tag))

        both = to_spark(real, "real").unionByName(to_spark(synthetic, "syn"))
        return self.evaluate_reference_keys(both, "value", "tag", "real", "syn", ["ts"])

    def evaluate_arrays(
        self, synthetic_prices, real_prices, spark=None
    ) -> dict[str, float]:
        """The reference's array call form
        (distribution_evaluator.py:85-116: raw price ndarrays in, same
        key set out) — PredictiveEvaluator's secondary-metrics hook
        calls exactly this (predictive_evaluator.py:270-273). ``spark``
        defaults to the active session (the reference needs no session
        arg; a Spark engine does — this is the only signature delta)."""
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.active()

        def to_tagged(arr, tag):
            rows = [(tag, i, float(v)) for i, v in enumerate(arr)]
            return spark.createDataFrame(rows, "tag STRING, ord LONG, value DOUBLE")

        both = to_tagged(real_prices, "real").unionByName(
            to_tagged(synthetic_prices, "syn")
        )
        return self.evaluate_reference_keys(
            both, "value", "tag", "real", "syn", ["ord"]
        )

    def evaluate(
        self,
        df: DataFrame,
        value_col: str,
        tag_col: str,
        tag_real: str,
        tag_syn: str,
        order_cols: list[str],
        include_raw: bool = False,
    ) -> dict[str, float]:
        """``include_raw`` adds per-tag raw stats (means/stds/raw ACF)
        for the reference-keyed surface; default off so long-standing
        consumers (d8's per-metric row emission) keep a stable key set."""
        out: dict[str, float] = {}
        rng = df.filter(F.col(tag_col).isin(tag_real, tag_syn)).agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).first()
        lo, hi = float(rng["lo"]), float(rng["hi"])
        if hi <= lo:
            hi = lo + 1.0

        # the six metric pipelines are independent Spark jobs — submit
        # them concurrently from driver threads so the cluster overlaps
        # their stages instead of running the panel serially (the same
        # plans, so results are unchanged; the FIFO scheduler interleaves)
        def _js():
            return float(
                D.js_divergence(df, value_col, tag_col, tag_real, tag_syn, lo, hi, self.bins)
                .first()["js_div"]
            )

        def _w1():
            return float(
                D.wasserstein_1d(df, value_col, tag_col, tag_real, tag_syn).first()["w1"]
            )

        def _ks():
            return float(
                D.ks_statistic(df, value_col, tag_col, tag_real, tag_syn).first()["ks_stat"]
            )

        def _panel():
            r = TS.log_returns(df, value_col, [tag_col], order_cols, out_col="_r")
            w = Window.partitionBy(tag_col).orderBy(*order_cols)
            lag_cols = [F.lag("_r", k).over(w).alias(f"_l{k}") for k in self.acf_lags]
            panel = (
                r.select(
                    tag_col,
                    "_r",
                    F.abs("_r").alias("_a"),
                    F.lag(F.abs("_r")).over(w).alias("_al"),
                    *lag_cols,
                )
                .groupBy(tag_col)
                .agg(
                    F.stddev_pop("_r").alias("std"),
                    F.mean("_r").alias("mean"),
                    F.skewness("_r").alias("skew"),
                    (F.kurtosis("_r") + 3.0).alias("kurt_raw"),  # fisher=False
                    *[F.corr("_r", f"_l{k}").alias(f"ac{k}") for k in self.acf_lags],
                    F.corr("_a", "_al").alias("vol_cluster"),
                )
            )
            return {row[tag_col]: row for row in panel.collect()}

        def _hurst():
            return {
                row[tag_col]: row["hurst"]
                for row in D.hurst_rs(df, value_col, [tag_col], order_cols)
                .filter(F.col(tag_col).isin(tag_real, tag_syn))
                .collect()
            }

        def _spec():
            return spectral_distance(df, value_col, tag_col, tag_real, tag_syn, order_cols)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=6) as pool:
            f_js, f_w1, f_ks = pool.submit(_js), pool.submit(_w1), pool.submit(_ks)
            f_panel, f_hurst, f_spec = pool.submit(_panel), pool.submit(_hurst), pool.submit(_spec)
            out["js_div"] = f_js.result()
            out["wasserstein"] = f_w1.result()
            out["ks_stat"] = f_ks.result()
            rows = f_panel.result()
            hurst = f_hurst.result()
            out["spectral_dist"] = f_spec.result()

        ra, rb = rows[tag_real], rows[tag_syn]
        out["std_ratio"] = (rb["std"] / ra["std"]) if ra["std"] else float("nan")
        out["std_dev"] = abs(out["std_ratio"] - 1.0)

        # ratio-deviation form with the reference's near-zero guard
        # (composite_metric.py:106-121: |ac_s/ac_r − 1| when |ac_r|>1e-6
        # else |ac_s|) — plus the plain-diff form for D7 consumers
        def ratio_dev(a_, b_):
            a_, b_ = a_ or 0.0, b_ or 0.0
            return abs(b_ / a_ - 1.0) if abs(a_) > 1e-6 else abs(b_)

        for k in self.acf_lags:
            a_, b_ = ra[f"ac{k}"], rb[f"ac{k}"]
            out[f"ac{k}_diff"] = abs((b_ or 0.0) - (a_ or 0.0))
            out[f"ac_lag{k}"] = ratio_dev(a_, b_)
            if include_raw:
                out[f"real_autocorr_lag{k}"] = float(a_ or 0.0)
                out[f"synthetic_autocorr_lag{k}"] = float(b_ or 0.0)
        out["vol_cluster_diff"] = abs((rb["vol_cluster"] or 0.0) - (ra["vol_cluster"] or 0.0))
        out["vol_cluster"] = ratio_dev(ra["vol_cluster"], rb["vol_cluster"])
        out["skew_diff"] = abs((rb["skew"] or 0.0) - (ra["skew"] or 0.0))
        # normalized raw-kurtosis diff (composite_metric.py:128-131)
        kr = ra["kurt_raw"] or 3.0
        out["kurt_diff"] = abs((rb["kurt_raw"] or 3.0) - kr) / max(kr, 1.0)
        out["hurst_diff"] = abs(hurst.get(tag_syn, 0.5) - hurst.get(tag_real, 0.5))
        if include_raw:
            out["real_return_mean"] = float(ra["mean"] or 0.0)
            out["synthetic_return_mean"] = float(rb["mean"] or 0.0)
            out["real_return_std"] = float(ra["std"] or 0.0)
            out["synthetic_return_std"] = float(rb["std"] or 0.0)
        return out

    # reference key names → this evaluator's metrics. The reference's
    # "kl_divergence" is its histogram divergence over shared-range bins
    # (distribution_evaluator.py:94 — actually Jensen-Shannon, see the
    # d1 docstring), which is exactly `js_div` here.
    def evaluate_reference_keys(
        self,
        df: DataFrame,
        value_col: str,
        tag_col: str,
        tag_real: str,
        tag_syn: str,
        order_cols: list[str],
    ) -> dict[str, float]:
        """The reference's `DistributionEvaluator.evaluate` output keys
        (distribution_evaluator.py:85-116): kl_divergence,
        wasserstein_distance, {real,synthetic}_return_{mean,std},
        {real,synthetic}_autocorr_lag{1,5,10},
        {real,synthetic}_adf_pvalue, quality_score — so a reference
        caller can switch without touching its key handling."""
        from .adf_autolag import adf_autolag_panel
        from ..functions import timeseries as TS

        m = self.evaluate(
            df, value_col, tag_col, tag_real, tag_syn, order_cols, include_raw=True
        )
        out: dict[str, float] = {
            "kl_divergence": m["js_div"],
            "wasserstein_distance": m["wasserstein"],
            "real_return_mean": m["real_return_mean"],
            "synthetic_return_mean": m["synthetic_return_mean"],
            "real_return_std": m["real_return_std"],
            "synthetic_return_std": m["synthetic_return_std"],
        }
        for k in (1, 5, 10):
            out[f"real_autocorr_lag{k}"] = m[f"real_autocorr_lag{k}"]
            out[f"synthetic_autocorr_lag{k}"] = m[f"synthetic_autocorr_lag{k}"]
        rets = TS.log_returns(df, value_col, [tag_col], order_cols, out_col="_r")
        adf = {
            r[tag_col]: r
            for r in adf_autolag_panel(rets, "_r", [tag_col], order_cols)
        }
        out["real_adf_pvalue"] = float(adf[tag_real]["p_value"])
        out["synthetic_adf_pvalue"] = float(adf[tag_syn]["p_value"])
        out["quality_score"] = (
            out["kl_divergence"]
            + 0.1 * out["wasserstein_distance"]
            + abs(out["real_return_std"] - out["synthetic_return_std"])
        )
        return out
