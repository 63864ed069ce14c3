"""Plugin system — the reference's extensibility contract re-homed on
Spark (reference: app/plugin_loader.py:7-27 resolves setuptools entry
points in four groups, pyproject.toml:30-44; plugins are duck-typed
with ``configure(dict)`` / ``set_params(**kw)`` plus a role method).

Here the four groups are in-process registries (an installed package
can still extend them via ``register(group, name)`` at import time —
same by-name late binding, no import-time coupling). ``plugin_params``
class attributes merge into the config exactly as the reference does
(augmentation_evaluator.py:339-343).

``register_sql_functions`` exposes the scalar text/quality plugins to
the SQL surface via ``spark.udf.register`` (SURVEY §2.12) — note these
are the *slow path* by design; the DataFrame API uses the JVM-side
column functions in functions/.
"""

from __future__ import annotations

from typing import Any

# module-level so pandas-UDF type hints (stringified by the __future__
# import above) resolve against module globals at registration time
import numpy as np
import pandas as pd

GROUPS = ("sdg.trainer", "sdg.generator", "sdg.evaluator", "sdg.optimizer")

_REGISTRY: dict[str, dict[str, type]] = {g: {} for g in GROUPS}


class PluginBase:
    """Duck-typed plugin contract (reference: typical_price_generator.py:
    44-64): config dict in, keyword overrides via set_params."""

    plugin_params: dict[str, Any] = {}

    def __init__(self, config: dict | None = None):
        self.config = {**self.plugin_params, **(config or {})}

    def configure(self, config: dict) -> None:
        self.config.update(config)

    def set_params(self, **kwargs: Any) -> None:
        self.config.update(kwargs)


def register(group: str, name: str):
    """Class decorator: put a plugin class in a group registry."""
    if group not in _REGISTRY:
        raise KeyError(f"unknown plugin group {group!r}; groups: {GROUPS}")

    def deco(cls: type) -> type:
        _REGISTRY[group][name] = cls
        return cls

    return deco


def load_plugin(group: str, name: str) -> type:
    """By-name plugin resolution (reference: plugin_loader.py:14-22)."""
    try:
        return _REGISTRY[group][name]
    except KeyError as e:
        known = sorted(_REGISTRY.get(group, {}))
        raise KeyError(f"no plugin {name!r} in {group!r}; known: {known}") from e


def available(group: str) -> list[str]:
    return sorted(_REGISTRY[group])


def _register_builtins() -> None:
    """Built-in plugins mirror the reference's entry-point table."""
    from .evaluators import (
        DistributionEvaluator,
        ExternalPredictorEvaluator,
        PredictiveEvaluator,
    )
    from .generators import BlockBootstrapGenerator, GrasyndaGenerator
    from .ml import GanTrainer, LinearDecoder, TimeGanTrainer, VaeGanTrainer
    from .optimize import GAOptimizer

    reg = {
        "sdg.generator": {
            "block_bootstrap": BlockBootstrapGenerator,
            "grasynda": GrasyndaGenerator,
            "linear_decoder": LinearDecoder,
        },
        "sdg.evaluator": {
            "distribution": DistributionEvaluator,
            "predictive": PredictiveEvaluator,
            # the reference's third evaluator entry point
            # (pyproject.toml: augmentation_evaluator) — the
            # external-predictor augmentation protocol (M13)
            "augmentation": ExternalPredictorEvaluator,
        },
        "sdg.trainer": {
            "gan": GanTrainer,
            "vae_gan": VaeGanTrainer,
            "timegan": TimeGanTrainer,
        },
        "sdg.optimizer": {
            "ga": GAOptimizer,
        },
    }
    for group, entries in reg.items():
        _REGISTRY[group].update(entries)


_register_builtins()


def register_sql_functions(spark) -> None:
    """Expose scalar plugin functions to SQL (spark.udf.register).

    Python UDFs — row-at-a-time, the documented slow path; the fast
    equivalents are the column expressions in functions/text.py.
    """
    import re

    def token_count_py(s: str | None) -> int:
        return len(s.split()) if s and s.strip() else 0

    def quality_score_py(s: str | None) -> float:
        # mirrors functions/text.quality_score exactly (0.5 length +
        # 0.3 punctuation + 0.2 stopword) so the SQL surface and the
        # DataFrame surface score identically
        from .functions.text import STOPWORDS

        if not s:
            return 0.0
        n = len(s)
        punct = len(re.findall(r"[\.,;:!\?\'\"\(\)\[\]\-]", s))
        len_score = min(n / 200.0, 1.0)
        punct_pen = max(0.0, 1.0 - 4.0 * punct / n)
        toks = s.strip().lower().split()
        sw = set(STOPWORDS["en"])
        sw_ratio = (sum(t in sw for t in toks) / len(toks)) if toks else 0.0
        sw_score = min(sw_ratio * 5.0, 1.0)
        return 0.5 * len_score + 0.3 * punct_pen + 0.2 * sw_score

    spark.udf.register("token_count_py", token_count_py, "int")
    spark.udf.register("quality_score_py", quality_score_py, "double")


def register_vectorized_functions(spark) -> None:
    """SURVEY §2.12(b) — the FAST UDF path: Arrow-batched pandas UDFs,
    scalar and grouped-agg, registered beside the row-at-a-time
    demonstrators above. Same results, ~10-100× the throughput: one
    Python invocation per Arrow batch instead of per row, columnar
    transfer both ways.

    * ``token_count_vec(text)``  — scalar: whitespace token count
    * ``quality_score_vec(text)`` — scalar: composite quality heuristic
      (mirrors functions/text.quality_score exactly)
    * ``ar1_agg(idx, x)`` — grouped aggregate: lag-1 autocorrelation of
      the group's values ordered by ``idx`` (the per-regime AR(1)
      statistic, A8/J1, as a reusable UDAF). The explicit order column
      makes it partition-order-independent — grouped-agg input order is
      otherwise unspecified.
    """
    from pyspark.sql.functions import pandas_udf

    from .functions.text import STOPWORDS

    sw = frozenset(STOPWORDS["en"])
    punct_re = r"[\.,;:!\?\'\"\(\)\[\]\-]"

    @pandas_udf("int")
    def token_count_vec(s: pd.Series) -> pd.Series:
        toks = s.fillna("").str.split()
        return toks.str.len().fillna(0).astype("int32")

    @pandas_udf("double")
    def quality_score_vec(s: pd.Series) -> pd.Series:
        t = s.fillna("")
        n = t.str.len().to_numpy(dtype=np.float64)
        punct = t.str.count(punct_re).to_numpy(dtype=np.float64)
        len_score = np.minimum(n / 200.0, 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            punct_pen = np.where(n > 0, np.maximum(0.0, 1.0 - 4.0 * punct / np.where(n > 0, n, 1.0)), 1.0)
        sw_ratio = np.array(
            [
                (sum(tok in sw for tok in txt.strip().lower().split()) / nt if nt else 0.0)
                for txt, nt in zip(t, t.str.split().str.len().fillna(0))
            ],
            dtype=np.float64,
        )
        sw_score = np.minimum(sw_ratio * 5.0, 1.0)
        out = 0.5 * len_score + 0.3 * punct_pen + 0.2 * sw_score
        return pd.Series(np.where(n > 0, out, 0.0))

    @pandas_udf("double")
    def ar1_agg(idx: pd.Series, x: pd.Series) -> float:
        order = np.argsort(idx.to_numpy(), kind="stable")
        v = x.to_numpy(dtype=np.float64)[order]
        if len(v) < 3:
            return 0.0
        a, b = v[1:], v[:-1]
        if a.std() == 0.0 or b.std() == 0.0:
            return 0.0
        return float(np.corrcoef(a, b)[0, 1])

    @pandas_udf("double")
    def hurst_agg(idx: pd.Series, x: pd.Series) -> float:
        # numpy twin of functions/distances.hurst_rs (SURVEY §4.3's
        # "metrics callable from SQL"): same R/S estimator — full
        # segments only, S > 1e-10 gate, mean(R/S) per lag, log-log
        # slope via corr·sy/sx, clipped to [0, 1]. Right for one
        # driver-sized series; the distributed hurst_rs is the scale
        # path (tests assert they agree).
        order = np.argsort(idx.to_numpy(), kind="stable")
        v = x.to_numpy(dtype=np.float64)[order]
        d = np.diff(v)
        if len(d) < 4:
            return 0.5
        lxs, lys = [], []
        for lag in range(2, 101):
            m = len(d) // lag
            if m == 0:
                continue
            segs = d[: m * lag].reshape(m, lag)
            mu = segs.mean(axis=1)
            s = segs.std(axis=1)
            dev = np.cumsum(segs - mu[:, None], axis=1)
            r = dev.max(axis=1) - dev.min(axis=1)
            mask = s > 1e-10
            if not mask.any():
                continue
            rs = float(np.mean(r[mask] / s[mask]))
            if rs > 0:
                lxs.append(np.log(lag))
                lys.append(np.log(rs))
        if len(lxs) < 2:
            return 0.5
        lx, ly = np.asarray(lxs), np.asarray(lys)
        sx, sy = lx.std(ddof=1), ly.std(ddof=1)
        if sx == 0.0 or sy == 0.0:
            return 0.5
        slope = float(np.corrcoef(lx, ly)[0, 1]) * sy / sx
        return float(min(max(slope, 0.0), 1.0))

    spark.udf.register("token_count_vec", token_count_vec)
    spark.udf.register("quality_score_vec", quality_score_vec)
    spark.udf.register("ar1_agg", ar1_agg)
    spark.udf.register("hurst_agg", hurst_agg)
