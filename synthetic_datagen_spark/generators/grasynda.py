"""G5 — Grasynda graph-walk generator (SURVEY §2.10).

reference: sdg_plugins/generator/grasynda_generator.py:53-149 —
quantile-bin the training *returns* into states, build the state
transition matrix, then generate by walking the chain and sampling a
return from the current state's value pool each step; prices rebuild by
cumulative product.

Spark design:
  * fit() is pure DataFrame work: exact quantile edges (A4), digitize
    (A5), lead-pair counts (A7), per-state pools — each one shuffle.
    The K×K matrix and K pools are tiny and collect to the driver
    (pools are capped with a seeded per-state sample at scale — the
    matrix is O(K²) regardless of data size).
  * generate() fans out one task per synthetic series via
    `applyInPandas` over a `spark.range(n_series)` — the walk is
    inherently sequential *within* a series (SURVEY §4.2), but
    thousands of series/seeds run in parallel across executors, with
    the fitted model broadcast once.
  * determinism: each series walks with numpy RNG seeded by
    splitmix64(base_seed, series_id) — partition-layout independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from .seeds import derive_seed


class GrasyndaGenerator:
    def __init__(self, n_states: int = 10, max_pool_per_state: int = 100_000):
        self.n_states = n_states
        self.max_pool = max_pool_per_state
        self.edges: np.ndarray | None = None
        self.trans_cum: np.ndarray | None = None   # row-wise CDF of K×K
        self.start_cum: np.ndarray | None = None   # state-frequency CDF
        self.pools: list[np.ndarray] | None = None
        self.p0: float | None = None

    def fit(
        self,
        df: DataFrame,
        value_col: str,
        order_cols: list[str],
        series_col: str | None = None,
    ) -> "GrasyndaGenerator":
        # Adjacency (lag / lead) over the training order WITHOUT an
        # unpartitioned window (plan-pinned, tests/test_plans.py): a
        # dense global index (functions/indexing.py — one range
        # shuffle, no SinglePartition exchange) turns both into
        # shuffle joins on idx == idx-1 / idx+1. The series path keeps
        # its partitioned window (already scale-safe).
        part = [series_col] if series_col else []
        lp = F.log(F.greatest(F.col(value_col), F.lit(1e-10)))
        if part:
            w = Window.partitionBy(*part).orderBy(*order_cols)
            rets = (
                df.withColumn("_r", lp - F.lag(lp).over(w))
                .withColumn("_idx", F.row_number().over(w))
                .filter(F.col("_r").isNotNull())
                .select(*part, F.col("_idx").alias("idx"), F.col("_r").alias("r"))
            )
        else:
            from ..functions.indexing import with_global_index

            d = with_global_index(
                df.select(lp.alias("_lp"), *order_cols), list(order_cols), "_idx"
            ).select("_idx", "_lp")
            prev = d.select(
                (F.col("_idx") + 1).alias("_idx"), F.col("_lp").alias("_lp_prev")
            )
            rets = d.join(prev, "_idx").select(
                F.col("_idx").alias("idx"),
                (F.col("_lp") - F.col("_lp_prev")).alias("r"),
            )
        rets = rets.persist()
        # retained for the plan pin in tests/test_plans.py: the fit
        # path must never contain an Exchange SinglePartition
        self.fit_plan = rets._jdf.queryExecution().executedPlan().toString()
        # A4: exact quantile edges, uniquified (reference :77-82)
        probs = [i / self.n_states for i in range(self.n_states + 1)]
        edges = np.unique(
            rets.agg(
                F.percentile("r", F.array(*[F.lit(p) for p in probs])).alias("e")
            ).first()["e"]
        )
        self.edges = edges[1:-1]  # interior edges for digitize
        k = len(self.edges) + 1

        state = F.lit(k - 1)
        for i in range(len(self.edges) - 1, -1, -1):
            state = F.when(F.col("r") < float(self.edges[i]), i).otherwise(state)
        labeled = rets.withColumn("state", state)

        # A7: transition counts via lead over the original time order —
        # a partitioned window per series, or an idx+1 self-join when
        # there is no series (idx is dense, so the join IS the lead)
        if part:
            lw = Window.partitionBy(*part).orderBy("idx")
            led = labeled.withColumn("nxt", F.lead("state").over(lw)).filter(
                F.col("nxt").isNotNull()
            )
        else:
            nxt = labeled.select(
                (F.col("idx") - 1).alias("idx"), F.col("state").alias("nxt")
            )
            led = labeled.join(nxt, "idx")
        pairs = led.groupBy("state", "nxt").count()
        tm = np.full((k, k), 0.0)
        for row in pairs.collect():
            tm[row["state"], row["nxt"]] = row["count"]
        tm = (tm + 1e-12) / (tm + 1e-12).sum(axis=1, keepdims=True)
        self.trans_cum = np.cumsum(tm, axis=1)

        # A6: start-state frequencies
        freq = np.zeros(k)
        for row in labeled.groupBy("state").count().collect():
            freq[row["state"]] = row["count"]
        self.start_cum = np.cumsum(freq / freq.sum())

        # per-state value pools (seeded bounded sample = the scale path)
        pool_rows = (
            labeled.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("state").orderBy(F.md5(F.col("r").cast("string")))
                ),
            )
            .filter(F.col("rn") <= self.max_pool)
            .select("state", "r")
            .collect()
        )
        self.pools = [np.array([x["r"] for x in pool_rows if x["state"] == s]) for s in range(k)]
        for s in range(k):
            if len(self.pools[s]) == 0:
                self.pools[s] = np.array([0.0])
        self.p0 = df.orderBy(*order_cols).select(value_col).first()[0]
        rets.unpersist()
        return self

    def generate(self, spark, seed: int, n_samples: int, n_series: int = 1) -> DataFrame:
        """(series_id, t, price) — deterministic in (seed, series_id)."""
        if self.trans_cum is None:
            raise RuntimeError("fit() first")
        trans_cum, start_cum = self.trans_cum, self.start_cum
        pools, p0 = self.pools, float(self.p0)
        schema = T.StructType(
            [
                T.StructField("series_id", T.LongType()),
                T.StructField("t", T.LongType()),
                T.StructField("price", T.DoubleType()),
            ]
        )

        def walk(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for sid in pdf["id"]:
                rng = np.random.default_rng(derive_seed(seed, int(sid)))
                # clamp like the loop below: fp rounding can leave
                # start_cum[-1] slightly under 1.0
                s = min(
                    int(np.searchsorted(start_cum, rng.random(), side="right")),
                    len(pools) - 1,
                )
                rets = np.empty(n_samples - 1)
                for i in range(n_samples - 1):
                    s = int(np.searchsorted(trans_cum[s], rng.random(), side="right"))
                    s = min(s, len(pools) - 1)
                    pool = pools[s]
                    rets[i] = pool[rng.integers(0, len(pool))]
                # clamp the cumulated walk so exp stays positive-finite
                # (P5 clip discipline; events-table returns are far
                # heavier-tailed than the reference's forex data)
                cum = np.clip(np.concatenate([[0.0], np.cumsum(rets)]), -600.0, 600.0)
                prices = np.clip(p0 * np.exp(cum), 1e-300, 1e300)
                out.append(
                    pd.DataFrame(
                        {
                            "series_id": np.full(n_samples, sid, dtype=np.int64),
                            "t": np.arange(n_samples, dtype=np.int64),
                            "price": prices,
                        }
                    )
                )
            return pd.concat(out) if out else pd.DataFrame(columns=["series_id", "t", "price"])

        return (
            spark.range(n_series)
            .repartition(max(1, min(n_series, 64)), "id")
            .groupBy("id")
            .applyInPandas(walk, schema)
        )


# ---------------------------------------------------------- artifacts --
def save_grasynda(gen: GrasyndaGenerator, path: str) -> None:
    """S5/S6: numpy state as npz + meta.json (the transition CDF, bin
    edges, per-state pools and anchor price are the whole model)."""
    import json
    import os

    if gen.trans_cum is None:
        raise RuntimeError("fit() first")
    os.makedirs(path, exist_ok=True)
    np.savez(
        os.path.join(path, "state.npz"),
        edges=gen.edges,
        trans_cum=gen.trans_cum,
        start_cum=gen.start_cum,
        **{f"pool_{i}": p for i, p in enumerate(gen.pools)},
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {"n_states": gen.n_states, "max_pool": gen.max_pool,
             "n_pools": len(gen.pools), "p0": float(gen.p0), "format_version": 1},
            f,
        )


def load_grasynda(path: str) -> GrasyndaGenerator:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    z = np.load(os.path.join(path, "state.npz"))
    gen = GrasyndaGenerator(n_states=meta["n_states"], max_pool_per_state=meta["max_pool"])
    gen.edges = z["edges"]
    gen.trans_cum = z["trans_cum"]
    gen.start_cum = z["start_cum"]
    gen.pools = [z[f"pool_{i}"] for i in range(meta["n_pools"])]
    gen.p0 = meta["p0"]
    return gen
