"""G8/G9 — regime-segmented block bootstrap (the reference's best-scoring
generator family, sdg_plugins/generator/regime_bootstrap_hybrid.py:49-191
and examples/scripts/optimize_generator_v3.py:87-258).

Spark-first split:

- fit(): everything distributed. Contiguous same-regime runs of the
  labeled training stream become blocks via the classic gaps-and-islands
  rewrite (change-marker → running sum → segment id → groupBy collect).
  Pools are capped per regime with a deterministic cap so the driver/
  broadcast footprint is bounded no matter how large the training data
  is — at 100 TB the pool cap (not the data size) fixes memory.
- generate(): per-series applyInPandas walk with the pools broadcast in
  the closure. Each series: Markov regime path → per-run block sampling
  (ratio-free: blocks are *returns*, so chaining is just concatenation)
  → W12 boundary smoothing b[0] = (1-λ)b[0] + λ·prev_last → cumsum →
  prices. Seeded by splitmix64(base_seed, series_id): partition-count
  independent.

Boundary variants (G9, optimize_generator_v3.py): ``smoothing="blend"``
is the reference default; ``"crossfade"`` alpha-blends the first
``overlap`` elements of each block against the previous block's tail
(W13); ``"none"`` disables stitching.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from ..generators.seeds import derive_seed
from .model import RegimeModel


class RegimeBootstrapHybrid:
    def __init__(
        self,
        model: RegimeModel,
        min_block: int = 5,
        max_blocks_per_regime: int = 4096,
        lam: float = 0.3,
        smoothing: str = "blend",
        overlap: int = 3,
        p0: float = 100.0,
    ):
        self.model = model
        self.min_block = min_block
        self.max_blocks = max_blocks_per_regime
        self.lam = lam
        self.smoothing = smoothing
        self.overlap = overlap
        self.p0 = p0
        self.pools: dict[int, list[np.ndarray]] | None = None

    # ---------------------------------------------------------- fit --
    def fit(self, partition_cols: list[str]) -> "RegimeBootstrapHybrid":
        """Build per-regime block pools from the model's labeled stream.

        Gaps-and-islands: a regime-change marker per row, running-summed
        into a segment id — one window pass, then one groupBy. Blocks
        shorter than min_block are dropped (reference min length,
        regime_bootstrap_hybrid.py:80-97).
        """
        if self.model.labeled is None:
            raise RuntimeError("regime model not fitted")
        w = Window.partitionBy(*partition_cols).orderBy("idx") if partition_cols else Window.orderBy("idx")
        lab = self.model.labeled.select(*partition_cols, "idx", "regime", "log_ret")
        chg = (
            F.when(F.lag("regime").over(w).isNull(), 1)
            .when(F.lag("regime").over(w) != F.col("regime"), 1)
            .otherwise(0)
        )
        d = lab.withColumn("_chg", chg).withColumn("seg", F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
        segs = (
            d.groupBy(*partition_cols, "seg")
            .agg(
                F.first("regime").alias("regime"),
                F.array_sort(
                    F.collect_list(F.struct("idx", "log_ret"))
                )["log_ret"].alias("rets"),
                F.count("*").alias("m"),
            )
            .filter(F.col("m") >= self.min_block)
        )
        # deterministic per-regime cap: rank segments by (m desc, seg) and
        # keep the longest max_blocks — bounded broadcast at any scale
        rw = Window.partitionBy("regime").orderBy(F.desc("m"), "seg")
        capped = segs.withColumn("_rk", F.row_number().over(rw)).filter(
            F.col("_rk") <= self.max_blocks
        )
        pools: dict[int, list[np.ndarray]] = {}
        for row in capped.select("regime", "seg", "rets").orderBy("regime", "seg").collect():
            pools.setdefault(int(row["regime"]), []).append(
                np.asarray(row["rets"], dtype=np.float64)
            )
        self.pools = pools
        return self

    # ----------------------------------------------------- generate --
    def generate(
        self, spark: SparkSession, seed: int, n_samples: int, n_series: int = 1
    ) -> DataFrame:
        if self.pools is None:
            raise RuntimeError("fit() first")
        if self.model.trans is None:
            raise RuntimeError("regime model not fitted")
        pools = {r: [b.copy() for b in bs] for r, bs in self.pools.items()}
        trans_cum = np.cumsum(self.model.trans, axis=1)
        start_cum = np.cumsum(self.model.start)
        stats = self.model.stats
        k = len(start_cum)
        lam, mode, overlap, p0 = self.lam, self.smoothing, self.overlap, float(self.p0)

        schema = T.StructType(
            [
                T.StructField("series_id", T.LongType()),
                T.StructField("t", T.LongType()),
                T.StructField("regime", T.IntegerType()),
                T.StructField("price", T.DoubleType()),
            ]
        )

        def walk(pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for sid in pdf["id"]:
                rng = np.random.default_rng(derive_seed(seed, int(sid)))
                n_ret = n_samples - 1
                # regime path (G6)
                regs = np.empty(n_ret, dtype=np.int64)
                s = int(np.searchsorted(start_cum, rng.random(), side="right"))
                s = min(s, k - 1)
                for t in range(n_ret):
                    regs[t] = s
                    s = min(
                        int(np.searchsorted(trans_cum[s], rng.random(), side="right")),
                        k - 1,
                    )
                # fill each same-regime run with sampled blocks
                rets = np.empty(n_ret)
                prev_last: float | None = None
                i = 0
                while i < n_ret:
                    j = i
                    while j < n_ret and regs[j] == regs[i]:
                        j += 1
                    need = j - i
                    filled = 0
                    reg_pool = pools.get(int(regs[i]))
                    while filled < need:
                        if reg_pool:
                            blk = reg_pool[int(rng.integers(len(reg_pool)))]
                        else:  # parametric fallback for empty pools
                            st = stats.get(int(regs[i]), {"mu": 0.0, "sigma": 1e-3})
                            blk = st["mu"] + st["sigma"] * rng.standard_normal(need)
                        take = blk[: need - filled].copy()
                        # W12/W13/W14 stitch against the previous block's last
                        if prev_last is not None and len(take):
                            if mode == "blend":
                                take[0] = (1.0 - lam) * take[0] + lam * prev_last
                            elif mode == "crossfade":
                                m = min(overlap, len(take))
                                alpha = np.linspace(0.0, 1.0, m + 2)[1:-1][:m]
                                take[:m] = alpha * take[:m] + (1 - alpha) * prev_last
                            elif mode == "ar_bridge":
                                # W14: AR(1) recursion walks from the prev
                                # block's last return toward the block's own
                                # values over `overlap` steps (reference:
                                # optimize_generator_v3.py:148-201)
                                m = min(overlap, len(take))
                                cur = prev_last
                                for bi in range(m):
                                    cur = lam * cur + (1.0 - lam) * take[bi]
                                    take[bi] = cur
                        rets[i + filled : i + filled + len(take)] = take
                        filled += len(take)
                        prev_last = float(take[-1]) if len(take) else prev_last
                    i = j
                cum = np.clip(np.concatenate([[0.0], np.cumsum(rets)]), -600.0, 600.0)
                prices = np.clip(p0 * np.exp(cum), 1e-300, 1e300)
                out.append(
                    pd.DataFrame(
                        {
                            "series_id": np.full(n_samples, sid, dtype=np.int64),
                            "t": np.arange(n_samples, dtype=np.int64),
                            "regime": np.concatenate([[regs[0]], regs]).astype(np.int32),
                            "price": prices,
                        }
                    )
                )
            return (
                pd.concat(out)
                if out
                else pd.DataFrame(columns=["series_id", "t", "regime", "price"])
            )

        return (
            spark.range(n_series)
            .repartition(max(1, min(n_series, 64)), "id")
            .groupBy("id")
            .applyInPandas(walk, schema)
        )


def save_hybrid(gen: RegimeBootstrapHybrid, path: str) -> None:
    """S5/S6 artifact layout: regime model JSON + per-regime block pools
    npz + meta.json (reference .parts convention)."""
    import json
    import os

    if gen.pools is None:
        raise RuntimeError("fit() first")
    os.makedirs(path, exist_ok=True)
    gen.model.save(os.path.join(path, "regime_model.json"))
    arrays = {
        f"pool_{r}_{i}": blk
        for r, blocks in gen.pools.items()
        for i, blk in enumerate(blocks)
    }
    np.savez(os.path.join(path, "pools.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "min_block": gen.min_block,
                "max_blocks": gen.max_blocks,
                "lam": gen.lam,
                "smoothing": gen.smoothing,
                "overlap": gen.overlap,
                "p0": gen.p0,
                "pool_counts": {str(r): len(b) for r, b in gen.pools.items()},
                "format_version": 1,
            },
            f,
        )


def load_hybrid(path: str) -> RegimeBootstrapHybrid:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    model = RegimeModel.load(os.path.join(path, "regime_model.json"))
    gen = RegimeBootstrapHybrid(
        model,
        min_block=meta["min_block"],
        max_blocks_per_regime=meta["max_blocks"],
        lam=meta["lam"],
        smoothing=meta["smoothing"],
        overlap=meta["overlap"],
        p0=meta["p0"],
    )
    z = np.load(os.path.join(path, "pools.npz"))
    gen.pools = {
        int(r): [z[f"pool_{r}_{i}"] for i in range(n)]
        for r, n in meta["pool_counts"].items()
    }
    return gen
