"""G4 — block bootstrap generator, Spark-first (SURVEY §2.10).

reference: sdg_plugins/generator/block_bootstrap_generator.py:50-103 —
sample contiguous price blocks from the training series, rescale each
block so its first price continues the previous block's last price
(ratio chaining), concatenate, truncate.

Spark design (NOT a port):
  * fit(): one windowed pass marks each training row with
    (block_id, pos) — the blocks table stays distributed.
  * generate(): `spark.range(n_series × n_slots)` picks a block per
    slot via the hash-derived seed (partition-independent), joins the
    blocks table on block_id, and rewrites the reference's sequential
    multiplicative chain  scale_i = Π_j<i  last_j / first_j  as a
    log-space prefix sum — a running window aggregate, fully parallel
    within each generated series.  No applyInPandas, no driver loop:
    generation is ~4 narrow stages + 1 join + 1 window.
  * determinism: block choice = splitmix64(seed, series_id, slot); no
    rand(), no partition sensitivity (tests vary shuffle partitions).

At 100 TB: blocks table partitions by block_id (the join key), the
slot table is tiny, and the window partitions by generated series —
both axes scale with cluster width.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from .seeds import seed_col


class BlockBootstrapGenerator:
    """Training-free block-bootstrap sampler.

    Parameters mirror the reference (block_size default 30 ≈ one
    trading week of 4 h bars, block_bootstrap_generator.py:12).
    """

    def __init__(self, block_size: int = 30):
        self.block_size = block_size
        self.blocks: DataFrame | None = None
        self.n_blocks: int | None = None

    # ---------------------------------------------------------- fit --
    def fit(
        self,
        df: DataFrame,
        value_col: str,
        order_cols: list[str],
        series_col: str | None = None,
    ) -> "BlockBootstrapGenerator":
        """Index the training series into non-overlapping blocks.

        With a series column, blocks from all series pool together
        (block ids are global), matching the reference's single pool.

        NO unpartitioned window in either path (plan-pinned,
        tests/test_plans.py): row indexing uses the range-partitioned
        distributed index (functions/indexing.py) when there is no
        series column, and dense global block ids come from per-series
        full-block counts prefix-summed over the (one-row-per-series)
        counts frame — never from a row_number over the block list.
        """
        bs = self.block_size
        if series_col:
            w = Window.partitionBy(series_col).orderBy(*order_cols)
            d = df.select(
                series_col,
                F.col(value_col).alias("price"),
                (F.row_number().over(w) - 1).alias("_i"),
            )
        else:
            from ..functions.indexing import with_global_index

            d = with_global_index(
                df.select(F.col(value_col).alias("price"), *order_cols),
                list(order_cols),
            ).select("price", "_i")
        d = d.withColumn("local_block", F.floor(F.col("_i") / bs)).withColumn(
            "pos", F.col("_i") % bs
        )
        if series_col:
            # _i is dense per series, so blocks 0..k-1 are full and only
            # the tail block can be partial: k = floor(count / bs);
            # global id = prefix-sum of preceding series' k + local id
            from ..functions.indexing import with_prefix_sum

            counts = d.groupBy(series_col).agg(
                F.floor(F.count("*") / bs).alias("_k")
            )
            offs = with_prefix_sum(counts, [series_col], "_k", "_off")
            self.blocks = (
                d.join(F.broadcast(offs), series_col)
                .filter(F.col("local_block") < F.col("_k"))
                .select(
                    (F.col("_off") + F.col("local_block")).alias("block_id"),
                    "pos",
                    "price",
                )
                .persist()
            )
            self.n_blocks = int(
                counts.agg(F.sum("_k")).first()[0] or 0
            )
        else:
            n_rows = d.count()
            k = n_rows // bs
            self.blocks = (
                d.filter(F.col("local_block") < k)
                .select(F.col("local_block").alias("block_id"), "pos", "price")
                .persist()
            )
            self.n_blocks = int(k)
        return self

    # ----------------------------------------------------- generate --
    def generate(self, spark, seed: int, n_samples: int, n_series: int = 1) -> DataFrame:
        """Seed-deterministic synthetic series.

        Returns (series_id, t, price); same (seed, params) ⇒ identical
        rows under any partitioning; different seed ⇒ different draws
        (reference contract tests/test_plugins.py:74-83).
        """
        if self.blocks is None or not self.n_blocks:
            raise RuntimeError("fit() first")
        n_slots = math.ceil(n_samples / self.block_size)
        slots = (
            spark.range(n_series * n_slots)
            .select(
                (F.col("id") / n_slots).cast("long").alias("series_id"),
                (F.col("id") % n_slots).alias("slot"),
            )
            .withColumn(
                "block_id",
                F.pmod(seed_col(seed, F.col("series_id"), F.col("slot")), F.lit(self.n_blocks)),
            )
        )
        picked = slots.join(self.blocks, "block_id")
        sw = Window.partitionBy("series_id").orderBy("slot", "pos")
        # per-(series,slot) first/last prices for the ratio chain
        bw = Window.partitionBy("series_id", "slot")
        d = (
            picked.withColumn("first_p", F.min(F.struct("pos", "price")).over(bw)["price"])
            .withColumn("last_p", F.max(F.struct("pos", "price")).over(bw)["price"])
        )
        # scale_i = Π_{j<i} last_j/first_j  →  exp(Σ log ratio) over
        # preceding slots; implemented as running sum minus own term.
        log_ratio = F.log(F.col("last_p")) - F.log(F.col("first_p"))
        slot_w = (
            Window.partitionBy("series_id")
            .orderBy("slot", "pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # running sum of per-row "slot-start marker × log_ratio" gives the
        # chain up to and including the current slot; subtract the
        # current slot's own contribution to get strictly-preceding.
        marker = F.when(F.col("pos") == 0, log_ratio).otherwise(F.lit(0.0))
        d = d.withColumn("chain", F.sum(marker).over(slot_w) - log_ratio)
        # output price: block price re-anchored at its own first price,
        # then chained: p·(first_0/first_i)·Π_{j<i}(last_j/first_j)
        first0 = F.first("first_p").over(sw.rowsBetween(Window.unboundedPreceding, 0))
        d = d.withColumn("t", F.row_number().over(sw) - 1).filter(F.col("t") < n_samples)
        out_price = F.exp(
            F.log("price") - F.log("first_p") + F.col("chain") + F.log(first0)
        )
        return d.select("series_id", "t", out_price.alias("price"))


# ---------------------------------------------------------- artifacts --
def save_block_bootstrap(gen: BlockBootstrapGenerator, path: str) -> None:
    """S5 `.parts/` layout: the (distributed) blocks table as parquet +
    meta.json (reference: typical_price_generator.py:186-206 — model
    payload beside metadata; here the payload IS a table, so it stays
    a parquet dataset and reloads partitioned)."""
    import json
    import os

    if gen.blocks is None:
        raise RuntimeError("fit() first")
    os.makedirs(path, exist_ok=True)
    gen.blocks.write.mode("overwrite").parquet(os.path.join(path, "blocks.parquet"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {"block_size": gen.block_size, "n_blocks": gen.n_blocks,
             "format_version": 1},
            f,
        )


def load_block_bootstrap(spark, path: str) -> BlockBootstrapGenerator:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    gen = BlockBootstrapGenerator(block_size=meta["block_size"])
    gen.blocks = spark.read.parquet(os.path.join(path, "blocks.parquet")).persist()
    gen.n_blocks = meta["n_blocks"]
    return gen
