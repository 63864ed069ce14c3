"""Generator queries (SURVEY §2.10) — rows-only driver checks (the
generators are not SQL-expressible; their invariants are covered by
tests/test_generators.py: seed determinism under repartitioning,
chain continuity, moment fidelity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..generators import BlockBootstrapGenerator, GrasyndaGenerator
from ..sources import Catalog
from .base import pinned_parquet_oracle, register


def _train_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return ev.filter(F.col("event_type") == "click").select("ts", "event_id", "value")


@register(
    "g4_block_bootstrap",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): window-free hash-seeded block choice and
    # log-ratio chaining are per-row deterministic. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    oracle=pinned_parquet_oracle("g4_block_bootstrap"),
    pinned_sf="0.01",
    doc="G4 block bootstrap: windowed block indexing + hash-seeded block "
    "choice + log-space ratio chaining (no applyInPandas, no driver "
    "loop) — reference: block_bootstrap_generator.py:50-103.",
)
def g4_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session memo (r14, guide §2.4 — the kNN-panel discipline): the
    # walk is deterministic in (corpus, seed) and its summary twin
    # re-ran the whole fit+generate chain; one checkpointed build per
    # session serves both queries, and a memo hit returns the SAME
    # checkpointed frame (identical rows, identical order).
    from ..functions.vectors import cached_lsh_pairs

    def build() -> DataFrame:
        gen = BlockBootstrapGenerator(block_size=25).fit(
            _train_series(spark, sf_dir), "value", ["ts", "event_id"]
        )
        return gen.generate(spark, seed=42, n_samples=200, n_series=4)

    return cached_lsh_pairs(spark, ("gen_walk", "g4_bb25", sf_dir), build)


@register(
    "g5_grasynda",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): per-series splitmix64 walk inside one grouped-map
    # task is layout-independent by construction. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    oracle=pinned_parquet_oracle("g5_grasynda"),
    pinned_sf="0.01",
    doc="G5 Grasynda graph walk: DataFrame-built quantile states + "
    "transition matrix, per-series applyInPandas walk with "
    "splitmix64(seed, series_id) RNG — reference: "
    "grasynda_generator.py:53-149.",
)
def g5_grasynda(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session memo shared with g5_grasynda_summary (see g4 note)
    from ..functions.vectors import cached_lsh_pairs

    def build() -> DataFrame:
        gen = GrasyndaGenerator(n_states=8).fit(
            _train_series(spark, sf_dir), "value", ["ts", "event_id"]
        )
        return gen.generate(spark, seed=42, n_samples=200, n_series=4)

    return cached_lsh_pairs(spark, ("gen_walk", "g5_gr8", sf_dir), build)


# Pinned literal-VALUES oracles captured at sf0.01 by tools/pin_oracles.py
# (r9 VERDICT task 5). The summaries are bit-deterministic: every aggregate
# is order-free and the generators are partition-invariant by contract
# (tests/test_generators.py). Regenerate with the tool if the fixture or
# generator seeds ever change.
_PIN_G4_SUMMARY = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(971.635878804 AS DOUBLE), CAST(0.181166002 AS DOUBLE), CAST(12193.00961271 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(771.43340736 AS DOUBLE), CAST(0.016265576 AS DOUBLE), CAST(1478.111658028 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(406.00687974 AS DOUBLE), CAST(0.011569358 AS DOUBLE), CAST(191.59 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(1049.364301271 AS DOUBLE), CAST(0.02641286 AS DOUBLE), CAST(187684.893537591 AS DOUBLE))
) AS t("series_id", "n_rows", "t_min", "t_max", "sum_log_price", "price_min", "price_max")
"""

_PIN_G5_SUMMARY = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(3589.138020734 AS DOUBLE), CAST(3.078282496 AS DOUBLE), CAST(414016185922.3731 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(-3157.729167512 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(12.31 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(3314.895291563 AS DOUBLE), CAST(2.619820513 AS DOUBLE), CAST(26239569030426.57 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(200 AS BIGINT), CAST(0 AS BIGINT), CAST(199 AS BIGINT), CAST(1884.336402241 AS DOUBLE), CAST(0.002713904 AS DOUBLE), CAST(19209447485407.133 AS DOUBLE))
) AS t("series_id", "n_rows", "t_min", "t_max", "sum_log_price", "price_min", "price_max")
"""


def _series_summary(walk: DataFrame) -> DataFrame:
    """Order-free per-series summary of a generated (series_id, t,
    price) walk, built only from merge-order-safe aggregates so the
    output is bit-deterministic and PINNABLE as a literal-VALUES
    oracle (the r9 JPEG/AVI summary-twin trick): counts and min/max
    are order-free by algebra; the price mass sums as ROUND(ln(p), 9)
    cast to DECIMAL(18,9) — exact, associative — and converts to
    DOUBLE only once at the end. Plain SUM(DOUBLE) would flake under
    shuffle-merge order and is exactly why g9 stayed unpinned in r9."""
    logp = F.round(F.log("price"), 9).cast("decimal(18,9)")
    return (
        walk.groupBy("series_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("t").alias("t_min"),
            F.max("t").alias("t_max"),
            F.sum(logp).cast("double").alias("sum_log_price"),
            F.round(F.min("price"), 9).alias("price_min"),
            F.round(F.max("price"), 9).alias("price_max"),
        )
        .orderBy("series_id")
    )


@register(
    "g4_bootstrap_summary",
    oracle=_PIN_G4_SUMMARY,  # pinned values, sf0.01 (see note above)
    pinned_sf="0.01",
    doc="Value-oracled twin of g4_block_bootstrap (r9 VERDICT task 5): "
    "the same seeded generation reduced to an order-free per-series "
    "panel (row counts, t range, DECIMAL-summed log prices, price "
    "extremes) whose literal values are pinned at the sf0.01 gate "
    "scale — the generator itself is partition-invariant by contract, "
    "so the summary is a pure function of (seed, fit data).",
)
def g4_bootstrap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _series_summary(g4_block_bootstrap(spark, sf_dir))


@register(
    "g5_grasynda_summary",
    oracle=_PIN_G5_SUMMARY,  # pinned values, sf0.01 (see note above)
    pinned_sf="0.01",
    doc="Value-oracled twin of g5_grasynda — same order-free summary "
    "panel as g4_bootstrap_summary over the Grasynda walk.",
)
def g5_grasynda_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _series_summary(g5_grasynda(spark, sf_dir))


@register(
    "g1_g3_latent_decode_generate",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): seeded latent sampling + broadcast
    # decode are per-window deterministic. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    # r14: prices quantize to 6 significant digits at the output
    # boundary (the d6 absorption pattern, r13 VERDICT item 2) so the
    # documented ≤1.1e-14 OpenBLAS-dispatch drift on host migration
    # can no longer flip the pinned cells.
    oracle=pinned_parquet_oracle("g1_g3_latent_decode_generate"),
    pinned_sf="0.01",
    doc="G1→G2→G3 deep-generator inference chain with the stand-in "
    "linear decoder: per-window seeded latent sampling, broadcast-"
    "weights mapInPandas decode, zero-mean + seeded anchor-price window "
    "reconstruction (reference: typical_price_generator.py:88-159). A "
    "trained Keras decoder drops into the same plan.",
)
def g1_g3_latent_decode_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..ml import LinearDecoder

    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("event_type") == "view")
        .select("value")
        .limit(2000)
    )
    pool = np.array([r[0] for r in ev.collect()], dtype=float)
    dec = LinearDecoder(latent_dim=16, window_rows=32, model_seed=7)
    return dec.generate(
        spark, pool, seed=42, n_samples=256, n_series=4, quantize_sig=6
    )


@register(
    "g2_conditional_train_generate",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): numpy SGD trains on a driver-ordered
    # window matrix; generation is seeded. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    # r14: prices quantize to 6 significant digits at the output
    # boundary (pin-hardening, r13 VERDICT item 2; see
    # g1_g3_latent_decode_generate).
    oracle=pinned_parquet_oracle("g2_conditional_train_generate"),
    pinned_sf="0.01",
    doc="G2 CONDITIONAL decode path (reference: "
    "typical_price_generator.py:120-136 + vae_gan_trainer.py:64-94): "
    "a conditional tanh-MLP VAE-GAN trains on windows with the 6 "
    "cyclical features of each window's last timestamp "
    "(prep.py temporal_features), then generation concatenates the "
    "generated date-range's features onto z inside the mapInPandas "
    "decode — season-aware output, deterministic in "
    "(data, train_seed, seed, start_dt).",
)
def g2_conditional_train_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..ml import VaeGanTrainer

    src = _train_series(spark, sf_dir).select("ts", "value")
    tr = VaeGanTrainer(
        window_rows=32, latent_dim=16, epochs=6, train_seed=42, conditional=True,
    )
    tr.prepare([src], "value", "ts")
    dec = tr.fit()
    pool = np.array(
        [r[0] for r in src.select("value").limit(2000).collect()], dtype=float
    )
    return dec.generate(
        spark, pool, seed=42, n_samples=256, n_series=4,
        start_dt="2021-03-01 00:00:00", quantize_sig=6,
    )


@register(
    "m1_vae_train_generate",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): numpy SGD trains on a driver-ordered window
    # matrix; generation is seeded. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    # r14: prices quantize to 6 significant digits at the output
    # boundary (pin-hardening, r13 VERDICT item 2; see
    # g1_g3_latent_decode_generate).
    oracle=pinned_parquet_oracle("m1_vae_train_generate"),
    pinned_sf="0.01",
    doc="M1 end-to-end train→generate: Spark-prepared return windows "
    "(S2→W1→W3) feed the numpy-SGD tanh-MLP VAE-GAN (analytic "
    "gradients through the reference's Dense stacks + Gaussian-kernel "
    "MMD term, VAE + discriminator + generator-adversarial steps per "
    "batch — reference: vae_gan_trainer.py:46-139,220-309); the fitted "
    "MLP decoder broadcasts into the G1-G3 mapInPandas generate plan. "
    "Deterministic in (data, train_seed, generate seed) — tests pin "
    "retrain-equality under repartitioning and gradient-check the "
    "backprop.",
)
def m1_vae_train_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..ml import VaeGanTrainer

    src = _train_series(spark, sf_dir).select("ts", "value")
    tr = VaeGanTrainer(window_rows=32, latent_dim=16, epochs=10, train_seed=42)
    tr.prepare([src], "value", "ts")
    dec = tr.fit()
    pool = np.array(
        [r[0] for r in src.select("value").limit(2000).collect()], dtype=float
    )
    return dec.generate(
        spark, pool, seed=42, n_samples=256, n_series=4, quantize_sig=6
    )


@register(
    "g11_timegan_train_generate",
    # Parquet-captured pin at sf0.01 (tools/pin_oracles.py
    # --parquet): the 3-phase numpy protocol trains on a
    # driver-ordered window matrix; generation is seeded. Validated
    # bit-identical across independent processes AND across the
    # builder (32 shuffle partitions) vs plain-gate (200) layouts.
    # r14: prices quantize to 6 significant digits at the output
    # boundary (pin-hardening, r13 VERDICT item 2; see
    # g1_g3_latent_decode_generate).
    oracle=pinned_parquet_oracle("g11_timegan_train_generate"),
    pinned_sf="0.01",
    doc="M4+G11 end-to-end TimeGAN: Spark-prepared return windows feed "
    "the numpy 3-phase protocol (autoencoder L1 -> supervised one-step "
    "latent -> joint BCE + 10x supervised + 100x moment loss, per-phase "
    "Adam, early stop with best-weight restore - reference: "
    "timegan_generator.py:321-551, real GRU stacks with numpy BPTT, "
    "reduced-size config for the bench); the trained chain z->G->S->R "
    "broadcasts into the "
    "same mapInPandas generate plan as G1-G3. Deterministic in "
    "(data, train_seed, generate seed).",
)
def g11_timegan_train_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..ml import TimeGanTrainer

    src = _train_series(spark, sf_dir).select("ts", "value")
    tr = TimeGanTrainer(
        window_rows=24, latent_dim=8, hidden_dim=12, n_layers=1, epochs=6,
        epochs_joint=4, train_seed=42, max_windows=512,
    )
    tr.prepare([src], "value", "ts")
    tg = tr.fit()
    pool = np.array(
        [r[0] for r in src.select("value").limit(2000).collect()], dtype=float
    )
    return tg.generate(
        spark, pool, seed=42, n_samples=240, n_series=4, quantize_sig=6
    )
