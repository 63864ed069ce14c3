"""Generator invariants — the reference's hardest contract (SURVEY §4.2):
same seed ⇒ identical output, different seed ⇒ different output, and —
stricter than the reference — identical under different partitioning.
(reference: tests/test_plugins.py:74-83)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from synthetic_datagen_spark.generators import (
    BlockBootstrapGenerator,
    GrasyndaGenerator,
    derive_seed,
)
from synthetic_datagen_spark.sources import Catalog


def _train(spark, sf_smoke):
    ev = Catalog(spark, sf_smoke).table("events")
    return ev.filter(F.col("event_type") == "click").select("ts", "event_id", "value")


def _rows(df):
    return sorted((r.series_id, r.t, round(r.price, 9)) for r in df.collect())


def test_derive_seed_stable_and_spread():
    a = derive_seed(42, 0, 1)
    assert a == derive_seed(42, 0, 1)
    assert a != derive_seed(42, 0, 2)
    assert a != derive_seed(43, 0, 1)
    seen = {derive_seed(42, i) % 997 for i in range(200)}
    assert len(seen) > 150  # well-spread


def test_block_bootstrap_determinism(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = BlockBootstrapGenerator(block_size=20).fit(t, "value", ["ts", "event_id"])
    a = _rows(g.generate(spark, 42, 120, n_series=3))
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = _rows(g.generate(spark, 42, 120, n_series=3))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b, "same seed must be partition-independent"
    c = _rows(g.generate(spark, 99, 120, n_series=3))
    assert a != c, "different seed must differ"


def test_block_bootstrap_chain_continuity(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    bs = 20
    g = BlockBootstrapGenerator(block_size=bs).fit(t, "value", ["ts", "event_id"])
    out = g.generate(spark, 7, 100, n_series=2).collect()
    by_series = {}
    for r in out:
        by_series.setdefault(r.series_id, {})[r.t] = r.price
    for sid, series in by_series.items():
        assert len(series) == 100
        for t0 in range(bs, 100, bs):
            # block start price must equal previous block's end ratio chain
            prev_last, cur_first = series[t0 - 1], series[t0]
            assert math.isclose(prev_last, cur_first, rel_tol=1e-9), (
                f"series {sid} discontinuous at {t0}: {prev_last} vs {cur_first}"
            )
        assert all(p > 0 for p in series.values())


def test_block_bootstrap_values_from_training_shape(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = BlockBootstrapGenerator(block_size=20).fit(t, "value", ["ts", "event_id"])
    out = g.generate(spark, 42, 200, n_series=2)
    # log-return std of synthetic should be same order as training
    from synthetic_datagen_spark.functions import timeseries as TS

    syn = TS.log_returns(out, "price", ["series_id"], ["t"])
    real = TS.log_returns(t, "value", [], ["ts", "event_id"])
    s = syn.agg(F.stddev_pop("log_ret")).first()[0]
    r = real.agg(F.stddev_pop("log_ret")).first()[0]
    assert 0.3 * r < s < 3.0 * r


def test_grasynda_determinism_and_moments(spark, sf_smoke):
    t = _train(spark, sf_smoke)
    g = GrasyndaGenerator(n_states=6).fit(t, "value", ["ts", "event_id"])
    a = _rows(g.generate(spark, 42, 150, n_series=3))
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = _rows(g.generate(spark, 42, 150, n_series=3))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b
    c = _rows(g.generate(spark, 1, 150, n_series=3))
    assert a != c
    raw = g.generate(spark, 42, 150, n_series=3).collect()
    assert all(r.price > 0 for r in raw)
    # returns are drawn from training pools: synthetic std within 3× band
    from synthetic_datagen_spark.functions import timeseries as TS

    syn_df = g.generate(spark, 42, 150, n_series=3)
    syn = TS.log_returns(syn_df, "price", ["series_id"], ["t"])
    real = TS.log_returns(t, "value", [], ["ts", "event_id"])
    s = syn.agg(F.stddev_pop("log_ret")).first()[0]
    r = real.agg(F.stddev_pop("log_ret")).first()[0]
    assert 0.3 * r < s < 3.0 * r


def test_block_bootstrap_artifact_roundtrip(spark, tmp_path):
    from synthetic_datagen_spark.generators.block_bootstrap import (
        load_block_bootstrap,
        save_block_bootstrap,
    )
    from synthetic_datagen_spark.sources import Catalog
    import pyspark.sql.functions as F

    ev = (
        Catalog(spark, "/root/testdata/sf0.001")
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    gen = BlockBootstrapGenerator(block_size=20).fit(ev, "value", ["ts", "event_id"])
    p = str(tmp_path / "bb.parts")
    save_block_bootstrap(gen, p)
    back = load_block_bootstrap(spark, p)
    a = gen.generate(spark, seed=3, n_samples=80).orderBy("series_id", "t").collect()
    b = back.generate(spark, seed=3, n_samples=80).orderBy("series_id", "t").collect()
    assert [r.price for r in a] == [r.price for r in b]


def test_grasynda_artifact_roundtrip(spark, tmp_path):
    from synthetic_datagen_spark.generators.grasynda import (
        load_grasynda,
        save_grasynda,
    )
    from synthetic_datagen_spark.sources import Catalog
    import pyspark.sql.functions as F

    ev = (
        Catalog(spark, "/root/testdata/sf0.001")
        .table("events")
        .filter(F.col("event_type") == "click")
        .select("ts", "event_id", "value")
    )
    gen = GrasyndaGenerator(n_states=6).fit(ev, "value", ["ts", "event_id"])
    p = str(tmp_path / "gr.parts")
    save_grasynda(gen, p)
    back = load_grasynda(p)
    a = gen.generate(spark, seed=3, n_samples=60).orderBy("series_id", "t").collect()
    b = back.generate(spark, seed=3, n_samples=60).orderBy("series_id", "t").collect()
    assert [r.price for r in a] == [r.price for r in b]


# ----------------------------------------------------- MLP fidelity --
# Round-4 fidelity tier: the reference's tanh-MLP VAE-GAN architecture
# with the Gaussian-kernel MMD term (vae_gan_trainer.py:46-139) —
# analytic numpy gradients checked against central differences, and a
# statistical capability test a linear decoder provably fails.


def _grad_check_entries(m, xb, tb, eps, kl_w, srng, n_per_tensor=6):
    """Max relative error between analytic and central-difference grads
    over sampled entries of every parameter tensor."""
    import numpy as np

    _, _, _, g = m.vae_step_grads(xb, tb, eps, kl_w)
    params = [
        ("enc0", m.enc0, g["enc0"]),
        ("mu_head", m.mu_head, g["mu_head"]),
        ("lv_head", m.lv_head, g["lv_head"]),
        ("out_head", m.out_head, g["out_head"]),
    ]
    params += [(f"enc_rest{i}", lay, g["enc_rest"][i]) for i, lay in enumerate(m.enc_rest)]
    params += [(f"dec{i}", lay, g["dec_hidden"][i]) for i, lay in enumerate(m.dec_hidden)]
    h = 1e-6
    worst = 0.0
    for _, layer, (gW, gb) in params:
        for arr, ana in ((layer[0], gW), (layer[1], gb)):
            for fi in srng.choice(arr.size, size=min(n_per_tensor, arr.size), replace=False):
                ix = np.unravel_index(fi, arr.shape)
                orig = arr[ix]
                arr[ix] = orig + h
                lp = m.vae_step_loss(xb, tb, eps, kl_w)
                arr[ix] = orig - h
                lm = m.vae_step_loss(xb, tb, eps, kl_w)
                arr[ix] = orig
                num = (lp - lm) / (2 * h)
                worst = max(worst, abs(num - ana[ix]) / max(1e-8, abs(num) + abs(ana[ix])))
    return worst


def test_mlp_vae_gradient_check():
    """Analytic VAE-step gradients (recon + KL + MMD through the tanh
    stacks) match central differences to ~1e-6, plain and conditional."""
    import numpy as np

    from synthetic_datagen_spark.ml.vae import MlpVae

    rng = np.random.default_rng(2)
    xb = rng.normal(0, 1, (6, 5))
    eps = rng.standard_normal((6, 3))
    srng = np.random.default_rng(3)

    m = MlpVae(window_rows=5, latent_dim=3, hidden=(7, 4), mmd_lambda=1e-2, train_seed=1)
    m.init_params()
    assert _grad_check_entries(m, xb, None, eps, 1e-3, srng) < 1e-5

    mc = MlpVae(
        window_rows=5, latent_dim=3, hidden=(7, 4), mmd_lambda=1e-2,
        n_temporal=6, train_seed=1,
    )
    mc.init_params()
    tb = np.random.default_rng(5).normal(0, 1, (6, 6))
    assert _grad_check_entries(mc, xb, tb, eps, 1e-3, srng) < 1e-5


def test_mmd_estimator_properties():
    """MMD² ≈ 0 for same-distribution batches, large for shifted ones,
    and symmetric-positive (reference vae_gan_trainer.py:131-139)."""
    import numpy as np

    from synthetic_datagen_spark.ml.mlp import mmd_and_grad

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (64, 8))
    b = rng.normal(0, 1, (64, 8))
    c = rng.normal(3, 1, (64, 8))
    same, _ = mmd_and_grad(a, b)
    far, _ = mmd_and_grad(a, c)
    assert 0.0 <= same < 0.05
    assert far > 10 * same


def test_mlp_gan_learns_bimodal_linear_cannot():
    """Capability split: windows cluster at ±1; a linear generator's
    output is exactly Gaussian per coordinate so it must fill the
    mid-gap, while the tanh-MLP generator empties it (deterministic
    seeds — exact values pinned by the rng stream)."""
    import numpy as np

    from synthetic_datagen_spark.ml.gan import LinearGan, MlpGan

    rng = np.random.default_rng(7)
    sign = rng.choice([-1.0, 1.0], size=(2048, 1))
    X = sign + rng.normal(0, 0.05, (2048, 4))

    lin = LinearGan(window_rows=4, latent_dim=4, epochs=60, train_seed=1).fit(X)
    w, b = lin.generator_weights()
    z = np.random.default_rng(2).standard_normal((4096, 4))
    lin_mid = float(np.mean(np.abs((z @ w + b).ravel()) < 0.5))

    mlp = MlpGan(
        window_rows=4, latent_dim=4, hidden=(16, 16), epochs=60,
        lr=2e-2, disc_lr=5e-3, train_seed=1,
    ).fit(X)
    mlp_mid = float(np.mean(np.abs(mlp.sample(4096, 2).ravel()) < 0.5))

    assert lin_mid > 0.45  # Gaussian must put mass in the gap
    assert mlp_mid < 0.30  # the MLP empties it
    assert mlp_mid < lin_mid * 0.6


def test_mlp_decoder_save_load_and_conditional_decode(tmp_path):
    """v3 artifact round-trip preserves the forward pass bit-exactly,
    conditional included; meta carries the reference's conditional /
    n_temporal keys (vae_gan_trainer.py:339-345)."""
    import json
    import numpy as np

    from synthetic_datagen_spark.ml.decoder import MlpDecoder, load_decoder, save_decoder
    from synthetic_datagen_spark.ml.mlp import dense_init

    rng = np.random.default_rng(4)
    hidden = [dense_init(rng, 3 + 6, 10), dense_init(rng, 10, 12)]
    out = dense_init(rng, 12, 8)
    dec = MlpDecoder(latent_dim=3, window_rows=8, hidden=hidden, out_head=out, n_temporal=6)
    p = str(tmp_path / "mlp.parts")
    save_decoder(dec, p)
    with open(p + "/meta.json") as f:
        meta = json.load(f)
    assert meta["conditional"] is True and meta["n_temporal"] == 6
    back = load_decoder(p)
    z = rng.standard_normal((5, 3))
    t = rng.standard_normal((5, 6))
    assert np.array_equal(dec.decode(z, t), back.decode(z, t))
    assert np.array_equal(dec.flat_weights(), back.flat_weights())


def test_conditional_vae_train_generate_roundtrip(spark, sf_smoke, tmp_path):
    """G2 conditional path (typical_price_generator.py:120-136): train a
    conditional VAE-GAN on real event series, save/load the artifact,
    and generate — same seed ⇒ identical, different start date ⇒
    different windows (the temporal conditioning is live)."""
    import numpy as np

    from synthetic_datagen_spark.ml import VaeGanTrainer
    from synthetic_datagen_spark.ml.decoder import load_decoder, save_decoder

    src = _train(spark, sf_smoke).select("ts", "value")
    tr = VaeGanTrainer(
        window_rows=16, latent_dim=8, epochs=6, train_seed=42, conditional=True,
    )
    tr.prepare([src], "value", "ts")
    dec = tr.fit()
    assert dec.n_temporal == 6

    p = str(tmp_path / "cond.parts")
    save_decoder(dec, p)
    back = load_decoder(p)
    pool = np.linspace(50.0, 150.0, 100)

    a = back.generate(spark, pool, seed=3, n_samples=48, start_dt="2021-03-01 00:00:00")
    b = back.generate(spark, pool, seed=3, n_samples=48, start_dt="2021-03-01 00:00:00")
    c = back.generate(spark, pool, seed=3, n_samples=48, start_dt="2021-09-01 12:00:00")
    ra = [r.price for r in a.orderBy("series_id", "t").collect()]
    rb = [r.price for r in b.orderBy("series_id", "t").collect()]
    rc = [r.price for r in c.orderBy("series_id", "t").collect()]
    assert ra == rb            # deterministic in (model, seed, start)
    assert ra != rc            # season-aware: start date changes output
    assert all(np.isfinite(v) and v > 0 for v in ra)

    # retrain determinism with conditioning on
    tr2 = VaeGanTrainer(
        window_rows=16, latent_dim=8, epochs=6, train_seed=42, conditional=True,
    )
    tr2.prepare([src.repartition(5)], "value", "ts")
    dec2 = tr2.fit()
    assert np.array_equal(dec.flat_weights(), dec2.flat_weights())


def test_disc_bce_update_is_single_combined_step():
    """The discriminator step must apply ONE update whose gradient is
    evaluated entirely at the pre-step parameters (the reference
    computes both BCE halves inside one GradientTape —
    gan_trainer.py:77-88). Sequential per-half stepping would leave
    different weights."""
    import numpy as np
    from synthetic_datagen_spark.ml.mlp import (
        dense_init, disc_bce_update, lrelu_stack_backward,
        lrelu_stack_forward, sgd_step,
    )
    from synthetic_datagen_spark.ml.vae import _sigmoid

    rng = np.random.default_rng(7)
    layers = [dense_init(rng, 6, 8), dense_init(rng, 8, 4)]
    head = dense_init(rng, 4, 1)
    xb = rng.standard_normal((16, 6))
    fake = rng.standard_normal((16, 6))
    hr, acts_r, _ = lrelu_stack_forward(xb, layers)
    pr = _sigmoid((hr @ head[0] + head[1])[:, 0])
    hf, acts_f, _ = lrelu_stack_forward(fake, layers)
    pf = _sigmoid((hf @ head[0] + head[1])[:, 0])
    # expected: sum both halves' grads at CURRENT params, one step
    exp_layers = [[W.copy(), b.copy()] for W, b in layers]
    exp_head = [head[0].copy(), head[1].copy()]
    B = len(xb)
    tot = None
    tot_head = None
    for p, target, acts in ((pr, 1.0, acts_r), (pf, 0.0, acts_f)):
        ds = (0.5 * (p - target) / B)[:, None]
        gh = (acts[-1].T @ ds, ds.sum(axis=0))
        _, gl = lrelu_stack_backward(ds @ exp_head[0].T, acts, exp_layers)
        if tot is None:
            tot, tot_head = gl, gh
        else:
            tot = [(a0 + b0, a1 + b1) for (a0, a1), (b0, b1) in zip(tot, gl)]
            tot_head = (tot_head[0] + gh[0], tot_head[1] + gh[1])
    sgd_step(exp_layers, tot, 0.1)
    sgd_step([exp_head], [tot_head], 0.1)
    d_loss = disc_bce_update(pr, acts_r, pf, acts_f, layers, head, 0.1)
    for (W, b), (eW, eb) in zip(layers, exp_layers):
        np.testing.assert_allclose(W, eW, rtol=1e-12)
        np.testing.assert_allclose(b, eb, rtol=1e-12)
    np.testing.assert_allclose(head[0], exp_head[0], rtol=1e-12)
    assert d_loss > 0.0


def test_disc_dropout_gradient_check_and_determinism():
    """Seeded inverted dropout (reference vae_gan_trainer.py:122:
    Dropout(disc_dropout=0.3) after each LeakyReLU, shared by the GAN
    trainer via _build_discriminator): analytic backward matches
    central differences under FIXED masks, inference (rng=None) applies
    no dropout, and same-seed training stays bit-identical."""
    import numpy as np

    from synthetic_datagen_spark.ml.gan import MlpGan
    from synthetic_datagen_spark.ml.mlp import (
        dense_init, lrelu_stack_backward, lrelu_stack_forward,
    )

    rng = np.random.default_rng(11)
    layers = [dense_init(rng, 5, 7), dense_init(rng, 7, 4)]
    x = rng.standard_normal((6, 5))
    h, acts, scales = lrelu_stack_forward(
        x, layers, dropout=0.3, rng=np.random.default_rng(99)
    )
    assert scales is not None and any((s == 0).any() for s in scales)
    # replaying with the captured masks reproduces the forward exactly
    h2, _, _ = lrelu_stack_forward(x, layers, scales=scales)
    np.testing.assert_array_equal(h, h2)
    # inference path: no rng → identity dropout
    h_inf, _, sc_inf = lrelu_stack_forward(x, layers, dropout=0.3, rng=None)
    assert sc_inf is None
    h_plain, _, _ = lrelu_stack_forward(x, layers)
    np.testing.assert_array_equal(h_inf, h_plain)

    # gradient check: loss = sum(forward(x)) under the FIXED masks
    dx, grads = lrelu_stack_backward(np.ones_like(h), acts, layers, scales=scales)

    def loss() -> float:
        hh, _, _ = lrelu_stack_forward(x, layers, scales=scales)
        return float(hh.sum())

    eps = 1e-6
    worst = 0.0
    params = [p for layer in layers for p in layer] + [x]
    analytic = [g for gW, gb in grads for g in (gW, gb)] + [dx]
    for arr, g in zip(params, analytic):
        flat = arr.ravel()
        for idx in range(0, flat.size, max(1, flat.size // 5)):
            old = flat[idx]
            flat[idx] = old + eps
            up = loss()
            flat[idx] = old - eps
            dn = loss()
            flat[idx] = old
            num = (up - dn) / (2 * eps)
            worst = max(worst, abs(num - g.ravel()[idx]) / (abs(num) + 1e-8))
    assert worst < 1e-5

    # same-seed GAN training (dropout active by default) is bit-identical
    rngX = np.random.default_rng(7)
    X = rngX.choice([-1.0, 1.0], size=(256, 1)) + rngX.normal(0, 0.05, (256, 4))
    g1 = MlpGan(window_rows=4, latent_dim=4, hidden=(8,), disc_hidden=(8,),
                epochs=3, train_seed=5).fit(X)
    g2 = MlpGan(window_rows=4, latent_dim=4, hidden=(8,), disc_hidden=(8,),
                epochs=3, train_seed=5).fit(X)
    assert g1.disc_dropout == 0.3
    assert g1.d_loss_history == g2.d_loss_history
    for (Wa, ba), (Wb, bb) in zip(g1.gen_hidden, g2.gen_hidden):
        np.testing.assert_array_equal(Wa, Wb)
        np.testing.assert_array_equal(ba, bb)


def test_counter_rng_matches_scalar_derive_seed():
    """splitmix64_vec is derive_seed bit-for-bit over arrays — the
    counter-based draw contract the online tick kernel relies on for
    micro-batch invariance (streaming/stateful.py)."""
    import numpy as np

    from synthetic_datagen_spark.generators.seeds import (
        counter_normals,
        counter_uniforms,
        splitmix64_vec,
    )

    steps = np.arange(1, 500, dtype=np.uint64)
    vec = splitmix64_vec(42, 7, steps, 2)
    for i in (0, 1, 17, 498):
        assert int(vec[i]) == derive_seed(42, 7, int(steps[i]), 2)

    u = counter_uniforms(42, 7, steps, 2)
    assert (u > 0).all() and (u <= 1).all()
    # a batch draw equals the concatenation of two half-span draws —
    # the exact micro-batch-boundary invariance property
    u_a = counter_uniforms(42, 7, steps[:250], 2)
    u_b = counter_uniforms(42, 7, steps[250:], 2)
    assert np.array_equal(u, np.concatenate([u_a, u_b]))
    z = counter_normals(42, 7, steps)
    z2 = np.concatenate([counter_normals(42, 7, steps[:100]),
                         counter_normals(42, 7, steps[100:])])
    assert np.array_equal(z, z2)
    assert abs(float(z.mean())) < 0.15 and abs(float(z.std()) - 1.0) < 0.15


def test_summary_twins_bit_deterministic_across_partitioning(spark, sf_smoke):
    """The pinned-oracle summary twins (r9 VERDICT task 5) must be
    BIT-deterministic under any shuffle layout: every aggregate they
    use is order-free (count / min / max / DECIMAL-summed rounded
    values), so two runs under different shuffle.partitions must
    collect identical rows — the precondition for pinning their
    literal values at the gate scale."""
    from synthetic_datagen_spark.operators import REGISTRY

    names = ["g4_bootstrap_summary", "g5_grasynda_summary", "g9_stitch_summary"]

    def runs(parts: str):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            return {
                n: sorted(map(tuple, REGISTRY[n].build(spark, sf_smoke).collect()))
                for n in names
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    a, b = runs("5"), runs("13")
    for n in names:
        assert a[n] == b[n], n
        assert a[n], f"{n}: empty summary"


def test_generator_walk_memo_matches_fresh_build(spark, sf_smoke):
    """r14: the session-memoized g4/g5 walks (shared with their summary
    twins) must be row-identical to a fresh un-memoized build."""
    from synthetic_datagen_spark.generators import (
        BlockBootstrapGenerator,
        GrasyndaGenerator,
    )
    from synthetic_datagen_spark.operators import REGISTRY
    from synthetic_datagen_spark.operators.generator_queries import _train_series

    src = _train_series(spark, sf_smoke)
    fresh = {
        "g4_block_bootstrap": BlockBootstrapGenerator(block_size=25)
        .fit(src, "value", ["ts", "event_id"])
        .generate(spark, seed=42, n_samples=200, n_series=4),
        "g5_grasynda": GrasyndaGenerator(n_states=8)
        .fit(src, "value", ["ts", "event_id"])
        .generate(spark, seed=42, n_samples=200, n_series=4),
    }
    for name, f in fresh.items():
        memo = REGISTRY[name].build(spark, sf_smoke)
        a = sorted(map(tuple, f.collect()))
        b = sorted(map(tuple, memo.collect()))
        assert a == b, f"{name}: memoized walk differs from fresh build"
