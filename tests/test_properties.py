"""Property-based tests (hypothesis) for the algebraic invariants the
reference pins with unit tests (SURVEY §5.1): returns↔prices round-trip,
window shape identities, seed-derivation stability, plus pure-kernel
properties of the engine's own primitives."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from synthetic_datagen_spark.evaluators.stationarity import _tau_pvalue
from synthetic_datagen_spark.generators.seeds import derive_seed
from synthetic_datagen_spark.ml.decoder import _splitmix_matrix
from synthetic_datagen_spark.optimize import Gene
from synthetic_datagen_spark.regime.segmentation import _binseg

prices = st.lists(
    st.floats(min_value=1e-3, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=3,
    max_size=200,
)


@given(prices)
@settings(max_examples=200, deadline=None)
def test_returns_price_roundtrip_numpy(ps):
    """exp(cumsum(diff(log p))) · p0 == p — the reference's core identity
    (test_data_processor.py:19-23, rtol 1e-12), numpy form of W1→W2."""
    p = np.array(ps)
    r = np.diff(np.log(p))
    rebuilt = p[0] * np.exp(np.cumsum(r))
    assert np.allclose(rebuilt, p[1:], rtol=1e-9)


@given(st.integers(min_value=0, max_value=2**31 - 1), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_derive_seed_stable_and_spread(base, unit):
    a = derive_seed(base, unit)
    assert a == derive_seed(base, unit)  # pure
    assert 0 <= a < 2**63
    assert a != derive_seed(base, unit + 1)  # unit sensitivity
    assert a != derive_seed(base + 1, unit)  # base sensitivity


@given(
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.floats(min_value=0.1, max_value=5.0),
)
@settings(max_examples=200, deadline=None)
def test_gene_clip_respects_bounds(v, span):
    g = Gene("x", -1.0, -1.0 + span)
    assert g.lo <= g.clip(v) <= g.hi
    gi = Gene("k", 2, 10, "int")
    c = gi.clip(v)
    assert c == int(c) and 2 <= c <= 10


@given(st.floats(min_value=-6, max_value=2, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_tau_pvalue_monotone(stat):
    p = _tau_pvalue(stat)
    assert 0.001 <= p <= 0.999
    assert _tau_pvalue(stat + 0.1) >= p  # larger stat → weaker rejection


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_splitmix_matrix_range_and_determinism(seed):
    m = _splitmix_matrix(seed, 4, 5)
    assert m.shape == (4, 5)
    assert np.all(np.abs(m) <= 1.0)
    assert np.array_equal(m, _splitmix_matrix(seed, 4, 5))


@given(
    st.integers(min_value=3, max_value=40),
    st.floats(min_value=0.5, max_value=3.0),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=100, deadline=None)
def test_binseg_detects_clear_mean_shift(n_half, shift, seed):
    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.normal(0, 0.1, n_half * 10), rng.normal(shift + 1, 0.1, n_half * 10)])
    bounds = _binseg(x, min_size=max(3, n_half), penalty=1.0)
    assert bounds, "clear shift must be found"
    assert any(abs(b - n_half * 10) <= max(3, n_half) for b in bounds)
    # boundaries are interior, sorted, unique
    assert bounds == sorted(set(bounds))
    assert all(0 < b < len(x) for b in bounds)


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_binseg_constant_series_no_split(data):
    n = data.draw(st.integers(min_value=10, max_value=300))
    c = data.draw(st.floats(min_value=-5, max_value=5, allow_nan=False))
    assert _binseg(np.full(n, c), min_size=5, penalty=1e-9) == []


@given(
    st.floats(min_value=3.0, max_value=10.0),
    st.integers(min_value=0, max_value=500),
)
@settings(max_examples=50, deadline=None)
def test_pelt_detects_variance_shift(ratio, seed):
    """PELT with the Gaussian cost must find a clear volatility regime
    switch (the reference's use case: vol-shift boundaries in returns)."""
    from synthetic_datagen_spark.regime.segmentation import _pelt

    rng = np.random.default_rng(seed)
    x = np.concatenate([rng.normal(0, 1.0, 300), rng.normal(0, ratio, 300)])
    bounds = _pelt(x, min_size=30, jump=5, penalty=3.0)
    assert bounds, "clear variance shift must be found"
    assert any(abs(b - 300) <= 30 for b in bounds)
    assert all(b % 5 == 0 for b in bounds), "boundaries live on the jump grid"


@given(st.integers(min_value=0, max_value=300))
@settings(max_examples=30, deadline=None)
def test_pelt_min_size_respected(seed):
    from synthetic_datagen_spark.regime.segmentation import _pelt

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1.0, 400) * np.repeat([1.0, 4.0, 0.5, 2.0], 100)
    bounds = _pelt(x, min_size=40, jump=5, penalty=2.0)
    sp = [0] + bounds + [len(x)]
    assert all(sp[i + 1] - sp[i] >= 40 for i in range(len(sp) - 1))
    assert bounds == _pelt(x, min_size=40, jump=5, penalty=2.0), "deterministic"


def test_pelt_scale_invariant():
    """Gaussian-cost differences are scale-free: scaling the series must
    not move the boundaries (mirrors ruptures' normalized rbf cost)."""
    from synthetic_datagen_spark.regime.segmentation import _pelt

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(0, 0.3, 200), rng.normal(0, 2.0, 200)])
    assert _pelt(x, 30, 5, 3.0) == _pelt(x * 1e-4, 30, 5, 3.0)


def test_ward_separates_obvious_clusters():
    from synthetic_datagen_spark.regime.segmentation import _ward

    feats = np.array(
        [[0.0, 0.1], [0.1, 0.0], [0.05, 0.05], [5.0, 5.1], [5.1, 4.9], [4.9, 5.0]]
    )
    labels = _ward(feats, 2)
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    assert labels[0] != labels[3]
    assert labels[0] == 0, "labels relabeled by first-segment order"


def test_segment_features_match_pandas_skew():
    """Feature rows must match the reference's pandas-skew / corrcoef
    formulas (regime_gan.py:78-86)."""
    from synthetic_datagen_spark.regime.segmentation import _segment_features

    rng = np.random.default_rng(3)
    seg = rng.normal(0.2, 1.5, 97)
    f = _segment_features(seg, [0, len(seg)])[0]
    assert f[0] == pytest.approx(seg.mean())
    assert f[1] == pytest.approx(seg.std())
    assert f[2] == pytest.approx(float(pd.Series(seg).skew()))
    assert f[3] == pytest.approx(float(np.corrcoef(seg[:-1], seg[1:])[0, 1]))
    assert f[4] == pytest.approx(np.log(len(seg)))


def test_window_shape_identity(spark):
    """N rows, window W → N−W+1 full windows (reference
    test_data_processor.py:26-31), checked on a Spark frame."""
    from synthetic_datagen_spark.functions import timeseries as TS

    n, w = 57, 8
    df = spark.createDataFrame([("s", i, float(i)) for i in range(n)], "sid STRING, t LONG, v DOUBLE")
    win = TS.sliding_windows(df, "v", w, ["sid"], ["t"])
    rows = win.orderBy("window_id").collect()
    assert len(rows) == n - w + 1
    assert rows[0]["window_vec"] == [float(i) for i in range(w)]
    assert rows[-1]["window_vec"] == [float(i) for i in range(n - w, n)]


def test_salted_agg_equals_plain_agg(spark):
    """Two-phase salted aggregation must equal the direct groupBy for
    algebraic aggregates, for any salt count."""
    import pyspark.sql.functions as F

    from synthetic_datagen_spark.functions.skew import salted_agg
    from synthetic_datagen_spark.sources import Catalog

    ev = Catalog(spark, "/root/testdata/sf0.001").table("events")
    dec = F.col("value").cast("decimal(12,2)")
    for n_salts in (1, 4, 32):
        got = {
            r.event_type: (r.n, r.s)
            for r in salted_agg(
                ev,
                ["event_type"],
                {
                    "n": (F.count("*"), lambda c: F.sum(c)),
                    "s": (F.sum(dec), lambda c: F.sum(c)),
                },
                n_salts=n_salts,
                salt_on="event_id",
            ).collect()
        }
        want = {
            r.event_type: (r.n, r.s)
            for r in ev.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum(dec).alias("s"))
            .collect()
        }
        assert {k: (v[0], float(v[1])) for k, v in got.items()} == {
            k: (v[0], float(v[1])) for k, v in want.items()
        }, f"n_salts={n_salts}"


def test_transition_counts_laplace_covers_unseen(spark):
    """ADVICE r1: smoothing must reach transitions never observed —
    the dense K x K grid gives them prob laplace/(tot + laplace*K) > 0
    and every row still sums to 1."""
    from synthetic_datagen_spark.functions import stats as ST

    rows = [("u", i, s) for i, s in enumerate(["a", "a", "b", "a", "a", "b"])]
    df = spark.createDataFrame(rows, "user STRING, idx INT, st STRING")
    t = ST.transition_counts(df, "st", ["user"], ["idx"], laplace=1.0).collect()
    got = {(r["state"], r["next_state"]): r for r in t}
    assert len(got) == 4  # dense 2x2 incl. the never-seen b->b
    assert got[("b", "b")]["cnt"] == 0 and got[("b", "b")]["prob"] > 0
    from collections import defaultdict
    sums = defaultdict(float)
    for (s, _), r in got.items():
        sums[s] += r["prob"]
    for s, v in sums.items():
        assert abs(v - 1.0) < 1e-12, (s, v)


# ------------------------------------------------- CC kernel (graph) --
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=12, deadline=None)
def test_min_label_components_matches_union_find(spark, edges):
    """The distributed min-label kernel must agree with a driver-side
    union-find on arbitrary small graphs (components AND canonical min
    labels) — INCLUDING self-loop pairs (a, a), which a raw similarity
    join naturally emits: the node still 'appears in >=1 pair' and must
    come back labeled with itself."""
    if not edges:
        return
    from synthetic_datagen_spark.functions.graph import min_label_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {
        r["node_id"]: r["cluster_id"]
        for r in min_label_components(pairs, "id_a", "id_b").collect()
    }
    assert got == want


def test_cc_long_chain_pointer_doubling(spark):
    """ADVICE r3: a chain-shaped component longer than max_rounds hops
    must still collapse to ONE cluster (pointer doubling gives O(log d)
    rounds), and an insufficient round budget must RAISE, never return
    silently split clusters."""
    import pytest

    from synthetic_datagen_spark.functions.graph import min_label_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a LONG, id_b LONG"
    )
    out = min_label_components(chain).collect()
    assert len(out) == 64 and all(r.cluster_id == 0 for r in out)

    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a LONG, id_b LONG"
    )
    with pytest.raises(RuntimeError, match="still changing"):
        min_label_components(long_chain, max_rounds=2)


@given(st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_ward_row_cache_matches_naive_full_scan(seed):
    """_ward's row-minimum cache (O(s²) expected) must reproduce the
    naive full-matrix-argmin merge order BIT-IDENTICALLY, including on
    zero-distance ties from duplicate feature rows (degenerate segments
    emit identical rows). The naive loop here is the pre-optimization
    reference implementation."""
    import numpy as np

    from synthetic_datagen_spark.regime.segmentation import _ward

    def naive_ward(feats, n_clusters):
        s = len(feats)
        if s == 0:
            return np.zeros(0, dtype=np.int64)
        mu = feats.mean(axis=0)
        sd = feats.std(axis=0) + 1e-10
        cent = ((feats - mu) / sd).astype(np.float64).copy()
        size = np.ones(s)
        diff = cent[:, None, :] - cent[None, :, :]
        D = (diff * diff).sum(-1) * 0.5
        D[np.tril_indices(s)] = np.inf
        parent = np.arange(s)
        active = np.ones(s, dtype=bool)
        n_active = s
        while n_active > max(n_clusters, 1):
            flat = int(np.argmin(D))
            a, b = flat // s, flat % s
            cent[a] = (size[a] * cent[a] + size[b] * cent[b]) / (size[a] + size[b])
            size[a] += size[b]
            parent[parent == b] = a
            active[b] = False
            D[b, :] = np.inf
            D[:, b] = np.inf
            idx = np.where(active & (np.arange(s) != a))[0]
            if len(idx):
                d2 = ((cent[idx] - cent[a]) ** 2).sum(-1)
                w = size[idx] * size[a] / (size[idx] + size[a])
                lo = np.minimum(idx, a)
                hi = np.maximum(idx, a)
                D[lo, hi] = w * d2
            n_active -= 1
        roots = np.unique(parent)
        labels = np.zeros(s, dtype=np.int64)
        firsts = [(int(np.min(np.where(parent == r)[0])), r) for r in roots]
        for lbl, (_, r) in enumerate(sorted(firsts)):
            labels[parent == r] = lbl
        return labels

    rng = np.random.default_rng(seed)
    s = int(rng.integers(2, 50))
    f = rng.normal(0, 1, (s, 5))
    for _ in range(int(rng.integers(0, max(1, s // 3)))):
        f[rng.integers(0, s)] = f[rng.integers(0, s)]  # duplicate rows
    k = int(rng.integers(1, 5))
    assert np.array_equal(_ward(f.copy(), k), naive_ward(f.copy(), k))


def test_event_pattern_match_equals_reference_nfa(spark, sf_smoke):
    """The CEP fold must agree with a hand-rolled per-user NFA run in
    plain Python over the same (ts, code)-ordered events — a THIRD
    implementation, independent of both Spark's F.aggregate fold and
    the recursive-CTE oracle (which this test also guards against the
    DuckDB 1.0.0 list_reduce nondeterminism class: any engine-side
    fold corruption shows up as a counter mismatch here)."""
    import duckdb

    from synthetic_datagen_spark.operators.base import REGISTRY
    from synthetic_datagen_spark.operators.event_queries import _CEP_WINDOW_US

    rows = duckdb.sql(
        f"""
        SELECT user_id, epoch_us(ts) AS ts,
               CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                    WHEN 'purchase' THEN 3 WHEN 'error' THEN 4
                    ELSE 0 END AS code
        FROM '{sf_smoke}/events.parquet'
        ORDER BY user_id, ts, code
        """
    ).fetchall()
    state: dict[int, tuple[int, int, int, int, int]] = {}
    for u, ts, c in rows:
        ph, tv, n, k, x = state.get(u, (0, 0, 0, 0, 0))
        if c == 4:
            if ph > 0:
                k += 1
            ph = 0
        elif ph == 0 and c == 1:
            ph, tv = 1, ts
        elif ph == 1 and c == 2:
            ph = 2
        elif ph == 2 and c == 3:
            if ts - tv <= _CEP_WINDOW_US:
                n += 1
            else:
                x += 1
            ph = 0
        state[u] = (ph, tv, n, k, x)

    got = {
        r.user_id: (r.n_matches, r.n_error_kills, r.n_expired)
        for r in REGISTRY["event_pattern_match"].build(spark, sf_smoke).collect()
    }
    want = {u: (v[2], v[3], v[4]) for u, v in state.items()}
    assert got == want
