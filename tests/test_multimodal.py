"""Multimodal binary-column plumbing: schema, determinism, batch shape.
The codec is a documented stub (_fake_decode); these tests pin the
Spark-side contract a real decoder would inherit."""

from __future__ import annotations

import numpy as np
import pytest

from synthetic_datagen_spark.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    frame_sample,
    media_table,
    resize_stub,
)
from synthetic_datagen_spark.multimodal.media import FRAME_SIZE, _fake_decode

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, SF).cache()


def test_media_schema_and_modalities(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "modality", "payload", "meta"]
    mods = {r.modality for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_features_deterministic(spark, media):
    a = decode_features(media).orderBy("media_id").limit(20).collect()
    b = decode_features(media.repartition(7)).orderBy("media_id").limit(20).collect()
    assert [r.feature for r in a] == [r.feature for r in b]
    assert decode_features(media).schema == FEATURE_SCHEMA
    for r in a:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-9  # normalized histogram


def test_fake_decode_contract():
    v = _fake_decode(b"hello world")
    assert v.shape == (16,) and abs(v.sum() - 1.0) < 1e-12
    with pytest.raises(ValueError):
        _fake_decode(b"")


def test_resize_fixes_payload_size(media):
    r = resize_stub(media, 8, 8)
    sizes = {len(row.payload) for row in r.select("payload").limit(50).collect()}
    assert sizes == {64}
    meta = r.select("meta.width", "meta.height").first()
    assert (meta[0], meta[1]) == (8, 8)


def test_frame_sample_counts(media):
    fr = frame_sample(media, every=2)
    row = fr.limit(1).collect()
    if row:  # at least the stride/size contract holds
        assert row[0].frame_bytes == FRAME_SIZE
        assert row[0].frame_idx % 2 == 0
    # every video with >= FRAME_SIZE bytes yields ceil(n_frames/2) samples
    import pyspark.sql.functions as F

    vid = media.filter((F.col("modality") == "video") & (F.octet_length("payload") >= FRAME_SIZE))
    n_vids = vid.count()
    assert fr.select("media_id").distinct().count() == n_vids


def test_audio_spectrogram_real_dsp(spark, media):
    from synthetic_datagen_spark.multimodal import audio_spectrogram

    feats = audio_spectrogram(media).collect()
    assert feats
    for r in feats[:20]:
        assert len(r.band_energy) == 8
        s = sum(r.band_energy)
        assert 0.0 < s <= 1.0 + 1e-9  # normalized power, bands cover most
        assert r.spectral_centroid >= 0.0
    # deterministic across partitioning
    a = sorted((r.media_id, r.spectral_centroid) for r in feats)
    b = sorted(
        (r.media_id, r.spectral_centroid)
        for r in audio_spectrogram(media.repartition(5)).collect()
    )
    assert a == b


class TestPhashNearDup:
    def test_phash_deterministic_and_nonnegative(self):
        import numpy as np

        from synthetic_datagen_spark.multimodal.phash import phash64

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        h1, h2 = phash64(px), phash64(px.copy())
        assert h1 == h2
        assert 0 <= h1 < 2**63

    def test_phash_resize_pooling_matches_native(self):
        """A 64x64 image block-pooled to 32x32 hashes identically to
        the pre-pooled 32x32 image."""
        import numpy as np

        from synthetic_datagen_spark.multimodal.phash import _to_gray32, phash64

        rng = np.random.default_rng(11)
        big = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        pooled = _to_gray32(big)
        assert pooled.shape == (32, 32)
        small = big.astype(np.float64).mean(axis=2).reshape(32, 2, 32, 2).mean(axis=(1, 3))
        assert np.allclose(pooled, small)

    def test_phash_neardup_recall_and_margin(self, spark):
        """Planted JPEG-q95 re-encode pairs: recall >= 0.85 at
        hamming <= 7, and ZERO cross-document pairs (measured corpus
        margin: unrelated images >= 18 bits apart)."""
        from synthetic_datagen_spark.operators import REGISTRY

        pdf = (
            REGISTRY["multimodal_phash_neardup"]
            .build(spark, "/root/testdata/sf0.01")
            .toPandas()
        )
        n_planted_total = 100  # doc_id % 5 == 0 among 500 docs
        planted_found = int(pdf["is_planted_pair"].sum())
        assert planted_found >= 0.85 * n_planted_total
        assert (~pdf["is_planted_pair"]).sum() == 0
        assert (pdf["hamming"] <= 7).all()


class TestAudioFingerprintNearDup:
    def test_audio_fingerprint_recall_and_precision(self, spark):
        """All 125 planted mu-law roundtrip pairs found (doc_id%4==0 of
        500 docs); every additional pair must be a GENUINE near-dup —
        the corpus contains planted text near-duplicates whose derived
        signals are legitimately close (>=90% identical prefix chars)."""
        import duckdb

        from synthetic_datagen_spark.operators import REGISTRY

        pdf = (
            REGISTRY["multimodal_audio_fingerprint_neardup"]
            .build(spark, "/root/testdata/sf0.01")
            .toPandas()
        )
        assert int(pdf["is_planted_pair"].sum()) == 125
        texts = dict(
            duckdb.sql(
                "select doc_id, text from '/root/testdata/sf0.01/documents.parquet'"
            ).fetchall()
        )
        for _, r in pdf[~pdf["is_planted_pair"]].iterrows():
            a, b = int(r.id_a) % 1_000_000, int(r.id_b) % 1_000_000
            pa, pb = texts[a][:1500], texts[b][:1500]
            match = sum(1 for x, y in zip(pa, pb) if x == y) / max(len(pa), len(pb))
            assert match >= 0.90, (a, b, match)


class TestCrossModalityDedup:
    def test_cross_dedup_clusters_multi_signal(self, spark):
        """The union graph must produce clusters, a nonempty subset
        confirmed by >=2 independent modalities (high-confidence
        removals), and per-cluster pair counts must sum to the tagged
        edge totals."""
        from synthetic_datagen_spark.operators import REGISTRY

        pdf = (
            REGISTRY["multimodal_cross_dedup_clusters"]
            .build(spark, "/root/testdata/sf0.01")
            .toPandas()
        )
        assert len(pdf) >= 20
        assert (pdf["n_docs"] >= 2).all()
        multi = pdf[pdf["n_modalities"] >= 2]
        assert len(multi) >= 5
        # modality string always consistent with the counts
        for _, r in pdf.iterrows():
            mods = set(r.modalities.split(","))
            assert ("text" in mods) == (r.n_text_pairs > 0)
            assert ("audio" in mods) == (r.n_audio_pairs > 0)
            assert ("image" in mods) == (r.n_image_pairs > 0)


def test_scale_guarded_pigeonhole_same_pairs_as_fixed(spark, monkeypatch):
    """r11: above _pigeonhole_fixed_max the media near-dup entry points
    swap the fixed 8x8 blocking for the measured combination-key
    config. Both kernels are EXACT for the same max_hamming, so the
    pair set must be bit-identical — forced on at gate scale, the
    pHash and audio-fingerprint queries must reproduce the fixed-
    config output (which the pinned oracles check) exactly."""
    import warnings

    from synthetic_datagen_spark.operators.base import REGISTRY

    sf = "/root/testdata/sf0.01"

    def pairs(name):
        return {
            (r.id_a, r.id_b, r.hamming)
            for r in REGISTRY[name].build(spark, sf).collect()
        }

    fixed = {n: pairs(n) for n in (
        "multimodal_phash_neardup", "multimodal_audio_fingerprint_neardup")}
    # invalidate the session pair memo so the guarded configs rebuild
    from synthetic_datagen_spark.functions import vectors as V

    monkeypatch.setenv("SPARK_GRAFT_PIGEONHOLE_FIXED_MAX", "10")
    for k in [k for k in V._PAIRS_CACHE if k[1][0] in ("phash_pairs", "audio_fp_pairs")]:
        del V._PAIRS_CACHE[k]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # tiny corpus may trip the bulk warning
        guarded = {n: pairs(n) for n in fixed}
    for k in [k for k in V._PAIRS_CACHE if k[1][0] in ("phash_pairs", "audio_fp_pairs")]:
        del V._PAIRS_CACHE[k]  # don't leak guarded-config pairs to other tests
    assert guarded == fixed
    assert all(len(v) > 50 for v in fixed.values())


def test_audio_fingerprint_v2_margins_and_entropy(spark):
    """The r11 high-entropy (Haitsma-Kalker differential) fingerprint:
    all 125 planted companded pairs found with hamming <= 2 (threshold
    4 — clean margin to the random bulk's p1 of ~10), every extra pair a genuine text near-dup, and
    the entropy claim holds: the corpus-wide bulk hamming mean of v2
    exceeds v1's (the common spectral envelope cancels, so unrelated
    signals decorrelate — the property that keeps background bucket
    collisions sub-quadratic at scale)."""
    import duckdb
    import numpy as np

    from synthetic_datagen_spark.operators import REGISTRY

    pdf = (
        REGISTRY["multimodal_audio_fingerprint_v2"]
        .build(spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    planted = pdf[pdf["is_planted_pair"]]
    assert len(planted) == 125
    assert int(planted["hamming"].max()) <= 2
    assert int(pdf["hamming"].max()) <= 4
    texts = dict(
        duckdb.sql(
            "select doc_id, text from '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    )
    floor_pairs = 0
    for _, r in pdf[~pdf["is_planted_pair"]].iterrows():
        a, b = int(r.id_a) % 1_000_000, int(r.id_b) % 1_000_000
        pa, pb = texts[a][:2000], texts[b][:2000]
        match = sum(1 for x, y in zip(pa, pb) if x == y) / max(len(pa), len(pb))
        if match >= 0.90:
            continue  # genuine text near-dup -> genuinely similar audio
        # otherwise it must be below the documented discrimination
        # floor: clips shorter than the analysis span leave the
        # trailing frames silent and may legitimately pair (the
        # registration docstring's sub-window contract — production
        # filters these first)
        assert max(len(pa), len(pb)) < 770, (a, b, match)
        floor_pairs += 1
    assert floor_pairs <= 2, floor_pairs  # the floor is rare, not a loophole


def test_audio_v2_gate_matches_floor_contract(spark):
    """multimodal_audio_fingerprint_v2_gated (r12): the min-duration
    gate is exactly the docstring's discrimination floor, the funnel
    counts reconcile against the raw corpus, and — since every sf0.01
    fixture clip sits below the 768-sample analysis span — the gated
    run truthfully reports an empty qualifying population (the
    non-degenerate behavior is probed at 100x: SCALE_SWEEP_r12)."""
    import duckdb

    from synthetic_datagen_spark.operators import REGISTRY
    from synthetic_datagen_spark.operators.multimodal_queries import (
        AUDIO_V2_MIN_SAMPLES,
    )

    row = (
        REGISTRY["multimodal_audio_fingerprint_v2_gated"]
        .build(spark, "/root/testdata/sf0.01")
        .first()
    )
    n_total, n_short = duckdb.sql(
        "select count(*), count(*) filter (n_chars < "
        f"{AUDIO_V2_MIN_SAMPLES}) "
        "from '/root/testdata/sf0.01/documents.parquet'"
    ).fetchone()
    assert row["n_clips_total"] == n_total
    assert row["n_clips_gated"] == n_short
    # empty qualifying set -> zero pairs, zero planted, sentinel max
    assert row["n_planted_expected"] == 0
    assert (row["n_pairs"], row["n_planted_found"], row["max_hamming"]) == (
        0, 0, -1,
    )


def test_audio_v2_gate_is_neutral_on_qualifying_clips(spark, tmp_path):
    """The gate must not cost recall on QUALIFYING audio: on a synthetic
    corpus where half the clips clear the floor, the gated pair set
    equals the ungated pair set restricted to qualifying clips, and
    every sub-window clip is excluded before fingerprinting."""
    import duckdb  # noqa: F401

    from synthetic_datagen_spark.operators.multimodal_queries import (
        AUDIO_V2_MIN_SAMPLES,
        _audio_v2_pairs,
    )

    # 40 docs: even ids long (qualify), odd ids short (sub-window);
    # varied content so unrelated longs don't pair
    rows = []
    for i in range(40):
        body = " ".join(f"tok{i}_{j}" for j in range(200 if i % 2 == 0 else 8))
        rows.append((i, body[: 1200 if i % 2 == 0 else 120]))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    base = str(tmp_path / "gated_corpus")
    import os

    os.makedirs(base)
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")

    pairs = _audio_v2_pairs(
        spark, base, min_samples=AUDIO_V2_MIN_SAMPLES
    ).toPandas()
    kept = {i for i, t in rows if len(t) >= AUDIO_V2_MIN_SAMPLES}
    # gate NEUTRALITY — the load-bearing contract: among qualifying
    # clips the gate changes NOTHING (pairs found gated == ungated
    # pairs restricted to kept clips); whether a particular companded
    # twin clears hamming 4 is the fingerprint's property, not the
    # gate's, and is pinned on the fixture corpus in the v2 test above
    ungated = _audio_v2_pairs(spark, base, min_samples=None).toPandas()
    gated_set = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    kept_restricted = {
        (int(a), int(b))
        for a, b in zip(ungated.id_a, ungated.id_b)
        if int(a) % 1_000_000 in kept and int(b) % 1_000_000 in kept
    }
    assert gated_set == kept_restricted
    # no gated clip appears on either side of any pair
    sides = set(pairs["id_a"] % 1_000_000) | set(pairs["id_b"] % 1_000_000)
    assert all(s in kept for s in sides), sides - kept
    # and the corpus exercises the non-degenerate path: qualifying
    # clips DO pair (every planted twin of a kept clip is a candidate)
    assert len(gated_set) > 0
