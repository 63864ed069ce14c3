"""Multimodal-column queries (driver brief: image/audio/video as opaque
binary columns with typed metadata; decode/resize/frame-sample as
Arrow-batched Pandas UDFs). The media table derives deterministically
from documents.parquet — see synthetic_datagen_spark/multimodal/media.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..multimodal import decode_features, frame_sample, media_table, resize_stub
from .base import register


def _pigeonhole_fixed_max() -> int:
    """Signature count above which the media near-dup entry points
    swap the fixed 8-blocks × 8-bit pigeonhole config for the
    combination-key config chosen by scaled_pigeonhole_params (r11
    100× probe: the fixed config's random-collision term is
    8·2⁻⁸·n²/2 — 1.9e9 candidates at 62.5k audio signatures for ~15k
    real pairs). Unlike the LSH guard this swap CANNOT change results:
    both kernels are exact for the same max_hamming, so the pinned
    oracles are config-independent — the cutoff only avoids the
    count+sample jobs at gate scales. Env-overridable for tests."""
    return int(os.environ.get("SPARK_GRAFT_PIGEONHOLE_FIXED_MAX", "50000"))


def _scale_guarded_sig_pairs(
    sig: DataFrame, sig_col: str, max_hamming: int, n_est: int
) -> DataFrame:
    """Route a media signature frame to the right pigeonhole kernel:
    the classic single-block config below _pigeonhole_fixed_max, the
    measured-sample combination-key config above it (functions/
    bitsig.py). The sample is a bounded limit() collect — real media
    signatures are corpus-correlated and uniform-hash cost models were
    30×+ off on the r11 fixture, so the chooser must see real pieces.
    Warns when even the best exact config stays quadratic (signature
    bulk too close to the threshold — the geometry, not the plan)."""
    import warnings

    from ..functions.bitsig import (
        pigeonhole_pairs,
        pigeonhole_pairs_combo,
        scaled_pigeonhole_params,
    )

    if n_est <= _pigeonhole_fixed_max():
        return pigeonhole_pairs(
            sig, "media_id", sig_col,
            n_blocks=8, block_bits=8, max_hamming=max_hamming,
        )
    sample = [r[0] for r in sig.select(sig_col).limit(2000).collect()]
    p, c, est = scaled_pigeonhole_params(n_est, max_hamming, sample)
    # 500/signature separates the measured geometries at 100×: the
    # pHash corpus (bulk hamming 31.4 ≈ random bits — healthy) sits at
    # ~430 background candidates/sig, the correlated audio fingerprint
    # (bulk 22.4) at ~1600 — genuinely quadratic; no exact config can
    # shrink a bulk that close to the threshold, only a higher-entropy
    # signature can (SCALE_SWEEP_r11).
    if est > 500.0 * n_est:
        warnings.warn(
            f"media near-dup mining at n={n_est}: even the best exact "
            f"combination-key config (pieces={p}, combo={c}) estimates "
            f"{est:.2e} background candidate pairs (> 500/signature) — "
            f"the signature bulk sits too close to hamming "
            f"{max_hamming} and candidate volume is quadratic in "
            f"corpus size by geometry; the fix is a higher-entropy "
            f"signature (longer fingerprint), not a blocking change",
            stacklevel=3,
        )
    return pigeonhole_pairs_combo(
        sig, "media_id", sig_col,
        max_hamming=max_hamming, n_pieces=p, combo_size=c,
    )


@register(
    "multimodal_metadata_panel",
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
         octet_length(encode(text)) AS n_bytes,
         CAST(doc_id % 640 + 16 AS INT) AS width,
         CAST(doc_id % 480 + 16 AS INT) AS height
  FROM documents
)
SELECT modality,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(CAST(n_bytes AS BIGINT)) AS BIGINT) AS total_bytes,
       CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
       CAST(MIN(width) AS BIGINT) AS min_width,
       CAST(MAX(height) AS BIGINT) AS max_height
FROM m
GROUP BY modality
""",
    doc="Multimodal metadata panel: binary payload sizes + typed header "
    "fields aggregated per modality. Payload bytes never leave the JVM "
    "(octet_length on BinaryType); Parquet column pruning drops the "
    "payload column entirely for this projection at scale.",
)
def multimodal_metadata_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    # Every numeric output is pinned to int64 on BOTH engines: Spark's
    # octet_length is INT while DuckDB's is BIGINT (SUM→HUGEINT), and the
    # driver's value-hash is dtype-sensitive — two rounds of hash-red on
    # exact values traced back to this.
    return m.groupBy("modality").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(F.octet_length("payload").cast("long")).cast("long").alias("total_bytes"),
        F.min(F.octet_length("payload")).cast("long").alias("min_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
        F.min("meta.width").cast("long").alias("min_width"),
        F.max("meta.height").cast("long").alias("max_height"),
    )


@register(
    "multimodal_decode_features",
    oracle=None,  # blob-byte decode: not SQL-expressible in DuckDB
    doc="Decode + feature-extract via mapInPandas (stubbed codec, real "
    "Arrow-batch plumbing): per-media 16-dim feature vector; emits "
    "rounded summary stats so output is schema-stable.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_features(media_table(spark, sf_dir))
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("f_sum"),
    )


@register(
    "multimodal_frame_stats",
    oracle=None,  # blob-byte frame split: not SQL-expressible in DuckDB
    doc="Video frame sampling via mapInPandas (every 2nd 64-byte frame), "
    "aggregated to per-video frame counts + mean frame intensity.",
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = frame_sample(media_table(spark, sf_dir), every=2)
    return fr.groupBy("media_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.round(F.avg("frame_mean"), 6).alias("avg_intensity"),
    )


@register(
    "multimodal_resize_roundtrip",
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality
  FROM documents
)
SELECT modality, COUNT(*) AS n, CAST(32 * 32 AS BIGINT) AS payload_bytes
FROM m
GROUP BY modality
""",
    doc="Resize stub: payload truncated/zero-padded to 32x32 bytes and "
    "metadata rewritten JVM-side (binary substr/rpad, no UDF); checks "
    "every resized payload is exactly the target size.",
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = resize_stub(media_table(spark, sf_dir), 32, 32)
    return r.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.max(F.octet_length("payload")).cast("long").alias("payload_bytes"),
    )


@register(
    "multimodal_audio_spectrogram",
    oracle=None,  # FFT kernel over blob bytes: not SQL-expressible
    doc="Audio feature extraction over mapInPandas: payload bytes as an "
    "8-bit PCM waveform, REAL numpy rfft power spectrum, 8 log-band "
    "energies + spectral centroid per clip — the DSP is genuine, only "
    "the codec is the stand-in (soundfile decode drops in ahead of the "
    "FFT unchanged).",
)
def multimodal_audio_spectrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import audio_spectrogram

    feats = audio_spectrogram(media_table(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_samples",
        F.round(F.element_at("band_energy", 1), 6).alias("band0"),
        F.round(
            F.aggregate("band_energy", F.lit(0.0), lambda a, x: a + x), 6
        ).alias("band_sum"),
        F.round("spectral_centroid", 6).alias("spectral_centroid"),
    )


@register(
    "multimodal_codec_roundtrip",
    oracle="""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents
)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 2 THEN 'image_png'
            ELSE 'audio' END AS modality,
       CASE WHEN doc_id % 3 = 1 THEN 0 ELSE CAST(doc_id % 13 + 4 AS INT) END AS width,
       CASE WHEN doc_id % 3 = 1 THEN 0 ELSE CAST(doc_id % 11 + 4 AS INT) END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN CAST(LEAST(nb, 1500) AS INT) ELSE 0 END AS n_samples,
       CASE WHEN doc_id % 3 = 0
            THEN CAST(54 + (((doc_id % 13 + 4) * 3 + 3) // 4) * 4
                         * (doc_id % 11 + 4) AS BIGINT)
            WHEN doc_id % 3 = 2
            -- PNG with stored (BTYPE=00) deflate blocks: 8 signature +
            -- 25 IHDR + 12 IEND + (12 + 11 + n) IDAT where n =
            -- h*(1 + 3w) filtered scanline bytes (single block: n < 65535)
            THEN CAST(68 + (doc_id % 11 + 4) * (1 + 3 * (doc_id % 13 + 4)) AS BIGINT)
            ELSE CAST(44 + 2 * LEAST(nb, 1500) AS BIGINT) END AS payload_bytes,
       TRUE AS ok_roundtrip
FROM m
ORDER BY media_id
""",
    doc="REAL codec round-trip (no stub) across THREE formats: 24-bit "
    "BMP (struct-packed headers, padded BGR rows), zlib PNG "
    "(IHDR/IDAT/IEND + CRC32, stored-block IDAT for closed-form sizes; "
    "decode reconstructs all five scanline filters and is golden-"
    "fixture-pinned against a filtered+compressed encoding in tests), "
    "and RIFF PCM-16 WAV (chunk walking; interops with Python's stdlib "
    "wave module both directions). Each row encodes doc-derived "
    "pixels/samples, decodes them back inside the same Arrow batch, and "
    "verifies bit-exact equality (ok_roundtrip). The SQL oracle checks "
    "every deterministic structural fact — dims, sample counts, exact "
    "on-disk byte sizes incl. BMP row padding, PNG chunk+zlib framing, "
    "WAV header overhead. JPEG (lossy, so no byte-size oracle) has its "
    "own rows-only query multimodal_jpeg_roundtrip; only MP3/video "
    "remain stubbed.",
)
def multimodal_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.codecs import (
        decode_bmp, decode_png, decode_wav, encode_bmp, encode_png, encode_wav,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("payload_bytes", T.LongType()),
            T.StructField("ok_roundtrip", T.BooleanType()),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                if did % 3 == 0:  # image → real BMP
                    w, h = did % 13 + 4, did % 11 + 4
                    px = np.resize(buf, (h, w, 3)).astype(np.uint8)
                    payload = encode_bmp(px)
                    ok = np.array_equal(decode_bmp(payload), px)
                    vals = (did, "image", w, h, 0, 0, len(payload), bool(ok))
                elif did % 3 == 2:  # image → real PNG (stored-block IDAT)
                    w, h = did % 13 + 4, did % 11 + 4
                    px = np.resize(buf, (h, w, 3)).astype(np.uint8)
                    payload = encode_png(px, level=0)
                    ok = np.array_equal(decode_png(payload), px)
                    vals = (did, "image_png", w, h, 0, 0, len(payload), bool(ok))
                else:  # audio → real WAV (PCM-16 mono)
                    n = min(len(buf), 1500)
                    samples = ((buf[:n].astype(np.int32) - 128) * 256).astype(np.int16)
                    payload = encode_wav(samples, 16000)
                    rate, back = decode_wav(payload)
                    ok = rate == 16000 and np.array_equal(back, samples)
                    vals = (did, "audio", 0, 0, 16000, n, len(payload), bool(ok))
                for f, v in zip(schema.fields, vals):
                    out[f.name].append(v)
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, schema).orderBy("media_id")


@register(
    "multimodal_jpeg_roundtrip",
    oracle=None,  # JPEG is lossy and entropy-coded: byte sizes and PSNR
    # are deterministic but not SQL-computable. Decoder correctness is
    # pinned cross-engine in tests/test_codecs.py (decode_jpeg vs
    # javax.imageio on a libjpeg-encoded file: mean |delta| < 1).
    doc="REAL baseline-JPEG round-trip (multimodal/jpeg.py — 8x8 DCT, "
    "Annex K quantization + Huffman tables, byte stuffing, written from "
    "the T.81 spec with numpy): each image row encodes doc-derived "
    "pixels at quality 50 and 90, decodes back in the same Arrow batch, "
    "and emits sizes + PSNR. Invariants a correct lossy codec must "
    "show, asserted in tests and visible in the output: higher quality "
    "=> more bytes AND higher PSNR, every decode matches dims, PSNR "
    "above the transform-coding floor. The decoder also reads real "
    "libjpeg files (4:2:0, restart markers), cross-checked against the "
    "JVM's javax.imageio pixel-for-pixel.",
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.jpeg import decode_jpeg, encode_jpeg

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    ).filter(F.col("doc_id") % 5 == 0)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("bytes_q50", T.IntegerType()),
            T.StructField("bytes_q90", T.IntegerType()),
            T.StructField("psnr_q50", T.DoubleType()),
            T.StructField("psnr_q90", T.DoubleType()),
            T.StructField("ok_roundtrip", T.BooleanType()),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def psnr(a, b):
            mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
            return 99.0 if mse == 0 else float(10 * np.log10(255.0 ** 2 / mse))

        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                w, h = did % 13 + 8, did % 11 + 8
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                px = np.resize(buf, (h, w, 3)).astype(np.uint8)
                enc50, enc90 = encode_jpeg(px, 50), encode_jpeg(px, 90)
                d50, d90 = decode_jpeg(enc50), decode_jpeg(enc90)
                p50, p90 = psnr(px, d50), psnr(px, d90)
                ok = (
                    d50.shape == px.shape
                    and d90.shape == px.shape
                    and len(enc90) >= len(enc50)
                    and p90 >= p50 > 15.0
                )
                for f, v in zip(
                    schema.fields,
                    (did, w, h, len(enc50), len(enc90),
                     round(p50, 3), round(p90, 3), bool(ok)),
                ):
                    out[f.name].append(v)
            yield pd.DataFrame(out)

    return docs.repartition(32).mapInPandas(roundtrip, schema).orderBy("media_id")


@register(
    "multimodal_video_frames",
    oracle=None,  # MJPEG entropy coding makes container bytes content-
    # dependent; codec correctness is pinned in tests/test_codecs.py
    # (AVI chunk-walk + per-frame JPEG PSNR, javax.imageio cross-check
    # for the underlying JPEG decoder).
    doc="REAL video frame sampling (no stub): each row builds a short "
    "MJPEG-in-AVI clip from doc-derived frames (multimodal/avi.py — "
    "RIFF hdrl/movi/idx1 container over per-frame baseline JPEGs), "
    "then samples every 2nd frame the way a 100 TB pipeline must: the "
    "container walk is cheap chunk arithmetic and ONLY the sampled "
    "frames pay JPEG decode (DCT) cost. Emits per-clip header meta, "
    "sampled-frame intensity stats, and a decode-integrity flag.",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.avi import avi_frame_chunks, encode_avi_mjpeg
    from ..multimodal.jpeg import decode_jpeg

    # 1-in-21 sample: the per-clip work (encode n frames + decode the
    # sampled half, all CPU inside one Arrow batch) embarrassingly
    # parallelizes across rows, so the sampling rate sets bench cost
    # without changing the plan shape the 100 TB run would use
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    ).filter(F.col("doc_id") % 21 == 0)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("fps", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_sampled", T.IntegerType()),
            T.StructField("avg_intensity", T.DoubleType()),
            T.StructField("container_bytes", T.LongType()),
            T.StructField("ok_decode", T.BooleanType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                w, h = did % 13 + 8, did % 11 + 8
                n_frames = did % 4 + 3
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                base = np.resize(buf, (h, w, 3)).astype(np.int32)
                frames = [
                    ((base + 17 * t) % 256).astype(np.uint8) for t in range(n_frames)
                ]
                avi = encode_avi_mjpeg(frames, fps=12, quality=85)
                meta, chunks = avi_frame_chunks(avi)
                sampled = [decode_jpeg(chunks[i]) for i in range(0, len(chunks), 2)]
                ok = (
                    meta["n_frames"] == n_frames
                    and len(chunks) == n_frames
                    and all(s.shape == (h, w, 3) for s in sampled)
                )
                inten = float(np.mean([s.mean() for s in sampled]))
                for f, v in zip(
                    schema.fields,
                    (did, n_frames, meta["fps"], meta["width"], meta["height"],
                     len(sampled), round(inten, 3), len(avi), bool(ok)),
                ):
                    out[f.name].append(v)
            yield pd.DataFrame(out)

    return docs.repartition(32).mapInPandas(sample, schema).orderBy("media_id")


@register(
    "multimodal_jpeg_roundtrip_summary",
    # Pinned-value oracle (r9), captured by tools/pin_oracles.py:
    # 100 images, 72096 bytes at q50 vs 94093 at q90 (more quality =>
    # more bytes, corpus-wide), all 100 roundtrip-ok and PSNR-monotone.
    oracle="""SELECT * FROM (VALUES
  (CAST(100 AS BIGINT), CAST(72096 AS BIGINT), CAST(94093 AS BIGINT),
   CAST(100 AS BIGINT), CAST(100 AS BIGINT))
) AS t(n_images, total_bytes_q50, total_bytes_q90, n_ok_roundtrip,
       n_psnr_monotone)""",
    pinned_sf="0.01",
    doc="Integer-only summary twin of multimodal_jpeg_roundtrip: total "
    "encoded bytes at q50/q90, roundtrip-ok and PSNR-monotonicity "
    "counts over the full per-image frame. Every column is an exact "
    "integer (byte sums, boolean counts — per-row float PSNRs only "
    "feed a comparison), so the whole REAL-JPEG codec path pins to a "
    "literal value oracle where the 500-row detail panel cannot.",
)
def multimodal_jpeg_roundtrip_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = multimodal_jpeg_roundtrip(spark, sf_dir)
    return base.agg(
        F.count("*").alias("n_images"),
        F.sum("bytes_q50").cast("long").alias("total_bytes_q50"),
        F.sum("bytes_q90").cast("long").alias("total_bytes_q90"),
        F.sum(F.col("ok_roundtrip").cast("long")).alias("n_ok_roundtrip"),
        F.sum((F.col("psnr_q90") >= F.col("psnr_q50")).cast("long")).alias(
            "n_psnr_monotone"
        ),
    )


@register(
    "multimodal_video_frames_summary",
    # Pinned-value oracle (r9), captured by tools/pin_oracles.py:
    # 24 clips, 108 frames of which every 2nd (60) decodes, container
    # bytes exactly reproducible (RIFF arithmetic + deterministic
    # entropy coding), all 24 decode-ok.
    oracle="""SELECT * FROM (VALUES
  (CAST(24 AS BIGINT), CAST(102798 AS BIGINT), CAST(108 AS BIGINT),
   CAST(60 AS BIGINT), CAST(24 AS BIGINT))
) AS t(n_clips, total_container_bytes, total_frames, total_sampled,
       n_ok_decode)""",
    pinned_sf="0.01",
    doc="Integer-only summary twin of multimodal_video_frames: clip "
    "count, total MJPEG-AVI container bytes, frame and sampled-frame "
    "totals, decode-ok count — the deterministic structural output of "
    "the container+codec path, pinnable as a literal value oracle.",
)
def multimodal_video_frames_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = multimodal_video_frames(spark, sf_dir)
    return base.agg(
        F.count("*").alias("n_clips"),
        F.sum("container_bytes").cast("long").alias("total_container_bytes"),
        F.sum("n_frames").cast("long").alias("total_frames"),
        F.sum("n_sampled").cast("long").alias("total_sampled"),
        F.sum(F.col("ok_decode").cast("long")).alias("n_ok_decode"),
    )


@register(
    "multimodal_audio_codec_roundtrip",
    oracle="""
WITH m AS (
  SELECT doc_id, LEAST(octet_length(encode(text)), 1500) AS n
  FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id AS media_id,
       CAST(n AS INT) AS n_samples,
       -- mu-law WAV: RIFF(8) + WAVE(4) + fmt(8+18) + fact(8+4) +
       -- data(8 + n) + odd-length pad  =  58 + n + n%2
       CAST(58 + n + n % 2 AS BIGINT) AS ulaw_wav_bytes,
       -- IMA ADPCM: two 4-bit nibbles per byte
       CAST((n + 1) // 2 AS BIGINT) AS adpcm_bytes,
       TRUE AS ok_ulaw,
       TRUE AS ok_adpcm
FROM m ORDER BY media_id
""",
    doc="COMPRESSED-audio codec round-trip (multimodal/audio.py): each "
    "audio row encodes its PCM clip as (a) a standard G.711 mu-law WAV "
    "(fmt tag 7, fact chunk — byte length closed-form 58+n+n%2) and "
    "(b) a 4-bit IMA ADPCM nibble stream (ceil(n/2) bytes), decodes "
    "both back in the same Arrow batch, and verifies the codec error "
    "bounds: mu-law reconstruction within the G.711 segment-quantizer "
    "bound (|err| <= 2^(seg+3), decode bit-exact vs CPython audioop, "
    "pinned exhaustively in tests), ADPCM within its adaptive-step "
    "envelope. The SQL oracle checks every deterministic structural "
    "fact; the codec arithmetic itself is audioop-parity-tested.",
)
def multimodal_audio_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.audio import (
        adpcm_decode, adpcm_encode, decode_wav_any, encode_wav_ulaw, ulaw_decode, ulaw_encode,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    ).filter(F.col("doc_id") % 3 == 1)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("ulaw_wav_bytes", T.LongType()),
            T.StructField("adpcm_bytes", T.LongType()),
            T.StructField("ok_ulaw", T.BooleanType()),
            T.StructField("ok_adpcm", T.BooleanType()),
        ]
    )

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                n = min(len(buf), 1500)
                pcm = ((buf[:n].astype(np.int32) - 128) * 256).astype(np.int16)
                wav = encode_wav_ulaw(pcm, 8000)
                rate, back = decode_wav_any(wav)
                # G.711 mu-law error bound: half quantizer step per segment
                ok_u = rate == 8000 and bool(
                    np.array_equal(back, ulaw_decode(ulaw_encode(pcm)))
                    and np.abs(back.astype(int) - pcm.astype(int)).max() <= 1024
                )
                adp, _ = adpcm_encode(pcm)
                dec, _ = adpcm_decode(adp, n_samples=n)
                # adaptive-step codec: exactness only for silence; bound loosely
                ok_a = dec.shape == pcm.shape and bool(
                    np.abs(dec.astype(int) - pcm.astype(int)).mean() < 4000
                )
                for f, v in zip(
                    schema.fields,
                    (did, n, len(wav), len(adp), ok_u, ok_a),
                ):
                    out[f.name].append(v)
            yield pd.DataFrame(out)

    return docs.repartition(32).mapInPandas(roundtrip, schema).orderBy("media_id")


@register(
    "multimodal_phash_neardup",
    # Pinned-value oracle (r9): the DCT pHash is not SQL-expressible,
    # but the pair set is a pure function of the sf0.01 corpus (images
    # render deterministically from doc bytes; the JPEG re-encode is
    # our own deterministic codec) — every emitted pair is a planted
    # (k, k+1e6) re-encode pair with a fixed hamming distance, so the
    # gate checks literals captured via tools/pin_oracles.py (sf0.01
    # only). Planted-pair recall and the zero-false-positive margin
    # are additionally pinned in tests/test_multimodal.py.
    oracle="""SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_a + 1000000 AS BIGINT) AS id_b,
       CAST(h AS BIGINT) AS hamming, TRUE AS is_planted_pair
FROM (VALUES
  (0,6),(5,2),(10,6),(15,2),(20,2),(25,4),(30,0),(35,4),(40,2),(45,4),
  (55,4),(60,4),(65,6),(70,0),(75,2),(80,2),(85,4),(90,2),(95,4),(100,
  4),(105,2),(110,4),(120,4),(125,2),(130,6),(135,2),(140,6),(145,2),(
  150,4),(155,2),(160,4),(165,6),(170,0),(175,4),(180,4),(185,4),(190,
  2),(195,2),(200,2),(205,2),(210,0),(215,2),(220,2),(225,2),(230,2),(
  235,4),(240,2),(245,2),(250,6),(255,2),(260,4),(265,2),(270,2),(275,
  4),(280,4),(290,0),(295,4),(300,6),(305,6),(310,4),(315,2),(320,0),(
  330,4),(335,4),(340,4),(345,6),(350,4),(355,0),(360,4),(365,6),(375,
  2),(380,0),(385,2),(390,6),(395,2),(400,4),(405,2),(410,2),(415,4),(
  420,2),(430,2),(435,2),(440,4),(445,4),(450,2),(455,2),(460,0),(465,
  2),(470,6),(480,2),(490,4)
) AS t(id_a, h)""",
    pinned_sf="0.01",
    doc="Image near-duplicate detection via DCT perceptual hash "
    "(multimodal/phash.py): every doc renders a deterministic 32x32 "
    "RGB image; every 5th doc additionally plants a JPEG-reencoded "
    "(quality 95, real codec) variant under media_id + 1_000_000. "
    "Stage 1 computes the 63-bit pHash in Arrow-batched mapInPandas; "
    "stage 2 is pure DataFrame ops — Manku pigeonhole blocking (8 "
    "blocks x 8 bits, any hamming<=7 pair shares an exact block), "
    "bucket equi-join, then bit_count(a XOR b) <= 7 verification "
    "JVM-side. Measured margins on this corpus: re-encode pairs mean "
    "hamming 3.7, unrelated images >= 18. Above "
    "_pigeonhole_fixed_max signatures the entry point swaps in the "
    "combination-key config from scaled_pigeonhole_params (r11 100x "
    "probe: the fixed config's 8*2^-8*n^2/2 random-collision term hit "
    "102M candidates at 60k images for ~12k real pairs; the measured-"
    "sample chooser cut it 42x). Both kernels are exact for "
    "hamming<=7, so the swap never changes the pair set — the pinned "
    "oracle is config-independent.",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.jpeg import decode_jpeg, encode_jpeg
    from ..multimodal.phash import phash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    )

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("ph", T.LongType())]
    )

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, phs = [], []
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                px = np.resize(buf, (32, 32, 3)).astype(np.uint8)
                ids.append(did)
                phs.append(phash64(px))
                if did % 5 == 0:  # plant a re-encoded near-duplicate
                    px2 = decode_jpeg(encode_jpeg(px, quality=95))
                    ids.append(did + 1_000_000)
                    phs.append(phash64(px2))
            yield pd.DataFrame({"media_id": ids, "ph": phs})

    from ..functions.vectors import cached_lsh_pairs

    def build() -> DataFrame:
        sig = docs.repartition(32).mapInPandas(hashes, schema)
        # n is derivable from the doc count alone (every doc hashes,
        # every 5th plants a variant) — no extra pass over the
        # expensive JPEG re-encode stage just to size the kernel
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        return _scale_guarded_sig_pairs(
            sig, "ph", max_hamming=7, n_est=n_docs + n_docs // 5 + 1
        )

    # session memo: the cross-modality dedup query consumes the same
    # pair frame — one signature+blocking pass per (session, sf_dir)
    cand = cached_lsh_pairs(spark, ("phash_pairs", sf_dir), build)
    return cand.withColumn(
        "is_planted_pair", F.col("id_b") == F.col("id_a") + 1_000_000
    ).orderBy("id_a", "id_b")


@register(
    "multimodal_audio_fingerprint_neardup",
    # Pinned-value oracle (r9): the FFT band-energy fingerprint is not
    # SQL-expressible, but the pair set is a pure function of the
    # sf0.01 corpus (signals render deterministically from doc bytes;
    # the G.711 companding roundtrip is bit-pinned against audioop) —
    # integer/boolean output only, zero fp-parity risk. Captured via
    # tools/pin_oracles.py; planted recall and margins additionally
    # pinned in tests/test_multimodal.py.
    oracle="""SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(h AS BIGINT) AS hamming, p AS is_planted_pair
FROM (VALUES
  (0,1000000,2,TRUE), (4,1000004,0,TRUE), (8,1000008,0,TRUE),
  (12,1000012,0,TRUE), (16,1000016,0,TRUE), (20,1000020,0,TRUE),
  (24,1000024,0,TRUE), (28,1000028,0,TRUE), (31,383,2,FALSE),
  (32,1000032,0,TRUE), (36,1000036,0,TRUE), (40,1000040,0,TRUE),
  (44,1000044,0,TRUE), (45,267,2,FALSE), (45,413,2,FALSE),
  (48,1000048,0,TRUE), (52,1000052,0,TRUE), (56,1000056,0,TRUE),
  (58,293,4,FALSE), (60,1000060,0,TRUE), (61,185,4,FALSE),
  (64,1000064,0,TRUE), (68,1000068,0,TRUE), (70,447,4,FALSE),
  (72,377,2,FALSE), (72,1000072,0,TRUE), (76,1000076,0,TRUE),
  (80,1000080,0,TRUE), (84,1000084,0,TRUE), (88,1000088,0,TRUE),
  (92,1000092,0,TRUE), (96,1000096,0,TRUE), (98,290,2,FALSE),
  (100,1000100,0,TRUE), (104,1000104,0,TRUE), (108,1000108,0,TRUE),
  (112,1000112,0,TRUE), (116,1000116,0,TRUE), (120,1000120,2,TRUE),
  (124,1000124,0,TRUE), (128,1000128,0,TRUE), (132,1000132,2,TRUE),
  (136,1000136,0,TRUE), (140,1000140,0,TRUE), (144,1000144,0,TRUE),
  (148,1000148,0,TRUE), (152,1000152,0,TRUE), (156,1000156,2,TRUE),
  (160,1000160,0,TRUE), (164,1000164,0,TRUE), (166,323,4,FALSE),
  (168,1000168,0,TRUE), (172,1000172,0,TRUE), (176,1000176,0,TRUE),
  (180,1000180,0,TRUE), (184,1000184,0,TRUE), (188,1000188,0,TRUE),
  (192,1000192,0,TRUE), (196,1000196,0,TRUE), (200,1000200,0,TRUE),
  (204,1000204,0,TRUE), (208,1000208,0,TRUE), (212,1000212,0,TRUE),
  (216,1000216,0,TRUE), (220,1000220,0,TRUE), (224,1000224,0,TRUE),
  (228,1000228,0,TRUE), (232,1000232,0,TRUE), (236,1000236,0,TRUE),
  (240,1000240,0,TRUE), (244,1000244,0,TRUE), (248,1000248,0,TRUE),
  (252,1000252,2,TRUE), (256,1000256,0,TRUE), (260,1000260,0,TRUE),
  (264,1000264,0,TRUE), (267,413,0,FALSE), (268,1000268,0,TRUE),
  (272,1000272,0,TRUE), (276,1000276,0,TRUE), (280,1000280,0,TRUE),
  (284,1000284,0,TRUE), (285,301,0,FALSE), (288,1000288,0,TRUE),
  (292,1000292,0,TRUE), (295,374,2,FALSE), (296,1000296,0,TRUE),
  (300,1000300,0,TRUE), (304,1000304,2,TRUE), (308,1000308,0,TRUE),
  (312,1000312,2,TRUE), (316,1000316,0,TRUE), (320,1000320,0,TRUE),
  (324,1000324,0,TRUE), (326,457,4,FALSE), (328,1000328,2,TRUE),
  (332,1000120,4,FALSE), (332,1000332,0,TRUE), (336,1000336,0,TRUE),
  (340,1000340,0,TRUE), (344,1000344,0,TRUE), (348,1000348,0,TRUE),
  (352,1000352,0,TRUE), (356,1000356,0,TRUE), (360,1000360,0,TRUE),
  (364,1000364,0,TRUE), (368,1000368,0,TRUE), (372,1000372,0,TRUE),
  (376,1000376,0,TRUE), (377,1000072,2,FALSE), (380,1000380,0,TRUE),
  (384,1000384,0,TRUE), (388,1000388,0,TRUE), (392,1000392,0,TRUE),
  (393,420,2,FALSE), (393,1000420,2,FALSE), (396,1000396,0,TRUE),
  (400,1000400,0,TRUE), (404,1000404,0,TRUE), (408,1000408,2,TRUE),
  (412,1000412,0,TRUE), (416,1000416,2,TRUE), (420,1000420,0,TRUE),
  (424,1000424,2,TRUE), (428,1000428,0,TRUE), (432,1000432,2,TRUE),
  (435,486,2,FALSE), (436,1000436,0,TRUE), (440,1000440,0,TRUE),
  (444,1000444,0,TRUE), (448,1000448,0,TRUE), (452,1000452,0,TRUE),
  (456,1000456,0,TRUE), (458,462,0,FALSE), (460,1000460,0,TRUE),
  (464,1000464,0,TRUE), (468,1000468,2,TRUE), (472,1000472,0,TRUE),
  (476,1000476,0,TRUE), (480,1000480,0,TRUE), (484,1000484,0,TRUE),
  (488,1000488,0,TRUE), (492,1000492,0,TRUE), (496,1000496,0,TRUE),
  (1000120,1000332,4,FALSE)
) AS t(id_a, id_b, h, p)""",
    pinned_sf="0.01",
    doc="Audio near-duplicate detection via spectral band-energy "
    "fingerprinting — the audio sibling of the pHash image pipeline "
    "and text SimHash: every doc renders a deterministic PCM-16 "
    "signal; every 4th doc plants a G.711 mu-law companded roundtrip "
    "(real codec, multimodal/audio.py) as a lossy near-duplicate. "
    "Signature = 64 spectral bands of a 1024-point rFFT, bit = band "
    "energy > median (robust to companding noise: measured re-encode "
    "hamming <= 2, unrelated signals >= 10, but BULK hamming mean "
    "22.4 — these signatures are corpus-correlated). Candidates via "
    "the shared pigeonhole kernel (functions/bitsig.py, 8x8-bit "
    "blocks, complete for hamming <= 5), verification JVM-side. "
    "Above _pigeonhole_fixed_max signatures the combination-key "
    "config from scaled_pigeonhole_params replaces the fixed blocks "
    "(r11 100x probe: 1.9e9 candidates at 62.5k audio sigs under the "
    "fixed config — the correlated-signature worst case; the "
    "measured-sample chooser cut it 175x). Exact either way, so the "
    "pinned oracle is config-independent.",
)
def multimodal_audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..multimodal.audio import ulaw_decode, ulaw_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    )

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("fp", T.LongType())]
    )

    def fingerprint(samples: np.ndarray) -> int:
        x = np.zeros(1024)
        n = min(len(samples), 1024)
        x[:n] = samples[:n].astype(np.float64)
        mag = np.abs(np.fft.rfft(x))[1:513]
        bands = mag.reshape(64, 8).sum(axis=1)
        med = np.median(bands)
        h = 0
        for b in bands > med:
            h = (h << 1) | int(b)
        # clear bit 63: the signature must fit a signed BIGINT (Arrow
        # int64); costs at most 1 bit of margin (measured: re-encode
        # hamming <= 2, cross-signal >= 10, threshold 5 — still safe)
        return h & ((1 << 63) - 1)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for did, raw in zip(pdf["doc_id"], pdf["raw"]):
                did = int(did)
                buf = np.frombuffer(bytes(raw), dtype=np.uint8)
                s = ((buf[:1500].astype(np.int32) - 128) * 256).astype(np.int16)
                ids.append(did)
                fps.append(fingerprint(s))
                if did % 4 == 0:  # plant a companded near-duplicate
                    s2 = ulaw_decode(ulaw_encode(s))
                    ids.append(did + 1_000_000)
                    fps.append(fingerprint(s2))
            yield pd.DataFrame({"media_id": ids, "fp": fps})

    from ..functions.vectors import cached_lsh_pairs

    def build() -> DataFrame:
        sig = docs.repartition(32).mapInPandas(hashes, schema)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        return _scale_guarded_sig_pairs(
            sig, "fp", max_hamming=5, n_est=n_docs + n_docs // 4 + 1
        )

    cand = cached_lsh_pairs(spark, ("audio_fp_pairs", sf_dir), build)
    return cand.withColumn(
        "is_planted_pair", F.col("id_b") == F.col("id_a") + 1_000_000
    ).orderBy("id_a", "id_b")


@register(
    "multimodal_cross_dedup_clusters",
    # Pinned-value oracle (r9): composes the (non-SQL) image/audio
    # signature pipelines with the text MinHash candidates — every
    # stage deterministic, and the per-cluster panel is integer/string
    # only (cluster_id = component min, counts per modality), so the
    # sf0.01 output pins exactly (tools/pin_oracles.py). Cluster
    # invariants additionally in tests.
    oracle="""SELECT * FROM (VALUES
  (CAST(8 AS BIGINT), CAST(4 AS BIGINT), 'text', CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(11 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(15 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(22 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(23 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(26 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(27 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(31 AS BIGINT), CAST(3 AS BIGINT), 'audio,text', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(32 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(33 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(35 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(40 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(44 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(45 AS BIGINT), CAST(3 AS BIGINT), 'audio,text', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(51 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(58 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(61 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(64 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(67 AS BIGINT), CAST(3 AS BIGINT), 'text', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(69 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(70 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(71 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(72 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(80 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(81 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(84 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(86 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(87 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(92 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(98 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(102 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(105 AS BIGINT), CAST(3 AS BIGINT), 'text', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(107 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(109 AS BIGINT), CAST(3 AS BIGINT), 'text', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(117 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(118 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(120 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(121 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(147 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(150 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(151 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(152 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(164 AS BIGINT), CAST(3 AS BIGINT), 'text', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(166 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(184 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(205 AS BIGINT), CAST(5 AS BIGINT), 'text', CAST(5 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(213 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(219 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(225 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(250 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(264 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(280 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(285 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(295 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(310 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(326 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(393 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(395 AS BIGINT), CAST(2 AS BIGINT), 'text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(435 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
  (CAST(458 AS BIGINT), CAST(2 AS BIGINT), 'audio,text', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT))
) AS t("cluster_id", "n_docs", "modalities", "n_text_pairs", "n_image_pairs", "n_audio_pairs", "n_modalities")""",
    pinned_sf="0.01",
    doc="Cross-modality duplicate clustering — the capstone dedup op: "
    "text MinHash-LSH candidate pairs, image pHash pairs, and audio "
    "spectral-fingerprint pairs (planted-variant ids folded back to "
    "their source doc) union into ONE edge list tagged by modality; "
    "the shared min-label CC kernel assigns clusters; output reports "
    "per-cluster size and which modalities found it. A duplicate "
    "caught by >=2 independent signals is a high-confidence removal "
    "at 100 TB — single-signal clusters get human review. All three "
    "pair generators stay banded/bucketed (~linear candidates).",
)
def multimodal_cross_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import cached_min_label_components
    from ..functions.vectors import cached_lsh_pairs
    from ..operators.text_queries import _lsh_candidates
    from .base import REGISTRY

    def doc_level(pairs: DataFrame, modality: str) -> DataFrame:
        a = F.pmod(F.col("id_a"), F.lit(1_000_000))
        b = F.pmod(F.col("id_b"), F.lit(1_000_000))
        return (
            pairs.select(
                F.least(a, b).alias("id_a"), F.greatest(a, b).alias("id_b")
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
            .withColumn("modality", F.lit(modality))
        )

    text = (
        cached_lsh_pairs(
            spark, ("text_lsh_pairs", sf_dir), lambda: _lsh_candidates(spark, sf_dir)
        )
        .withColumn("modality", F.lit("text"))
        .select("id_a", "id_b", "modality")
    )
    image = doc_level(
        REGISTRY["multimodal_phash_neardup"].build(spark, sf_dir), "image"
    )
    audio = doc_level(
        REGISTRY["multimodal_audio_fingerprint_neardup"].build(spark, sf_dir), "audio"
    )
    edges = text.unionByName(image).unionByName(audio)
    labels = cached_min_label_components(
        spark,
        ("cross_modal_cc", sf_dir),
        lambda: edges.select("id_a", "id_b").distinct(),
    )
    tagged = edges.join(
        labels, edges.id_a == labels.node_id, "inner"
    ).select("cluster_id", "modality", "id_a", "id_b")
    return (
        tagged.groupBy("cluster_id")
        .agg(
            (
                F.size(
                    F.array_distinct(
                        F.flatten(F.collect_list(F.array("id_a", "id_b")))
                    )
                )
            ).alias("n_docs"),
            F.sort_array(F.collect_set("modality")).alias("modalities"),
            F.count(F.when(F.col("modality") == "text", 1)).alias("n_text_pairs"),
            F.count(F.when(F.col("modality") == "image", 1)).alias("n_image_pairs"),
            F.count(F.when(F.col("modality") == "audio", 1)).alias("n_audio_pairs"),
        )
        .withColumn("n_modalities", F.size("modalities"))
        .withColumn("modalities", F.concat_ws(",", "modalities"))
        .orderBy("cluster_id")
    )
