"""Generate an sfN-equivalent fixture for the local scale probe.

The driver's /root/testdata is read-only and tops out at sf0.1
(events 100k / documents 5k / embeddings 2k). To prove the scale
story beyond that (VERDICT r3 item 5), this script writes a
structurally matching fixture at an arbitrary multiplier into a
scratch dir inside the repo:

    python tools/gen_scale_fixture.py .scratch/sf1 --mult 10
    python tools/gen_scale_fixture.py .scratch/sf0.1eq --mult 1

- events:      100k·mult rows, same 30-day span (density scales),
               1500·mult users, 5 event types, exp-ish values,
               {"k": int} JSON props — same shape the sf0.1 table has.
- documents:   5k·mult rows, same small word vocab (so shingle/LSH
               candidate volume behaves like the driver corpus),
               5 langs / 20 sources with the observed skew, ~2% exact
               duplicates + ~8% near-duplicates (word-level mutations)
               so the dedup family has real work at every scale.
- embeddings:  2k·mult rows, 64-dim float32 around 10 cluster
               centers, ~5% near-duplicate pairs (tiny perturbations).
- the relational star tables are copied from /root/testdata/sf0.1
  (the probe queries that touch them are not the scale-limited ones).

Deterministic in --seed. The mult=1 output is the *same generator* as
mult=10, so probe timings compare like against like.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch agg filter query a big key window row part table stream merge "
    "data the customer join vector"
).split()

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def gen_events(out: str, n: int, n_users: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, span_us, n)) + base
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n)),
            "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
            "props": pa.array(
                np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}"
                )
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def gen_documents(out: str, n: int, seed: int) -> None:
    rng = np.random.default_rng(seed + 1)
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.02:  # exact duplicate of an earlier doc
            j = int(rng.integers(max(0, i - 2000), i))
            texts.append(texts[j])
            langs.append(langs[j])
            sources.append(f"src{rng.integers(0, 20)}")
            continue
        if i > 10 and r < 0.10:  # near-duplicate: mutate a few words
            j = int(rng.integers(max(0, i - 2000), i))
            words = texts[j].split()
            for _ in range(max(1, len(words) // 20)):
                words[int(rng.integers(0, len(words)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            texts.append(" ".join(words))
            langs.append(langs[j])
            sources.append(f"src{rng.integers(0, 20)}")
            continue
        n_words = max(5, int(rng.lognormal(3.8, 0.6)))
        texts.append(" ".join(rng.choice(VOCAB, n_words)))
        langs.append(LANGS[int(rng.choice(len(LANGS), p=LANG_W))])
        sources.append(f"src{rng.integers(0, 20)}")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, n: int, seed: int, style: str = "clustered") -> None:
    """Two geometries:

    - ``clustered`` (default): 10 dominant centers + noise; within-
      cluster cosine averages ≈0.89, so at thresholds ≤0.9 qualifying
      pairs are quadratic in cluster size — the ADVERSARIAL regime that
      stresses output-bound pair emission.
    - ``diffuse``: i.i.d. Gaussian vectors (pairwise cosine ~N(0,1/64),
      max ≈0.5 like the driver's real testdata) + the same ~5%
      tiny-perturbation near-dup families (cos ≈0.9999). This is the
      PRODUCTION-like regime: at cos ≥0.9, qualifying pairs == planted
      families == linear in corpus size.
    """
    rng = np.random.default_rng(seed + 2)
    dim, k = 64, 10
    if style == "diffuse":
        labels = rng.integers(0, k, n)
        vecs = rng.normal(0, 1.0, (n, dim))
    else:
        centers = rng.normal(0, 1.0, (k, dim))
        labels = rng.integers(0, k, n)
        vecs = centers[labels] + rng.normal(0, 0.35, (n, dim))
    # ~5% near-duplicates of earlier rows
    n_dup = n // 20
    src = rng.integers(0, n - n_dup, n_dup)
    dst = np.arange(n - n_dup, n)
    vecs[dst] = vecs[src] + rng.normal(0, 0.01, (n_dup, dim))
    labels[dst] = labels[src]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--copy-star",
        default="/root/testdata/sf0.1",
        help="dir whose relational tables are copied through",
    )
    ap.add_argument(
        "--emb-style",
        default="clustered",
        choices=("clustered", "diffuse"),
        help="embedding geometry (see gen_embeddings docstring)",
    )
    ap.add_argument(
        "--tables",
        default="events,documents,embeddings",
        help="comma list of generated tables; omitted generated tables "
        "are copied from --copy-star unscaled (e.g. --tables embeddings "
        "for a 100x embedding-family-only fixture)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    m = args.mult
    gen = set(args.tables.split(","))
    if "events" in gen:
        gen_events(args.out, int(100_000 * m), int(1500 * m), args.seed)
    if "documents" in gen:
        gen_documents(args.out, int(5_000 * m), args.seed)
    if "embeddings" in gen:
        gen_embeddings(args.out, int(2_000 * m), args.seed, style=args.emb_style)
    star = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
    passthrough = [t for t in ("events", "documents", "embeddings") if t not in gen]
    for t in star + tuple(passthrough):
        shutil.copyfile(
            os.path.join(args.copy_star, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
    print(f"wrote {args.out} at mult={m} (generated: {sorted(gen)})")


if __name__ == "__main__":
    main()
