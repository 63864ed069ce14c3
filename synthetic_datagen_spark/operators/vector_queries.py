"""Similarity-search queries over `embeddings` (driver brief: ANN over
an array<float> column).

Brute-force cosine top-k is the exactness baseline (oracle-checked);
the sign-LSH bucketed variant is the 100 TB path (rows-only — its
hyperplanes are engine-internal literals; recall vs brute force is
asserted in tests/test_vectors.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import execution as X, vectors as V
from ..sources import Catalog
from .base import pinned_parquet_oracle, register

_K = 5
_NQ = 10  # vec_id < 10 are the query vectors


def _fixed_config_max_rows() -> int:
    """Corpus size above which the near-dup entry points REFUSE their
    fixed LSH configs and derive (n_planes, n_tables) from the corpus
    count instead (scaled_lsh_params). A constant config's random-
    collision candidate term is L·2⁻ᵇ·n²/2 — quadratic in n — and the
    r9 100× probe showed it concretely: the fixed 12×6 config OOMs at
    ~9e9 candidate pairs on a 200k corpus while the size-derived
    config completes at unit cost 0.31 (SCALE_SWEEP_r9.json). Below
    the cutoff the requested fixed config is kept verbatim, so the
    literal-hyperplane SQL oracles (valid only for the fixed planes)
    are unaffected at the gate scales (≤2.5k vectors).

    Default 10 000: the r11 gray-zone probe MEASURED the old 50 000
    boundary — at 48.4k corpus rows the fixed 12×6 config burned
    443 s on 244 M bucket candidates where the scaled config finishes
    in well under a minute (SCALE_SWEEP_r11.json, before/after). The
    quadratic term reaches ~9e6 candidates at 10k — a few seconds of
    join work, a defensible worst case for the boundary. Env-
    overridable so tests can force either path on small fixtures."""
    return int(os.environ.get("SPARK_GRAFT_LSH_FIXED_MAX", "10000"))


# corpus row counts / bulk-cosine floors memoized per (applicationId,
# sf_dir, corpus kind) — the scale guard needs ONE count job and ONE
# bounded sample per corpus per session, not one per query (same
# eviction discipline as the pair/CC memos)
_COUNT_CACHE: dict = {}
_FLOOR_CACHE: dict = {}


def _memoized(cache: dict, spark: SparkSession, key: tuple, compute):
    app_id = spark.sparkContext.applicationId
    full = (app_id,) + key
    hit = cache.get(full)
    if hit is not None:
        return hit
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]
    val = compute()
    cache[full] = val
    return val


def _corpus_count(
    spark: SparkSession, sf_dir: str, corpus_kind: str, df: DataFrame
) -> int:
    return _memoized(
        _COUNT_CACHE, spark, (sf_dir, corpus_kind), lambda: df.count()
    )


def _scale_guarded_config(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    n_tables: int,
    n_planes: int,
    corpus_kind: str,
    df: DataFrame,
) -> tuple[int, int, bool]:
    """Resolve the (n_tables, n_planes) a near-dup entry point actually
    runs with — plus a guard-engaged flag: the requested fixed config
    below _fixed_config_max_rows (engaged=False), the corpus-size-
    derived scaled_lsh_params config above it (engaged=True).
    Idempotent — feeding a resolved config back in re-derives the same
    values (the derivation depends only on corpus count + threshold).
    Callers need the FLAG, not a resolved-vs-requested comparison:
    above the cutoff a pre-resolved request re-resolves to itself, so
    comparing tuples can never detect engagement on the second hop —
    the r10 defect where _dedup_clusters resolved first and
    _cached_pairs then saw resolved==requested, silently rebuilding the
    pair set with the ~10× slower JVM fold under a different memo key
    instead of sharing the scaled sibling's arrow build.

    Above the cutoff two data-quality guards also fire (r9 VERDICT
    task 3): if the threshold sits below the corpus's bulk-cosine
    floor (threshold_floor) the query's ANSWER is quadratic in corpus
    size and a warning says so; if no sane LSH config reaches the
    recall target at this threshold (lsh_config_feasible) the call
    raises instead of OOMing at ~n²/2 candidates — the r9 100× probe's
    concrete failure mode."""
    import warnings

    n = _corpus_count(spark, sf_dir, corpus_kind, df)
    if n <= _fixed_config_max_rows():
        return n_tables, n_planes, False
    floor = _memoized(
        _FLOOR_CACHE, spark, (sf_dir, corpus_kind),
        lambda: V.threshold_floor(df, vec_col="embedding"),
    )
    if threshold < floor:
        warnings.warn(
            f"near-dup threshold {threshold} is below the corpus's "
            f"bulk-cosine floor {floor:.3f} (0.999-quantile of sampled "
            f"random-pair cosines, n={n}): the matching pair set itself "
            f"grows quadratically with corpus size — raise the "
            f"threshold above the floor (SCALE_SWEEP_r9 "
            f"clustered-geometry finding)",
            stacklevel=3,
        )
    if not V.lsh_config_feasible(n, threshold):
        raise ValueError(
            f"sign-LSH cannot mine cos >= {threshold} at corpus size "
            f"{n} within a sane index budget (bulk-cosine floor "
            f"{floor:.3f}): every config either misses the recall "
            f"target or needs thousands of hash tables. Raise the "
            f"threshold above functions.vectors.threshold_floor(df), "
            f"or use the exact brute-force path on a filtered subset."
        )
    b, L = V.scaled_lsh_params(n, threshold)
    return L, b, True

_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).table("embeddings")


def _knn_panel_memo(
    spark: SparkSession, sf_dir: str, name: str, builder, narrow: bool = True
) -> DataFrame:
    """Session memo for the seeded kNN panels three catalog queries and
    knn_recall_eval share verbatim (truth / lsh 8x5 / ivf 16_4): each
    panel is deterministic in (embeddings, seed) — the same contract
    their pinned oracles rely on — so the checkpointed frame is
    interchangeable with a fresh build. Besides the cross-query
    sharing, the checkpoint anchor stops knn_recall_eval's union plan
    recomputing the brute-force truth subtree once PER ANN branch.

    ``narrow=True`` materializes a below-cutoff build under the narrow
    static confs (execution.narrow_build_confs) — the truth and LSH
    panels are pure relational per-row-fold + rank plans, verified
    bit-identical across layouts; the IVF panel passes narrow=False
    because its builder runs an MLlib KMeans fit whose determinism
    contract is per-layout (the fit input is repartition-pinned, but
    execution confs stay hands-off around MLlib on principle)."""
    n = _corpus_count(spark, sf_dir, "_emb", _emb(spark, sf_dir))
    cutoff = int(os.environ.get("SPARK_GRAFT_LSH_TINY_ROWS", "20000"))
    with X.narrow_build_confs(spark, n, cutoff if narrow else -1):
        return V.cached_lsh_pairs(spark, ("knn_panel", name, sf_dir), builder)


def _knn_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        emb = _emb(spark, sf_dir)
        q = emb.filter(F.col("vec_id") < _NQ)
        return V.brute_force_knn(q, emb, _K)

    return _knn_panel_memo(spark, sf_dir, "truth", build)


def _knn_lsh_8x5(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        emb = _emb(spark, sf_dir)
        q = emb.filter(F.col("vec_id") < _NQ)
        return V.lsh_bucketed_knn(q, emb, _K, dim=64, n_tables=8, n_planes=5, seed=42)

    return _knn_panel_memo(spark, sf_dir, "lsh_8x5", build)


def _knn_ivf_16_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        emb = _emb(spark, sf_dir)
        q = emb.filter(F.col("vec_id") < _NQ)
        return V.ivf_knn(q, emb, _K, n_lists=16, n_probe=4, seed=42)

    return _knn_panel_memo(spark, sf_dir, "ivf_16_4", build, narrow=False)


@register(
    "knn_brute_force",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_NQ}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q.embedding', b='c.embedding')}
           / (sqrt({_DOT.format(a='q.embedding', b='q.embedding')})
              * sqrt({_DOT.format(a='c.embedding', b='c.embedding')})) AS cos_sim
  FROM embeddings c, q
  WHERE c.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
""",
    doc="Exact top-5 cosine kNN for 10 query vectors: broadcast the "
    "query set, score the corpus with JVM higher-order functions "
    "(zip_with+aggregate — no Python), per-query window top-k.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _knn_truth(spark, sf_dir)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def _bucket_cte_sql(
    n_tables: int, n_planes: int, seed: int = 42, source: str = "embeddings"
) -> str:
    """Sign-LSH bucket CTEs with the hyperplanes inline as float
    literals — repr() round-trips doubles exactly, so both engines hash
    vectors to identical buckets (sign of a 64-term dot; |dot| ~ O(1),
    never near the ulp boundary for random planes). Returns the
    ``b``/``tables`` CTE bodies shared by both LSH oracles."""
    def plane_sql(plane):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        return (f"CASE WHEN list_sum(list_transform(generate_series(1, 64), "
                f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i])) >= 0 THEN 1 ELSE 0 END")

    buckets = []
    for t in range(n_tables):
        bits = [plane_sql(p) for p in V.random_hyperplanes(64, n_planes, seed + t)]
        # BIGINT fold mirrors the Spark side's long accumulator (no
        # 32-bit overflow at any plane count the scaler can choose)
        expr = f"CAST({bits[0]} AS BIGINT)"
        for b in bits[1:]:
            expr = f"({expr}) * 2 + ({b})"
        buckets.append(f"({expr}) AS bucket_{t}")
    unions = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, bucket_{t} AS bucket FROM b"
        for t in range(n_tables)
    )
    return f"""
b AS (
  SELECT vec_id, embedding,
         {", ".join(buckets)}
  FROM {source}
), tables AS (
  {unions}
)"""


def _near_dup_oracle_sql() -> str:
    """Near-dup oracle mirroring lsh_near_dup_pairs exactly: same
    8-table × 4-plane literal-hyperplane candidate set, same exact
    cosine rescore at 0.35."""
    return f"""
WITH {_bucket_cte_sql(8, 4)}
, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM tables a JOIN tables b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND({_DOT.format(a='ea', b='eb')}
         / (sqrt({_DOT.format(a='ea', b='ea')})
            * sqrt({_DOT.format(a='eb', b='eb')})), 6) AS cos_sim
FROM cand
WHERE {_DOT.format(a='ea', b='eb')}
         / (sqrt({_DOT.format(a='ea', b='ea')})
            * sqrt({_DOT.format(a='eb', b='eb')})) >= 0.35
"""


@register(
    "embedding_near_dup_pairs",
    oracle=_near_dup_oracle_sql(),
    doc="Embedding-cosine near-duplicate pairs (cos ≥ 0.35) via "
    "sign-LSH candidate pruning (8 tables × 4 planes) + exact rescore "
    "— the scale path: a shuffle self-join on (tbl, bucket) instead of "
    "the O(n²/2) all-pairs crossJoin. Fully SQL-oracled (hyperplanes "
    "inline as literals → identical candidate set in both engines); "
    "recall vs the exact brute-force baseline asserted in tests. The "
    "8×4 config is the BELOW-CUTOFF request only: past "
    "_fixed_config_max_rows the scale guard derives planes/tables from "
    "the corpus count (scaled_lsh_params) — the fixed config's "
    "random-collision term is quadratic in n and OOMed the r9 100× "
    "probe. The literal-hyperplane oracle is valid exactly where the "
    "fixed config runs (the gate scales).",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _cached_pairs(spark, sf_dir, 0.35, 8, 4, _emb)
    return out.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


def _cached_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    n_tables: int,
    n_planes: int,
    corpus,
    arrow: bool = False,
) -> DataFrame:
    """The sign-LSH candidate-pair scaffold shared across the embedding
    family: embedding_near_dup_pairs and embedding_dedup_clusters use
    the identical (0.35, 8×4) pair set; the strict/scaled siblings memo
    their own configs. One (session, input, config) → one bucket-join.
    ``arrow=True`` selects the numpy bucket kernel (rows-only queries
    only; oracled configs keep the SQL-bit-identical JVM fold).

    The requested (n_tables, n_planes) are a REQUEST, not a contract:
    above _fixed_config_max_rows the scale guard swaps in the
    corpus-size-derived scaled_lsh_params config (r9 VERDICT task —
    the fixed configs are a proven 100× scale-killer). The memo key
    uses the RESOLVED config, so siblings that resolve identically
    share one bucket-join."""
    corpus_kind = getattr(corpus, "__name__", str(corpus))
    df = corpus(spark, sf_dir)
    n_tables, n_planes, engaged = _scale_guarded_config(
        spark, sf_dir, threshold, n_tables, n_planes, corpus_kind, df
    )
    if engaged:
        # guard engaged => outside oracle territory (the literal-
        # hyperplane SQL only ever runs at gate scales below the
        # cutoff), so take the numpy bucket kernel too: scaled configs
        # carry the big plane×table products where the vectorized
        # matmul beats the interpreted per-element JVM fold ~10×
        arrow = True
    # r13 optimization: on a below-cutoff corpus the scaffold build's
    # wall is AQE sub-job scheduling (measured: 12 driver jobs / 6.5 s
    # for the 2 000-vector sf0.1 build; AQE off + 8 static partitions =
    # 1 job / 3.0 s, pair set identical — the per-row fold arithmetic
    # is layout-independent and the driver hash sorts rows). Same
    # discipline as graph._tiny_graph_confs; a big corpus keeps AQE.
    n = _corpus_count(spark, sf_dir, corpus_kind, df)
    with X.narrow_build_confs(
        spark, n, int(os.environ.get("SPARK_GRAFT_LSH_TINY_ROWS", "20000"))
    ):
        return V.cached_lsh_pairs(
            spark,
            ("lsh_pairs", sf_dir, threshold, n_tables, n_planes, corpus_kind, arrow),
            lambda: V.lsh_near_dup_pairs(
                df, threshold, dim=64,
                n_tables=n_tables, n_planes=n_planes, seed=42,
                arrow_buckets=arrow,
            ),
        )


def _semantic_cluster_oracle_sql(
    threshold: float = 0.35,
    n_tables: int = 8,
    n_planes: int = 4,
    source: str = "embeddings",
    pre_cte: str = "",
) -> str:
    """Recursive transitive closure over the exact near-dup pair graph
    (same literal hyperplanes + exact-cosine rescore as the Spark
    query): component min == propagated min label."""
    cos = (
        f"{_DOT.format(a='ea', b='eb')} / (sqrt({_DOT.format(a='ea', b='ea')})"
        f" * sqrt({_DOT.format(a='eb', b='eb')}))"
    )
    return f"""
WITH RECURSIVE {pre_cte}{_bucket_cte_sql(n_tables, n_planes, source=source).strip()}
, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM (SELECT vec_id, embedding AS ea, tbl, bucket FROM tables) a
  JOIN (SELECT vec_id, embedding AS eb, tbl, bucket FROM tables) b
    ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id AND {cos} >= {threshold}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL SELECT id_b, id_a FROM cand
), reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS vec_id,
       CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id,
       a = LEAST(a, MIN(b)) AS keep
FROM reach GROUP BY a ORDER BY vec_id
"""


@register(
    "embedding_dedup_clusters",
    oracle=_semantic_cluster_oracle_sql(),
    doc="Semantic (embedding-cosine) duplicate clustering end-to-end — "
    "the embedding analogue of the text curation funnel's near-dup "
    "stage: sign-LSH candidate pairs (8×4, exact 0.35 rescore) → "
    "connected components via the shared min-label kernel "
    "(functions/graph.py, O(log diameter) join+min rounds) → one row "
    "per clustered vector with its canonical (min) vec_id and the "
    "keep-one-per-cluster flag. Fully SQL-oracled: literal hyperplanes "
    "+ recursive-CTE closure give DuckDB the identical clustering.",
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup_clusters(spark, sf_dir, 0.35, n_tables=8, n_planes=4)


def _dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    n_tables: int,
    n_planes: int,
    corpus=None,
    arrow: bool = False,
) -> DataFrame:
    from ..functions.graph import cached_min_label_components

    src = corpus if corpus is not None else _emb
    kind = getattr(src, "__name__", str(src))
    # resolve the scale guard BEFORE building the CC memo key, so two
    # entry points whose configs resolve to the same scaled params
    # share both the pair memo and the CC labels. Thread the ENGAGED
    # flag into the arrow choice — the resolved tuple alone can't carry
    # it (re-resolution is idempotent), and a mismatched arrow flag is
    # a pair-memo MISS: the dedup path would rebuild the pair set with
    # the slow JVM fold instead of sharing the sibling's arrow build
    # (r10 ADVICE, medium).
    n_tables, n_planes, engaged = _scale_guarded_config(
        spark, sf_dir, threshold, n_tables, n_planes,
        kind, src(spark, sf_dir),
    )
    arrow = arrow or engaged
    labels = cached_min_label_components(
        spark,
        (f"emb_lsh_cc_{threshold}_{n_tables}x{n_planes}_{kind}", sf_dir),
        lambda: _cached_pairs(
            spark, sf_dir, threshold, n_tables, n_planes, src, arrow=arrow
        ).select("id_a", "id_b"),
    )
    return (
        labels.select(
            F.col("node_id").alias("vec_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
            (F.col("node_id") == F.col("cluster_id")).alias("keep"),
        )
        .orderBy("vec_id")
    )


_STRICT_PRE_CTE = """corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_prepend(-embedding[1], embedding[2:]) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
), """


@register(
    "embedding_dedup_clusters_strict",
    oracle=_semantic_cluster_oracle_sql(
        threshold=0.9, n_tables=12, n_planes=6,
        source="corpus", pre_cte=_STRICT_PRE_CTE,
    ),
    doc="PRODUCTION-threshold semantic dedup (cos ≥ 0.9) — the regime a "
    "real 100 TB curation run uses, where near-dup output is LINEAR in "
    "corpus size (vs the 0.35 exploratory threshold of "
    "embedding_dedup_clusters, whose pair set is quadratic in cluster "
    "size by its own semantics). The synthetic fixture has no natural "
    "pairs above cos 0.52, so the corpus plants a near-dup variant "
    "(first coordinate negated — fp-exact in both engines) for every "
    "10th vector; the resulting planted cosines straddle 0.9 (48 of 50 "
    "accepted at sf0.01), so the threshold genuinely discriminates. "
    "LSH config is retuned for the tighter threshold: 6 planes/table "
    "(64 buckets — ~4× fewer candidates per table than the 4-plane "
    "config) × 12 tables keeps pair recall ≈99.8% at cos 0.9 "
    "(p = 1-θ/π ≈ 0.857, 1-(1-p^6)^12; verified vs brute force in "
    "tests/test_vectors.py). Same shared min-label CC kernel; "
    "SQL-oracled end-to-end via literal hyperplanes + recursive-CTE "
    "closure. Above _fixed_config_max_rows the scale guard replaces "
    "12×6 with the corpus-size-derived scaled_lsh_params config — at "
    "that point this query IS embedding_dedup_clusters_scaled (they "
    "resolve to the same memo keys and share one bucket-join).",
)
def embedding_dedup_clusters_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup_clusters(
        spark, sf_dir, 0.9, n_tables=12, n_planes=6, corpus=_planted_corpus
    )


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ planted near-dup variants (vec_id % 10 == 0 →
    id + 1000000, first coordinate negated). Negation is exact in fp,
    so Spark and the DuckDB oracle build bit-identical corpora."""
    emb = _emb(spark, sf_dir)
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.concat(
            F.array(-F.element_at("embedding", 1)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(planted)


def _lsh_oracle_sql() -> str:
    """Sign-LSH kNN oracle: 8-table × 5-plane literal-hyperplane
    buckets (see _bucket_cte_sql), query-side filtered, rescored and
    ranked per query. 8×5 (vs the old 4×6) doubles the table count and
    widens buckets — measured recall@5 vs brute force rises 0.08 →
    ≥0.4 for ~4× the candidate volume, still ~linear at corpus scale."""
    return f"""
WITH {_bucket_cte_sql(8, 5)}
, cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qe, c.embedding AS ce
  FROM tables q JOIN tables c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < {_NQ} AND c.vec_id != q.vec_id
), scored AS (
  SELECT query_id, neighbor_id,
         {_DOT.format(a='qe', b='ce')}
           / (sqrt({_DOT.format(a='qe', b='qe')}) * sqrt({_DOT.format(a='ce', b='ce')})) AS cos_sim
  FROM cand
), ranked AS (
  SELECT query_id, neighbor_id, ROUND(cos_sim, 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {_K}
"""


@register(
    "knn_lsh_bucketed",
    oracle=_lsh_oracle_sql(),
    doc="Approximate kNN via 8-table × 5-plane sign-LSH bucketing + "
    "exact rescoring inside buckets — the scale path (candidates from "
    "bucket collisions instead of the full corpus). Fully SQL-oracled: "
    "the splitmix hyperplanes inline as literals, so DuckDB builds the "
    "identical index.",
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _knn_lsh_8x5(spark, sf_dir)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


# Pinned literal-VALUES oracles for the seeded ANN trio, captured at
# sf0.01 by tools/pin_oracles.py (r10 VERDICT task 3). All three are
# pure functions of (seed=42, sf0.01 embeddings): hyperplanes/KMeans
# inits are seed-pinned and every per-pair cosine is a fixed-order
# expression (no cross-row float accumulation), so the full 50-row
# result is bit-deterministic — verified identical across independent
# processes before pinning. MLlib KMeans's documented layout
# sensitivity (k-means|| samples per partition) was re-examined
# late-r11: all three queries were re-built under local[8] +
# 200 shuffle partitions vs local[32] + 32 and matched CELL-EXACTLY —
# at the pinned scale the tiny embeddings scan collapses to the same
# split layout under any parallelism, so the fit input is invariant.
# The residual risk (a bigger file splitting differently) is bounded
# by pinned_sf: the gate only evaluates these literals against the
# fixed sf0.01 file. Regenerate with the tool if the fixture,
# seeds, or index configs ever change.
_PIN_KNN_IVF = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(365 AS BIGINT), CAST(0.3699935965460897 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(320 AS BIGINT), CAST(0.2878605122093518 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(190 AS BIGINT), CAST(0.2817947192081154 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(464 AS BIGINT), CAST(0.2766279302075019 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(498 AS BIGINT), CAST(0.25072556674447577 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(386 AS BIGINT), CAST(0.37148454183744223 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(27 AS BIGINT), CAST(0.3482081864636984 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(407 AS BIGINT), CAST(0.3270099496117245 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(195 AS BIGINT), CAST(0.32274442635213746 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(402 AS BIGINT), CAST(0.2923219897446138 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(117 AS BIGINT), CAST(0.318142564237661 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(188 AS BIGINT), CAST(0.263272104561668 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(320 AS BIGINT), CAST(0.25504277088103294 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(418 AS BIGINT), CAST(0.25402949645206835 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(471 AS BIGINT), CAST(0.24719275246584027 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(343 AS BIGINT), CAST(0.30847165466962984 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(174 AS BIGINT), CAST(0.30354804540607316 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(207 AS BIGINT), CAST(0.29170184705661967 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(437 AS BIGINT), CAST(0.28053528594179866 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(474 AS BIGINT), CAST(0.2767381136347725 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(114 AS BIGINT), CAST(0.39851269358433744 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(408 AS BIGINT), CAST(0.32275312529105415 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(280 AS BIGINT), CAST(0.27982608680315935 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(249 AS BIGINT), CAST(0.2796306459978647 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(470 AS BIGINT), CAST(0.2525366199686862 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(157 AS BIGINT), CAST(0.31125602484760423 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(33 AS BIGINT), CAST(0.3109867269549467 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(395 AS BIGINT), CAST(0.2755988285521192 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(487 AS BIGINT), CAST(0.2630433732893686 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(182 AS BIGINT), CAST(0.2073426508588085 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(430 AS BIGINT), CAST(0.32252026548071816 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(145 AS BIGINT), CAST(0.2976957384094014 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(395 AS BIGINT), CAST(0.2591195532405805 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(252 AS BIGINT), CAST(0.255629792758746 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(371 AS BIGINT), CAST(0.24136445905502324 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(340 AS BIGINT), CAST(0.4927657135003488 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(425 AS BIGINT), CAST(0.4075199341921925 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(209 AS BIGINT), CAST(0.3944625171493481 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(334 AS BIGINT), CAST(0.3569014029689115 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(381 AS BIGINT), CAST(0.3451787678585175 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(39 AS BIGINT), CAST(0.384696274117943 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(138 AS BIGINT), CAST(0.35667116396668896 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(403 AS BIGINT), CAST(0.3382375201415271 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(497 AS BIGINT), CAST(0.31779823647761163 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(380 AS BIGINT), CAST(0.3045263882069312 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(49 AS BIGINT), CAST(0.38517053208433855 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(414 AS BIGINT), CAST(0.3323000623250119 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(386 AS BIGINT), CAST(0.3221179074351903 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(107 AS BIGINT), CAST(0.2844935027707189 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(256 AS BIGINT), CAST(0.2844743732954765 AS DOUBLE), CAST(5 AS BIGINT))
) AS t("query_id", "neighbor_id", "cos_sim", "rank")
"""

_PIN_KNN_PQ = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(365 AS BIGINT), CAST(0.369994 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(334 AS BIGINT), CAST(0.362722 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(387 AS BIGINT), CAST(0.331139 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(423 AS BIGINT), CAST(0.296934 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(7 AS BIGINT), CAST(0.292842 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(27 AS BIGINT), CAST(0.348208 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(407 AS BIGINT), CAST(0.32701 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(195 AS BIGINT), CAST(0.322744 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(64 AS BIGINT), CAST(0.316374 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(124 AS BIGINT), CAST(0.30275 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(117 AS BIGINT), CAST(0.318143 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(450 AS BIGINT), CAST(0.266344 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(145 AS BIGINT), CAST(0.263494 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(418 AS BIGINT), CAST(0.254029 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(471 AS BIGINT), CAST(0.247193 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(130 AS BIGINT), CAST(0.399872 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(149 AS BIGINT), CAST(0.329934 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(343 AS BIGINT), CAST(0.308472 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(174 AS BIGINT), CAST(0.303548 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(231 AS BIGINT), CAST(0.298788 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(114 AS BIGINT), CAST(0.398513 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(496 AS BIGINT), CAST(0.341212 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(482 AS BIGINT), CAST(0.313897 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(280 AS BIGINT), CAST(0.279826 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(249 AS BIGINT), CAST(0.279631 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(404 AS BIGINT), CAST(0.328403 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(157 AS BIGINT), CAST(0.311256 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(33 AS BIGINT), CAST(0.310987 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(487 AS BIGINT), CAST(0.263043 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(266 AS BIGINT), CAST(0.260944 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(430 AS BIGINT), CAST(0.32252 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(145 AS BIGINT), CAST(0.297696 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(437 AS BIGINT), CAST(0.283031 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(386 AS BIGINT), CAST(0.275196 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(395 AS BIGINT), CAST(0.25912 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(340 AS BIGINT), CAST(0.492766 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(425 AS BIGINT), CAST(0.40752 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(209 AS BIGINT), CAST(0.394463 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(334 AS BIGINT), CAST(0.356901 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(381 AS BIGINT), CAST(0.345179 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(39 AS BIGINT), CAST(0.384696 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(497 AS BIGINT), CAST(0.317798 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(380 AS BIGINT), CAST(0.304526 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(173 AS BIGINT), CAST(0.30203 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(494 AS BIGINT), CAST(0.284058 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(489 AS BIGINT), CAST(0.343538 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(414 AS BIGINT), CAST(0.3323 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(386 AS BIGINT), CAST(0.322118 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(256 AS BIGINT), CAST(0.284474 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(205 AS BIGINT), CAST(0.234705 AS DOUBLE), CAST(5 AS BIGINT))
) AS t("query_id", "neighbor_id", "cos_sim", "rank")
"""

_PIN_KNN_IVFPQ = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(365 AS BIGINT), CAST(0.369994 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(334 AS BIGINT), CAST(0.362722 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(423 AS BIGINT), CAST(0.296934 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(73 AS BIGINT), CAST(0.295434 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(0 AS BIGINT), CAST(190 AS BIGINT), CAST(0.281795 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(386 AS BIGINT), CAST(0.371485 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(27 AS BIGINT), CAST(0.348208 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(407 AS BIGINT), CAST(0.32701 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(64 AS BIGINT), CAST(0.316374 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(124 AS BIGINT), CAST(0.30275 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(117 AS BIGINT), CAST(0.318143 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(145 AS BIGINT), CAST(0.263494 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(188 AS BIGINT), CAST(0.263272 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(418 AS BIGINT), CAST(0.254029 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(471 AS BIGINT), CAST(0.247193 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(174 AS BIGINT), CAST(0.303548 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(207 AS BIGINT), CAST(0.291702 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(315 AS BIGINT), CAST(0.285192 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(363 AS BIGINT), CAST(0.268615 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(396 AS BIGINT), CAST(0.260965 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(114 AS BIGINT), CAST(0.398513 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(496 AS BIGINT), CAST(0.341212 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(482 AS BIGINT), CAST(0.313897 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(280 AS BIGINT), CAST(0.279826 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(4 AS BIGINT), CAST(249 AS BIGINT), CAST(0.279631 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(419 AS BIGINT), CAST(0.319237 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(157 AS BIGINT), CAST(0.311256 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(316 AS BIGINT), CAST(0.291112 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(395 AS BIGINT), CAST(0.275599 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(5 AS BIGINT), CAST(464 AS BIGINT), CAST(0.270882 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(350 AS BIGINT), CAST(0.324518 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(430 AS BIGINT), CAST(0.32252 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(252 AS BIGINT), CAST(0.25563 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(371 AS BIGINT), CAST(0.241364 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(11 AS BIGINT), CAST(0.235949 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(340 AS BIGINT), CAST(0.492766 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(425 AS BIGINT), CAST(0.40752 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(209 AS BIGINT), CAST(0.394463 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(334 AS BIGINT), CAST(0.356901 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(7 AS BIGINT), CAST(381 AS BIGINT), CAST(0.345179 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(39 AS BIGINT), CAST(0.384696 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(138 AS BIGINT), CAST(0.356671 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(403 AS BIGINT), CAST(0.338238 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(497 AS BIGINT), CAST(0.317798 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(8 AS BIGINT), CAST(380 AS BIGINT), CAST(0.304526 AS DOUBLE), CAST(5 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(489 AS BIGINT), CAST(0.343538 AS DOUBLE), CAST(1 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(386 AS BIGINT), CAST(0.322118 AS DOUBLE), CAST(2 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(107 AS BIGINT), CAST(0.284494 AS DOUBLE), CAST(3 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(256 AS BIGINT), CAST(0.284474 AS DOUBLE), CAST(4 AS BIGINT)),
  (CAST(9 AS BIGINT), CAST(198 AS BIGINT), CAST(0.258676 AS DOUBLE), CAST(5 AS BIGINT))
) AS t("query_id", "neighbor_id", "cos_sim", "rank")
"""


@register(
    "knn_ivf",
    oracle=_PIN_KNN_IVF,  # pinned values, sf0.01 (see note above)
    pinned_sf="0.01",
    doc="IVF approximate kNN: seed-pinned KMeans coarse quantizer over "
    "the corpus (one MLlib fit), inverted lists per centroid, each "
    "query probes its 4 nearest of 16 centroids and rescores exactly "
    "inside the probed lists — candidates ≈ |C|·n_probe/n_lists per "
    "query. The IVF scale path beside sign-LSH (knn_lsh_bucketed).",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _knn_ivf_16_4(spark, sf_dir)


_PIN_SCALED_CLUSTERS = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE),
  (CAST(10 AS BIGINT), CAST(10 AS BIGINT), TRUE),
  (CAST(20 AS BIGINT), CAST(20 AS BIGINT), TRUE),
  (CAST(40 AS BIGINT), CAST(40 AS BIGINT), TRUE),
  (CAST(50 AS BIGINT), CAST(50 AS BIGINT), TRUE),
  (CAST(60 AS BIGINT), CAST(60 AS BIGINT), TRUE),
  (CAST(70 AS BIGINT), CAST(70 AS BIGINT), TRUE),
  (CAST(80 AS BIGINT), CAST(80 AS BIGINT), TRUE),
  (CAST(90 AS BIGINT), CAST(90 AS BIGINT), TRUE),
  (CAST(100 AS BIGINT), CAST(100 AS BIGINT), TRUE),
  (CAST(110 AS BIGINT), CAST(110 AS BIGINT), TRUE),
  (CAST(120 AS BIGINT), CAST(120 AS BIGINT), TRUE),
  (CAST(130 AS BIGINT), CAST(130 AS BIGINT), TRUE),
  (CAST(140 AS BIGINT), CAST(140 AS BIGINT), TRUE),
  (CAST(150 AS BIGINT), CAST(150 AS BIGINT), TRUE),
  (CAST(160 AS BIGINT), CAST(160 AS BIGINT), TRUE),
  (CAST(170 AS BIGINT), CAST(170 AS BIGINT), TRUE),
  (CAST(180 AS BIGINT), CAST(180 AS BIGINT), TRUE),
  (CAST(190 AS BIGINT), CAST(190 AS BIGINT), TRUE),
  (CAST(200 AS BIGINT), CAST(200 AS BIGINT), TRUE),
  (CAST(210 AS BIGINT), CAST(210 AS BIGINT), TRUE),
  (CAST(220 AS BIGINT), CAST(220 AS BIGINT), TRUE),
  (CAST(230 AS BIGINT), CAST(230 AS BIGINT), TRUE),
  (CAST(240 AS BIGINT), CAST(240 AS BIGINT), TRUE),
  (CAST(250 AS BIGINT), CAST(250 AS BIGINT), TRUE),
  (CAST(260 AS BIGINT), CAST(260 AS BIGINT), TRUE),
  (CAST(270 AS BIGINT), CAST(270 AS BIGINT), TRUE),
  (CAST(280 AS BIGINT), CAST(280 AS BIGINT), TRUE),
  (CAST(290 AS BIGINT), CAST(290 AS BIGINT), TRUE),
  (CAST(300 AS BIGINT), CAST(300 AS BIGINT), TRUE),
  (CAST(310 AS BIGINT), CAST(310 AS BIGINT), TRUE),
  (CAST(320 AS BIGINT), CAST(320 AS BIGINT), TRUE),
  (CAST(330 AS BIGINT), CAST(330 AS BIGINT), TRUE),
  (CAST(350 AS BIGINT), CAST(350 AS BIGINT), TRUE),
  (CAST(360 AS BIGINT), CAST(360 AS BIGINT), TRUE),
  (CAST(370 AS BIGINT), CAST(370 AS BIGINT), TRUE),
  (CAST(380 AS BIGINT), CAST(380 AS BIGINT), TRUE),
  (CAST(390 AS BIGINT), CAST(390 AS BIGINT), TRUE),
  (CAST(400 AS BIGINT), CAST(400 AS BIGINT), TRUE),
  (CAST(410 AS BIGINT), CAST(410 AS BIGINT), TRUE),
  (CAST(420 AS BIGINT), CAST(420 AS BIGINT), TRUE),
  (CAST(430 AS BIGINT), CAST(430 AS BIGINT), TRUE),
  (CAST(440 AS BIGINT), CAST(440 AS BIGINT), TRUE),
  (CAST(450 AS BIGINT), CAST(450 AS BIGINT), TRUE),
  (CAST(460 AS BIGINT), CAST(460 AS BIGINT), TRUE),
  (CAST(470 AS BIGINT), CAST(470 AS BIGINT), TRUE),
  (CAST(480 AS BIGINT), CAST(480 AS BIGINT), TRUE),
  (CAST(490 AS BIGINT), CAST(490 AS BIGINT), TRUE),
  (CAST(1000000 AS BIGINT), CAST(0 AS BIGINT), FALSE),
  (CAST(1000010 AS BIGINT), CAST(10 AS BIGINT), FALSE),
  (CAST(1000020 AS BIGINT), CAST(20 AS BIGINT), FALSE),
  (CAST(1000040 AS BIGINT), CAST(40 AS BIGINT), FALSE),
  (CAST(1000050 AS BIGINT), CAST(50 AS BIGINT), FALSE),
  (CAST(1000060 AS BIGINT), CAST(60 AS BIGINT), FALSE),
  (CAST(1000070 AS BIGINT), CAST(70 AS BIGINT), FALSE),
  (CAST(1000080 AS BIGINT), CAST(80 AS BIGINT), FALSE),
  (CAST(1000090 AS BIGINT), CAST(90 AS BIGINT), FALSE),
  (CAST(1000100 AS BIGINT), CAST(100 AS BIGINT), FALSE),
  (CAST(1000110 AS BIGINT), CAST(110 AS BIGINT), FALSE),
  (CAST(1000120 AS BIGINT), CAST(120 AS BIGINT), FALSE),
  (CAST(1000130 AS BIGINT), CAST(130 AS BIGINT), FALSE),
  (CAST(1000140 AS BIGINT), CAST(140 AS BIGINT), FALSE),
  (CAST(1000150 AS BIGINT), CAST(150 AS BIGINT), FALSE),
  (CAST(1000160 AS BIGINT), CAST(160 AS BIGINT), FALSE),
  (CAST(1000170 AS BIGINT), CAST(170 AS BIGINT), FALSE),
  (CAST(1000180 AS BIGINT), CAST(180 AS BIGINT), FALSE),
  (CAST(1000190 AS BIGINT), CAST(190 AS BIGINT), FALSE),
  (CAST(1000200 AS BIGINT), CAST(200 AS BIGINT), FALSE),
  (CAST(1000210 AS BIGINT), CAST(210 AS BIGINT), FALSE),
  (CAST(1000220 AS BIGINT), CAST(220 AS BIGINT), FALSE),
  (CAST(1000230 AS BIGINT), CAST(230 AS BIGINT), FALSE),
  (CAST(1000240 AS BIGINT), CAST(240 AS BIGINT), FALSE),
  (CAST(1000250 AS BIGINT), CAST(250 AS BIGINT), FALSE),
  (CAST(1000260 AS BIGINT), CAST(260 AS BIGINT), FALSE),
  (CAST(1000270 AS BIGINT), CAST(270 AS BIGINT), FALSE),
  (CAST(1000280 AS BIGINT), CAST(280 AS BIGINT), FALSE),
  (CAST(1000290 AS BIGINT), CAST(290 AS BIGINT), FALSE),
  (CAST(1000300 AS BIGINT), CAST(300 AS BIGINT), FALSE),
  (CAST(1000310 AS BIGINT), CAST(310 AS BIGINT), FALSE),
  (CAST(1000320 AS BIGINT), CAST(320 AS BIGINT), FALSE),
  (CAST(1000330 AS BIGINT), CAST(330 AS BIGINT), FALSE),
  (CAST(1000350 AS BIGINT), CAST(350 AS BIGINT), FALSE),
  (CAST(1000360 AS BIGINT), CAST(360 AS BIGINT), FALSE),
  (CAST(1000370 AS BIGINT), CAST(370 AS BIGINT), FALSE),
  (CAST(1000380 AS BIGINT), CAST(380 AS BIGINT), FALSE),
  (CAST(1000390 AS BIGINT), CAST(390 AS BIGINT), FALSE),
  (CAST(1000400 AS BIGINT), CAST(400 AS BIGINT), FALSE),
  (CAST(1000410 AS BIGINT), CAST(410 AS BIGINT), FALSE),
  (CAST(1000420 AS BIGINT), CAST(420 AS BIGINT), FALSE),
  (CAST(1000430 AS BIGINT), CAST(430 AS BIGINT), FALSE),
  (CAST(1000440 AS BIGINT), CAST(440 AS BIGINT), FALSE),
  (CAST(1000450 AS BIGINT), CAST(450 AS BIGINT), FALSE),
  (CAST(1000460 AS BIGINT), CAST(460 AS BIGINT), FALSE),
  (CAST(1000470 AS BIGINT), CAST(470 AS BIGINT), FALSE),
  (CAST(1000480 AS BIGINT), CAST(480 AS BIGINT), FALSE),
  (CAST(1000490 AS BIGINT), CAST(490 AS BIGINT), FALSE)
) AS t("vec_id", "cluster_id", "keep")
"""


@register(
    "embedding_dedup_clusters_scaled",
    oracle=_PIN_SCALED_CLUSTERS,  # r11 pinned VALUES at sf0.01: the LSH
    # params derive from the corpus COUNT at runtime so no static
    # literal-hyperplane SQL exists, but the OUTPUT is integer/bool-only
    # and bit-deterministic (verified across independent processes);
    # cluster parity with the SQL-oracled fixed-config sibling and the
    # 100%-recall-vs-brute-force test remain in tests/test_vectors.py
    pinned_sf="0.01",
    doc="The 100 TB configuration of production-threshold semantic dedup: "
    "same planted corpus and cos ≥ 0.9 semantics as "
    "embedding_dedup_clusters_strict, but the sign-LSH plane/table "
    "counts come from scaled_lsh_params(corpus count) — planes grow "
    "with log2(n) so the random-collision candidate term (L·2⁻ᵇ·n²/2, "
    "quadratic under ANY fixed config) stays ≤ ~50 candidates/vector, "
    "tables set for ≥99% pair recall at the threshold. Probe-measured "
    "at 10× data (round 7, output-attributed): 5.86× wall time while "
    "the emitted pair set grows 104× (the replicated fixture's "
    "within-group duplicates) — time_per_output_growth 0.06 "
    "(SCALE_SWEEP_r7.json); at sf0.01 the chosen config is 6×10, at "
    "sf1-equivalent 13×33.",
)
def embedding_dedup_clusters_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_corpus(spark, sf_dir)
    n = _corpus_count(spark, sf_dir, "_planted_corpus", corpus)
    b, L = V.scaled_lsh_params(n, 0.9)
    # Arrow bucket kernel at every scale: this query is rows-only (no
    # SQL oracle to stay bit-identical to) and its scale-aware configs
    # carry the largest plane counts in the catalog — exactly where the
    # numpy matmul beats interpreted per-element HOF evaluation most.
    # Routing through _dedup_clusters means above _fixed_config_max_rows
    # this query and embedding_dedup_clusters_strict resolve to the SAME
    # pair-memo and CC-memo keys — one bucket-join, one label pass,
    # shared (r10 ADVICE: the old scaled-specific CC key prefix kept
    # the labels separate even when the pair sets were identical).
    return _dedup_clusters(
        spark, sf_dir, 0.9, L, b, corpus=_planted_corpus, arrow=True
    )


@register(
    "knn_pq",
    oracle=_PIN_KNN_PQ,  # pinned values, sf0.01 (see note above);
    # recall vs brute force and cross-partitioning determinism are
    # additionally pinned in tests/test_vectors.py
    pinned_sf="0.01",
    doc="PQ/ADC approximate kNN — the memory-bound 100 TB ANN path "
    "(FAISS-style product quantization): corpus vectors L2-normalize "
    "and encode to 8 sub-codes of 4 bits (512 B float64 -> 4 B, 128x "
    "compression), queries scan the code table via asymmetric-distance "
    "lookup (m adds per vector, no vector arithmetic), top-50 ADC "
    "candidates rescore exactly. Codebooks train on a bounded seeded "
    "sample driver-side (the FAISS practice); encoding and the ADC "
    "scan are one Arrow-batched mapInPandas pass each. Third ANN "
    "family beside sign-LSH (knn_lsh_bucketed) and IVF (knn_ivf) — at "
    "100 TB, PQ is what lets the index live in executor memory.",
)
def knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _NQ)
    out = V.pq_knn(q, emb, _K, m=8, n_cent=16, top_c=50, seed=42)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


@register(
    "knn_ivfpq",
    oracle=_PIN_KNN_IVFPQ,  # pinned values, sf0.01 (see note above);
    # recall vs brute force and the save/load/query lifecycle are
    # additionally pinned in tests/test_vectors.py
    pinned_sf="0.01",
    doc="IVFPQ approximate kNN — the canonical 100 TB ANN composition "
    "(FAISS IndexIVFPQ): KMeans coarse quantizer -> inverted lists; "
    "each vector stores list_id + 4-bit PQ codes of its RESIDUAL "
    "(v - centroid), so the whole searchable corpus is ~5 bytes/vector "
    "plus one small centroid set. Queries probe their 4 nearest of 8 "
    "centroids and ADC-scan only those lists (score = q.centroid + "
    "residual table lookups, m adds per candidate), then the top-50 "
    "rescore exactly. Completes the ANN family: sign-LSH (hashing), "
    "IVF (partition pruning), PQ (compression), IVFPQ (both).",
)
def knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _NQ)
    idx = V.IvfPqIndex.build(emb, n_lists=8, m=8, n_cent=16, seed=42)
    out = idx.query(q, _K, n_probe=4, top_c=50, rescore=emb)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


_NORM = "sqrt({d})".format(d=_DOT.format(a="embedding", b="embedding"))


@register(
    "label_balanced_resample",
    oracle=f"""
WITH ranked AS (
  SELECT vec_id, label, embedding,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
  FROM embeddings
)
SELECT label, COUNT(*) AS n_kept,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(SUM(CAST(ROUND({_NORM}, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm
FROM ranked WHERE rk <= 40
GROUP BY label ORDER BY label
""",
    doc="Class-balanced dataset assembly: keep a deterministic 40-"
    "vector sample per label, ranked by md5(vec_id) — the same hash-"
    "rank idiom as stratified_hash_downsample, so the selection is "
    "reproducible across engines and cluster sizes (no RAND). The "
    "window partitions by label (never a global sort), and sum_vec_id "
    "pins the exact selected membership while the decimal-summed "
    "norms pin the payloads. The balancing step behind every "
    "class-skew-corrected training mix.",
)
def label_balanced_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    norm = V.l2_norm(V._as_double(F.col("embedding")))
    return (
        emb.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 40)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
            F.sum(F.round(norm, 6).cast("decimal(18,6)")).cast("double").alias("sum_norm"),
        )
        .orderBy("label")
    )


@register(
    "embedding_int8_quantization_error",
    oracle="""
WITH el AS (
  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
), stats AS (
  SELECT dim, MIN(x) AS vmin, MAX(x) AS vmax FROM el GROUP BY dim
), q AS (
  SELECT el.dim, el.x, s.vmin, s.vmax,
         CASE WHEN s.vmax = s.vmin THEN 0.0
              ELSE ABS(el.x - (s.vmin + FLOOR((el.x - s.vmin) / ((s.vmax - s.vmin) / 255.0) + 0.5)
                                       * ((s.vmax - s.vmin) / 255.0)))
         END AS abs_err
  FROM el JOIN stats s USING (dim)
)
SELECT dim,
       ROUND(MIN(vmin), 6) AS vmin,
       ROUND(MAX(vmax), 6) AS vmax,
       ROUND(CAST(SUM(CAST(ROUND(abs_err, 9) AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 9) AS mean_abs_err,
       ROUND(MAX(abs_err), 9) AS max_abs_err
FROM q GROUP BY dim ORDER BY dim
""",
    doc="Int8 scalar-quantization error panel — the compression step "
    "that shrinks an ANN corpus 4x before PQ even starts: per-"
    "dimension min/max over the corpus, 255-level uniform grid, "
    "round-to-nearest code (FLOOR(u+0.5) — identical in both engines, "
    "unlike ROUND's tie rules), reconstruction error per element. The "
    "64-row stats side broadcasts back onto the exploded elements, so "
    "the plan is two hash-aggs plus a broadcast join — no shuffle of "
    "the element table twice. Errors are decimal-summed after 9dp "
    "rounding so the cross-row mean is order-independent.",
)
def embedding_int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    el = emb.select(
        "vec_id", F.posexplode(V._as_double(F.col("embedding"))).alias("pos", "x")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "x")
    stats = el.groupBy("dim").agg(F.min("x").alias("vmin"), F.max("x").alias("vmax"))
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    recon = F.col("vmin") + F.floor((F.col("x") - F.col("vmin")) / scale + 0.5) * scale
    abs_err = F.when(F.col("vmax") == F.col("vmin"), F.lit(0.0)).otherwise(
        F.abs(F.col("x") - recon)
    )
    q = el.join(F.broadcast(stats), "dim").withColumn("abs_err", abs_err)
    return (
        q.groupBy("dim")
        .agg(
            F.round(F.min("vmin"), 6).alias("vmin"),
            F.round(F.max("vmax"), 6).alias("vmax"),
            F.round(
                F.sum(F.round(F.col("abs_err"), 9).cast("decimal(18,9)")).cast("double")
                / F.count("*"),
                9,
            ).alias("mean_abs_err"),
            F.round(F.max("abs_err"), 9).alias("max_abs_err"),
        )
        .orderBy("dim")
    )


@register(
    "doc_embedding_join_panel",
    oracle=f"""
SELECT e.label, d.lang, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(ROUND({_NORM.replace('embedding', 'e.embedding')}, 6)
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label, d.lang ORDER BY e.label, d.lang
""",
    doc="Document-to-embedding-row join: the RAG/curation primitive "
    "that attaches a vector (and its cluster label) to each document "
    "for label-aware corpus slicing. Plain co-partitioned equi-join on "
    "the id — at 100 TB BOTH sides are large, so neither broadcasts; "
    "the shuffle keys match the natural storage bucketing (doc_id / "
    "vec_id), then one hash-agg per (label, lang). Decimal-summed "
    "norms keep the cross-row float aggregation order-independent.",
)
def doc_embedding_join_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    d = cat.table("documents")
    e = _emb(spark, sf_dir)
    norm = V.l2_norm(V._as_double(F.col("embedding")))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.round(norm, 6).cast("decimal(18,6)")).cast("double").alias("sum_norm"),
        )
        .orderBy("label", "lang")
    )


def _dot_prefix(a: str, b: str, k: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {k}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


@register(
    "embedding_truncation_fidelity",
    oracle=f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id < 200
), dims AS (
  SELECT id_a, id_b, ea, eb, k
  FROM pairs, UNNEST([8, 16, 32, 64]) AS t(k)
), sims AS (
  SELECT k,
         {_dot_prefix('ea','eb','k')}
           / (sqrt({_dot_prefix('ea','ea','k')}) * sqrt({_dot_prefix('eb','eb','k')}))
           AS cos_k,
         {_dot_prefix('ea','eb','64')}
           / (sqrt({_dot_prefix('ea','ea','64')}) * sqrt({_dot_prefix('eb','eb','64')}))
           AS cos_full
  FROM dims
)
SELECT k, COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(ABS(cos_k - cos_full), 9) AS DECIMAL(18,9)))
                  AS DOUBLE) / COUNT(*), 9) AS mean_abs_err,
       ROUND(MAX(ABS(cos_k - cos_full)), 9) AS max_abs_err
FROM sims GROUP BY k ORDER BY k
""",
    doc="Matryoshka-style truncation fidelity: how much cosine "
    "similarity survives keeping only the first k of 64 dimensions "
    "(k = 8/16/32/64) — the panel that justifies prefix-truncated "
    "storage tiers before committing a 100 TB re-embed. 200 "
    "consecutive-id pairs scored at each k with JVM higher-order "
    "functions (slice + aggregate — no UDF, no explode of the vector "
    "table); errors decimal-summed after 9dp rounding so the cross-"
    "row mean is order-independent. k=64 rows pin the harness (error "
    "exactly 0).",
)
def embedding_truncation_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    a = emb.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)

    def cos_at(k: int) -> F.Column:
        ea = V._as_double(F.slice(F.col("ea"), 1, k))
        eb = V._as_double(F.slice(F.col("eb"), 1, k))
        return V.dot(ea, eb) / (V.l2_norm(ea) * V.l2_norm(eb))

    dims = pairs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        cos_at(k).alias("cos_k"),
                        cos_at(64).alias("cos_full"),
                    )
                    for k in (8, 16, 32, 64)
                ]
            )
        ).alias("s")
    ).select("s.k", "s.cos_k", "s.cos_full")
    err = F.abs(F.col("cos_k") - F.col("cos_full"))
    return (
        dims.groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(
                F.sum(F.round(err, 9).cast("decimal(18,9)")).cast("double") / F.count("*"),
                9,
            ).alias("mean_abs_err"),
            F.round(F.max(err), 9).alias("max_abs_err"),
        )
        .orderBy("k")
    )


@register(
    "knn_recall_eval",
    # Pinned-value oracle (r9): the ANN indexes (seeded hyperplanes /
    # seeded KMeans lists) and the brute-force truth are all pure
    # functions of (seed=42, sf0.01 embeddings) — recall@5 is exactly
    # reproducible, so the gate value-checks it against literals
    # captured via tools/pin_oracles.py (sf0.01 only). The brute-force
    # truth side is additionally SQL-oracled as knn_brute_force.
    oracle="""SELECT * FROM (VALUES
  ('ivf_16_4', CAST(31 AS BIGINT), CAST(0.62 AS DOUBLE)),
  ('lsh_8x5', CAST(26 AS BIGINT), CAST(0.52 AS DOUBLE))
) AS t(method, true_positives, recall_at_5)""",
    pinned_sf="0.01",
    doc="ANN quality evaluator — recall@5 of each approximate index "
    "family against the exact brute-force answer, as a catalog query "
    "(the number a user checks before trading exactness for the "
    "scale path): per-method true-positive counts from an id-level "
    "join of (query, neighbor) sets, recall = |ANN ∩ exact| / "
    "(n_queries * k). Shares the builders with knn_brute_force / "
    "knn_lsh_bucketed / knn_ivf, so this evaluates the PRODUCTION "
    "configs, not toy copies.",
)
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = _knn_truth(spark, sf_dir).select("query_id", "neighbor_id")
    methods = {
        "lsh_8x5": _knn_lsh_8x5(spark, sf_dir).select("query_id", "neighbor_id"),
        "ivf_16_4": _knn_ivf_16_4(spark, sf_dir).select("query_id", "neighbor_id"),
    }
    panels = []
    for name, ann in methods.items():
        hit = ann.join(truth, ["query_id", "neighbor_id"], "left_semi")
        panels.append(
            hit.agg(
                F.lit(name).alias("method"),
                F.count("*").alias("true_positives"),
                F.round(F.count("*") / F.lit(float(_NQ * _K)), 6).alias("recall_at_5"),
            )
        )
    out = panels[0]
    for p in panels[1:]:
        out = out.unionByName(p)
    return out.orderBy("method")


# ---------------------------------------------------------------------------
# SemDeDup — cluster-then-dedup semantic deduplication (Abbas et al.
# 2023, arXiv:2303.09540), the production alternative to pair-graph
# LSH: k-means partitions the corpus, near-dup pruning runs WITHIN
# clusters only, so candidate work is Σ n_c² ≈ n²/K flops inside
# per-cluster kernels instead of an LSH table build — and nothing
# pairwise is ever materialized as rows. Composes the two kernels the
# repo already trusts: deterministic_kmeans (set-deterministic — the
# pinned-oracle path) below the scale cutoff, the IVF coarse quantizer
# (train-once-persist determinism, same contract as FAISS) above it.

_SEMDEDUP_TH = 0.9
# Cluster on a 16-dim PREFIX of the unit vectors: assignment cost (and
# the set-deterministic k-means' literal-centroid expression size) is
# k×dims, and the corpus's own truncation-fidelity panel
# (embedding_truncation_fidelity) shows prefix cosine ranks track the
# full vector closely — only the cluster ASSIGNMENT is approximate
# (SemDeDup's inherent approximation); the dedup similarity inside the
# kernel always uses all 64 dims. 8 Lloyd iterations: cluster quality
# plateaus well before centroid bit-convergence and each iteration
# compiles a fresh k×16-term plan.
_SEMDEDUP_CLUSTER_DIMS = 16
_SEMDEDUP_MAX_ITER = 8
_SEMDEDUP_CACHE: dict = {}
_SEMDEDUP_SCHEMA = (
    "cluster_id long, n_members long, n_planted_coloc long, "
    "n_planted_sim long, n_dup_pairs long, n_dropped long, n_kept long"
)


def _semdedup_kernel(threshold: float):
    """Per-cluster dedup kernel for applyInPandas: rank members by
    (similarity to centroid DESC, vec_id) — keep-centroid-nearest —
    then drop any member whose cosine to an EARLIER-ranked member
    reaches the threshold (relational dominance, not greedy chaining:
    a member is dropped even if its dominator was itself dropped —
    deterministic and order-free, and at ≥0.9 the two sets differ only
    on near-transitive chains the paper also prunes). O(c²) flops per
    cluster via one gemm; members stay columnar, no pair rows."""
    import numpy as np
    import pandas as pd

    def dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cent_cos", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        c = len(pdf)
        block = 2048
        dominated = np.zeros(c, dtype=bool)
        n_dup_pairs = 0
        if c <= block:
            S = X @ X.T
            M = S >= threshold
            upper = np.triu(M, k=1)
            dominated = upper.any(axis=0)
            n_dup_pairs = int(upper.sum())
            sim = lambda i, j: S[i, j]  # noqa: E731
        else:
            # blockwise gemm: a skewed cluster (e.g. the IVF path's
            # largest list at 100×) must not allocate a c×c similarity
            # matrix — O(c·block) memory, same O(c²) flops, identical
            # dominance semantics (rows are rank-sorted, so column j is
            # dominated iff any i<j reaches the threshold)
            for j0 in range(0, c, block):
                j1 = min(j0 + block, c)
                Sb = X @ X[j0:j1].T  # (c, j1-j0)
                for off in range(j1 - j0):
                    j = j0 + off
                    col = Sb[:j, off]
                    hits = int((col >= threshold).sum())
                    n_dup_pairs += hits
                    if hits:
                        dominated[j] = True
            sim = lambda i, j: float(X[i] @ X[j])  # noqa: E731
        pos = {int(v): i for i, v in enumerate(ids)}
        coloc = sim_ok = 0
        for v, i in pos.items():
            j = pos.get(v + 1_000_000)
            if v < 1_000_000 and j is not None:
                coloc += 1
                if sim(i, j) >= threshold:
                    sim_ok += 1
        return pd.DataFrame(
            {
                "cluster_id": [int(ids.min())],
                "n_members": [c],
                "n_planted_coloc": [coloc],
                "n_planted_sim": [sim_ok],
                "n_dup_pairs": [int(n_dup_pairs)],
                "n_dropped": [int(dominated.sum())],
                "n_kept": [int(c - dominated.sum())],
            }
        )

    return dedup


def _semdedup_cents_path(sf_dir: str, k: int, pdims: int) -> str:
    """Cross-session artifact home for one (corpus, config) SemDeDup
    fit — keyed on the embeddings file's identity (mtime+size) so
    regenerated testdata can never serve stale centroids (the
    regime-family artifact discipline)."""
    import hashlib
    import os

    base = os.environ.get(
        "SPARK_GRAFT_ARTIFACT_DIR", "/tmp/spark_graft_artifacts"
    )
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fp = "na"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|semdedup|{k}|{pdims}|"
        f"{_SEMDEDUP_MAX_ITER}|{fp}".encode()
    ).hexdigest()[:16]
    return os.path.join(base, f"semdedup_{key}.json")


def _semdedup_load_cents(sf_dir: str, k: int, pdims: int):
    import json
    import os

    path = _semdedup_cents_path(sf_dir, k, pdims)
    if os.path.exists(path):
        with open(path) as f:
            return [tuple(c) for c in json.load(f)]
    return None


def _semdedup_save_cents(sf_dir: str, k: int, pdims: int, cents) -> None:
    import json
    import os

    path = _semdedup_cents_path(sf_dir, k, pdims)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp"
    try:
        with open(tmp, "w") as f:
            json.dump([list(c) for c in cents], f)
        os.replace(tmp, path)
    except OSError:
        pass  # artifact write is an optimization, never a failure


def _semdedup_labeled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(vec_id, nv, _cluster, cent_cos) for the planted corpus.

    Below the fixed-config cutoff: deterministic_kmeans on the 64
    unit-vector coordinates with K = ⌊√n⌋ (cluster size ≈ √n ⇒ total
    candidate flops ≈ n^1.5), centroids re-derived as decimal-exact
    per-cluster means so cent_cos is layout-deterministic (the pinned
    oracle depends on it). Above the cutoff: the IVF coarse quantizer
    (MLlib k-means, n_lists = n/512) whose determinism contract is
    per-layout / train-once-persist — the FAISS posture, identical to
    knn_ivf's."""
    import math as _math

    from ..functions.stats import dsum

    corpus = _planted_corpus(spark, sf_dir)
    n = _corpus_count(spark, sf_dir, "_planted_corpus", corpus)
    dim = 64

    if n > _fixed_config_max_rows():
        # spread the single-row-group parquet before the fit: an
        # un-spread corpus hands MLlib k-means ONE partition — every
        # iteration runs single-threaded (the _docs_wide discipline,
        # applied to embeddings). Layout changes are inside the IVF
        # path's per-layout determinism contract, and this branch only
        # engages above the fixed-config cutoff — outside oracle
        # territory — so the spread width scales with the cluster
        # instead of pinning a local core count.
        idx = V.IvfIndex.build(
            corpus.repartition(spark.sparkContext.defaultParallelism),
            n_lists=max(64, n // 512), seed=42,
        )
        labeled = idx.lists.select(
            F.col("neighbor_id").alias("vec_id"),
            F.zip_with(
                "cv",
                F.array_repeat("cn", dim),
                lambda x, nrm: x / nrm,
            ).alias("nv"),
            F.col("list_id").alias("_cluster"),
        )
        cent_rows = [
            (ci, [float(x) for x in ctr])
            for ci, ctr in enumerate(idx.centroids)
        ]
        cent = spark.createDataFrame(
            cent_rows, "_cluster int, carr array<double>"
        )
    else:
        k = max(4, _math.isqrt(n))
        pdims = _SEMDEDUP_CLUSTER_DIMS
        fcols = [f"_f{i}" for i in range(pdims)]
        unit = (
            corpus.select(
                "vec_id", V._as_double(F.col("embedding")).alias("_e")
            )
            .withColumn("_nrm", V.l2_norm(F.col("_e")))
            .select(
                "vec_id",
                F.zip_with(
                    "_e",
                    F.array_repeat("_nrm", dim),
                    lambda x, nrm: x / nrm,
                ).alias("nv"),
            )
        )
        feats = unit.select(
            "vec_id", "nv", *[F.get("nv", i).alias(c) for i, c in enumerate(fcols)]
        )
        from ..regime.segmentation import deterministic_kmeans, kmeans_assign

        # train-once-persist: the Lloyd loop is a per-corpus artifact
        # (deterministic in the input SET, so a cached fit is
        # interchangeable with a fresh one — the regime-model
        # contract); warm sessions pay one assignment pass
        cents = _semdedup_load_cents(sf_dir, k, pdims)
        if cents is not None:
            labeled = kmeans_assign(feats.localCheckpoint(eager=True), fcols, cents)
        else:
            labeled, cents = deterministic_kmeans(
                feats, fcols, k, max_iter=_SEMDEDUP_MAX_ITER,
                return_centroids=True,
            )
            _semdedup_save_cents(sf_dir, k, pdims, cents)
        # ranking centroid = decimal-exact FULL-dim mean of members
        # (the prefix is only for assignment); one agg, paid once
        cagg = (
            labeled.select(
                "_cluster",
                *[F.get("nv", i).alias(f"_v{i}") for i in range(dim)],
            )
            .groupBy("_cluster")
            .agg(
                F.count("*").alias("_n"),
                *[dsum(F.col(f"_v{i}")).alias(f"_s{i}") for i in range(dim)],
            )
        )
        cent = cagg.select(
            "_cluster",
            F.array(
                *[
                    (F.col(f"_s{i}").cast("double") / F.col("_n"))
                    for i in range(dim)
                ]
            ).alias("carr"),
        )
        labeled = labeled.select("vec_id", "nv", "_cluster")

    joined = labeled.join(F.broadcast(cent), "_cluster")
    # nv is unit, so cos(v, c) = dot(nv, carr)/|carr|; carr/cnrm are
    # attribute refs by the time the folds see them (staged select)
    staged = joined.withColumn("_cnrm", V.l2_norm(F.col("carr")))
    return staged.select(
        "vec_id",
        "nv",
        "_cluster",
        (V.dot(F.col("nv"), F.col("carr")) / F.col("_cnrm")).alias("cent_cos"),
    )


_PIN_SEMDEDUP = """SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(38 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(35 AS BIGINT)),
  (CAST(1 AS BIGINT), CAST(44 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(42 AS BIGINT)),
  (CAST(2 AS BIGINT), CAST(42 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(38 AS BIGINT)),
  (CAST(3 AS BIGINT), CAST(59 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(56 AS BIGINT)),
  (CAST(6 AS BIGINT), CAST(24 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(21 AS BIGINT)),
  (CAST(10 AS BIGINT), CAST(41 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(35 AS BIGINT)),
  (CAST(11 AS BIGINT), CAST(23 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(23 AS BIGINT)),
  (CAST(12 AS BIGINT), CAST(31 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(29 AS BIGINT)),
  (CAST(15 AS BIGINT), CAST(16 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(14 AS BIGINT)),
  (CAST(18 AS BIGINT), CAST(27 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(27 AS BIGINT)),
  (CAST(20 AS BIGINT), CAST(51 AS BIGINT), CAST(7 AS BIGINT), CAST(7 AS BIGINT), CAST(7 AS BIGINT), CAST(7 AS BIGINT), CAST(44 AS BIGINT)),
  (CAST(24 AS BIGINT), CAST(52 AS BIGINT), CAST(6 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(47 AS BIGINT)),
  (CAST(29 AS BIGINT), CAST(33 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(4 AS BIGINT), CAST(29 AS BIGINT)),
  (CAST(57 AS BIGINT), CAST(38 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(35 AS BIGINT)),
  (CAST(92 AS BIGINT), CAST(29 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(27 AS BIGINT)),
  (CAST(284 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
  (CAST(459 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT))
) AS t("cluster_id", "n_members", "n_planted_coloc", "n_planted_sim", "n_dup_pairs", "n_dropped", "n_kept")"""


@register(
    "embedding_semdedup_clusters",
    # r13 pinned VALUES at sf0.01: integer-only panel, layout-
    # deterministic below the scale cutoff (set-deterministic k-means,
    # decimal centroid means, within-row folds, rank-sorted kernel);
    # a persisted-centroid warm start is bit-interchangeable with a
    # fresh Lloyd fit (verified, and pinned in tests/test_vectors.py)
    oracle=_PIN_SEMDEDUP,
    pinned_sf="0.01",
    doc="SemDeDup cluster-then-dedup semantic deduplication (Abbas et "
    "al. 2023): deterministic k-means (K=⌊√n⌋ below the scale cutoff; "
    "the IVF coarse quantizer with n/512 lists above it) partitions "
    "the planted near-dup corpus, then near-dup pruning runs WITHIN "
    "each cluster — members ranked by similarity-to-centroid "
    "(keep-centroid-nearest), any member at cos ≥ 0.9 to an "
    "earlier-ranked member is dropped — inside one applyInPandas gemm "
    "per cluster: candidate work is K·(n/K)² flops with NOTHING "
    "pairwise materialized as rows, the 100 TB alternative to LSH "
    "table tuning (embedding_dedup_clusters_scaled is the same corpus "
    "through the LSH path). Emits the per-cluster audit panel: "
    "members, co-located planted pairs, planted pairs above "
    "threshold, dup pairs, dropped, kept. Layout-deterministic below "
    "the cutoff by construction (set-deterministic k-means, "
    "decimal-exact centroid means, within-row cosine folds, "
    "rank-sorted kernel) — the pinned oracle checks exact values; "
    "recall-vs-LSH and dominance invariants in tests/test_vectors.py.",
)
def embedding_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.memo import app_scoped_memo

    # the clustering (iterative k-means or IVF build) is the corpus
    # artifact; memoize the labeled frame per session so warm runs pay
    # only the per-cluster kernel (bench steady-state discipline)
    labeled = app_scoped_memo(
        _SEMDEDUP_CACHE,
        spark,
        ("semdedup_labeled", sf_dir),
        lambda: _semdedup_labeled(spark, sf_dir).localCheckpoint(eager=True),
    )
    return (
        labeled.groupBy("_cluster")
        .applyInPandas(_semdedup_kernel(_SEMDEDUP_TH), _SEMDEDUP_SCHEMA)
        .drop("_cluster")
        .orderBy("cluster_id")
    )


def _semdedup_keep_kernel(threshold: float):
    """Per-member twin of _semdedup_kernel: same rank order, same
    dominance rule, but emits the per-vector decision rows (the apply
    step users feed into the training-set join) instead of the
    cluster audit panel."""
    import numpy as np
    import pandas as pd

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cent_cos", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        c = len(pdf)
        block = 2048
        dominated = np.zeros(c, dtype=bool)
        if c <= block:
            M = np.triu(X @ X.T >= threshold, k=1)
            dominated = M.any(axis=0)
        else:
            for j0 in range(0, c, block):
                j1 = min(j0 + block, c)
                Sb = X @ X[j0:j1].T
                for off in range(j1 - j0):
                    j = j0 + off
                    if (Sb[:j, off] >= threshold).any():
                        dominated[j] = True
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": np.full(c, int(ids.min()), dtype=np.int64),
                "rnk": np.arange(1, c + 1, dtype=np.int64),
                "keep": ~dominated,
            }
        )

    return keep


@register(
    "embedding_semdedup_keep",
    oracle=pinned_parquet_oracle("embedding_semdedup_keep"),
    pinned_sf="0.01",
    doc="SemDeDup APPLY step — the per-vector keep list the panel "
    "audits (the detect→apply pair, mirroring "
    "dedup_repeated_ngram_spans → corpus_span_scrub): every vector "
    "with its cluster (labeled by the cluster's min vec_id), its "
    "centroid-similarity rank (1 = keep-centroid-nearest anchor), "
    "and the keep/drop decision under the same cos ≥ 0.9 dominance "
    "rule as embedding_semdedup_clusters — the frame a training-mix "
    "assembly semi-joins against. Shares the memoized labeled frame "
    "(clustering paid once per session across both queries); one "
    "applyInPandas gemm per cluster, blockwise past 2048 members. "
    "Layout-deterministic below the scale cutoff, pinned as a "
    "parquet capture.",
)
def embedding_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.memo import app_scoped_memo

    labeled = app_scoped_memo(
        _SEMDEDUP_CACHE,
        spark,
        ("semdedup_labeled", sf_dir),
        lambda: _semdedup_labeled(spark, sf_dir).localCheckpoint(eager=True),
    )
    schema = "vec_id long, cluster_id long, rnk long, keep boolean"
    return (
        labeled.groupBy("_cluster")
        .applyInPandas(_semdedup_keep_kernel(_SEMDEDUP_TH), schema)
        .orderBy("vec_id")
    )
