"""Text-analysis operators for the training-data pipeline surface
(driver brief): token counting, quality scoring, language-ID heuristic,
document fingerprinting, shingling.

All column-expression based (JVM-side, codegen) — no Python UDFs in the
hot path. Shingles/minhash explode rows but stay vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword seeds for the n-gram/stopword language
# heuristic. Public common-word lists.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "im", "für"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count — size(split(trim(text), '\\s+'))."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (quality-score component)."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, r"[\.,;:!\?\'\"\(\)\[\]\-]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword tokens / total tokens for one language's seed list."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: length sweet-spot,
    moderate punctuation, presence of stopword-like short tokens.
    Mirrors the length/punct/stopword ratio recipe from the brief.

    NULL/empty text scores 0.0, matching the row UDF and the pandas
    UDF exactly (ADVICE r3: the surfaces used to disagree on empty
    docs — NULL text even scored 0.8 because ``least(NULL/200, 1.0)``
    skips the NULL)."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))  # saturate at 200 chars
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - 4.0 * punct_ratio(text))
    sw = stopword_ratio(text, "en")
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    score = 0.5 * len_score + 0.3 * punct_pen + 0.2 * sw_score
    return F.when(n > 0, score).otherwise(F.lit(0.0))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language stopword hit ratios as columns
    plus the argmax language. Pure expressions — one narrow projection."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"score_{lang}", stopword_ratio(F.col(text_col), lang))
    # argmax over the struct of (score, lang) pairs
    pairs = F.array(
        *[F.struct(F.col(f"score_{l}").alias("s"), F.lit(l).alias("l")) for l in STOPWORDS]
    )
    best = F.array_max(pairs)
    return out.withColumn("pred_lang", best["l"]).withColumn("pred_score", best["s"])


def fingerprint(text: Column) -> Column:
    """Document fingerprint — normalized-text MD5 (stable across engines,
    unlike xxhash/cityhash which differ per engine)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and hand it to ``fn`` as a bound
    higher-order-function lambda variable.

    A plain Column reference used inside a per-element lambda is
    re-INLINED into every element's expression tree — transform over a
    doc's n tokens that references the tokenization Column re-runs the
    whole split per element, O(n²) per row. This is the third sighting
    of the class (r11 streaming span twin: 59 s → 7 s; r12 PII filter
    pushdown; r12 word-ngram gram build: 390 s of a 487 s query at
    500 k docs). Lambda VARIABLES, by contrast, are materialized
    values, so wrapping the expensive expr in a single-element array
    and binding it through one outer transform makes every inner
    reference O(1)."""
    return F.get(F.transform(F.array(expr), fn), 0)


def shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingle array via sequence+transform — JVM-side, no UDF.
    Returns empty array for texts shorter than k (guarded: Spark's
    sequence(1, 0) auto-steps DESCENDING, which would yield two garbage
    shingles for short texts). The lowered text is bound once per row
    (bind_once) — referenced per element it would re-lower the whole
    doc per shingle, O(len²)/row."""

    def build(t: Column) -> Column:
        n = F.length(t)
        return F.when(n < k, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda i: F.substring(t, i, k),
            )
        )

    return bind_once(F.lower(text), build)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram array (for n-gram Jaccard dedup). The token array is
    bound once per row (bind_once): referenced per element it would
    re-run the whole regex split per gram — O(tokens²)/row, measured
    as 390 s of the 487 s word-ngram verify at 500 k docs (r12)."""

    def build(toks: Column) -> Column:
        cnt = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(cnt - F.lit(n), F.lit(-1)))
        return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
            )
        )

    return bind_once(F.split(F.lower(F.trim(text)), r"\s+"), build)


def minhash_implied_threshold(bands: int, rows: int) -> float:
    """The Jaccard level where a b-band × r-row MinHash-LSH banding's
    collision curve crosses ~50% candidate probability: (1/b)^(1/r)
    (from P(candidate) = 1-(1-J^r)^b). Pairs far below it rarely
    collide; a CORPUS whose random-pair bulk sits at or above it makes
    the candidate set — and the answer — quadratic in corpus size."""
    return (1.0 / bands) ** (1.0 / rows)


def jaccard_bulk_floor(
    shingled: DataFrame,
    shingle_col: str = "shs",
    sample_n: int = 1000,
    q: float = 0.999,
) -> float:
    """Bulk-Jaccard quantile guard — the text-family analogue of
    ``vectors.threshold_floor`` (r10 VERDICT task 4): the ``q``
    quantile of pairwise shingle-set Jaccard over a bounded sample of
    the corpus. When a MinHash-LSH banding's implied threshold
    (``minhash_implied_threshold``) sits at or below this floor, the
    band-collision probability for RANDOM pairs is non-negligible and
    the candidate set grows quadratically with corpus size — the same
    geometry as the r10 100× probe's 54.6 M-pair output, which no
    banding change can shrink (the matching pairs are real).

    Driver-side on a bounded ``limit(sample_n)`` pool (same idiom as
    threshold_floor): O(sample_n²) frozenset intersections — the
    default is ~0.5 M set ops on short shingle sets, milliseconds.
    The bulk quantile is a corpus STATISTIC; any contiguous slice
    estimates it."""
    rows = shingled.select(shingle_col).limit(sample_n).collect()
    sets = [frozenset(r[0]) for r in rows if r[0]]
    if len(sets) < 2:
        return 0.0  # degenerate corpus: nothing to collide with
    sims = []
    for i in range(len(sets)):
        a = sets[i]
        for j in range(i + 1, len(sets)):
            b = sets[j]
            inter = len(a & b)
            if inter:
                sims.append(inter / (len(a) + len(b) - inter))
            else:
                sims.append(0.0)
    sims.sort()
    k = min(len(sims) - 1, int(q * len(sims)))
    return float(sims[k])
