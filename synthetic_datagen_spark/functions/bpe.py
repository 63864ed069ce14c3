"""Byte-pair-encoding tokenizer training — the missing first step of
every LLM data pipeline (Sennrich et al. 2016, public): merges are
learned from the WORD-FREQUENCY table, not the raw corpus, so the
distributed part is one groupBy; the merge loop itself runs on the
compact (word, count) table driver-side — exactly how production
tokenizer trainers (HF tokenizers, SentencePiece) structure it.

Scale shape at 100 TB: the corpus-wide word count is a single hash
aggregate (map-side combined); a min-count cutoff + cap bounds the
driver table (same `train_cap` idiom as the PQ codebook trainer in
functions/vectors.py); the learned merge rules broadcast back for
distributed tokenization.

Determinism: pair selection ties break on (count desc, pair lexical
asc) — bit-stable across partition layouts because the input is an
exact frequency table.
"""

from __future__ import annotations


def train_bpe(
    word_freq: dict[str, int], n_merges: int, end_marker: str = "</w>"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Returns [(left, right, pair_count_at_merge_time), ...] in merge
    order. Symbols start as single characters plus ``end_marker``.
    """
    # word -> (symbol tuple, freq)
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_freq.items():
        sym = tuple(w) + (end_marker,)
        vocab[sym] = vocab.get(sym, 0) + c

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:  # nothing left worth merging
            break
        merges.append((a, b, cnt))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str, int]], end_marker: str = "</w>") -> list[str]:
    """Tokenize one word with a learned merge list (greedy in merge
    order — the standard BPE segmenter)."""
    sym: list[str] = list(word) + [end_marker]
    for a, b, _ in merges:
        i = 0
        out: list[str] = []
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
        if len(sym) == 1:
            break
    return sym
