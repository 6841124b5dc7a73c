"""Unigram-LM subword tokenizer (Kudo, ACL'18 — the SentencePiece
`--model_type=unigram` algorithm): EM-trained piece probabilities,
Viterbi encoding.

Division of labor, same as :mod:`bpe` and how sentencepiece itself
behaves at web scale:

- TRAINING is a small-data problem: everything the EM loop needs is
  the (word, count) vocabulary — a bounded distributed hash-aggregate
  (MBs even for 100 TB corpora; rare words are frequency-truncated,
  falling through to character pieces). Seeding, EM, and pruning run
  driver-side over that compact table, exactly like
  sentencepiece/HF-tokenizers train on one machine.
- ENCODING stays fully distributed: the learned (piece → logprob)
  table broadcasts into an Arrow-batched pandas UDF; Viterbi is
  per-word, scan-local, zero shuffles.

Algorithm (public reference implementation semantics, from scratch):

1. Seed vocabulary: all substrings of the retained words up to
   ``max_piece_len``, scored by frequency·length, top
   ``seed_multiplier × vocab_size`` kept (plus EVERY single
   character, which are never pruned — they guarantee any word in
   the training charset segments).
2. EM rounds: E-step accumulates expected piece counts with
   forward–backward over each word's segmentation lattice (weighted
   by word count); M-step renormalizes to log-probabilities.
3. Prune: drop the lowest-expected-count multi-char pieces
   (keep_ratio per round) until ``vocab_size`` remains, EM between
   rounds — the standard shrink loop (sentencepiece's is loss-based;
   expected-count ranking is the common simplification and keeps
   every tie deterministic: ties break lexicographically).

Determinism: exact integer word counts, fixed lexicographic piece
ordering everywhere a tie can arise, single-threaded driver floats —
the same corpus yields the same model bit-for-bit on every run and
partitioning. Unknown characters at encode time emit as single-char
pieces with a floor log-probability (never dropped), so
decode(encode(x)) == x for EVERY string."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_UNK_LOGP = -100.0


def _word_counts(
    df: DataFrame, text_col: str, min_count: int, max_words: int
) -> list[tuple[str, int]]:
    rows = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def _seed_vocab(
    words: list[tuple[str, int]], max_piece_len: int, n_seed: int
) -> dict[str, float]:
    """Substring seed scored by count·len; singles always included."""
    scores: dict[str, int] = {}
    singles: set[str] = set()
    for w, c in words:
        n = len(w)
        for i in range(n):
            singles.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                scores[p] = scores.get(p, 0) + c * (j - i)
    multi = sorted(
        (p for p in scores if len(p) > 1),
        key=lambda p: (-scores[p], p),
    )[: max(0, n_seed - len(singles))]
    seed = {p: float(scores[p]) for p in multi}
    for ch in singles:
        seed[ch] = float(scores[ch])
    tot = sum(seed.values())
    return {p: math.log(v / tot) for p, v in sorted(seed.items())}


def _e_step(
    words: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """Forward–backward expected piece counts; returns (counts,
    total corpus log-likelihood)."""
    exp: dict[str, float] = {}
    ll = 0.0
    for w, c in words:
        n = len(w)
        alpha = [-math.inf] * (n + 1)
        alpha[0] = 0.0
        arcs: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
        for i in range(1, n + 1):
            for j in range(max(0, i - max_piece_len), i):
                piece = w[j:i]
                lp = logp.get(piece)
                if lp is None:
                    continue
                arcs[i].append((j, piece, lp))
                v = alpha[j] + lp
                if v > -math.inf:
                    a = alpha[i]
                    alpha[i] = (
                        v
                        if a == -math.inf
                        else max(a, v) + math.log1p(math.exp(-abs(a - v)))
                    )
        if alpha[n] == -math.inf:
            continue  # unsegmentable (char outside vocab) — skipped
        beta = [-math.inf] * (n + 1)
        beta[n] = 0.0
        for i in range(n, 0, -1):
            if beta[i] == -math.inf:
                continue
            for j, piece, lp in arcs[i]:
                v = beta[i] + lp
                b = beta[j]
                beta[j] = (
                    v
                    if b == -math.inf
                    else max(b, v) + math.log1p(math.exp(-abs(b - v)))
                )
        ll += c * alpha[n]
        for i in range(1, n + 1):
            for j, piece, lp in arcs[i]:
                if alpha[j] == -math.inf or beta[i] == -math.inf:
                    continue
                post = math.exp(alpha[j] + lp + beta[i] - alpha[n])
                if post > 0.0:
                    exp[piece] = exp.get(piece, 0.0) + c * post
    return exp, ll


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    min_count: int = 1,
    max_words: int = 50_000,
    seed_multiplier: int = 4,
    em_rounds: int = 2,
    keep_ratio: float = 0.75,
) -> dict[str, float]:
    """Train; returns {piece: logprob} with |vocab| ≤ vocab_size
    (plus however many single characters the corpus needs)."""
    words = _word_counts(df, text_col, min_count, max_words)
    if not words:
        raise ValueError("empty training vocabulary")
    logp = _seed_vocab(words, max_piece_len, seed_multiplier * vocab_size)
    while True:
        for _ in range(em_rounds):
            exp, _ll = _e_step(words, logp, max_piece_len)
            tot = sum(exp.values())
            logp = {
                p: math.log(v / tot)
                for p, v in sorted(exp.items())
                if v > 0.0
            }
            # singles must survive even with zero expectation
            for p in list(_singles(words)):
                if p not in logp:
                    logp[p] = _UNK_LOGP
        n_multi = sum(1 for p in logp if len(p) > 1)
        n_target = max(0, vocab_size - (len(logp) - n_multi))
        if n_multi <= n_target:
            break
        keep_n = max(n_target, int(n_multi * keep_ratio))
        if keep_n == n_multi:
            keep_n = n_target
        exp, _ll = _e_step(words, logp, max_piece_len)
        ranked = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (-exp.get(p, 0.0), p),
        )
        dropped = set(ranked[keep_n:])
        logp = {p: lp for p, lp in logp.items() if p not in dropped}
    return dict(sorted(logp.items()))


def _singles(words: list[tuple[str, int]]) -> set[str]:
    return {ch for w, _ in words for ch in w}


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Best segmentation under the model; unknown characters emit as
    single-char pieces at a floor probability (total coverage).
    Ties prefer the segmentation found with the LONGEST last piece
    (scan order), deterministically."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    best[0] = 0.0
    back: list[tuple[int, str]] = [(0, "")] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = _UNK_LOGP  # unknown char fallback
                else:
                    continue
            v = best[j] + lp
            if v > best[i]:
                best[i] = v
                back[i] = (j, piece)
    out: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    return out[::-1]


def unigram_encode(
    df: DataFrame,
    text_col: str,
    model: dict[str, float],
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Distributed Viterbi encode: model broadcasts into an
    Arrow-batched pandas UDF, applied per word after whitespace
    pre-tokenization — scan-local, zero shuffles."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s):
        import pandas as pd

        m = bc.value
        # Viterbi is pure in (word, model): segment each distinct
        # word once per batch (word types << occurrences); the
        # emitted piece sequence is unchanged.
        cache: dict[str, list[str]] = {}

        def one(x):
            if x is None:
                return None
            pieces: list[str] = []
            for w in x.split():
                p = cache.get(w)
                if p is None:
                    p = viterbi_segment(w, m, max_piece_len)
                    cache[w] = p
                pieces.extend(p)
            return pieces

        return pd.Series([one(x) for x in s])

    return df.withColumn(out_col, _enc(F.col(text_col)))


def unigram_decode_pieces(pieces: list[str]) -> str:
    """Pieces are literal substrings; decode is concatenation (word
    boundaries are the caller's pre-tokenization concern, matching
    bpe_decode's contract)."""
    return "".join(pieces)
