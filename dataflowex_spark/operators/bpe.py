"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
encoding — the canonical LLM preprocessing operator (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units").

Division of labor, which is how production tokenizer training actually
works at 100 TB:

- TRAINING is a small-data problem: the merge loop only ever needs the
  (word, count) vocabulary, which is MBs even for web-scale corpora
  (and is standardly computed on a sample anyway). The vocabulary
  aggregate is distributed (one hash agg over the corpus); the merge
  loop itself runs driver-side over that compact table, like
  sentencepiece/HF-tokenizers do on a single machine.
- ENCODING is the big-data problem and stays fully distributed: the
  learned merge list broadcasts to executors inside an Arrow-batched
  pandas UDF; no shuffle, scan-local.

Determinism: pair-count ties break lexicographically, so the same
corpus always yields the same merge sequence on any engine/partitioning
(counts are exact integers from a hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"


def _word_counts(
    df: DataFrame,
    text_col: str,
    min_count: int,
    max_vocab: int,
) -> list[tuple[str, int]]:
    """Distributed (word, count) vocabulary with a HARD driver-side
    bound: frequency filter inside the aggregation plus a top-N by
    (count desc, word asc) — the collect is O(max_vocab) by
    construction, never O(distinct words). On a 100 TB web corpus the
    distinct-token table (URLs, typos, unicode junk) is 1e8–1e9 rows;
    an unbounded collect is a driver OOM, not a slowdown. Frequency-
    truncated BPE is standard practice (rare words fall through to
    character pieces), and orderBy+limit runs as Spark's TakeOrdered —
    per-partition top-N heaps, no global sort materialization.
    Deterministic: exact integer counts, lexicographic tiebreak."""
    rows = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_vocab)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    sample_fraction: float | None = None,
    seed: int = 42,
    min_count: int = 1,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (most frequent first). ``sample_fraction``
    trains on a deterministic sample — the standard trade at corpus
    scale (the vocabulary aggregate still distributes either way).

    ``min_count``/``max_vocab`` bound the driver-side vocabulary to
    O(max_vocab) regardless of corpus size (see :func:`_word_counts`).
    When the corpus has fewer than ``max_vocab`` distinct words above
    ``min_count``, truncation is a no-op and the merges are identical
    to unbounded training (property-tested)."""
    d = df
    if sample_fraction is not None:
        d = df.sample(fraction=sample_fraction, seed=seed)
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in _word_counts(d, text_col, min_count, max_vocab):
        sym = tuple(word) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + cnt

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode a text column with a learned merge list — Arrow-batched
    pandas UDF, merges travel in the closure (broadcast by Spark's
    task serialization; a merge table is KBs). Adds ``out_col`` as
    array<string>. Greedy lowest-rank-first merging, the same rule
    the trainer induced — encode(train corpus) re-tokenizes exactly
    as training left it."""
    import pandas

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _enc(s: "pandas.Series") -> "pandas.Series":
        def one(x):
            if x is None:
                return None
            out: list[str] = []
            for w in x.split():
                out.extend(_encode_word(w, ranks))
            return out

        return s.map(one)

    _enc.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    enc = F.pandas_udf(_enc, "array<string>")
    return df.withColumn(out_col, enc(F.col(text_col)))


def bpe_decode(
    df: DataFrame,
    tokens_col: str = "bpe_tokens",
    out_col: str = "decoded_text",
) -> DataFrame:
    """Invert :func:`bpe_encode` — pure JVM expressions (no UDF):
    concatenate the subword pieces and turn each end-of-word marker
    back into a single space. Because the encoder splits on arbitrary
    whitespace runs, the round-trip law is

        decode(encode(text)) == " ".join(text.split())

    (whitespace-normalized identity) — property-tested in
    tests/test_properties.py. Decoding is scan-local: zero shuffles,
    whole-stage codegen end to end."""
    joined = F.array_join(F.col(tokens_col), "")
    spaced = F.regexp_replace(joined, F.lit(_EOW), F.lit(" "))
    return df.withColumn(
        out_col,
        F.when(F.col(tokens_col).isNull(), F.lit(None)).otherwise(
            F.rtrim(spaced)
        ),
    )
