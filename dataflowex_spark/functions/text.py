"""Text-analysis expressions for training-data pipelines.

All pure Column expressions (split/regexp/aggregate/transform) —
JVM-side, no UDFs — so language-ID / quality scoring / fingerprinting
run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Canonical whitespace definition, shared by EVERY engine we touch.
#
# Java regex `\s` is ASCII-only ([ \t\n\x0B\f\r]) while Python `re`'s
# `\s` is Unicode-aware, so a naive F.split(text, r"\s+") diverges from
# the Python reference on U+00A0, U+2007, … (hypothesis found it).
# The single source of truth is WS_CHARS: the exact character set
# Python's `re` `\s` matches (enumerated by probing all code points).
# - Spark/Java side: WS_REGEX embeds the literal characters in a class.
# - DuckDB/RE2 oracle side: WS_SQL_REGEX spells the same set with
#   \x{..} escapes (verified char-for-char equal to Python `\s`).
WS_CHARS = (
    "\x09\x0a\x0b\x0c\x0d\x1c\x1d\x1e\x1f \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)
WS_REGEX = "[" + WS_CHARS + "]+"
_WS_CLASS_SQL = (
    r"\t\n\v\f\r\x{1c}-\x{1f} \x{85}\x{a0}\x{1680}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}"
)
WS_SQL_REGEX = "[" + _WS_CLASS_SQL + "]+"

# BPE-ish tokenizer: words, numbers, or single non-space symbols.
# TOKEN_SQL_REGEX is the RE2 (DuckDB oracle) spelling of the same
# pattern; the three alternates match disjoint character classes, so
# leftmost-first (Java) and RE2 matching agree.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + WS_CHARS + "]"
TOKEN_SQL_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9" + _WS_CLASS_SQL + "]"


def bind(expr: Column, fn) -> Column:
    """HOF let-binding: evaluate ``expr`` ONCE per row and pass the
    bound value to ``fn``.

    Catalyst collapses projections, so a heavy array expression that a
    downstream chain references k times (e.g. the shifted-slice
    ``zip_with`` folds below) gets inlined — and re-computed — k times
    per row. Wrapping it as the element of a 1-element array and
    referencing it through a lambda variable forces single evaluation:
    lambda variables are bound values, never re-expanded. Measured on
    winnowing fingerprints at sf0.1: 17.1 s → 1.3 s, bit-identical.
    """
    return F.get(F.transform(F.array(expr), fn), 0)


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    return F.filter(F.split(text, WS_REGEX), lambda t: t != "")


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: 'whitespace' or 'bpe' (regex word/number/symbol)."""
    if mode == "whitespace":
        return F.size(tokens(text))
    if mode == "bpe":
        return F.size(
            F.filter(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)), lambda t: t != "")
        )
    raise ValueError(f"unknown token mode: {mode}")


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-gram array (for Jaccard / MinHash shingling)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(text, i, n))


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles — the standard near-dup unit for documents.

    Built as a chain of k−1 shifted ``zip_with``s rather than an
    index-lambda over ``sequence``: a lambda body that references the
    token array re-evaluates the whole tokenization PER ELEMENT
    (Spark HOFs don't hoist loop invariants), which makes the naive
    form O(tokens²) per document — measured 18 s vs 2 s for 13-gram
    shingling of 5 k docs. Here every stage evaluates its inputs once
    per row: O(k·tokens).

    Semantics (identical to the naive form): full k-windows joined by
    single spaces; a document with 0 < n < k tokens yields one
    shingle of all n tokens; an empty document yields [""].
    """
    def chain(toks: Column) -> Column:
        n = F.size(toks)
        m = F.greatest(n - (k - 1), F.lit(1))
        acc = F.slice(toks, 1, m)
        for j in range(1, k):
            nxt = F.slice(toks, F.lit(j + 1), m)  # short docs: zip_with pads NULL
            acc = F.zip_with(
                acc,
                nxt,
                lambda a, b: F.when(b.isNull(), a).otherwise(
                    F.concat(a, F.lit(" "), b)
                ),
            )
        return F.when(n == 0, F.array(F.lit(""))).otherwise(acc)

    # let-bind the token array: the chain references it k+1 times and
    # projection collapse would otherwise re-tokenize per reference
    return bind(tokens(text), chain)


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0,1]:
    mean of (word-length sanity, punctuation ratio sanity, stopword
    presence). Mirrors the usual Gopher/C4-style filters in spirit;
    deterministic and cheap (single pass of Column exprs)."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count(text).cast("double")
    avg_word = n_chars / F.greatest(n_tok, F.lit(1.0))
    word_ok = F.when((avg_word >= 3) & (avg_word <= 12), 1.0).otherwise(0.0)
    punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", "")).cast("double")
    punct_ok = F.when(punct / F.greatest(n_chars, F.lit(1.0)) <= 0.2, 1.0).otherwise(0.0)
    stop_hits = F.size(
        F.array_intersect(
            F.transform(tokens(text), lambda t: F.lower(t)),
            F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")]),
        )
    ).cast("double")
    stop_ok = F.when(stop_hits > 0, 1.0).otherwise(0.0)
    return (word_ok + punct_ok + stop_ok) / 3.0


def rolling_fingerprint(text: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash of the whole document (content
    fingerprint). fp = Σ code(cᵢ)·base^(n-i) mod m, computed as a
    left fold — deterministic across engines/partitions."""
    chars = F.split(text, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )
