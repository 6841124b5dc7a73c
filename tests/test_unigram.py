"""Unigram-LM tokenizer: EM behavior, Viterbi, totality, determinism."""

import math

from pyspark.sql import functions as F

from dataflowex_spark.operators.unigram import (
    _e_step,
    _seed_vocab,
    unigram_decode_pieces,
    unigram_encode,
    unigram_train,
    viterbi_segment,
)

WORDS = [("ababab", 50), ("abc", 30), ("banana", 20), ("cabba", 5)]


def test_em_likelihood_monotone():
    logp = _seed_vocab(WORDS, 6, 64)
    prev = -math.inf
    for _ in range(4):
        exp, ll = _e_step(WORDS, logp, 6)
        assert ll >= prev - 1e-9
        prev = ll
        tot = sum(exp.values())
        logp = {p: math.log(v / tot) for p, v in sorted(exp.items()) if v > 0}


def test_viterbi_total_coverage_and_roundtrip():
    logp = _seed_vocab(WORDS, 6, 64)
    for w in ["ababab", "banana", "zzq", "a", "éx"]:
        seg = viterbi_segment(w, logp, 6)
        assert unigram_decode_pieces(seg) == w


def test_train_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ate the rat",)] * 5,
        "text string",
    )
    m1 = unigram_train(df, "text", vocab_size=40, max_piece_len=4)
    m2 = unigram_train(df, "text", vocab_size=40, max_piece_len=4)
    assert m1 == m2  # bit-identical across runs
    n_multi = sum(1 for p in m1 if len(p) > 1)
    n_singles = sum(1 for p in m1 if len(p) == 1)
    assert n_multi + n_singles == len(m1)
    assert n_multi <= 40  # singles ride on top of the budget
    # frequent whole words become single pieces
    assert "the" in m1 or "he" in m1


def test_distributed_encode_matches_local(spark):
    df = spark.createDataFrame(
        [("abab abc",), ("banana cabba",), (None,)], "text string"
    )
    model = {
        "ab": math.log(0.4),
        "ba": math.log(0.1),
        "a": math.log(0.2),
        "b": math.log(0.1),
        "c": math.log(0.1),
        "n": math.log(0.1),
    }
    enc = unigram_encode(df, "text", model, max_piece_len=2)
    rows = {r["text"]: r["pieces"] for r in enc.collect()}
    assert rows[None] is None
    for text, pieces in rows.items():
        if text is None:
            continue
        want = []
        for w in text.split():
            want.extend(viterbi_segment(w, model, 2))
        assert pieces == want
        assert unigram_decode_pieces(pieces) == text.replace(" ", "")
