"""Unigram-LM tokenizer (Kudo 2018, round 13): Viterbi argmax
against a hand-scored lattice, EM/pruning behavior, bit-identical
retrains, lossless round trips, and the Spark apply path."""

from __future__ import annotations

import math

import pytest

from workshoop2_etl_spark.operators.unigram import (
    UNK_LOGPROB,
    unigram_apply,
    unigram_train,
    viterbi_segment,
)


def test_viterbi_argmax_hand_scored():
    """pieces {a, b, ab}: 'ab' wins iff log p(ab) > log p(a)+log p(b)."""
    win = {"a": math.log(0.2), "b": math.log(0.2), "ab": math.log(0.6)}
    assert viterbi_segment("ab", win) == ["ab"]
    assert viterbi_segment("aab", win) == ["a", "ab"]
    lose = {"a": math.log(0.45), "b": math.log(0.45), "ab": math.log(0.1)}
    assert viterbi_segment("ab", lose) == ["a", "b"]


def test_viterbi_oov_fallback_is_total():
    pieces = {"a": math.log(0.5)}
    segs = viterbi_segment("axa", pieces)
    assert segs == ["a", "x", "a"]
    # unknown char scored UNK_LOGPROB, known piece preferred
    assert UNK_LOGPROB < math.log(0.5)
    assert "".join(viterbi_segment("zzz", pieces)) == "zzz"


def test_train_learns_frequent_piece_and_is_deterministic(spark):
    corpus = [
        (i, "internationalization " * 3 + "nation national") for i in range(30)
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    p1 = unigram_train(df, "text", vocab_size=40, max_piece_len=6)
    p2 = unigram_train(df, "text", vocab_size=40, max_piece_len=6)
    assert p1 == p2  # bit-identical retrain
    multi = [p for p in p1 if len(p) > 1]
    assert "nation" in multi  # the dominant substring survives pruning
    # every single character of the corpus is retained (coverage)
    chars = {c for _, t in corpus for c in t.lower() if not c.isspace()}
    assert chars <= set(p1)
    # pruning reached the requested budget
    assert len(multi) <= 40


def test_roundtrip_and_spark_apply(spark):
    df = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    pieces = unigram_train(df, "text", vocab_size=60)
    out = unigram_apply(df, "text", pieces).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_pieces"] == len(r["unigram_tokens"])
        # lossless: pieces concatenate back to the whitespace-split words
        row_text = f"the quick brown fox {r['doc_id']} jumps over the lazy dog"
        assert "".join(r["unigram_tokens"]) == "".join(row_text.lower().split())


def test_empty_and_bad_args(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        unigram_train(df, "text")
    ok = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(ok, "text", vocab_size=0)
