"""BPE train/apply: the textbook example, determinism, lossless
roundtrip, and the memoized-apply equivalence."""

from __future__ import annotations

from workshoop2_etl_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_apply,
    bpe_train,
)


def _corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newer newer newer newer newer newer"),
        (3, "newest newest widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_frequent_pairs_deterministically(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", num_merges=10)
    assert merges == bpe_train(df, "text", num_merges=10)  # deterministic
    # Hand count: (w,e) appears in lower×2 + newer×6 + newest×2 = 10,
    # the corpus maximum — it must be the first merge learned.
    assert merges[0] == ("w", "e")
    # 'low' requires (l,o) then (lo,w) in that order somewhere after.
    assert merges.index(("l", "o")) < merges.index(("lo", "w"))


def test_apply_roundtrip_lossless(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", num_merges=50)
    out = {r["doc_id"]: r for r in bpe_apply(df, "text", merges).collect()}
    originals = {r["doc_id"]: r["text"] for r in df.collect()}
    for doc_id, text in originals.items():
        toks = out[doc_id]["bpe_tokens"]
        # concatenating tokens and splitting on the EOW sentinel
        # reconstructs the lower-cased pre-tokenized words exactly
        rebuilt = "".join(toks).split(EOW)
        assert rebuilt[-1] == ""
        assert rebuilt[:-1] == text.lower().split()
        assert out[doc_id]["n_bpe"] == len(toks)


def test_fully_merged_words_become_single_tokens(spark):
    df = _corpus(spark)
    # enough merges to fuse every training word into one token
    merges = bpe_train(df, "text", num_merges=500)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_apply(df, "text", merges).collect()}
    assert out[1] == ["low" + EOW] * 5


def test_unseen_word_degrades_to_chars(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", num_merges=500)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = _encode_word("zzz", ranks)
    # no trained merge applies → raw characters + sentinel survive
    assert toks == ["z", "z", "z", EOW]


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "low")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w")]
    out = {r["doc_id"]: r for r in bpe_apply(df, "text", merges).collect()}
    assert out[1]["n_bpe"] == 0 and out[2]["n_bpe"] == 0
    assert out[3]["bpe_tokens"] == ["low", EOW]
