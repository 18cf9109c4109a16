"""Model registry (round 13): every trained artifact kind survives
the versioned-table round trip bit-exactly, re-training versions
rather than overwrites history, and rollback restores an old model."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from workshoop2_etl_spark.operators.models import (
    load_bpe,
    load_classifier,
    load_langid,
    load_unigram,
    save_bpe,
    save_classifier,
    save_langid,
    save_unigram,
)


def test_classifier_roundtrip_and_versioning(spark, tmp_path):
    from workshoop2_etl_spark.operators.curation import (
        linear_text_classifier,
        train_text_classifier,
    )

    docs = spark.createDataFrame(
        [(i, ("good text " if i % 2 == 0 else "bad stuff ") * 5)
         for i in range(60)],
        "id long, text string",
    )
    w, b = train_text_classifier(
        docs, "id", "text", (F.col("id") % 2 == 0), sample_n=60, epochs=4
    )
    table = str(tmp_path / "clf")
    v1 = save_classifier(w, b, table)
    w2, b2 = load_classifier(spark, table)
    assert b2 == b
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))
    # scoring through the loaded model is bit-identical
    s_direct = linear_text_classifier(docs, w, "id", "text", bias=b).collect()
    s_loaded = linear_text_classifier(docs, w2, "id", "text", bias=b2).collect()
    assert sorted(map(tuple, s_direct)) == sorted(map(tuple, s_loaded))
    # retrain commits a NEW version; time travel loads the old model
    w3, b3 = train_text_classifier(
        docs, "id", "text", (F.col("id") % 2 == 0), sample_n=30, epochs=2
    )
    v2 = save_classifier(w3, b3, table)
    assert v2 == v1 + 1
    w_old, b_old = load_classifier(spark, table, version=v1)
    assert b_old == b
    assert sorted(map(tuple, w_old.collect())) == sorted(
        map(tuple, w.collect())
    )


def test_langid_roundtrip(spark, tmp_path):
    from workshoop2_etl_spark.operators.curation import (
        language_classify,
        train_language_classifier,
    )
    from workshoop2_etl_spark.operators.textstats import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)
    rows = [
        (i, langs[i % 4],
         (" ".join(LANG_STOPWORDS[langs[i % 4]]) + " ") * 3 + f"body {i}")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang_true string, text string")
    w, b = train_language_classifier(
        df, "doc_id", "text", "lang_true", langs, sample_n=80, epochs=6
    )
    table = str(tmp_path / "langid")
    save_langid(w, b, table)
    w2, b2 = load_langid(spark, table)
    assert b2 == b
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))
    p1 = language_classify(df, w, b, "doc_id", "text").collect()
    p2 = language_classify(df, w2, b2, "doc_id", "text").collect()
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))


def test_bpe_and_unigram_roundtrip(spark, tmp_path):
    from workshoop2_etl_spark.operators.bpe import bpe_train
    from workshoop2_etl_spark.operators.unigram import unigram_train

    docs = spark.createDataFrame(
        [(i, "lower newer lowest newest " * 3) for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", num_merges=30)
    t1 = str(tmp_path / "bpe")
    save_bpe(spark, merges, t1)
    assert load_bpe(spark, t1) == merges  # order and ranks exact

    pieces = unigram_train(docs, "text", vocab_size=40)
    t2 = str(tmp_path / "uni")
    save_unigram(spark, pieces, t2)
    back = load_unigram(spark, t2)
    assert back == pieces  # logprobs bit-identical through parquet
    assert all(math.isfinite(v) for v in back.values())


def test_ann_quantizers_roundtrip_bit_identical(spark, tmp_path):
    """X237: IVF centroids and PQ codebooks reload BIT-identically
    (float64 through parquet doubles), versioning works, and the
    reloaded quantizer yields byte-identical PQ codes."""
    import numpy as np

    from workshoop2_etl_spark.operators.models import (
        load_ivf,
        load_pq,
        save_ivf,
        save_pq,
    )
    from workshoop2_etl_spark.operators.similarity import (
        ivf_build,
        pq_assign,
        pq_build,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_build(df, n_clusters=4, seed=7)
    books = pq_build(df, m=4, n_codes=8, seed=7)

    tiv, tpq = str(tmp_path / "ivf"), str(tmp_path / "pq")
    save_ivf(spark, cents, tiv)
    save_pq(spark, books, tpq)
    cents2 = load_ivf(spark, tiv)
    books2 = load_pq(spark, tpq)
    assert cents2.shape == cents.shape and books2.shape == books.shape
    assert np.array_equal(cents2, cents)  # bit-identical, not approx
    assert np.array_equal(books2, books)

    # identical quantizer => identical codes on the query side
    c1 = {
        r["vec_id"]: list(r["code"])
        for r in pq_assign(df, books, out_col="code").collect()
    }
    c2 = {
        r["vec_id"]: list(r["code"])
        for r in pq_assign(df, books2, out_col="code").collect()
    }
    assert c1 == c2

    # re-training commits a NEW version; time travel restores v1
    cents_b = ivf_build(df, n_clusters=4, seed=99)
    v2 = save_ivf(spark, cents_b, tiv)
    assert np.array_equal(load_ivf(spark, tiv), cents_b)
    assert np.array_equal(load_ivf(spark, tiv, version=v2 - 1), cents)


def test_empty_models_roundtrip(spark, tmp_path):
    t = str(tmp_path / "emptybpe")
    save_bpe(spark, [], t)
    assert load_bpe(spark, t) == []

    # a zero-weight classifier still scores sigmoid(bias): the bias
    # must survive the save/load round trip (NULL-bucket carrier row)
    from workshoop2_etl_spark.operators.models import (
        load_classifier,
        save_classifier,
    )

    empty_w = spark.createDataFrame([], "bucket int, weight double")
    tc = str(tmp_path / "emptyclf")
    save_classifier(empty_w, -1.25, tc)
    w2, b2 = load_classifier(spark, tc)
    assert b2 == -1.25
    assert w2.count() == 0

    # zero-language langid keeps its (empty) bias dict
    from workshoop2_etl_spark.operators.models import (
        load_langid,
        save_langid,
    )

    tl = str(tmp_path / "langidone")
    lw = spark.createDataFrame([], "lang string, bucket int, weight double")
    save_langid(lw, {"zz": 0.5}, tl)
    w3, biases = load_langid(spark, tl)
    assert biases == {"zz": 0.5}
    assert w3.count() == 0

    # empty unigram table round-trips to an empty piece dict
    from workshoop2_etl_spark.operators.models import (
        load_unigram,
        save_unigram,
    )

    tu = str(tmp_path / "emptyuni")
    save_unigram(spark, {}, tu)
    assert load_unigram(spark, tu) == {}
