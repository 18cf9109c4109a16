"""Data-quality expectation suite: null fractions, uniqueness,
referential integrity — each check's pass AND fail paths."""

from __future__ import annotations

import pytest

from workshoop2_etl_spark.operators.quality import (
    expect_null_fractions,
    expect_referential,
    expect_unique,
    expectation_report,
)


def test_null_fractions_thresholds(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id int, v string"
    )
    rows = {
        r["target"]: r
        for r in expect_null_fractions(df, {"id": 0.0, "v": 0.4}).collect()
    }
    assert rows["id"]["ok"] is True and rows["id"]["n_bad"] == 0
    assert rows["v"]["n_bad"] == 2 and rows["v"]["metric"] == 0.5
    assert rows["v"]["ok"] is False  # 0.5 > 0.4


def test_unique_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id int, grp string"
    )
    ok = expect_unique(df, ["id"]).collect()[0]
    assert ok["ok"] is True and ok["n_bad"] == 0
    dup = expect_unique(df, ["grp"]).collect()[0]
    assert dup["ok"] is False and dup["n_bad"] == 1  # 3 rows, 2 distinct


def test_referential_counts_dangling_only(spark):
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    fact = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk int"
    )
    row = expect_referential(fact, dim, ["fk"], ["pk"], dim_name="d").collect()[0]
    # the None FK belongs to the null check, not here
    assert row["n_bad"] == 1 and row["ok"] is False
    assert row["target"] == "fk->d"


def test_expectation_report_unions_and_orders(spark):
    df = spark.createDataFrame([(1,), (2,)], "id int")
    rep = expectation_report(
        [expect_unique(df, ["id"]), expect_null_fractions(df, {"id": 0.0})]
    ).collect()
    assert [r["check"] for r in rep] == ["null_frac", "unique"]
    with pytest.raises(ValueError, match="no checks"):
        expectation_report([])


def test_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        expect_null_fractions(df, {})
    with pytest.raises(ValueError):
        expect_unique(df, [])
    with pytest.raises(ValueError):
        expect_referential(df, df, ["id"], [], dim_name="d")


def test_robust_outliers_flags_planted_spike(spark):
    from workshoop2_etl_spark.operators.quality import robust_outliers

    rows = [("g", float(v)) for v in range(100)] + [("g", 1e6)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, ["g"], "v", z=3.5)
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert flagged == {1e6}
    # median/MAD are robust: the spike must not drag them
    [r] = out.filter("v = 50.0").collect()
    assert abs(r["__med"] - 50.0) < 1e-9


def test_robust_outliers_zero_mad_flags_nothing(spark):
    from workshoop2_etl_spark.operators.quality import robust_outliers

    # >50% identical values → MAD = 0 → convention: no flags, even
    # for the obvious deviant (use a range gate for that regime).
    rows = [("g", 5.0)] * 10 + [("g", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, ["g"], "v")
    assert out.filter("is_outlier").count() == 0


def test_psi_zero_for_identical_distributions(spark):
    from workshoop2_etl_spark.operators.quality import psi_drift

    import pyspark.sql.functions as SF

    df = spark.range(10_000).select((SF.col("id") % 997).cast("double").alias("v"))
    out = psi_drift(df, df, "v", n_bins=10)
    rows = out.collect()
    assert len(rows) == 10
    total = sum(r["psi"] for r in rows)
    assert abs(total) < 1e-9  # p == q in every bin


def test_psi_detects_shift(spark):
    from workshoop2_etl_spark.operators.quality import psi_drift

    import pyspark.sql.functions as SF

    base = spark.range(10_000).select(
        (SF.col("id") % 1000).cast("double").alias("v")
    )
    shifted = base.select((SF.col("v") + 500).alias("v"))
    total = sum(r["psi"] for r in psi_drift(base, shifted, "v").collect())
    assert total > 0.25  # the conventional "significant shift" bar


def test_psi_nbins_guard(spark):
    from workshoop2_etl_spark.operators.quality import psi_drift

    import pyspark.sql.functions as SF
    import pytest as _pytest

    df = spark.range(10).select(SF.col("id").cast("double").alias("v"))
    with _pytest.raises(ValueError, match="n_bins"):
        psi_drift(df, df, "v", n_bins=1)


def test_chisq_perfect_association_and_independence(spark):
    from workshoop2_etl_spark.operators.quality import (
        chi_square_independence,
    )

    # Perfect association: b == a → χ² = N·(k−1), Cramér's V = 1
    rows = [(str(i % 3), str(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    assert r["n"] == 300 and r["dof"] == 4
    assert abs(r["chi2"] - 300 * 2) < 1e-6
    assert abs(r["cramers_v"] - 1.0) < 1e-9

    # Exact independence (balanced cross product) → χ² = 0
    rows = [(str(i % 3), str(j % 4)) for i in range(3) for j in range(4)] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi_square_independence(df, "a", "b").collect()
    assert abs(r["chi2"]) < 1e-9 and abs(r["cramers_v"]) < 1e-9


def test_join_key_health_planted_pathologies(spark):
    from workshoop2_etl_spark.operators.quality import join_key_health

    fact = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (99,)], "k long"
    )
    dim = spark.createDataFrame([(1,), (2,), (2,)], "pk long")  # dup key 2
    [r] = join_key_health(fact, "k", dim, "pk").collect()
    assert r["n_fact"] == 6
    assert r["n_null_keys"] == 1
    assert r["n_orphans"] == 1          # 99 dangles
    assert r["n_dup_dim_keys"] == 1     # pk=2 duplicated
    assert r["top_key"] == "1" and r["top_key_n"] == 3


def test_gopher_rules_each_rule_fires(spark):
    """Each Gopher rule trips on a document built to violate exactly
    that rule; a well-formed document passes all of them."""
    from workshoop2_etl_spark.operators.quality import gopher_rules

    good = (
        "the quick brown fox jumps over and over with steady prose to "
        "be sure of that rhythm " * 3
    )  # ~48 words — pad to pass min_words=50
    good = good + "padding words here again thanks"
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "tiny doc"),                                # word count
            (3, " ".join(["a"] * 60)),                      # mean word len + alpha ok? 'a' alpha; len 1 < 3
            (4, " ".join(["word#tag#x"] * 60)),             # symbol ratio (2 hits/word)
            (5, "\n".join(["- bullet line item"] * 10)),    # bullets
            (6, "\n".join(["trailing thought..."] * 10)),   # ellipses
            (7, " ".join(["1234"] * 60)),                   # alpha fraction
            (8, " ".join(["zxqv"] * 60)),                   # stopwords
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_rules(docs, "text").collect()}
    assert out[1].gopher_pass
    assert not out[2].ok_word_count
    assert not out[3].ok_mean_word_len
    assert not out[4].ok_symbol_ratio
    assert not out[5].ok_bullets
    assert not out[6].ok_ellipses
    assert not out[7].ok_alpha_words
    assert not out[8].ok_stopwords
    for d in range(2, 9):
        assert not out[d].gopher_pass


def test_gopher_rules_threshold_overrides_and_guard(spark):
    from workshoop2_etl_spark.operators.quality import gopher_rules

    docs = spark.createDataFrame(
        [(1, "the cat and the dog sat with all of that")],
        "doc_id long, text string",
    )
    relaxed = gopher_rules(docs, "text", min_words=5).collect()[0]
    assert relaxed.ok_word_count and relaxed.gopher_pass
    strict = gopher_rules(docs, "text", min_words=50).collect()[0]
    assert not strict.ok_word_count
    with pytest.raises(ValueError):
        gopher_rules(docs, "text", not_a_threshold=1)


def test_k_anonymity_planted_violations(spark):
    from workshoop2_etl_spark.operators.quality import k_anonymity

    rows = (
        [("a", 1, 100.0)] * 5          # group size 5, 1 distinct value
        + [("a", 2, float(i)) for i in range(3)]  # size 3 < k
        + [("b", 1, 7.0), ("b", 1, 8.0)]          # size 2 < k
        + [(None, 9, 1.0)]              # NULL quasi forms its own group
    )
    df = spark.createDataFrame(rows, "seg string, nat int, bal double")
    r = k_anonymity(
        df, ["seg", "nat"], k=4, sensitive_col="bal", l_threshold=2
    ).collect()[0]
    assert r.n_rows == 11 and r.n_groups == 4
    assert r.min_group_size == 1
    assert r.n_violating_groups == 3  # sizes 3, 2, 1 < 4
    assert r.n_reidentifiable_rows == 6
    assert r.pct_reidentifiable == pytest.approx(round(6 / 11, 6))
    # homogeneity: the size-5 group has 1 distinct bal, NULL group too
    assert r.min_l_diversity == 1 and r.n_low_diversity_groups == 2
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=4)
    with pytest.raises(ValueError):
        k_anonymity(df, ["seg"], k=0)


def test_benford_digit_extraction_and_exclusions(spark):
    from workshoop2_etl_spark.operators.quality import (
        BENFORD_EXPECTED,
        benford_audit,
    )

    # 1000.00 is the classic libm trap (log10 -> 2.999…); exact-cents
    # extraction must put it in digit 1. Negatives/zero excluded.
    vals = [1000.00, 19.99, 2.50, 0.0, -5.0, 935.01, 0.001]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[1].n == 2  # 1000.00 and 19.99
    assert rows[2].n == 1 and rows[9].n == 1
    assert rows[1].n_excluded == 3  # 0.0, -5.0, 0.001 (sub-cent)
    assert rows[3].n == 0 and rows[3].observed == 0.0
    for d in range(1, 10):
        assert rows[d].expected == BENFORD_EXPECTED[d]
    total = sum(rows[d].n for d in range(1, 10))
    assert total == 4


def test_ks_two_sample_matches_scipy_style_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.quality import ks_two_sample

    rng = random.Random(5)
    xs = [(round(rng.gauss(0, 1), 3), True) for _ in range(200)] + [
        (round(rng.gauss(0.5, 1.2), 3), False) for _ in range(150)
    ]
    df = spark.createDataFrame(xs, "v double, g boolean")
    r = ks_two_sample(df, "v", F.col("g"), num_partitions=5).collect()[0]
    a = sorted(v for v, g in xs if g)
    b = sorted(v for v, g in xs if not g)
    vals = sorted({v for v, _ in xs})
    import bisect

    best, best_v = -1.0, None
    for v in vals:
        d = abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        if d > best + 1e-15:
            best, best_v = d, v
    assert r.n_a == 200 and r.n_b == 150
    assert r.ks_stat == pytest.approx(best, abs=1e-12)
    assert r.ks_at == pytest.approx(best_v)


def test_ks_two_sample_identical_distributions_zero(spark):
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.quality import ks_two_sample

    rows = [(float(i % 7), i % 2 == 0) for i in range(140)]
    df = spark.createDataFrame(rows, "v double, g boolean")
    r = ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert r.ks_stat == 0.0


def test_dp_noisy_counts_deterministic_and_clamped(spark):
    import math

    from workshoop2_etl_spark.operators.quality import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 1, ["g"]
    )
    a = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], epsilon=0.5).collect()}
    b = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], epsilon=0.5).collect()}
    assert a == b  # seeded replay
    # noise magnitude is Laplace(2): within ~30 of truth with
    # overwhelming certainty at these seeds, never negative
    assert abs(a["a"] - 50) < 30 and a["a"] >= 0
    assert a["b"] >= 0
    # replay the inverse-CDF by hand for group 'a'
    import hashlib
    u = (int(hashlib.md5("dp\x1fa".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
    noise = -(1 / 0.5) * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
    expect = max(50 * 1_000_000 + math.floor(noise * 1e6 + 0.5), 0) / 1e6
    assert a["a"] == expect
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], epsilon=1.0)


def test_dp_noisy_counts_null_group_gets_own_seed(spark):
    import hashlib
    import math

    from workshoop2_etl_spark.operators.quality import dp_noisy_counts

    # a NULL group must NOT alias the seed of any other group (the
    # concat_ws-skips-NULL hazard): NULL normalizes to '<null>'
    df = spark.createDataFrame(
        [(None,)] * 10 + [("<null>",)] * 10 + [("",)] * 10,
        "g string",
    )
    got = {
        r.g: r.noisy_count
        for r in dp_noisy_counts(df, ["g"], epsilon=0.5).collect()
    }
    assert len(got) == 3 and None in got

    def replay(key: str) -> float:
        u = (int(hashlib.md5(key.encode()).hexdigest()[:8], 16) + 0.5) / 2**32
        noise = -(1 / 0.5) * math.copysign(1.0, u - 0.5) * math.log(
            1 - 2 * abs(u - 0.5)
        )
        return max(10 * 1_000_000 + math.floor(noise * 1e6 + 0.5), 0) / 1e6

    assert got[None] == replay("dp\x1f<null>")
    # the literal string '<null>' intentionally shares the sentinel
    # seed (documented collision); the empty string does not
    assert got["<null>"] == replay("dp\x1f<null>")
    assert got[""] == replay("dp\x1f")
