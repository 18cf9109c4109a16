"""Gap-and-islands semantics on handcrafted gaps (the events testdata
is dense per user, so oracle parity alone can't prove runs split)."""

from __future__ import annotations

from workshoop2_etl_spark.operators.timeseries import islands, longest_streaks


def test_islands_split_on_gaps(spark):
    # user a: days 1,2,3 | 7 | 9,10 → three islands
    rows = [("a", d) for d in (1, 2, 3, 7, 9, 10)] + [("b", 5)]
    df = spark.createDataFrame(rows, "u string, day long")
    got = {
        (r["u"], r["island_start"], r["island_end"], r["length_ticks"])
        for r in islands(df, ["u"], "day").collect()
    }
    assert got == {
        ("a", 1, 3, 3), ("a", 7, 7, 1), ("a", 9, 10, 2), ("b", 5, 5, 1)
    }


def test_duplicate_ticks_collapse(spark):
    # The same day observed many times counts once (distinct ticks).
    rows = [("a", 1), ("a", 1), ("a", 2), ("a", 2), ("a", 2)]
    df = spark.createDataFrame(rows, "u string, day long")
    [r] = islands(df, ["u"], "day").collect()
    assert (r["island_start"], r["island_end"], r["length_ticks"]) == (1, 2, 2)


def test_longest_streak_tiebreak_earliest(spark):
    # Two length-2 islands → earliest start reported.
    rows = [("a", d) for d in (1, 2, 5, 6, 9)]
    df = spark.createDataFrame(rows, "u string, day long")
    [r] = longest_streaks(df, ["u"], "day").collect()
    assert r["n_islands"] == 3
    assert r["n_active_ticks"] == 5
    assert r["longest_len"] == 2
    assert r["longest_start"] == 1


def test_grouped_ols_recovers_planted_line(spark):
    from workshoop2_etl_spark.operators.analytics import grouped_ols

    # exact line y = 3x + 7 → slope/intercept recovered, r² = 1
    rows = [("a", float(x), 3.0 * x + 7.0) for x in range(50)]
    # degenerate groups: single point; zero x-variance
    rows += [("single", 1.0, 5.0)]
    rows += [("novar", 2.0, 1.0), ("novar", 2.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert abs(got["a"]["slope"] - 3.0) < 1e-9
    assert abs(got["a"]["intercept"] - 7.0) < 1e-9
    assert abs(got["a"]["r2"] - 1.0) < 1e-12
    assert got["single"]["slope"] is None
    assert got["novar"]["slope"] is None and got["novar"]["r2"] is None
