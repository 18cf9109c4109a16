"""End-to-end reference-pipeline parity (VERDICT r1 missing #6):
the full ``spotify_clean`` shape — CSV in → required-columns check →
genre recode with defaults → drop source column → mode-or-first
group collapse → distinct → CSV out — on a spotify-schema fixture,
verified against a pandas oracle that follows the reference algorithm
(dags/limpiezaSpotify.py:72-105) step by step."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workshoop2_etl_spark.plans.pipelines import clean_pipeline
from workshoop2_etl_spark.sources.readers import read_csv
from workshoop2_etl_spark.sources.writers import write_csv

GENRE_MAP = {
    "rock": ("Rock", "classic rock"),
    "punk": ("Rock", "punk"),
    "house": ("Electronica", "house"),
    "techno": ("Electronica", "techno"),
}

ROWS = [
    # track_id, row_no (file order), track_genre, popularity
    ("t1", 0, "rock", 80),
    ("t1", 1, "rock", 75),
    ("t1", 2, "rock", 80),   # mode(popularity)=80
    ("t2", 3, "salsa", 60),  # unmapped genre -> ('Otro', 'salsa')
    ("t3", 4, "house", None),
    ("t3", 5, "house", 50),  # mode skips null -> 50
    ("t4", 6, "punk", 30),
    ("t4", 7, "punk", 30),   # exact dup rows collapse
]

SCHEMA = T.StructType(
    [
        T.StructField("track_id", T.StringType()),
        T.StructField("row_no", T.LongType()),
        T.StructField("track_genre", T.StringType()),
        T.StructField("popularity", T.LongType()),
    ]
)


def _pandas_oracle() -> pd.DataFrame:
    """The reference algorithm, step for step, in pandas."""
    df = pd.DataFrame(ROWS, columns=["track_id", "row_no", "track_genre", "popularity"])
    genero_map = {k: v[0] for k, v in GENRE_MAP.items()}
    sub_map = {k: v[1] for k, v in GENRE_MAP.items()}
    df["track_genre"] = df["track_genre"].astype(str)
    df["genero"] = df["track_genre"].map(genero_map).fillna("Otro")
    df["subgenero"] = df["track_genre"].map(sub_map).fillna(df["track_genre"])
    df = df.drop(columns=["track_genre"])

    def mode_or_first(s: pd.Series):
        m = s.mode(dropna=True)
        if len(m):
            return m.iloc[0]
        nn = s.dropna()
        return nn.iloc[0] if nn.size else None

    def agg_col(s: pd.Series):
        return mode_or_first(s) if s.name == "popularity" else s.iloc[0]

    df = df.sort_values("row_no").groupby("track_id", as_index=False).agg(agg_col)
    return df.drop_duplicates().drop(columns=["row_no"])


def test_spotify_clean_end_to_end(spark, tmp_path):
    src = tmp_path / "in_csv"
    dst = tmp_path / "out_csv"
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.option(
        "header", "true"
    ).csv(str(src))

    df = read_csv(spark, str(src), SCHEMA)
    cleaned = clean_pipeline(
        df,
        required=["track_id", "track_genre", "popularity"],
        recode_col="track_genre",
        recode_map=GENRE_MAP,
        recode_out=["genero", "subgenero"],
        recode_defaults=[F.lit("Otro"), F.col("track_genre")],
        dedup_key="track_id",
        mode_col="popularity",
        order_cols=["row_no"],
    ).drop("row_no")
    write_csv(cleaned, str(dst), single_file=True)

    out_schema = T.StructType(
        [
            T.StructField("track_id", T.StringType()),
            T.StructField("popularity", T.LongType()),
            T.StructField("genero", T.StringType()),
            T.StructField("subgenero", T.StringType()),
        ]
    )
    got = (
        read_csv(spark, str(dst), out_schema)
        .toPandas()
        .sort_values("track_id", ignore_index=True)
    )
    want = (
        _pandas_oracle()[["track_id", "popularity", "genero", "subgenero"]]
        .sort_values("track_id", ignore_index=True)
        .astype({"popularity": "Int64"})
    )
    got = got.astype({"popularity": "Int64"})
    pd.testing.assert_frame_equal(got, want)


def test_spotify_clean_missing_required_raises(spark):
    from workshoop2_etl_spark.sources.contracts import SchemaContractError

    df = spark.createDataFrame([("t1",)], "track_id string")
    with pytest.raises(SchemaContractError):
        clean_pipeline(df, required=["track_id", "track_genre", "popularity"])
