"""Relational + data-pipeline operators (reference SURVEY.md §2,
extensions §2.9). Curated re-exports for API discoverability; each
module remains importable directly."""

from workshoop2_etl_spark.operators.analytics import (
    approx_count_distinct,
    corr_matrix,
    crosstab_counts,
    grouped_quantiles,
    histogram,
    null_profile,
    quantiles,
    summary_stats,
    top_k,
    top_k_per_group,
    value_counts,
)
from workshoop2_etl_spark.operators.cleaning import (
    coerce_numeric,
    dedup_rows,
    ensure_columns,
    mode_or_first_dedup,
    recode_with_default,
    rename_columns,
)
from workshoop2_etl_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_groups,
    exact_dedup,
    near_dedup_keep,
    near_dedup_minhash,
    simhash,
)
from workshoop2_etl_spark.operators.merge import (
    full_outer_with_indicator,
    merge_provenance_counts,
)
from workshoop2_etl_spark.operators.multimodal import (
    attach_media,
    decode_image_metadata,
    extract_audio_features,
    extract_embedding,
    media_metadata,
    resize_images,
    sample_frames,
)
from workshoop2_etl_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    embedding_neardup,
    ivf_topk,
    lsh_topk,
)
from workshoop2_etl_spark.operators.star import build_dim, resolve_fk, upsert_dim
from workshoop2_etl_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
    word_frequencies,
)

__all__ = [name for name in dir() if not name.startswith("_")]
