"""Pipeline layer — the reference's DAGs as composed lazy plans."""

from workshoop2_etl_spark.plans.pipelines import (
    DimSpec,
    clean_pipeline,
    merge_pipeline,
    star_pipeline,
)

__all__ = ["DimSpec", "clean_pipeline", "merge_pipeline", "star_pipeline"]
