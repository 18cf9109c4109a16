"""Streaming-surface registry entries.

Each callable runs a bounded ``Trigger.AvailableNow`` activation of a
Structured Streaming plan and returns the materialized result as a
batch DataFrame — so the driver's oracle gate can hash-compare the
*streaming* engine path against DuckDB's batch answer (the strongest
correctness statement available for a stream: bounded-input parity
with batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workshoop2_etl_spark.plans.reference_queries import _register
from workshoop2_etl_spark.streaming import (
    run_available_now,
    sessionize,
    stream_events,
    windowed_event_counts,
)


@_register(
    "streaming_hourly_event_counts",
    """
SELECT CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
         AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
""",
)
def streaming_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts, computed by the streaming
    engine over the bounded events feed (complete mode so every
    window materializes in one activation) — hash-identical to the
    batch/DuckDB grouping."""
    stream = stream_events(spark, f"{sf_dir}/events.parquet")
    counts = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    return run_available_now(
        counts, "q_stream_hourly_counts", output_mode="complete"
    )


@_register("streaming_user_sessions")  # rows-only: stateful, not SQL-shaped
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user via
    applyInPandasWithState — the custom stateful operator class.
    Rows-only: session assignment is an iterative per-group scan, not
    a grouping DuckDB can express directly."""
    stream = stream_events(spark, f"{sf_dir}/events.parquet")
    sessions = sessionize(stream, gap_minutes=30)
    return run_available_now(sessions, "q_stream_sessions")
