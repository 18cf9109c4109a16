"""Structured Streaming surface (SURVEY §2.7 / §7 optional extension).

The reference's only recurrence is a weekly cron re-run of the whole
batch pipeline (dags/limpiezaSpotify.py:66, merge_to_drive.py:40).
The streaming-native equivalent is an incremental file-source stream
with ``Trigger.AvailableNow`` — each activation processes exactly the
files that arrived since the last checkpointed offset and stops, which
is the cron semantics minus the recompute-everything cost.
"""

from workshoop2_etl_spark.streaming.events import (
    run_available_now,
    run_available_now_to_parquet,
    sessionize,
    stream_events,
    windowed_event_counts,
)

__all__ = [
    "stream_events",
    "windowed_event_counts",
    "sessionize",
    "run_available_now",
    "run_available_now_to_parquet",
]
