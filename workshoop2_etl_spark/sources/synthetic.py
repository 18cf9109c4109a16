"""Custom connector via the Python DataSource API (Spark 4,
SPARK-44076): a deterministic synthetic events source.

This is the engine's connector SDK surface — the reference reads only
what its hooks hand it (CSV/SQLite, dags/merge_to_dw.py:37-44); a
Spark-native engine instead plugs arbitrary systems in as first-class
``spark.read.format(...)`` sources with their own partition planning.
The synthetic source doubles as the seedable workload generator every
engine test-bench needs (TPC-like generators are exactly this shape).

Scale/semantics notes:

- ``partitions()`` drives parallelism: each InputPartition generates
  its row range independently on an executor — no driver data, no
  skew, linear scale-out (the same contract a JDBC range or Kafka
  partition reader fulfils).
- Generation is PURE: row i is a closed-form function of i (mixed
  congruential hashes), so the produced table is identical across
  runs, partition counts, and engines — which is what makes the
  source oracle-checkable in DuckDB with a ``range()`` twin.
- The reader yields plain tuples; Arrow batching happens in the
  executor shim. Python-side generation is the slow path by design —
  this source exists for the API surface and test workloads, not as
  a 100 TB ingest (that is what parquet/JDBC/Kafka scans are for).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

try:  # pragma: no cover - import guard exercised only on old Spark
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAVE_PYTHON_DATASOURCE = True
except ImportError:  # Spark < 4
    HAVE_PYTHON_DATASOURCE = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass


EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

#: Knuth's multiplicative-hash constant and a Lehmer multiplier —
#: closed-form per-row mixing, reproducible in any engine's integer
#: arithmetic (values stay far below 2^63 for the row counts here).
_MIX_USER = 2654435761
_MIX_VALUE = 48271


def synth_row(i: int) -> tuple[int, int, str, float]:
    """Row ``i`` of the synthetic feed — pure closed form."""
    user_id = (i * _MIX_USER) % 1000
    event_type = EVENT_TYPES[i % 5]
    value = ((i * _MIX_VALUE) % 100000) / 1000.0
    return (i, user_id, event_type, value)


def synth_oracle_sql(n_rows: int) -> str:
    """DuckDB twin of :func:`synth_row` over ``range(n_rows)`` — the
    cross-engine proof that the connector's output is the pure
    function it claims to be."""
    return f"""
SELECT i AS event_id,
       (i * {_MIX_USER}) % 1000 AS user_id,
       ['view', 'click', 'purchase', 'signup', 'error'][(i % 5) + 1]
         AS event_type,
       CAST((i * {_MIX_VALUE}) % 100000 AS DOUBLE) / 1000.0 AS value
FROM range(0, {n_rows}) t(i)
"""


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — options:
    ``rows`` (total row count, default 1000) and ``numPartitions``
    (parallelism, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id long, user_id long, event_type string, value double"

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            n_rows=int(self.options.get("rows", 1000)),
            n_partitions=int(self.options.get("numpartitions", 8)),
        )

    def simpleStreamReader(
        self, schema
    ) -> "SyntheticEventsStreamReader":  # noqa: N802 - API contract
        return SyntheticEventsStreamReader(
            n_rows=int(self.options.get("rows", 1000)),
            batch_rows=int(self.options.get("batchrows", 100)),
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, *, n_rows: int, n_partitions: int) -> None:
        if n_rows < 0 or n_partitions < 1:
            raise ValueError("rows must be >= 0 and numPartitions >= 1")
        self.n_rows = n_rows
        self.n_partitions = min(n_partitions, max(1, n_rows))

    def partitions(self) -> Sequence[InputPartition]:
        # Contiguous row ranges, remainder spread over the first few
        # partitions — balanced within one row.
        base, extra = divmod(self.n_rows, self.n_partitions)
        bounds, start = [], 0
        for p in range(self.n_partitions):
            end = start + base + (1 if p < extra else 0)
            bounds.append(InputPartition((start, end)))
            start = end
        return bounds

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        for i in range(start, end):
            yield synth_row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector SDK
    (``spark.readStream.format("synthetic_events")``): offsets are
    plain row indices; each microbatch serves the next ``batchrows``
    slice of the same closed-form feed, so replay from any
    checkpointed offset is exact (the contract Kafka offsets give).
    ``rows`` bounds the feed — a bounded stream drains under
    ``Trigger.AvailableNow`` and the result equals the batch read,
    which is what the oracle-parity entry proves.

    The Simple reader variant serves data through the driver —
    appropriate for control-plane-scale feeds and tests; a
    partition-planned DataSourceStreamReader is the high-volume shape
    (same generator, same offsets per partition)."""

    def __init__(self, *, n_rows: int, batch_rows: int) -> None:
        if batch_rows < 1:
            raise ValueError("batchrows must be >= 1")
        self.n_rows = n_rows
        self.batch_rows = batch_rows

    def initialOffset(self) -> dict:  # noqa: N802 - API contract
        return {"idx": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # One bounded slice per call: the engine keeps calling (and a
        # bounded trigger keeps firing) until the returned offset
        # stops advancing — batch_rows is the rate limit.
        lo = start["idx"]
        hi = min(lo + self.batch_rows, self.n_rows)
        # iter(list), NOT a generator: the engine caches and COPIES
        # the iterator for replay (datasource_internal getCache), and
        # generators are unpicklable — a generator here fails at
        # planPartitions with "cannot pickle 'generator' object".
        return iter([synth_row(i) for i in range(lo, hi)]), {"idx": hi}

    def readBetweenOffsets(  # noqa: N802 - API contract
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # Deterministic replay for recovery: same closed form.
        return iter(
            [synth_row(i) for i in range(start["idx"], end["idx"])]
        )


def register_synthetic_source(spark) -> bool:
    """Idempotently register the source on a session; returns whether
    the Python DataSource API is available (False on Spark < 4, where
    callers should fall back to ``from_records``)."""
    if not HAVE_PYTHON_DATASOURCE:
        return False
    spark.dataSource.register(SyntheticEventsDataSource)
    return True
