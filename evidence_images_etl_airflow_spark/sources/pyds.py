"""Python DataSource API (Spark 4): a partition-parallel synthetic
events generator, registered as ``spark.read.format("synthetic_events")``.

Why it exists: scale experiments (SCALING.md) need driver-free load
generation — data that materializes inside executor tasks with no I/O,
so datagen never bottlenecks the thing being measured. The same API is
the modern extension point for custom connectors (the reference's blob
listing would be a DataSourceReader with one InputPartition per blob).

Determinism contract: every row is a pure function of its GLOBAL row
id (md5-derived), so the dataset content is identical for any
``partitions`` setting — partitioning changes parallelism, never data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["view", "click", "purchase", "error"]

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _row(i: int, n_users: int):
    h = int(hashlib.md5(f"evt:{i}".encode()).hexdigest()[:15], 16)
    return (
        i,
        h % n_users,
        EVENT_TYPES[(h >> 17) % len(EVENT_TYPES)],
        round(((h >> 23) % 100_000) / 100.0, 2),
    )


class _Partition(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.n_users = int(options.get("users", 100))

    def partitions(self):
        chunk = -(-self.rows // self.parts)  # ceil
        return [
            _Partition(lo, min(lo + chunk, self.rows), self.n_users)
            for lo in range(0, self.rows, chunk)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.n_users)


class SyntheticEventsDataSource(DataSource):
    """Options: rows (total), partitions (parallelism), users (key
    cardinality — the skew/shuffle dial for join and agg experiments)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
