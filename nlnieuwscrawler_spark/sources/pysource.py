"""Spark 4 Python DataSource API: a partitioned synthetic WARC-manifest source.

Demonstrates the custom-source surface (``pyspark.sql.datasource``) the way
a real crawl deployment would wrap a WARC/CDX index: ``partitions()``
splits the record range so the scan parallelizes across executors, and
``read(partition)`` yields only that slice — no driver materialization, no
external data. Records are a pure function of the record id, so a DuckDB
``range()`` query reproduces them exactly and the source is fully
oracle-checkable (rare for a custom source).

Swap-in for a real WARC source: replace the synthesis in ``read`` with
boto3/requests range-reads of the WARC segments listed in the partition's
manifest slice; partitioning, schema and registration stay identical.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BASE_TS = datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "rec_id long, url string, fetch_ts timestamp, status int, n_bytes long"


def synth_record(i: int) -> tuple:
    """Record i — deterministic, SQL-expressible (the oracle's contract)."""
    return (
        i,
        f"https://w{i % 50}.example/p{i}",
        BASE_TS + timedelta(minutes=i),
        (i * i) % 5,
        1000 + (i * 37) % 4096,
    )


class SyntheticWarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthwarc"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "SyntheticWarcReader":
        return SyntheticWarcReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticWarcStreamReader":
        return SyntheticWarcStreamReader(self.options)


class SyntheticWarcReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, math.ceil(self.n / self.n_parts))
        return [
            InputPartition((start, min(start + step, self.n)))
            for start in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield synth_record(i)


class SyntheticWarcStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the custom source (SimpleDataSourceStreamReader):
    a replayable offset-tracked feed of the same records. Offsets are plain
    record indices, so ``readBetweenOffsets`` replays any window exactly —
    the contract that makes the source exactly-once under retries. A real
    deployment would map offsets to CDX/WARC byte ranges the same way.
    """

    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.batch = int(options.get("rows_per_batch", 500))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        if i >= self.n:
            return iter([]), start
        end = min(i + self.batch, self.n)
        return iter([synth_record(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [synth_record(j) for j in range(int(start["i"]), int(end["i"]))]
        )


def register(spark) -> None:
    spark.dataSource.register(SyntheticWarcDataSource)
