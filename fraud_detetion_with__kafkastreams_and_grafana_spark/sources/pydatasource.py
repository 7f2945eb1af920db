"""Custom Python DataSource: the reference's transaction producer as a
pluggable Spark source.

The reference generates its input stream with a single-JVM Kafka producer
(TransactionProducer.java:40-50: 200 users, amount ~ U[1000, 11000), one
JSON message per second). This module re-expresses that generator as a
Spark 4 Python DataSource (`pyspark.sql.datasource.DataSource`) — the
extension point for sources Spark has no built-in reader for. Unlike the
reference's producer loop, generation is PARTITIONED: each of N input
partitions materializes its own id range on an executor, so a 10^12-row
synthetic load test never bottlenecks on one generator process.

Rows are a pure integer function of the row id (an LCG on the id, not a
seeded RNG object), which makes the source:
- deterministic across runs, partition counts, and retries (a recomputed
  task regenerates identical rows — required for exactly-once semantics
  downstream), and
- SQL-reproducible, so the r56 query carries a full DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# LCG constants (numerical-recipes flavor); all arithmetic stays < 2^63
# for ids < ~8e9 — hash to a wider mix before that at real scale.
_A = 1103515245
_C = 12345
_M = 1_000_000

SCHEMA = "event_id BIGINT, user_id BIGINT, amount DOUBLE"


def _row(i: int) -> tuple[int, int, float]:
    mix = (i * _A + _C) % _M
    user = (i * 2654435761) % 200
    # amount in [1000, 11000) like TransactionProducer.java:48
    amount = 1000.0 + (mix % 10000) + (mix // 10000) / 100.0
    return (i, user, amount)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticTxReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Range(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticTxDataSource(DataSource):
    """`spark.read.format("synthetic_tx").option("rows", N).load()`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_tx"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticTxReader:
        return SyntheticTxReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticTxStreamReader":
        return SyntheticTxStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticTxDataSource)


class SyntheticTxStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic generator: offsets
    are plain row indices, so every (start, end) range replays to
    identical rows — the property checkpoint recovery and exactly-once
    sinks depend on (readBetweenOffsets IS the recovery path). The stream
    is bounded: past `rows` the offset stops advancing, which lets
    processAllAvailable() terminate in tests and the driver harness.
    """

    def __init__(self, options):
        self.total = int(options.get("rows", 10_000))
        self.batch = int(options.get("stream_batch", 2_500))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = start["i"]
        end = min(i + self.batch, self.total)
        return iter([_row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(j) for j in range(start["i"], end["i"])])
