"""Batch-to-stream replay: run any wire-format transformation as a REAL
Structured Streaming query (file source, several micro-batches, memory
sink) and hand back the final result as a batch DataFrame.

This is how the driver's oracle harness exercises the streaming engine:
the same events that feed the batch oracle are serialized to the JSON wire
format (TransactionProducer.java:27), replayed through the streaming
topology in `maxFilesPerTrigger`-sized micro-batches — so stateful
aggregations genuinely accumulate across batches — and the complete-mode
snapshot is compared against plain batch SQL. Batch-stream parity becomes
an oracle-checked property instead of a claim.

Scale: the replay writer/reader are distributed (df.write.text /
readStream.text); nothing is collected. The memory sink holds only the
final aggregated snapshot (bounded by group count, not input rows).
"""

from __future__ import annotations

import itertools
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_RUN = itertools.count()


def materialize_wire_dir(wire: DataFrame, n_files: int = 8) -> str:
    """Write the single-STRING-column `wire` frame to exactly `n_files`
    text files (repartition, not coalesce, so the file count — and hence
    the micro-batch count on replay — is known). The directory is removed
    at interpreter exit."""
    import atexit
    import shutil

    run = next(_RUN)
    d = tempfile.mkdtemp(prefix=f"spark_graft_replay_{os.getpid()}_{run}_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    wire.repartition(n_files).write.mode("overwrite").text(d)
    return d


def replay_wire_stream(
    spark: SparkSession,
    wire: DataFrame | str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    n_files: int = 8,
    files_per_trigger: int = 2,
    name: str | None = None,
) -> DataFrame:
    """Serialize `wire` (single STRING column, or an already-materialized
    directory path) to text files, stream them back through `transform` in
    ceil(n_files/files_per_trigger) micro-batches, and return the final
    memory-sink snapshot.

    Pass a fixed `name` for repeated invocations (bench loops, driver
    re-runs): the previous run's memory-sink table of the same name is
    dropped first, so snapshots don't accumulate in JVM memory."""
    d = wire if isinstance(wire, str) else materialize_wire_dir(wire, n_files)

    stream = (
        spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", files_per_trigger)
        .text(d)
    )
    run = next(_RUN)
    if name is not None:
        spark.catalog.dropTempView(name)
    name = name or f"replay_mem_{os.getpid()}_{run}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
