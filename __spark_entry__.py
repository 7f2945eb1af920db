"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (fraud top-10 scammers) on sf0.001.
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per implemented
                 operator (SURVEY.md §2).
oracle_sql()  -> name -> equivalent DuckDB SQL over the same parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.registry import (
    all_oracles,
    all_queries,
)
from fraud_detetion_with__kafkastreams_and_grafana_spark.session import (
    apply_session_defaults,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_session_defaults(spark)
    q = all_queries()["q1_top10_scammers"]
    return q(spark, "/root/testdata/sf0.001")


def _self_configuring(fn: Callable[[SparkSession, str], DataFrame]):
    """Each query must run on a VANILLA driver session: apply the engine's
    runtime-settable defaults (UTC timezone, AQE, parquet-nanos handling)
    before building the plan, exactly like entry() does."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_session_defaults(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _self_configuring(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
