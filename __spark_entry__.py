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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
