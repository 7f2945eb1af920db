"""Per-query oracle parity sweep for every registered STREAMING query
(plans/streaming_queries.py) — real micro-batch execution compared to
batch ANSI SQL, mirroring the driver's check. Semantics-specific pins
(late-data drop, watermark bounds, recovery) live in test_streaming.py."""

from __future__ import annotations

import pytest

from fraud_detetion_with__kafkastreams_and_grafana_spark import testing
from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import streaming_queries


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = testing.duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(streaming_queries.QUERIES))
def test_streaming_oracle_parity(spark, duck, sf_dir, name):
    res = testing.check_query(
        spark,
        duck,
        name,
        streaming_queries.QUERIES[name],
        streaming_queries.ORACLES.get(name),
        sf_dir,
    )
    assert res.ok, res.detail
