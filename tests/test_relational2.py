"""Oracle parity for relational batch 2 + accuracy pin for approx agg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark import testing
from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import relational2


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = testing.duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(relational2.QUERIES))
def test_relational2_oracle_parity(spark, duck, sf_dir, name):
    res = testing.check_query(
        spark, duck, name, relational2.QUERIES[name], relational2.ORACLES.get(name), sf_dir
    )
    assert res.ok, res.detail


def test_approx_agg_accuracy(spark, sf_dir):
    """Each sketch sits inside its documented error envelope: the query
    surfaces that check as boolean columns, so assert they are all True."""
    rows = relational2.QUERIES["r36_approx_agg"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_parts_ok, r
        assert r.approx_median_ok, r
