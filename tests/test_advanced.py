"""Oracle parity for the UDF/UDAF/UDTF + MLlib plan module
(plans/advanced.py) — the dedicated behavioral tests live in
test_udfs_skew.py / test_mlscore.py; this mirrors the driver's
per-query value-hash check."""

from __future__ import annotations

import pytest

from fraud_detetion_with__kafkastreams_and_grafana_spark import testing
from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = testing.duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(advanced.QUERIES))
def test_advanced_oracle_parity(spark, duck, sf_dir, name):
    res = testing.check_query(
        spark, duck, name, advanced.QUERIES[name], advanced.ORACLES.get(name), sf_dir
    )
    assert res.ok, res.detail
