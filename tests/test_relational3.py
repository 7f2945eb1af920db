"""Oracle parity for relational batch 4 (maps, higher-order lambdas,
date arithmetic, bitwise, local-supplier join) + plan-shape evidence that
r47's dimension joins broadcast."""

from __future__ import annotations

import pytest

from fraud_detetion_with__kafkastreams_and_grafana_spark import testing
from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import relational3


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = testing.duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(relational3.QUERIES))
def test_relational3_oracle_parity(spark, duck, sf_dir, name):
    res = testing.check_query(
        spark, duck, name, relational3.QUERIES[name], relational3.ORACLES.get(name), sf_dir
    )
    assert res.ok, res.detail


def test_r47_broadcasts_dims(spark, sf_dir):
    """The Q5-shape join must broadcast customer/supplier/nation: the only
    sort-merge/shuffle join allowed in the plan is lineitem-orders."""
    plan = (
        relational3.QUERIES["r47_local_supplier_join"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_r44_exactness_anchor(spark, sf_dir):
    """Integer-valued quantities make the lambda folds exact: sum of
    squares must equal the relational formulation row-for-row."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    got = {
        r.l_orderkey: r.sum_sq_qty
        for r in relational3.QUERIES["r44_higher_order"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    want = {
        r.l_orderkey: r.s
        for r in li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity") * F.col("l_quantity")), 2).alias("s"))
        .collect()
    }
    assert got == want


def test_r43_single_shuffle(spark, sf_dir):
    """The repartition on l_orderkey must serve BOTH aggregations: exactly
    one hash-partitioning exchange in the executed plan."""
    plan = (
        relational3.QUERIES["r43_map_funcs"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
