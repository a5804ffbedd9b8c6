"""Bucketed-table sink: the exchange-elision promise, pinned on the plan.

write_bucketed pays the shuffle+sort once at write time; every later
equi-join on the bucket key must then run WITHOUT an Exchange on either
side — that is the entire point of the operator, so a silent regression
to shuffling (bucket-count mismatch, catalog misconfig, AQE interference)
must fail a test, not surface as a 100 TB bench mystery.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.sinks.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # park the test db (and its table files) under tmp, not the session
    # warehouse dir
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{wh}'")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        "bktest.orders_b", "okey", 8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        "bktest.lineitem_b", "okey", 8,
    )
    yield "bktest.orders_b", "bktest.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


@pytest.fixture()
def no_broadcast(spark):
    # bucketing's payoff is the BIG-BIG join (a broadcastable side needs no
    # co-location); at test scale both sides fit the broadcast threshold,
    # so disable it to pin the plan the operator exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_unbucketed_same_join_does_shuffle(spark, no_broadcast):
    # control: the identical join over bare parquet paths must shuffle —
    # proving the elision above comes from the bucketed layout, not from
    # some session default
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = (
        bucketed_join(spark, left, right, "okey")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .first()
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    ref = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .first()
    )
    assert (got.n, got.s) == (ref.n, ref.s)


def test_bucketed_groupby_on_bucket_key_has_no_exchange(spark, bucketed_tables):
    # bucketing helps aggregation too: groupBy on the bucket key reads
    # pre-partitioned data and needs no shuffle
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("okey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
