"""Join operator tests, incl. the skew-salting equivalence guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import joins
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table

from .conftest import SF0001


def test_join_fact_dim_matches_plain_join(spark):
    li = load_table(spark, SF0001, "lineitem")
    part = load_table(spark, SF0001, "part")
    a = joins.join_fact_dim(li, part, li["l_partkey"] == part["p_partkey"])
    b = li.join(part, li["l_partkey"] == part["p_partkey"])
    assert a.count() == b.count()


def test_salted_join_equals_plain_join_under_skew(spark):
    """90% of fact rows share one key (pathological skew); the salted join
    must return exactly the plain join's rows."""
    fact = spark.createDataFrame(
        [(1 if i % 10 else i, f"f{i}") for i in range(2000)], ["k", "fv"]
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 2000, 7)] + [(1, "r1b")], ["k", "rv"]
    )
    plain = {(r["k"], r["fv"], r["rv"])
             for r in fact.join(right, "k").collect()}
    salted = joins.salted_join(fact, right, "k", salt_factor=8)
    got = {(r["k"], r["fv"], r["rv"]) for r in salted.collect()}
    assert got == plain
    assert salted.columns == ["k", "fv", "rv"]


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows occupy multiple salt sub-keys (the whole point)."""
    fact = spark.createDataFrame([(1, i) for i in range(500)], ["k", "v"])
    salted = fact.withColumn("__salt", (F.rand(seed=7) * 8).cast("int"))
    n_subkeys = salted.select("__salt").distinct().count()
    assert n_subkeys >= 6  # 500 draws over 8 salts: all 8 with high prob.
