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


def test_set_ops_non_empty_semantics(spark):
    """EXCEPT/INTERSECT distinct semantics on data where both are non-empty
    (the registered set_except is 0-row at sf0.01 because the fixture's
    referential integrity is total — this pins the interesting cases)."""
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (4,)], ["k"])
    # subtract == SQL EXCEPT (distinct); exceptAll would keep one of the 2s
    assert sorted(r["k"] for r in a.subtract(b).collect()) == [1, 3]
    assert sorted(r["k"] for r in a.intersect(b).collect()) == [2]
    assert sorted(r["k"] for r in b.subtract(a).collect()) == [4]
    assert sorted(r["k"] for r in a.exceptAll(b.distinct()).collect()) == [1, 2, 3]


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows occupy multiple salt sub-keys (the whole point)."""
    fact = spark.createDataFrame([(1, i) for i in range(500)], ["k", "v"])
    salted = fact.withColumn("__salt", (F.rand(seed=7) * 8).cast("int"))
    n_subkeys = salted.select("__salt").distinct().count()
    assert n_subkeys >= 6  # 500 draws over 8 salts: all 8 with high prob.
