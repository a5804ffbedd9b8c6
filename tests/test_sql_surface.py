"""SQL-surface tests: consumer SQL written for the reference's SQLite
artifact runs unchanged against the registered Spark views."""

from __future__ import annotations

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.plans.sql_surface import (
    register_pricecatcher_views,
    register_testdata_views,
)
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table

from .conftest import SF0001


def test_testdata_views_queryable_by_sql(spark):
    names = register_testdata_views(spark, SF0001, "lineitem", "part")
    assert names == ["lineitem", "part"]
    got = spark.sql(
        """
        SELECT p_brand, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 3
        """
    ).collect()
    assert len(got) == 3 and got[0]["n"] >= got[2]["n"]


def test_pricecatcher_consumer_sql_ports_verbatim(spark, tmp_path):
    """The exact consumer query shape the reference's indexes were built
    for (filter by state, join both dims) runs against the views."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    d = tmp_path / "src"
    d.mkdir()
    pq.write_table(pa.table({
        "date": pa.array([datetime(2024, 1, 1), datetime(2024, 1, 9)], pa.timestamp("us")),
        "premise_code": pa.array(["101", "101"]),
        "item_code": pa.array(["10", "10"]),
        "price": pa.array(["5.00", "6.00"]),
    }), d / "prices.parquet")
    pq.write_table(pa.table({
        "premise_code": pa.array(["101.0"]),
        "premise": pa.array(["Shop"]),
        "address": pa.array(["1 Rd"]),
        "premise_type": pa.array(["grocer"]),
        "state": pa.array(["Selangor"]),
        "district": pa.array(["PJ"]),
    }), d / "premises.parquet")
    pq.write_table(pa.table({
        "item_code": pa.array(["10"]),
        "item": pa.array(["Milk"]),
        "unit": pa.array(["1l"]),
        "item_group": pa.array(["dairy"]),
        "item_category": pa.array(["drink"]),
    }), d / "items.parquet")

    register_pricecatcher_views(
        spark,
        prices_path=str(d / "prices.parquet"),
        premises_path=str(d / "premises.parquet"),
        items_path=str(d / "items.parquet"),
    )
    got = spark.sql(
        """
        SELECT p.date, pr.premise, i.item, p.price
        FROM prices p
        JOIN premises pr ON p.premise_code = pr.premise_code
        JOIN items i ON p.item_code = i.item_code
        WHERE pr.state = 'Selangor'
        """
    ).collect()
    assert len(got) == 1
    assert (got[0]["date"], got[0]["premise"], got[0]["item"], got[0]["price"]) == (
        "2024-01-09", "Shop", "Milk", 6.0
    )
