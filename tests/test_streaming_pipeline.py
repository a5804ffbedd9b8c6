"""Incremental artifact maintenance: any sequence of streaming top-ups must
converge to the same SQLite contents as a from-scratch batch rebuild."""

from __future__ import annotations

import sqlite3
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from opendosm_parquet_to_sqlite_spark.plans.pipeline import cleanse_prices
from opendosm_parquet_to_sqlite_spark.operators import dedup
from opendosm_parquet_to_sqlite_spark.streaming.pipeline import stream_prices_to_sqlite


def _month_file(path, rows):
    pq.write_table(
        pa.table(
            {
                "date": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "premise_code": pa.array([r[1] for r in rows]),
                "item_code": pa.array([r[2] for r in rows]),
                "price": pa.array([r[3] for r in rows]),
            }
        ),
        path,
    )


M1 = [
    (datetime(2024, 1, 5), "101", "10", "5.50"),
    (datetime(2024, 1, 20), "101", "10", "6.00"),
    (datetime(2024, 1, 9), "102", "10", "7.00"),
]
M2 = [
    (datetime(2024, 2, 2), "101", "10", "6.50"),   # newer champion for (101,10)
    (datetime(2024, 2, 3), "103", "20", "3.30"),   # brand-new key
]


def _db_rows(db):
    con = sqlite3.connect(db)
    try:
        return sorted(con.execute("SELECT * FROM prices").fetchall())
    finally:
        con.close()


def test_incremental_runs_converge_to_batch_rebuild(spark, tmp_path):
    src = tmp_path / "months"
    src.mkdir()
    _month_file(src / "pricecatcher_2024-01.parquet", M1)
    schema = spark.read.parquet(str(src)).schema

    db = tmp_path / "prices.db"
    ckpt = tmp_path / "ckpt"
    stream_prices_to_sqlite(spark, src, db, ckpt, schema)
    assert _db_rows(db) == [
        ("2024-01-09", 102, 10, 7.0),
        ("2024-01-20", 101, 10, 6.0),
    ]

    # idempotent: no new files → artifact untouched
    before = _db_rows(db)
    stream_prices_to_sqlite(spark, src, db, ckpt, schema)
    assert _db_rows(db) == before

    # month 2 lands: champion flip + new key, processed as a delta
    _month_file(src / "pricecatcher_2024-02.parquet", M2)
    stream_prices_to_sqlite(spark, src, db, ckpt, schema)
    got = _db_rows(db)

    # batch rebuild over ALL files must agree exactly
    batch = dedup.latest_per_group_maxby(
        cleanse_prices(spark.read.parquet(str(src))),
        ["premise_code", "item_code"], "date", tiebreak_cols=["price"],
    )
    expected = sorted(
        (r["date"], r["premise_code"], r["item_code"], r["price"])
        for r in batch.collect()
    )
    assert got == expected
    assert ("2024-02-02", 101, 10, 6.5) in got
