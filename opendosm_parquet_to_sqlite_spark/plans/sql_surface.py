"""SQL query surface — parity with 'SQLite is the query engine'.

The reference's consumers query its artifact with raw SQL over three tables
(prices / premises / items, indexes at src/main.rs:192-207). A user
switching to this engine keeps that workflow: register the same table
names as temp views and point spark.sql at them — Catalyst plans the same
joins/filters the SQLite indexes were built for, except distributed.

Views are lazy plan aliases: registration costs nothing until a query
runs, and every registered view benefits from pushdown/pruning exactly
like the DataFrame API (it IS the same plan representation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.parquet import load_tables
from .pipeline import build_tables


def register_testdata_views(
    spark: SparkSession, sf_dir: str, *names: str
) -> list[str]:
    """Expose the testdata tables (region/nation/.../embeddings) as temp
    views so spark.sql() queries them by name — the same names the DuckDB
    oracle uses, so any oracle SQL in this repo ALSO runs on Spark."""
    tables = load_tables(spark, sf_dir, *names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return sorted(tables)


def register_pricecatcher_views(
    spark: SparkSession,
    prices_path: str,
    premises_path: str,
    items_path: str,
) -> dict[str, DataFrame]:
    """Expose the reference's three OUTPUT tables (cleansed, flagship
    dedup applied to prices) as views named exactly as in its SQLite DDL
    (src/main.rs:193,197,203) — existing consumer SQL ports verbatim."""
    tables = build_tables(
        spark,
        prices_path=prices_path,
        premises_path=premises_path,
        items_path=items_path,
    )
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
