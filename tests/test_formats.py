"""CSV/JSONL ingestion semantics + parquet dataset export."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from opendosm_parquet_to_sqlite_spark.sinks.dataset import write_dataset
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table
from opendosm_parquet_to_sqlite_spark.sources.text_formats import (
    read_csv,
    read_jsonl,
    split_rejects,
)

from .conftest import SF0001

SCHEMA = StructType(
    [
        StructField("code", LongType()),
        StructField("name", StringType()),
        StructField("price", DoubleType()),
    ]
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "code,name,price\n"
        "1,milk,5.50\n"
        "2,bread,abc\n"      # malformed price
        "3,eggs,9.90\n"
    )
    return str(p)


def test_csv_permissive_splits_rejects(spark, csv_file):
    df = read_csv(spark, csv_file, SCHEMA, strict=False)
    clean, rejects = split_rejects(df)
    assert sorted(r["code"] for r in clean.collect()) == [1, 3]
    assert rejects.count() == 1
    raw = rejects.first()["_corrupt_record"]
    assert "abc" in raw  # quarantined raw record, reference's skip-with-log


def test_csv_strict_aborts(spark, csv_file):
    df = read_csv(spark, csv_file, SCHEMA, strict=True)
    with pytest.raises(Exception):  # FAILFAST = the reference's panic
        df.collect()


def test_jsonl_permissive_and_strict(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"code": 1, "name": "milk", "price": 5.5}\n'
        "this is not json\n"
        '{"code": 3, "name": "eggs", "price": 9.9}\n'
    )
    clean, rejects = split_rejects(read_jsonl(spark, str(p), SCHEMA))
    assert sorted(r["code"] for r in clean.collect()) == [1, 3]
    assert rejects.count() == 1
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), SCHEMA, strict=True).collect()


def test_write_dataset_partitioned_and_bounded(spark, tmp_path):
    ev = load_table(spark, SF0001, "events")
    out = str(tmp_path / "ds")
    write_dataset(
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")),
        out,
        partition_by=["day"],
        target_file_rows=100,
        sort_within_by=["user_id"],
    )
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # hive partition dirs exist and files respect the row bound
    days = [d.name for d in (tmp_path / "ds").iterdir() if d.name.startswith("day=")]
    assert len(days) >= 25  # a month of events
    import pyarrow.parquet as pq

    some_day = tmp_path / "ds" / days[0]
    for f in some_day.glob("*.parquet"):
        assert pq.read_metadata(f).num_rows <= 100


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution across incremental writes: old files lack a
    column the new files carry. mergeSchema reconciles the footers into
    the union schema with NULL backfill — the guard the reference lacks
    entirely (its positional access would silently corrupt on any
    upstream schema change, SURVEY 1.2)."""
    p = str(tmp_path / "evolving")
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    old.write.parquet(p)
    new = spark.createDataFrame(
        [(3, "c", 1.5), (4, "d", 2.5)], "id long, name string, score double"
    )
    new.write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows[1] == ("a", None)  # old rows: NULL backfill, not garbage
    assert rows[3] == ("c", 1.5)
    assert merged.count() == 4
    # column pruning still reaches the scan on the merged schema
    plan = (
        merged.select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<id:bigint>" in plan


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from opendosm_parquet_to_sqlite_spark.sources.text_formats import (
        read_orc,
        write_orc,
    )

    path = str(tmp_path / "orc")
    df = spark.range(1000).withColumn("v", F.col("id") * 3)
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).collect()[0][0] == 3 * sum(range(1000))
    # predicate pushdown reaches the ORC scan
    plan_buf = read_orc(spark, path).filter(F.col("id") > 900)
    plan = plan_buf._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,900)]" in plan
    assert plan_buf.count() == 99


def test_orc_declared_schema_verifies(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    from opendosm_parquet_to_sqlite_spark.sources.text_formats import (
        read_orc,
        write_orc,
    )

    path = str(tmp_path / "orc2")
    write_orc(spark.range(10), path)
    ok = read_orc(
        spark, path, StructType([StructField("id", LongType())])
    )
    assert ok.count() == 10
