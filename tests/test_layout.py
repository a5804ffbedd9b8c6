"""Layout tests: partition pruning and bucketed zero-exchange joins —
asserted on the PHYSICAL PLAN, not just results."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.sources.layout import (
    read_months,
    write_bucketed,
    write_partitioned_by_month,
)
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table

from .conftest import SF0001


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_reads_only_selected_months(spark, tmp_path):
    ev = load_table(spark, SF0001, "events")
    path = str(tmp_path / "events_by_month")
    write_partitioned_by_month(ev, path, "ts")

    one = read_months(spark, path, ["2024-01"])
    plan = _plan(one)
    assert "PartitionFilters" in plan and "month" in plan

    # pruned result equals a full-scan filter (correctness), and the month
    # count matches the raw data (completeness)
    expected = ev.filter(F.date_format("ts", "yyyy-MM") == "2024-01").count()
    assert expected > 0
    assert one.count() == expected


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """Two tables bucketed on the same key join with no shuffle at all —
    the layout paid it once at write time."""
    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    ords = load_table(spark, SF0001, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    # the fixture tables are small enough to auto-broadcast, which would
    # bypass the bucketed path entirely — disable broadcast to exercise the
    # layout the way a fact-fact join at scale would hit it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8,
                       path=str(tmp_path / "b_li"))
        write_bucketed(ords, "b_orders", "l_orderkey", 8,
                       path=str(tmp_path / "b_ord"))
        a = spark.table("b_lineitem")
        b = spark.table("b_orders")
        joined = a.join(b, "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # neither side shuffles
        assert "Bucketed: true" in plan
        # correctness vs the unbucketed join
        assert joined.count() == li.join(ords, "l_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_zvalue_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from opendosm_parquet_to_sqlite_spark.sources.layout import zvalue

    def py_z(a, b, bits=21):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(a, b) for a in (0, 1, 5, 1023, 2**21 - 1) for b in (0, 2, 7, 2**21 - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zvalue("a", "b").alias("z")).collect()
    for r in got:
        assert r.z == py_z(r.a, r.b), (r.a, r.b)


def test_write_zordered_clusters_both_dimensions(spark, tmp_path):
    """After a z-ordered write, per-file min/max ranges on BOTH columns are
    narrow — the property that makes row-group skipping effective on
    either predicate axis."""
    import math

    from opendosm_parquet_to_sqlite_spark.sources.layout import write_zordered

    n = 1 << 12
    df = spark.range(n).selectExpr(
        "CAST(id % 64 AS LONG) AS x", "CAST(CAST(id / 64 AS LONG) AS LONG) AS y"
    )
    path = str(tmp_path / "zord")
    write_zordered(df, path, "x", "y", target_file_rows=256)
    import glob

    spans_x, spans_y = [], []
    for f in glob.glob(f"{path}/*.parquet"):
        part = spark.read.parquet(f)
        row = part.selectExpr(
            "min(x) AS x0", "max(x) AS x1", "min(y) AS y0", "max(y) AS y1"
        ).collect()[0]
        spans_x.append(row.x1 - row.x0 + 1)
        spans_y.append(row.y1 - row.y0 + 1)
    # a 256-row z-tile covers a ~16x16 patch of the 64x64 grid: both spans
    # must be FAR below the full domain (64) on average
    assert sum(spans_x) / len(spans_x) <= 24, spans_x
    assert sum(spans_y) / len(spans_y) <= 24, spans_y


def test_compact_dataset_unpartitioned_reduces_files_keeps_rows(spark, tmp_path):
    from opendosm_parquet_to_sqlite_spark.sources.layout import (
        compact_dataset,
        dataset_file_report,
    )

    path = str(tmp_path / "many_small")
    # 40 tiny files via 40-way repartition
    spark.range(4000).withColumn("v", F.col("id") * 2).repartition(40) \
        .write.parquet(path)
    before = dataset_file_report(spark, path).collect()
    assert before[0]["n_files"] == 40
    # huge target -> everything folds into one file
    stats = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    out = spark.read.parquet(path)
    assert out.count() == 4000
    assert out.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(4000))


def test_compact_dataset_partitioned_preserves_pruning(spark, tmp_path):
    from opendosm_parquet_to_sqlite_spark.sources.layout import (
        compact_dataset,
    )

    path = str(tmp_path / "parts")
    df = spark.range(1000).withColumn("p", (F.col("id") % 3).cast("string"))
    df.repartition(30).write.partitionBy("p").parquet(path)
    stats = compact_dataset(
        spark, path, target_file_bytes=1 << 30, partition_col="p"
    )
    assert stats["files_after"] < stats["files_before"]
    out = spark.read.parquet(path)
    assert out.count() == 1000
    # hive layout intact -> a partition filter prunes at plan time
    pruned = out.filter(F.col("p") == "1")
    assert pruned.count() == sum(1 for i in range(1000) if i % 3 == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan


def test_compact_dataset_stale_staging_dirs_cleaned(spark, tmp_path):
    import os

    from opendosm_parquet_to_sqlite_spark.sources.layout import (
        compact_dataset,
    )

    path = str(tmp_path / "ds")
    spark.range(100).repartition(5).write.parquet(path)
    os.makedirs(path + ".next")  # leftover from a crashed prior run
    os.makedirs(path + ".old")
    stats = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + ".next")
    assert not os.path.exists(path + ".old")
    assert spark.read.parquet(path).count() == 100


def test_compact_dataset_recovers_mid_swap_crash(spark, tmp_path):
    # crash between the two swap renames leaves NO dataset at `path`
    # and the previous state stranded at '.old' -- the next compact
    # must self-heal via recover_swap (ADVICE r7), not fail the read
    import os

    from opendosm_parquet_to_sqlite_spark.sources.layout import (
        compact_dataset,
    )

    path = str(tmp_path / "ds2")
    spark.range(200).repartition(4).write.parquet(path)
    os.rename(path, path + ".old")  # simulate crash mid-swap
    assert not os.path.exists(path)
    stats = compact_dataset(spark, path, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + ".old")
    assert spark.read.parquet(path).count() == 200


def test_compact_if_needed_skips_healthy_and_fixes_fragmented(spark, tmp_path):
    from opendosm_parquet_to_sqlite_spark.sources.layout import (
        compact_if_needed,
    )

    path = str(tmp_path / "ds")
    spark.range(2000).repartition(40).write.parquet(path)
    # fragmented: 40 files vs ideal 1 -> compacts
    r1 = compact_if_needed(spark, path, target_file_bytes=1 << 30)
    assert not r1["skipped"] and r1["files_after"] == 1
    # now healthy: second run is a no-op (no data touched)
    r2 = compact_if_needed(spark, path, target_file_bytes=1 << 30)
    assert r2["skipped"] and r2["files_before"] == r2["files_after"] == 1
    assert spark.read.parquet(path).count() == 2000
