"""CSV / JSON-lines ingestion with the reference's failure semantics.

The reference reads only parquet, but its two error modes (SURVEY §2.2) —
panic on malformed input (prices/items, src/main.rs:24-26) vs log-and-skip
(premises, src/main.rs:33,44) — generalize to any text format. Spark's
reader modes map exactly:

- strict     → FAILFAST: any malformed record aborts the job (the panic)
- permissive → PERMISSIVE + corrupt-record capture, then the caller drops
  or inspects the rejects (the skip-with-log, but the rejects are a
  DataFrame you can count/sample/quarantine instead of a stderr line)

Schema is REQUIRED (inference is a scan of the whole input at 100 TB and
yields unstable types across batches — the same silent-drift hazard the
parquet layer guards with footer verification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import persist_tracked
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    strict: bool = False,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with declared schema; strict=True aborts on any malformed row."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if strict:
        return reader.schema(schema).option("mode", "FAILFAST").csv(path)
    return (
        reader.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    strict: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines with declared schema; strict=True aborts on bad records."""
    reader = spark.read.options(**options)
    if strict:
        return reader.schema(schema).option("mode", "FAILFAST").json(path)
    return (
        reader.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, reject_rows) from a permissive read.

    The reject side keeps the raw record for quarantine/debugging — the
    distributed version of the reference's `println!("{:?}", e)` skip path
    (src/main.rs:44).

    The parsed frame is cached first: Spark refuses lazy queries that
    reference only the corrupt-record column (the parser would have to
    re-run with different column pruning), so both splits read the one
    cached parse — which is also the efficient shape, since clean and
    reject consumers would otherwise each re-parse the input."""
    df = persist_tracked(df)
    corrupt = F.col(CORRUPT_COL)
    clean = df.filter(corrupt.isNull()).drop(CORRUPT_COL)
    rejects = df.filter(corrupt.isNotNull())
    return clean, rejects


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export — the columnar interchange format Hive/Trino warehouses
    expect (same role as the parquet dataset writer, different consumer
    ecosystem). Spark's native ORC writer: columnar, compressed,
    predicate-pushdown-capable on read."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC source with optional declared schema — schema-on-read
    verification mirroring read_csv's strictness contract: with a
    declared schema Spark verifies column names/types against the file
    footer (mismatched files fail at plan time, not row time — ORC is
    self-describing, unlike CSV, so no permissive/quarantine mode is
    needed). Filter pushdown and column pruning work as with parquet
    (min/max stripe statistics)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
