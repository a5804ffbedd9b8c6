"""Local mirror of the driver's t2 correctness gate.

Runs every QUERIES[name] on Spark and, where an oracle exists, the matching
SQL in DuckDB over the same parquet files; compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats normalized via repr of rounded values).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from opendosm_parquet_to_sqlite_spark.plans.queries import (
    ORACLES,
    QUERIES,
    SHADOW_ORACLES,
)

# the in-repo gate hash-checks shadow oracles too (queries past the
# driver's 50-entry window — driver-side they are rows-only)
ALL_ORACLES = {**ORACLES, **SHADOW_ORACLES}

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style float normalization: fixed precision
        return f"{v:.6f}"
    return str(v)


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_one(spark, con, name: str, sf_dir: str) -> dict:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    result = {"name": name, "rows": len(sdf), "cols": sorted(sdf.columns)}
    if name not in ALL_ORACLES:
        result["status"] = "rows-only"
        return result
    odf = con.execute(ALL_ORACLES[name]).fetchdf()
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if not problems:
        cs, co = canonical(sdf), canonical(odf)
        if cs != co:
            n_bad = sum(1 for a, b in zip(cs, co) if a != b)
            first = next(((a, b) for a, b in zip(cs, co) if a != b), None)
            problems.append(f"values differ in {n_bad} rows; first: {first}")
    result["status"] = "ok" if not problems else "FAIL: " + "; ".join(problems)
    return result


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[dict]:
    con = duck_connection(sf_dir)
    out = []
    for name in names or list(QUERIES):
        try:
            out.append(compare_one(spark, con, name, sf_dir))
        except Exception as e:  # noqa: BLE001
            out.append({"name": name, "status": f"ERROR: {type(e).__name__}: {e}"})
    return out


if __name__ == "__main__":
    import sys

    from opendosm_parquet_to_sqlite_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark()
    for r in run_all(spark, sf_dir, names):
        print(f"{r['name']:28s} {r.get('rows', '-'):>7} {r['status']}")
