#!/usr/bin/env python3
"""Scale-proof fixture generator: synthesize sf1 (10x bench scale) from
the driver's read-only sf0.1 parquet by deterministic replication.

Why replication, not regeneration: the driver's generator (seed=42) is
not in-repo, and a scale PROBE needs the same distribution *shape* at
10x the cardinality — replicating each table R times with key offsets
preserves value distributions, join fan-out, group-size profiles, and
skew exactly, while growing every key space linearly (the realistic
100 TB story: more customers/orders/documents, not fatter groups).

Per-table treatment (R = 10 by default):

- region/nation: copied as-is (fixed dimensions at every TPC-H scale).
- customer/supplier/part/orders/lineitem: replica i offsets every
  synthetic key by i * (its sf0.1 cardinality), so FK joins land on the
  replica-local parent and join selectivity is unchanged.
- events: user_id/event_id offset; timestamps kept — 10x event volume
  over the same month (per-user series length unchanged, event density
  10x — the scan/shuffle stressor).
- documents: replica 0 verbatim; replicas i>0 get a DETERMINISTIC text
  mutation (every 3rd word replaced by a replica-salted token). Plain
  copies would give every doc 9 exact twins and make near-dup candidate
  volume grow ~R^2/2 instead of ~R — a different regime, not a bigger
  one. Mutation drops cross-replica shingle overlap below every
  in-repo jaccard/containment threshold, so dup structure per replica
  matches sf0.1 and total candidate volume scales ~linearly.
- embeddings: vec_id offset, vector perturbed by a deterministic ±3%
  per-dim factor (keyed hash, no RNG state), label kept — cluster
  structure survives, exact-duplicate vectors do not.

Usage: python3 tools/make_scale.py [--out /tmp/sf1] [--replicas 10]
Writes one parquet per table; safe to re-run (overwrites).
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb

SRC = "/root/testdata/sf0.1"

CARD = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
}


def _mutate_text(text: str, replica: int) -> str:
    """Replace every 3rd word with a replica-salted token — deterministic,
    kills cross-replica shingle overlap (any 3-gram window touching a
    replaced word differs; with stride 3 that is every window)."""
    words = text.split(" ")
    out = []
    for j, w in enumerate(words):
        if j % 3 == 2:
            h = hashlib.md5(f"{replica}:{j}:{w}".encode()).hexdigest()[:6]
            out.append(f"{w}{h}")
        else:
            out.append(w)
    return " ".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    R = args.replicas
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(table: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    rep = f"(SELECT unnest(range({R})) AS r)"
    copy("customer", f"""
        SELECT c_custkey + r * 15000 AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', {rep}""")
    copy("supplier", f"""
        SELECT s_suppkey + r * 1000 AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {rep}""")
    copy("part", f"""
        SELECT p_partkey + r * 20000 AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', {rep}""")
    copy("orders", f"""
        SELECT o_orderkey + r * 150000 AS o_orderkey,
               o_custkey + r * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {rep}""")
    copy("lineitem", f"""
        SELECT l_orderkey + r * 150000 AS l_orderkey,
               l_partkey + r * 20000 AS l_partkey,
               l_suppkey + r * 1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', {rep}""")
    copy("events", f"""
        SELECT event_id + r * 100000 AS event_id, ts,
               user_id + r * 1500 AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', {rep}""")

    # documents: python-side mutation (45k small strings)
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    rows = []
    for r in range(R):
        for doc_id, text, lang, source, n_chars in docs:
            t = text if r == 0 else _mutate_text(text, r)
            rows.append((doc_id + r * 5000, t, lang, source, len(t)))
    con.execute(
        "CREATE OR REPLACE TABLE _docs "
        "(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, "
        "n_chars BIGINT)"
    )
    con.executemany("INSERT INTO _docs VALUES (?,?,?,?,?)", rows)
    copy("documents", "SELECT * FROM _docs ORDER BY doc_id")

    # embeddings: deterministic +-3% per-dim perturbation for replicas>0
    import numpy as np

    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    vecs = np.array([e[1] for e in emb], dtype=np.float32)
    dim = vecs.shape[1]
    out_rows = []
    for r in range(R):
        if r == 0:
            pv = vecs
        else:
            # keyed hash -> (-0.03, 0.03) multiplicative factor per dim
            salt = np.frombuffer(
                hashlib.sha256(f"emb{r}".encode()).digest(), dtype=np.uint8
            ).astype(np.float64)
            fac = 1.0 + 0.03 * np.sin(
                np.outer(np.arange(len(vecs)) + r * 7919, np.arange(dim) + 1)
                * (1.0 + salt[r % 32] / 255.0)
            )
            pv = (vecs * fac).astype(np.float32)
        for i, (vec_id, _v, label) in enumerate(emb):
            out_rows.append((vec_id + r * 2000, pv[i].tolist(), label))
    con.execute(
        "CREATE OR REPLACE TABLE _emb "
        "(vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO _emb VALUES (?,?,?)", out_rows)
    copy("embeddings", "SELECT * FROM _emb ORDER BY vec_id")


if __name__ == "__main__":
    main()
