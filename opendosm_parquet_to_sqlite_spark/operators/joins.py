"""Star-schema joins — the reference's implied query surface.

The reference never executes a join itself; its output schema + indexes
(/root/reference/src/main.rs:194-206) exist so consumers can run
fact→dimension equi-joins (prices⋈items on item_code, prices⋈premises on
premise_code) and the 3-way denormalization that is the repo's stated purpose
("merge ... into single db file", README.md:6).

Spark mapping (SURVEY §2.3): the SQLite indexed-nested-loop plan becomes a
broadcast hash join — dimensions are KB-to-MB scale while the fact is the
100 TB side, so we broadcast explicitly rather than trusting the size
estimator (statistics can be missing on fresh parquet). No shuffle of the
fact table at all: the BHJ streams fact partitions past an in-memory dim
hash map inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_fact_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact→dimension equi-join, dimension broadcast by default.

    broadcast_dim=False falls back to a shuffle join for dim tables too big
    to broadcast (then prefer bucketing both sides on the key — see
    plans.pipeline notes).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def star_denorm(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    how: str = "inner",
) -> DataFrame:
    """Chained fact→dim joins (the reference's 'single db file' purpose).

    All dims broadcast: the fact flows through N hash-probe stages in a
    single codegen'd pipeline with zero exchanges — the plan a 1000-executor
    cluster wants for a 100 TB fact.
    """
    out = fact
    for dim, key in dims:
        out = join_fact_dim(out, dim, key, how=how)
    return out


def salted_join(
    fact: DataFrame,
    right: DataFrame,
    key: str,
    salt_factor: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the fact key, replicate the right side.

    For a right side too big to broadcast joined on a key where a handful
    of values dominate the fact (the celebrity-user / null-bucket problem):
    a plain shuffle join lands a hot key's entire fact volume on ONE
    reducer. Salting splits each fact key into `salt_factor` sub-keys
    (random salt) and replicates each right row across all sub-keys
    (explode), so a hot key's rows spread over `salt_factor` reducers at
    the cost of a `salt_factor`× right-side shuffle. AQE's skew-join
    splitting handles moderate skew automatically; explicit salting is for
    the pathological keys AQE can't subdivide (single-key hash buckets).

    Same result set as `fact.join(right, key)` — pinned by test.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=7) * salt_factor).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return salted_fact.join(salted_right, on=[key, "__salt"]).drop("__salt")
