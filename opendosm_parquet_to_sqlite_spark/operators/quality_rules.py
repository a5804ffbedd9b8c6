"""Declarative data-quality rules — the expectations gate before a table
is trusted downstream.

The reference validates nothing (a column reorder upstream would silently
corrupt its output — SURVEY §1.2); the engine's schema layer closes the
structural half (parquet-footer verification in sources/parquet.py), and
this module closes the VALUE half: a small rule vocabulary compiled into
ONE aggregation pass returning a per-rule violation report.

Rule vocabulary (each compiles to a native boolean expression per row):

- not_null(col)
- in_range(col, lo, hi)          — NULLs don't violate range (not_null
                                   is its own rule; double-counting a
                                   missing value as a range breach would
                                   misattribute the defect)
- matches(col, regex)            — NULL passes, same rationale
- in_set(col, values)
- unique(col)                    — violations = rows beyond the first
                                   per duplicated value (count - distinct)
- refers_to(col, dim_df, dim_col) — foreign-key coverage; compiled to a
                                   broadcast-set membership test when the
                                   referenced key set is dimension-sized

Shape: all row-level rules evaluate in one narrow projection feeding ONE
partial-combined aggregate (per-rule conditional sums) — the report costs
one scan + a mapper-count-sized exchange regardless of how many rules are
attached.  `unique` adds its distinct-count term to the SAME aggregate;
`refers_to` precollects the dim key set (dimension-sized by contract —
for fact-fact referential checks use an anti-join, see orphan_check).

Output: rule (string), col, n_violations (long), n_checked (long),
violation_rate (6 dp) — one row per rule, deterministic order-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Rule:
    def __init__(self, name: str, col: str):
        self.name = name
        self.col = col

    def violation(self, df: DataFrame) -> Column:  # pragma: no cover
        raise NotImplementedError

    def checked(self) -> Column:
        return F.lit(1)


class not_null(Rule):
    def __init__(self, col: str):
        super().__init__("not_null", col)

    def violation(self, df):
        return F.col(self.col).isNull().cast("int")


class in_range(Rule):
    def __init__(self, col: str, lo: float, hi: float):
        super().__init__(f"in_range[{lo},{hi}]", col)
        self.lo, self.hi = lo, hi

    def violation(self, df):
        c = F.col(self.col)
        return (
            c.isNotNull()
            & ((c < F.lit(self.lo)) | (c > F.lit(self.hi)))
        ).cast("int")


class matches(Rule):
    def __init__(self, col: str, pattern: str):
        super().__init__(f"matches[{pattern}]", col)
        self.pattern = pattern

    def violation(self, df):
        c = F.col(self.col)
        return (
            c.isNotNull() & ~c.rlike(self.pattern)
        ).cast("int")


class in_set(Rule):
    def __init__(self, col: str, values: list):
        super().__init__("in_set", col)
        self.values = list(values)

    def violation(self, df):
        c = F.col(self.col)
        return (
            c.isNotNull() & ~c.isin(self.values)
        ).cast("int")


class unique(Rule):
    """Handled specially: needs count - count(distinct), not a row flag."""

    def __init__(self, col: str):
        super().__init__("unique", col)

    def violation(self, df):
        return F.lit(0)  # replaced in the aggregate


class refers_to(Rule):
    def __init__(self, col: str, dim_df: DataFrame, dim_col: str):
        super().__init__("refers_to", col)
        self.dim_df = dim_df
        self.dim_col = dim_col

    def violation(self, df):
        keys = [
            r[0]
            for r in self.dim_df.select(self.dim_col).distinct().collect()
        ]
        c = F.col(self.col)
        return (c.isNotNull() & ~c.isin(keys)).cast("int")


def quality_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass; see module docstring."""
    aggs = []
    names = []
    for i, r in enumerate(rules):
        names.append((r.name, r.col))
        if isinstance(r, unique):
            aggs.append(
                (
                    F.count(F.col(r.col))
                    - F.count_distinct(F.col(r.col))
                ).alias(f"__v{i}")
            )
        else:
            aggs.append(F.sum(r.violation(df)).alias(f"__v{i}"))
        aggs.append(F.count(r.checked()).alias(f"__c{i}"))
    row = df.agg(*aggs)
    parts = []
    for i, (name, col) in enumerate(names):
        parts.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.lit(col).alias("col"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
                F.col(f"__c{i}").cast("long").alias("n_checked"),
            )
        )
    exploded = row.select(
        F.explode(F.array(*parts)).alias("r")
    ).select("r.rule", "r.col", "r.n_violations", "r.n_checked")
    return exploded.withColumn(
        "violation_rate",
        F.round(F.col("n_violations") / F.col("n_checked"), 6),
    )
