"""Line-level boilerplate removal (round 6): semantics, strategy
equivalence, and the narrow-path plan guarantee (corpus text never
shuffles)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators.text import (
    remove_boilerplate_lines,
)

from .conftest import SF0001

ROWS = [
    (0, "unique intro\nSUBSCRIBE NOW\nreal content here\n\nfooter text"),
    (1, "subscribe now\nanother real line\nfooter text"),
    (2, "Footer Text\nsubscribe now  \ntotally original"),
    (3, None),
    (4, ""),
    (5, "subscribe now"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_boilerplate_lines_removed_case_insensitively(docs):
    out = {
        r.doc_id: (r.text_clean, r.n_lines_kept, r.n_lines_removed)
        for r in remove_boilerplate_lines(
            docs, "text", "doc_id", min_doc_count=3
        ).collect()
    }
    # 'subscribe now' and 'footer text' appear (normalized) in 3+ docs
    assert out[0] == ("unique intro\nreal content here\n", 3, 2)
    assert out[1] == ("another real line", 1, 2)
    assert out[2] == ("totally original", 1, 2)
    # NULL/empty docs keep a row; blank line kept, never counted
    assert out[3] == ("", 1, 0)
    assert out[4] == ("", 1, 0)
    # fully-boilerplate doc comes back empty, not missing
    assert out[5] == ("", 0, 1)


def test_boilerplate_threshold_below_keeps_everything(docs):
    out = {
        r.doc_id: r.n_lines_removed
        for r in remove_boilerplate_lines(
            docs, "text", "doc_id", min_doc_count=5
        ).collect()
    }
    assert all(v == 0 for v in out.values())


def test_boilerplate_strategies_row_identical(spark):
    """narrow (array-filter) and shuffle (anti-join+regroup) must agree on
    the fixture corpus with derived multi-line docs."""
    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .withColumn(
            "text",
            F.replace(
                F.coalesce("text", F.lit("")), F.lit(" merge "), F.lit("\n")
            ),
        )
    )
    a = sorted(
        tuple(r)
        for r in remove_boilerplate_lines(
            docs, "text", "doc_id", min_doc_count=5, strategy="narrow"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in remove_boilerplate_lines(
            docs, "text", "doc_id", min_doc_count=5, strategy="shuffle"
        ).collect()
    )
    assert a == b
    assert len(a) == docs.count()
    assert any(r[3] > 0 for r in a)  # threshold actually fires on fixture


def test_boilerplate_rejects_bad_strategy(docs):
    with pytest.raises(ValueError, match="narrow|shuffle"):
        remove_boilerplate_lines(docs, "text", "doc_id", strategy="x")


def test_boilerplate_narrow_plan_never_shuffles_text(spark):
    """The narrow path's only hash exchanges carry normalized line KEYS
    (the boilerplate-set aggregation); the document text reaches the
    output through a 1-row broadcast nested-loop join, never a
    hash-partitioned exchange."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    out = remove_boilerplate_lines(docs, "text", "doc_id", min_doc_count=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats crossJoin
    ex = [
        line for line in plan.splitlines()
        if "Arguments: hashpartitioning" in line
    ]
    # key agg only: every exchange partitions on the normalized key __k
    assert ex and all("__k" in line for line in ex), ex
