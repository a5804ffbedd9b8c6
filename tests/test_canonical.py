"""normalize_text: Unicode canonicalization for dedup keys. Fixture
parity runs in test_oracle_parity.py; this module pins the non-ASCII
behaviors the (mostly ASCII) fixture cannot exercise — including
cross-engine NFC parity against DuckDB on adversarial strings."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import text


CASES = [
    "café latte",          # NFD e + combining acute -> NFC é
    "café latte",           # already NFC — must collide with NFD twin
    "ZERO​WIDTH‌JOIN‍﻿BOM",
    "  runs   of\t\twhitespace\n\ncollapse  ",
    "MIXED Case STRASSE and ß",
    "Å ring",               # ANGSTROM SIGN -> NFC Å (U+00C5)
    "Å ring",               # LATIN A WITH RING — must collide with above
    "plain ascii",
    "",
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in text.normalize_text(df, "text").collect()}


def test_nfd_nfc_twins_collide(out):
    assert out[0].canon_fp == out[1].canon_fp
    assert out[0].text_canon == "café latte"


def test_compatibility_singletons_collide(out):
    # U+212B ANGSTROM normalizes to U+00C5 under NFC
    assert out[5].canon_fp == out[6].canon_fp


def test_zero_width_and_bom_stripped(out):
    assert out[2].text_canon == "zerowidthjoinbom"


def test_whitespace_collapse_and_trim(out):
    assert out[3].text_canon == "runs of whitespace collapse"


def test_lower_keeps_sharp_s(out):
    # JVM lower() == DuckDB lower(): ß unchanged (NOT casefolded to ss)
    assert out[4].text_canon == "mixed case strasse and ß"


def test_null_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    [r] = text.normalize_text(df, "text").collect()
    assert r.text_canon is None and r.canon_fp is None


def test_cross_engine_parity_on_adversarial_strings(spark):
    """The exact DuckDB restatement used by the shadow oracle produces
    byte-identical canonical forms on NON-ASCII input — proving the
    oracle's green fixture rows aren't just ASCII luck."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text_canon
        for r in text.normalize_text(df, "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") v(doc_id, txt)",
        list(CASES),
    )
    duck = dict(
        con.execute(
            """
            SELECT doc_id, trim(regexp_replace(regexp_replace(
                lower(nfc_normalize(txt)),
                '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
                '\\s+', ' ', 'g'))
            FROM t
            """
        ).fetchall()
    )
    assert got == duck
