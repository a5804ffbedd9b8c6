"""Registry-count hygiene: the README's query-ledger numbers are DERIVED
from the registry here, so the docs cannot drift from the code (the
round-6 ledger counts drifted twice before being caught by hand — this
makes the next drift a test failure, round-6 verdict item 8)."""

from __future__ import annotations

import os

from opendosm_parquet_to_sqlite_spark.plans.queries import (
    ORACLES,
    QUERIES,
    SHADOW_ORACLES,
)

_README = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
_SURVEY = os.path.join(os.path.dirname(os.path.dirname(__file__)), "SURVEY.md")


def test_registry_is_consistent():
    # every oracle (driver or shadow) keys a registered query, and no
    # query carries both kinds of oracle
    assert set(ORACLES) <= set(QUERIES)
    assert set(SHADOW_ORACLES) <= set(QUERIES)
    assert not set(ORACLES) & set(SHADOW_ORACLES)


def test_driver_window_is_exactly_fifty():
    # the driver checks the first 50 oracle-backed entries; the export
    # must hold exactly the window size so rotation stays a swap, not a
    # silent overflow past the cap
    assert len(ORACLES) == 50


def test_readme_counts_match_registry():
    text = open(_README, encoding="utf-8").read()
    assert f"{len(QUERIES)} registered queries" in text, (
        f"README query count drifted: registry has {len(QUERIES)}"
    )
    assert f"({len(ORACLES)} driver-checked" in text, (
        f"README driver-window count drifted: registry has {len(ORACLES)}"
    )
    assert f"for {len(SHADOW_ORACLES)} more" in text, (
        f"README shadow-oracle count drifted: registry has "
        f"{len(SHADOW_ORACLES)}"
    )


def test_survey_counts_match_registry():
    # SURVEY.md's recorded registry state drifted in round 7 (said 198
    # while the registry held 224); pin it exactly like README's ledger
    # so the next drift is a test failure (round-7 verdict item 5)
    text = open(_SURVEY, encoding="utf-8").read()
    assert f"**{len(QUERIES)} registered queries**" in text, (
        f"SURVEY query count drifted: registry has {len(QUERIES)}"
    )
    assert f"{len(ORACLES)} driver-window oracles" in text, (
        f"SURVEY driver-window count drifted: registry has {len(ORACLES)}"
    )
    assert f"{len(SHADOW_ORACLES)} shadow\noracles" in text or (
        f"{len(SHADOW_ORACLES)} shadow oracles" in text
    ), f"SURVEY shadow count drifted: registry has {len(SHADOW_ORACLES)}"
    n_rows_only = len(QUERIES) - len(ORACLES) - len(SHADOW_ORACLES)
    assert f"{n_rows_only} rows-only" in text, (
        f"SURVEY rows-only count drifted: registry implies {n_rows_only}"
    )


def test_entry_module_exports_match_registry():
    import __spark_entry__ as entry

    qs = entry.queries()
    assert set(qs) == set(QUERIES)
    assert entry.oracle_sql() == ORACLES
    # oracle-backed queries come first (the driver's check window is a
    # prefix); no oracle-backed name may trail a rows-only one
    names = list(qs)
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in ORACLES), len(names)
    )
    assert all(n not in ORACLES for n in names[first_rows_only:])
