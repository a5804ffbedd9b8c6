"""Driver-contract invariants over the query registry itself."""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_WINDOW = 50  # the driver checks the first 50 registered queries


def test_oracle_backed_queries_fit_the_driver_window():
    """Every oracle-backed query must sit inside the driver's fixed-size
    check window — a new oracle query that pushes another past index 49
    silently loses its CORRECTNESS row (this bit round 2: two text
    queries fell off the end unchecked)."""
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    oracle_positions = [i for i, n in enumerate(names) if n in oracles]
    assert all(i < DRIVER_WINDOW for i in oracle_positions), [
        names[i] for i in oracle_positions if i >= DRIVER_WINDOW
    ]
    # and the ordering contract: oracle-backed first, rows-only after
    first_rows_only = min(
        (i for i, n in enumerate(names) if n not in oracles), default=len(names)
    )
    assert all(i < first_rows_only for i in oracle_positions)


def test_rows_only_priority_list_is_exact():
    """_ROWS_ONLY_PRIORITY must name exactly the rows-only queries — a
    stale list silently falls back to registration order."""
    names = set(entry.queries()) - set(entry.oracle_sql())
    assert set(entry._ROWS_ONLY_PRIORITY) == names


def test_every_query_name_is_registry_safe():
    for n in entry.queries():
        assert n.replace("_", "").isalnum() and n == n.lower()
