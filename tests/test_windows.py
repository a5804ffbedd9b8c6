"""Sliding-window aggregation: DuckDB oracle + structural properties."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import aggregates
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table

from .conftest import SF0001


def test_sliding_window_matches_duckdb_oracle(spark):
    ev = load_table(spark, SF0001, "events")
    got = {
        r.window_start: (r.n_events, r.avg_value)
        for r in aggregates.sliding_window_agg(
            ev, "ts", "value", width="1 hour", slide="30 minutes"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF0001}/events.parquet'"
    )
    rows = con.execute(
        """
        WITH x AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                       - k * INTERVAL '30 minutes' AS w0,
                   value
            FROM events, LATERAL unnest([0, 1]) AS u(k)
        )
        SELECT strftime(w0, '%Y-%m-%d %H:%M:%S'),
               CAST(count(*) AS BIGINT), round(avg(value), 4)
        FROM x GROUP BY w0
        """
    ).fetchall()
    expected = {r[0]: (r[1], r[2]) for r in rows}
    assert got == expected
    assert len(got) > 2


def test_sliding_degenerates_to_tumbling_and_conserves_mass(spark):
    ev = load_table(spark, SF0001, "events")
    slid = aggregates.sliding_window_agg(ev, "ts", "value", "1 hour", "1 hour")
    tumb = aggregates.tumbling_window_agg(ev, "ts", "value", "1 hour")
    assert sorted(map(tuple, slid.collect())) == sorted(
        map(tuple, tumb.collect())
    )
    # width/slide = 2 → every event counted exactly twice
    two = aggregates.sliding_window_agg(ev, "ts", "value", "1 hour", "30 minutes")
    total = two.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * ev.count()
