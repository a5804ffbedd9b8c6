"""Incremental PriceCatcher artifact maintenance — the streaming twin of
plans.pipeline.

The reference rebuilds its whole SQLite artifact from scratch every day
(script.sh:2-4 → src/main.rs:252-278 drop-and-rebuild). Streaming version:
monthly price files land in a directory; each run processes ONLY the new
files (file-source checkpoint), updates the stateful latest-per-(premise,
item) aggregate, and upserts just the CHANGED champions into the SQLite
artifact (INSERT OR REPLACE on the key). Work per run is proportional to
the delta, not the history — at 100 TB of accumulated months that is the
difference between a daily full rebuild and a minutes-long top-up.

The upsert runs driver-side because SQLite is single-writer; the rows
crossing the driver are only the changed champions of the microbatch (the
update-mode delta), never the full table.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from ..plans.pipeline import cleanse_prices
from .incremental import latest_per_key_stream, read_stream_parquet, run_available_now

_DDL = (
    'CREATE TABLE IF NOT EXISTS "prices" ('
    '"date" TEXT, "premise_code" INTEGER, "item_code" INTEGER, "price" REAL, '
    'PRIMARY KEY ("premise_code", "item_code"))'
)


def stream_prices_to_sqlite(
    spark: SparkSession,
    prices_dir: str | Path,
    db_path: str | Path,
    checkpoint_dir: str | Path,
    source_schema: StructType,
) -> Path:
    """Drain new price files into the artifact; returns the db path.

    Safe to call repeatedly (cron-style): a run with no new files touches
    nothing. The champion rule matches the batch pipeline exactly
    (max date, price tie-break), so a from-scratch batch rebuild and any
    sequence of incremental runs over the same files converge to identical
    artifacts (pinned in tests/test_streaming_pipeline.py).
    """
    db_path = Path(db_path)
    db_path.parent.mkdir(parents=True, exist_ok=True)
    sdf = read_stream_parquet(spark, str(prices_dir), source_schema)
    latest = latest_per_key_stream(
        cleanse_prices(sdf), ["premise_code", "item_code"], "date",
        tiebreak_cols=["price"],
    )

    def upsert(batch_df, _batch_id: int, _batch_rows: int = 10_000) -> None:
        # Stream the update-mode delta through the driver in bounded chunks
        # (same shape as sinks/sqlite.py): steady-state batches hold only
        # changed keys, but the FIRST batch of a large corpus is the full
        # champion set — a collect() there is a driver OOM at scale, while
        # toLocalIterator holds at most a partition + prefetch in memory.
        it = (
            batch_df.select("date", "premise_code", "item_code", "price")
            .toLocalIterator(prefetchPartitions=True)
        )
        con = sqlite3.connect(db_path)
        try:
            con.execute(_DDL)
            insert = 'INSERT OR REPLACE INTO "prices" VALUES (?,?,?,?)'
            buf: list[tuple] = []
            for row in it:
                buf.append(tuple(row))
                if len(buf) >= _batch_rows:
                    con.executemany(insert, buf)
                    buf.clear()
            if buf:
                con.executemany(insert, buf)
            con.commit()
        finally:
            con.close()

    run_available_now(latest, str(checkpoint_dir), upsert, output_mode="update")
    return db_path
