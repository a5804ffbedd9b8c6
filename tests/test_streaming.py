"""Streaming ↔ batch equivalence tests.

The streaming operators must produce exactly the batch answers when drained
over the same data (backfill/live interchangeability), and incremental runs
must upsert correctly across microbatches.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import aggregates, dedup
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table
from opendosm_parquet_to_sqlite_spark.streaming import (
    dedup_within_watermark,
    latest_per_key_stream,
    read_stream_parquet,
    run_available_now,
    session_agg_stream,
    tumbling_window_agg_stream,
)

from .conftest import SF0001


def _events_dir(spark, tmp_path, n_files: int):
    """Re-write events as micros-timestamped parquet split into n files
    (the raw fixture is TIMESTAMP(NANOS), which the file stream source
    can't take without the batch loader's rebuild)."""
    ev = load_table(spark, SF0001, "events")
    out = str(tmp_path / "events_src")
    ev.repartition(n_files).write.parquet(out)
    return out, ev.schema


def test_streaming_latest_per_key_matches_batch(spark, tmp_path):
    src, schema, = _events_dir(spark, tmp_path, n_files=3)
    sdf = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)
    out = latest_per_key_stream(sdf, ["user_id", "event_type"], "ts", ["event_id"])

    state: dict = {}  # upsert sink: key -> row (update mode emits changed keys)

    def upsert(df, batch_id):
        for r in df.collect():
            state[(r["user_id"], r["event_type"])] = tuple(r)

    run_available_now(out, str(tmp_path / "ckpt"), upsert, output_mode="update")

    batch = dedup.latest_per_group_maxby(
        load_table(spark, SF0001, "events"), ["user_id", "event_type"], "ts",
        tiebreak_cols=["event_id"],
    )
    expected = {(r["user_id"], r["event_type"]): tuple(r) for r in batch.collect()}
    assert state == expected


def test_streaming_incremental_resume(spark, tmp_path):
    """A second run over the same directory processes nothing new (the
    checkpoint IS the freshness check, src/main.rs:134-146 analog); new
    files afterwards are picked up and can flip champions."""
    src, schema = _events_dir(spark, tmp_path, n_files=1)
    sdf = read_stream_parquet(spark, src, schema)
    out = latest_per_key_stream(sdf, ["user_id", "event_type"], "ts", ["event_id"])
    seen_batches = []

    def sink(df, batch_id):
        rows = df.collect()
        if rows:
            seen_batches.append(len(rows))

    ckpt = str(tmp_path / "ckpt2")
    run_available_now(out, ckpt, sink)
    n_first = len(seen_batches)
    assert n_first >= 1
    run_available_now(out, ckpt, sink)  # no new files → no new non-empty batch
    assert len(seen_batches) == n_first

    # add a late file with a newer event for one existing key
    ev = load_table(spark, SF0001, "events")
    first = ev.orderBy("event_id").first()
    late = spark.createDataFrame(
        [(10**9, first["ts"], first["user_id"], first["event_type"], 1.0, "{}")],
        schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
    late.write.mode("append").parquet(src)
    run_available_now(out, ckpt, sink)
    assert len(seen_batches) == n_first + 1
    assert seen_batches[-1] >= 1  # only the affected key(s) re-emitted


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = load_table(spark, SF0001, "events").limit(200)
    dup_src = str(tmp_path / "dup_src")
    ev.union(ev).repartition(2).write.parquet(dup_src)  # every row twice
    sdf = read_stream_parquet(spark, dup_src, ev.schema)
    out = dedup_within_watermark(sdf, ["event_id"], "ts", delay="10 minutes")
    rows = []
    run_available_now(
        out, str(tmp_path / "ckpt3"), lambda df, _: rows.extend(df.collect()),
        output_mode="append",
    )
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 200


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """A duplicate key arriving in a LATER microbatch (within the watermark
    horizon) is dropped — the state store carries dedup keys across
    batches, not just within one."""
    ev = load_table(spark, SF0001, "events").limit(50)
    src = str(tmp_path / "xbatch_src")
    ev.coalesce(1).write.parquet(src)                      # batch 1
    ev.limit(20).coalesce(1).write.mode("append").parquet(src)  # batch 2: dups
    sdf = read_stream_parquet(spark, src, ev.schema, max_files_per_trigger=1)
    out = dedup_within_watermark(sdf, ["event_id"], "ts", delay="30 days")
    rows, batches = [], []

    def sink(df, bid):
        got = df.collect()
        batches.append(len(got))
        rows.extend(got)

    run_available_now(out, str(tmp_path / "ckpt5"), sink, output_mode="append")
    ids = [r["event_id"] for r in rows]
    assert len(batches) >= 2          # the files really were separate batches
    assert sorted(ids) == sorted({r["event_id"] for r in ev.collect()})


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    src, schema = _events_dir(spark, tmp_path, n_files=2)
    sdf = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)
    out = tumbling_window_agg_stream(
        sdf, "ts", "value", width="1 hour", delay="1 hour",
        extra_group=["event_type"],
    )
    state: dict = {}

    def upsert(df, batch_id):
        for r in df.collect():
            state[(r["window_start"], r["event_type"])] = (
                r["n_events"], r["avg_value"]
            )

    run_available_now(out, str(tmp_path / "ckpt4"), upsert, output_mode="update")
    batch = aggregates.tumbling_window_agg(
        load_table(spark, SF0001, "events"), "ts", "value", "1 hour",
        extra_group=["event_type"],
    )
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in batch.collect()
    }
    assert state == expected


def test_streaming_corpus_ingest_matches_batch(spark, tmp_path):
    """The mixing layer is stateless → streaming rows must equal the batch
    composition of the same operators over the same documents."""
    from opendosm_parquet_to_sqlite_spark.operators import privacy, sampling, text
    from opendosm_parquet_to_sqlite_spark.streaming import corpus_ingest_stream
    from opendosm_parquet_to_sqlite_spark.streaming.corpus import (
        rowwise_repetition_ok,
    )

    docs = load_table(spark, SF0001, "documents").select(
        "doc_id", "source", "text"
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    rates = {"src0": 0.9, "src1": 0.5}
    sdf = read_stream_parquet(spark, src, docs.schema, max_files_per_trigger=1)
    out = corpus_ingest_stream(
        sdf, "text", "doc_id", "source", rates, default_rate=0.3
    )

    got: list = []
    run_available_now(
        out,
        str(tmp_path / "ckpt"),
        lambda df, _bid: got.extend(map(tuple, df.collect())),
        output_mode="append",
    )

    red = docs.withColumn("text", privacy.redact_pii(F.col("text")))
    toked = red.withColumn("__toks", text.tokens(F.col("text")))
    gated = toked.filter(
        (text.quality_score(F.col("text")) >= 0.5)
        & rowwise_repetition_ok(F.col("__toks"))
    )
    sampled = sampling.stratified_sample(gated, "source", "doc_id", rates, 0.3)
    batch = (
        sampling.split_assign(sampled, "doc_id")
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .drop("__toks")
    )
    expected = sorted(map(tuple, batch.collect()))
    assert sorted(got) == expected
    assert expected, "gate must pass some documents"


def test_streaming_neardup_index_probe_per_microbatch(spark, tmp_path):
    """The streaming dedup shape: a persisted MinHash index probed by each
    microbatch via foreachBatch — flagged pairs across all batches must
    equal a single batch probe of the same docs."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        build_neardup_index,
        probe_neardup_index,
    )

    docs = load_table(spark, SF0001, "documents").select(
        "doc_id", "source", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    bands, sets = build_neardup_index(corpus, "text", "doc_id", n=2)
    idx_dir = str(tmp_path / "idx")
    bands.write.parquet(f"{idx_dir}/bands")
    sets.write.parquet(f"{idx_dir}/sets")
    bands_r = spark.read.parquet(f"{idx_dir}/bands")
    sets_r = spark.read.parquet(f"{idx_dir}/sets")

    src = str(tmp_path / "incoming")
    incoming.repartition(3).write.parquet(src)
    sdf = read_stream_parquet(spark, src, incoming.schema, max_files_per_trigger=1)

    got: set = set()

    def probe(df, _bid):
        hits = probe_neardup_index(
            df, bands_r, sets_r, "text", "doc_id", n=2, threshold=0.4
        )
        got.update((r[0], r[1]) for r in hits.collect())

    # the probe is a per-batch JOIN against the index, not a stateful agg:
    # wire the raw stream through foreachBatch in append mode
    run_available_now(sdf, str(tmp_path / "ckpt2"), probe, output_mode="append")

    expected = {
        (r[0], r[1])
        for r in probe_neardup_index(
            incoming, bands_r, sets_r, "text", "doc_id", n=2, threshold=0.4
        ).collect()
    }
    assert got == expected
    assert expected, "fixture must produce at least one near-dup hit"


def test_rowwise_repetition_gate_matches_batch_profile(spark):
    """The streaming row-wise gate must agree with the batch
    repetition_profile on their shared metrics (distinct ratio, top-token
    mass) for every fixture document."""
    from opendosm_parquet_to_sqlite_spark.operators import text
    from opendosm_parquet_to_sqlite_spark.streaming.corpus import (
        rowwise_repetition_ok,
    )

    docs = load_table(spark, SF0001, "documents")
    row = docs.select(
        "doc_id", rowwise_repetition_ok(text.tokens(F.col("text"))).alias("ok")
    ).collect()
    prof = {
        r.doc_id: r
        for r in text.repetition_profile(docs, "text", "doc_id").collect()
    }
    for r in row:
        p = prof[r.doc_id]
        expect = (
            p.n_tokens > 0
            and p.distinct_ratio >= 0.5
            and p.top_token_frac <= 0.2
        )
        assert bool(r.ok) == expect, r.doc_id


def test_streaming_sliding_window_matches_batch(spark, tmp_path):
    from opendosm_parquet_to_sqlite_spark.operators import aggregates

    src, schema = _events_dir(spark, tmp_path, n_files=3)
    sdf = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)
    # delay wider than the fixture's time span: the microbatch split is
    # random, so any tight watermark would (correctly) drop late rows —
    # bounded-lateness semantics are pinned by the dedup-watermark tests;
    # THIS test pins backfill equivalence
    out = tumbling_window_agg_stream(
        sdf, "ts", "value", width="1 hour", slide="30 minutes",
        delay="40 days",
    )
    state: dict = {}

    def upsert(df, _bid):
        for r in df.collect():
            state[r["window_start"]] = (r["n_events"], r["avg_value"])

    run_available_now(out, str(tmp_path / "ckpt_sw"), upsert, output_mode="update")
    batch = aggregates.sliding_window_agg(
        load_table(spark, SF0001, "events"), "ts", "value",
        width="1 hour", slide="30 minutes",
    )
    expected = {
        r.window_start: (r.n_events, r.avg_value) for r in batch.collect()
    }
    assert state == expected


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """session_agg's docstring claims the same expression runs under
    Structured Streaming with a watermark — pin it. Append mode emits each
    finalized session exactly once; a far-future sentinel event advances
    the watermark so every real session finalizes before the drain stops
    (the no-data flush batch does the final emit)."""
    ev = load_table(spark, SF0001, "events")
    src = str(tmp_path / "sess_src")
    ev.coalesce(1).write.parquet(src)
    sentinel = ev.select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).limit(1)
    sentinel.select(ev.columns).write.mode("append").parquet(src)

    sdf = read_stream_parquet(spark, src, ev.schema, max_files_per_trigger=1)
    # watermarks need a TIMESTAMP instant; the loader's ts is NTZ — same
    # cast-then-watermark shape as tumbling_window_agg_stream
    wmk = sdf.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", "0 seconds"
    )
    out = aggregates.session_agg(wmk, "ts", ["user_id"], gap="30 minutes")
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend(
            (r.user_id, r.session_start, r.n_events) for r in df.collect()
        )

    run_available_now(out, str(tmp_path / "sess_ck"), sink, output_mode="append")
    real = [g for g in got if g[0] != -1]
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in aggregates.session_agg(
            ev, "ts", ["user_id"], gap="30 minutes"
        ).collect()
    )
    assert sorted(real) == want
    assert len(real) == len(set(real))  # append: each session exactly once


def test_session_agg_stream_operator_matches_batch(spark, tmp_path):
    """The packaged streaming session operator (watermark + cast inside)
    drains row-identical to the batch session_agg — including avg_value,
    which the ad-hoc pin above does not cover."""
    ev = load_table(spark, SF0001, "events")
    src = str(tmp_path / "sas_src")
    ev.coalesce(1).write.parquet(src)
    sentinel = ev.select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).limit(1)
    sentinel.select(ev.columns).write.mode("append").parquet(src)

    sdf = read_stream_parquet(spark, src, ev.schema, max_files_per_trigger=1)
    out = session_agg_stream(
        sdf, "ts", ["user_id"], gap="30 minutes", value_col="value",
        delay="0 seconds",
    )
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend(
            (r.user_id, r.session_start, r.n_events, r.avg_value)
            for r in df.collect()
        )

    run_available_now(out, str(tmp_path / "sas_ck"), sink, output_mode="append")
    real = [g for g in got if g[0] != -1]
    want = sorted(
        (r.user_id, r.session_start, r.n_events, r.avg_value)
        for r in aggregates.session_agg(
            ev, "ts", ["user_id"], gap="30 minutes", value_col="value"
        ).collect()
    )
    assert sorted(real) == want


# --- stream-static enrichment join -------------------------------------------


def test_enrich_stream_matches_batch_and_stays_narrow(spark, tmp_path):
    """Broadcast stream-static enrichment drains to exactly the batch
    join; the streamed side must never shuffle (BroadcastHashJoin in the
    microbatch plan)."""
    src, schema = _events_dir(spark, tmp_path, n_files=3)
    dim_rows = [("click", "engage"), ("view", "passive"), ("purchase", "convert")]
    dim = spark.createDataFrame(dim_rows, "event_type string, segment string")

    from opendosm_parquet_to_sqlite_spark.streaming import enrich_stream

    sdf = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)
    out = enrich_stream(
        sdf.select("event_id", "event_type"), dim, "event_type", how="left"
    )
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend((r.event_id, r.segment) for r in df.collect())

    run_available_now(out, str(tmp_path / "enrich_ck"), sink, output_mode="append")

    ev = load_table(spark, SF0001, "events")
    want = sorted(
        (r.event_id, r.segment)
        for r in ev.select("event_id", "event_type")
        .join(F.broadcast(dim), "event_type", "left")
        .collect()
    )
    assert sorted(got) == want
    assert len(got) == ev.count()  # left join: every stream row survives
    # plan probe on the batch twin of one microbatch: broadcast, no exchange
    plan = (
        ev.select("event_id", "event_type")
        .join(F.broadcast(dim), "event_type", "left")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_enrich_stream_inner_drops_unmatched_and_rejects_stateful_modes(
    spark, tmp_path
):
    src, schema = _events_dir(spark, tmp_path, n_files=1)
    dim = spark.createDataFrame(
        [("click", "engage")], "event_type string, segment string"
    )

    from opendosm_parquet_to_sqlite_spark.streaming import enrich_stream

    import pytest

    with pytest.raises(ValueError, match="inner.*left"):
        enrich_stream(
            read_stream_parquet(spark, src, schema), dim, "event_type",
            how="full_outer",
        )

    got: list[tuple] = []
    out = enrich_stream(
        read_stream_parquet(spark, src, schema).select(
            "event_id", "event_type"
        ),
        dim, "event_type", how="inner",
    )

    def sink(df, _bid):
        got.extend((r.event_id, r.segment) for r in df.collect())

    run_available_now(out, str(tmp_path / "enrich_ck2"), sink,
                      output_mode="append")
    ev = load_table(spark, SF0001, "events")
    n_click = ev.filter("event_type = 'click'").count()
    assert len(got) == n_click  # inner: only matched rows survive
    assert {s for _, s in got} == {"engage"}


def test_enrich_stream_live_sees_dim_overwrite_between_batches(
    spark, tmp_path
):
    """The live-dim helper must re-read the dimension per microbatch: a dim
    overwritten between two availableNow drains is reflected in the second
    drain's batches (the exact gap the pinned enrich_stream documents)."""
    from opendosm_parquet_to_sqlite_spark.streaming import enrich_stream_live

    src = str(tmp_path / "src")
    dim_path = str(tmp_path / "dim")
    ck = str(tmp_path / "live_ck")

    rows1 = [(1, "click"), (2, "view")]
    spark.createDataFrame(
        rows1, "event_id long, event_type string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("click", "engage_v1"), ("view", "passive_v1")],
        "event_type string, segment string",
    ).write.mode("overwrite").parquet(dim_path)

    schema = spark.read.parquet(src).schema
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend((r.event_id, r.segment) for r in df.collect())

    enrich_stream_live(
        read_stream_parquet(spark, src, schema),
        dim_path, "event_type", sink, ck,
    )
    assert sorted(got) == [(1, "engage_v1"), (2, "passive_v1")]

    # overwrite the dim AND add new stream data; same checkpoint
    spark.createDataFrame(
        [("click", "engage_v2"), ("view", "passive_v2")],
        "event_type string, segment string",
    ).write.mode("overwrite").parquet(dim_path)
    spark.createDataFrame(
        [(3, "click")], "event_id long, event_type string"
    ).coalesce(1).write.mode("append").parquet(src)

    got.clear()
    enrich_stream_live(
        read_stream_parquet(spark, src, schema),
        dim_path, "event_type", sink, ck,
    )
    # only the new file is processed (checkpoint), against the NEW dim
    assert got == [(3, "engage_v2")]


def test_enrich_stream_live_rejects_stateful_modes(spark, tmp_path):
    import pytest

    from opendosm_parquet_to_sqlite_spark.streaming import enrich_stream_live

    src = str(tmp_path / "src2")
    spark.createDataFrame(
        [(1, "click")], "event_id long, event_type string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    with pytest.raises(ValueError, match="inner.*left"):
        enrich_stream_live(
            read_stream_parquet(spark, src, schema),
            str(tmp_path / "dim2"), "event_type",
            lambda df, bid: None, str(tmp_path / "ck2"),
            how="full_outer",
        )


def test_frontier_dedup_stream_collapses_url_variants(spark, tmp_path):
    """Streaming URL frontier: spelling variants of the same page across
    microbatches collapse to one emission (the first arrival)."""
    from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
        frontier_dedup_stream,
    )

    schema = "id long, url string, et long"
    parts = [
        [(1, "https://WWW.Example.com/p/", 10)],
        [(2, "http://example.com/p?utm_source=x", 20),
         (3, "https://other.com/q", 30)],
        [(4, "https://example.com/p", 40),
         (5, "https://other.com/q?b=2&a=1", 50)],
    ]
    src = tmp_path / "frontier_src"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    sdf = read_stream_parquet(spark, str(src), schema, max_files_per_trigger=1)
    # horizon must cover the fixture's whole span: within-watermark dedup
    # legitimately re-admits a canonical form once its entry ages out
    out = frontier_dedup_stream(sdf, "url", "et", delay="1 hour")
    got = []

    def sink(df, _bid):
        got.extend((r.id, r.canonical_url) for r in df.collect())

    run_available_now(
        out, str(tmp_path / "frontier_ck"), sink, output_mode="append"
    )
    by_canon = {}
    for i, c in sorted(got):
        by_canon.setdefault(c, i)
    # first arrival per canonical page; variants 2 and 4 collapsed into 1
    assert by_canon["example.com/p"] == 1
    assert by_canon["other.com/q"] == 3
    # other.com/q?a=1&b=2 is a DIFFERENT page (real params survive)
    assert "other.com/q?a=1&b=2" in by_canon
    assert len(got) == 3


@pytest.mark.slow
def test_media_dedup_stream_collapses_reencodes(spark, tmp_path):
    """Streaming media dedup: re-encoded copies of the same pixels
    (different zlib levels -> different bytes, same content) collapse to
    the first arrival across microbatches; distinct images pass."""
    from opendosm_parquet_to_sqlite_spark.operators import mediadedup as M
    from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
        media_dedup_stream,
        read_stream_parquet,
        run_available_now,
    )

    g1, g2 = M._base_gray(1, 24), M._base_gray(2, 24)
    parts = [
        [(1, M.encode_png_gray(g1, level=9), 10)],
        [(2, M.encode_png_gray(g1, level=0), 20),   # re-encode of g1
         (3, M.encode_png_gray(g2, level=6), 30)],  # new content
        [(4, M.encode_png_gray(g2, level=9), 40)],  # re-encode of g2
    ]
    schema = "id long, payload binary, et long"
    src = tmp_path / "media_src"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    sdf = read_stream_parquet(spark, str(src), schema, max_files_per_trigger=1)
    out = media_dedup_stream(sdf, "payload", "et", modality="image",
                             delay="1 hour")
    got = []

    def sink(df, _bid):
        got.extend((r.id, r.phash) for r in df.collect())

    run_available_now(
        out, str(tmp_path / "media_ck"), sink, output_mode="append"
    )
    by_hash = {}
    for i, h in sorted(got):
        by_hash.setdefault(h, i)
    assert len(got) == 2                       # one survivor per content
    assert sorted(by_hash.values()) == [1, 3]  # first arrivals win
    # and the batch fingerprint column form agrees with the mapInPandas form
    batch = spark.createDataFrame(
        [p for part in parts for p in part], schema
    )
    col_form = {
        r.id: r.phash
        for r in M.with_media_phash(batch, "payload").collect()
    }
    map_form = {
        r.doc_id: r.phash
        for r in M.image_phash(batch, "payload", "id").collect()
    }
    assert col_form == map_form


def test_contamination_monitor_stream_matches_batch(spark, tmp_path):
    """Round-12 streaming twin of contamination_semantic: each drained
    microbatch's report equals semantic_overlap run on (that batch,
    benchmark) directly — the monitor adds delivery, not different math.
    Empty-benchmark edge: every row scores NULL / contaminated 0."""
    from opendosm_parquet_to_sqlite_spark.operators import contamination
    from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
        contamination_monitor_stream,
        read_stream_parquet,
    )

    dim = 4
    bench_rows = [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])]
    schema = "vec_id long, embedding array<double>"
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(bench_rows, schema).write.parquet(bench_path)

    batches = [
        [(1, [1.0, 0.01, 0.0, 0.0]), (2, [0.0, 0.0, 1.0, 0.0])],
        [(3, [0.0, 1.0, 0.0, 0.0]), (4, None)],
    ]
    src = str(tmp_path / "vecs")
    for i, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    sdf = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)

    got: dict[int, tuple] = {}

    def sink(report, _bid):
        for r in report.collect():
            got[r.vec_id] = (r.max_cosine, r.contaminated)

    contamination_monitor_stream(
        sdf, bench_path, str(tmp_path / "ckpt"), sink, threshold=0.95
    )
    batch_all = spark.createDataFrame(
        [p for part in batches for p in part], schema
    )
    expected = {
        r.vec_id: (r.max_cosine, r.contaminated)
        for r in contamination.semantic_overlap(
            batch_all,
            spark.read.parquet(bench_path),
            threshold=0.95,
        ).collect()
    }
    assert got == expected
    assert got[1][1] == 1 and got[2][1] == 0      # neighbor vs orthogonal
    assert got[4] == (None, 0)                    # NULL vector edge

    # empty-benchmark edge: overwrite with zero rows, re-drain from a
    # fresh checkpoint -> NULL max_cosine, contaminated 0 for every row
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        bench_path
    )
    got.clear()
    sdf2 = read_stream_parquet(spark, src, schema, max_files_per_trigger=1)
    contamination_monitor_stream(
        sdf2, bench_path, str(tmp_path / "ckpt2"), sink, threshold=0.95
    )
    assert len(got) == 4
    assert all(v == (None, 0) for v in got.values())
