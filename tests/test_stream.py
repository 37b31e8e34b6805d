"""§2.10 streaming tests: stream-batch equivalence (SURVEY.md §5.2).
Each op runs twice — once as a real file-replay stream (ST1 restream,
micro-batch per file), once as a plain batch plan — and must agree.
Late-data drop, stateful scoring, and incremental index finalize are
covered end to end."""

import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datastream_io_spark.corpus import corpus_df
from datastream_io_spark.golden import brute_force_topk
from datastream_io_spark.operators.indexed_search import search_indexed
from datastream_io_spark.streaming import windows as SW
from datastream_io_spark.streaming.detectors import (
    zscore_batch,
    zscore_pandas_reference,
    zscore_stateful_stream,
)
from datastream_io_spark.streaming.incremental import (
    finalize_stream_index,
    ingest_batch,
)
from datastream_io_spark.streaming.restream import read_restream, stage_restream
from tests.conftest import SF0001, load_table


@pytest.fixture(scope="module")
def events(spark):
    # parquet timestamps read as TIMESTAMP_NTZ; watermarks/event time
    # require TIMESTAMP — normalize once (session TZ is UTC)
    return load_table(spark, SF0001, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))


@pytest.fixture(scope="module")
def event_stream_dir(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("restream") / "events")
    schema = stage_restream(events, d, n_chunks=4, order_col="ts")
    return d, schema


def _run_stream(spark, stream_df, mode, name=None):
    name = name or f"out_{uuid.uuid4().hex[:8]}"
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("fn,mode,cols", [
    (SW.tumbling_counts, "complete",
     ["w_start", "w_end", "event_type", "n", "sum_value"]),
    (SW.sliding_counts, "complete", ["w_start", "event_type", "n"]),
    (SW.session_counts, "complete",
     ["s_start", "s_end", "user_id", "n_events", "sum_value"]),
])
def test_stream_batch_equivalence(spark, events, event_stream_dir, fn, mode, cols):
    d, schema = event_stream_dir
    stream = read_restream(spark, d, schema, max_files_per_trigger=1)
    got = _run_stream(spark, fn(stream), mode)
    want = fn(events)
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_dedupe(spark, events, tmp_path):
    # duplicate every event across two chunks → stream dedupe must
    # reduce back to the batch-distinct answer
    dup = events.unionByName(events)
    d = str(tmp_path / "dup_events")
    schema = stage_restream(dup, d, n_chunks=4, order_col="ts")
    stream = read_restream(spark, d, schema)
    # delay > the 30-day data span: no row is ever "late", so the only
    # row-dropping force in play is the dedupe state itself
    got = _run_stream(spark, SW.dedupe_stream(stream, ["event_id"], "35 days"),
                      "append")
    assert got.count() == events.count()
    assert _rows(got, ["event_id"]) == _rows(events, ["event_id"])


def test_watermark_drops_late_rows(spark, events, tmp_path):
    """ST5 — a row arriving far behind the watermark is dropped by the
    streaming agg but kept by the batch agg."""
    head = events.orderBy("ts").limit(900)
    late = events.orderBy("ts").limit(1)  # the earliest event, re-sent last
    d = str(tmp_path / "late_events")
    # chunk 0..3 = head (time-ordered), chunk 4 = the very old row again
    schema = stage_restream(head, d, n_chunks=4, order_col="ts")
    late.write.mode("append").parquet(d)
    stream = read_restream(spark, d, schema)
    got = _run_stream(spark, SW.watermarked_tumbling(stream, "1 hour", "1 hour"),
                      "append")
    # append mode emits only finalized windows; the late duplicate must
    # not create/extend any window beyond what head itself finalizes
    got_n = {(r["w_start"], r["event_type"]): r["n"] for r in got.collect()}
    want = SW.watermarked_tumbling(head, "1 hour", "1 hour")
    want_n = {(r["w_start"], r["event_type"]): r["n"] for r in want.collect()}
    for k, n in got_n.items():
        assert want_n[k] == n, f"late row leaked into window {k}"


def test_stateful_zscore_stream_equals_batch(spark, events, event_stream_dir):
    d, schema = event_stream_dir
    stream = read_restream(spark, d, schema)
    got = _run_stream(spark, zscore_stateful_stream(stream), "append").toPandas()
    want_batch = zscore_batch(events).toPandas()
    want_ref = zscore_pandas_reference(
        events.select("user_id", "event_id", "ts", "value").toPandas())
    key = ["user_id", "ts", "event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want_batch = want_batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want_batch) == len(want_ref)
    for col in ["zscore", "mean", "var"]:
        assert (got[col] - want_batch[col]).abs().max() < 1e-9
        assert (got[col] - want_ref[col]).abs().max() < 1e-9
    # sanity: scoring actually discriminates
    assert got["zscore"].abs().max() > 1.0


def test_incremental_index_foreachbatch(spark, tmp_path):
    """ST8 — corpus streamed in 3 micro-batches via writeStream.
    foreachBatch; finalized index must be searchable and rank-identical
    to the brute-force scorer over the same docs."""
    n = 150
    corpus = corpus_df(spark, n, n_partitions=4)
    src = str(tmp_path / "corpus_stream")
    schema = stage_restream(corpus, src, n_chunks=3, order_col=None)
    idx = str(tmp_path / "stream_index")
    stream = read_restream(spark, src, schema)

    q = (stream.writeStream
         .foreachBatch(lambda df, bid: ingest_batch(spark, df, bid, idx,
                                                    tokenizer="code"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stats = finalize_stream_index(spark, idx, n_buckets=8, tokenizer="code",
                                  salt_threshold=50, n_salts=4)
    assert stats["n_docs"] == n

    docs_pdf = (
        spark.read.parquet(f"{idx}/docs")
        .join(corpus, ["repo", "path", "commit"])
        .select("doc_id", F.col("content").alias("text"))
        .toPandas()
    )
    for query, mode in [("parseConfig", "and"), ("import os error", "or"),
                        ("parse config", "and")]:
        expected = brute_force_topk(docs_pdf, query, 10, mode, tokenizer="code")
        got = [(r.doc_id, r.score)
               for r in search_indexed(spark, idx, query, 10, mode).collect()]
        assert [g[0] for g in got] == [e["doc_id"] for e in expected]
        for g, e in zip(got, expected):
            assert g[1] == pytest.approx(e["score"], abs=1e-9)

    # exactly-once: re-delivering an already-done batch is a no-op
    before = spark.read.parquet(f"{idx}/docs").count()
    ingest_batch(spark, corpus.limit(10), 0, idx, tokenizer="code")
    assert spark.read.parquet(f"{idx}/docs_staged/batch_*").count() == before


def test_percentile_detector_stream_equals_batch(spark, events, event_stream_dir):
    """ST7b — rolling-percentile detector (dsio's second built-in):
    stream with state carry-over ≡ batch full-history pass."""
    from datastream_io_spark.streaming.detectors import (
        percentile_batch,
        percentile_stateful_stream,
    )

    d, schema = event_stream_dir
    stream = read_restream(spark, d, schema)
    got = _run_stream(spark, percentile_stateful_stream(stream, window=50),
                      "append").toPandas()
    want = percentile_batch(events, window=50).toPandas()
    key = ["user_id", "ts", "event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["pct_rank"] - want["pct_rank"]).abs().max() < 1e-12
    # ranks live in [0, 1] and actually spread
    assert got["pct_rank"].between(0, 1).all()
    assert got["pct_rank"].nunique() > 10


def test_detector_registry_and_plugins(tmp_path):
    from datastream_io_spark.streaming.detectors import (
        DETECTOR_REGISTRY,
        load_detector_modules,
    )

    assert {"gaussian", "percentile"} <= set(DETECTOR_REGISTRY)
    plugin = tmp_path / "my_detector.py"
    plugin.write_text(
        "from datastream_io_spark.streaming.detectors import "
        "register_detector\n"
        "register_detector('custom_null', lambda df: df, lambda df: df, "
        "'value')\n")
    load_detector_modules([str(plugin)])
    assert "custom_null" in DETECTOR_REGISTRY


def test_zscore_reference_forgetting():
    """dsio update_formulae semantics: capped effective sample size →
    the running mean tracks a level shift instead of freezing."""
    pdf = pd.DataFrame({
        "user_id": [1] * 400,
        "event_id": range(400),
        "ts": pd.date_range("2024-01-01", periods=400, freq="1min"),
        "value": [0.0] * 200 + [10.0] * 200,
    })
    out = zscore_pandas_reference(pdf, n_max=50.0)
    assert abs(out["mean"].iloc[199]) < 1e-6
    assert out["mean"].iloc[-1] > 9.0  # forgetting let it adapt
    assert out["zscore"].iloc[200] > 5.0  # the shift was flagged


def test_dashboard_metrics_sink_stream_equals_batch(
        spark, events, event_stream_dir, tmp_path):
    """ST sink (dsio dashboard heritage): the per-batch appended metrics
    feed, merged at read time, must equal one batch aggregation of the
    batch-scored history — and latest.json must carry the same totals."""
    import json

    from datastream_io_spark.streaming.dashboard import (
        attach_metrics_sink,
        read_metrics,
        render_dashboard,
        score_window_metrics,
    )

    d, schema = event_stream_dir
    stream = read_restream(spark, d, schema)
    scored_stream = zscore_stateful_stream(stream)
    out = str(tmp_path / "dash")
    q = attach_metrics_sink(scored_stream, out, "zscore", threshold=2.0)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _rows(read_metrics(spark, out),
                ["window_start", "n_rows", "n_anomalies", "max_abs_score"])
    exp_df = score_window_metrics(zscore_batch(events), "zscore",
                                  threshold=2.0)
    exp = _rows(exp_df,
                ["window_start", "n_rows", "n_anomalies", "max_abs_score"])
    assert [g[:3] for g in got] == [e[:3] for e in exp]
    for g, e in zip(got, exp):
        assert g[3] == pytest.approx(e[3], abs=1e-9)
    # sum_score is float accumulation across different batchings — 1e-6
    gs = {r.window_start: r.sum_score for r in read_metrics(spark, out).collect()}
    es = {r.window_start: r.sum_score for r in exp_df.collect()}
    for k in es:
        assert gs[k] == pytest.approx(es[k], abs=1e-6)

    with open(f"{out}/latest.json") as f:
        snap = json.load(f)
    assert snap["rows"] == events.count()
    assert snap["anomalies"] == sum(g[2] for g in got)
    table = render_dashboard(spark, out, n=5)
    assert table.count() == len(got)


def test_incremental_positional_index_phrase(spark, tmp_path):
    """ST8 + Q9: a stream-ingested positional index answers phrase
    queries rank-identically to the brute-force phrase matcher."""
    n = 120
    corpus = corpus_df(spark, n, n_partitions=4)
    src = str(tmp_path / "corpus_stream_pos")
    schema = stage_restream(corpus, src, n_chunks=3, order_col=None)
    idx = str(tmp_path / "stream_pos_index")
    stream = read_restream(spark, src, schema)

    q = (stream.writeStream
         .foreachBatch(lambda df, bid: ingest_batch(
             spark, df, bid, idx, tokenizer="code", positions=True))
         .option("checkpointLocation", str(tmp_path / "ckpt_pos"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stats = finalize_stream_index(spark, idx, n_buckets=8, tokenizer="code",
                                  salt_threshold=50, n_salts=4)
    assert stats["positions"] is True

    docs_pdf = (
        spark.read.parquet(f"{idx}/docs")
        .join(corpus, ["repo", "path", "commit"])
        .select("doc_id", F.col("content").alias("text"))
        .toPandas()
    )
    for query in ["parse config", "import os"]:
        expected = brute_force_topk(docs_pdf, query, 10, "phrase",
                                    tokenizer="code")
        got = [(r.doc_id, r.score) for r in
               search_indexed(spark, idx, query, 10, "phrase").collect()]
        assert [g[0] for g in got] == [e["doc_id"] for e in expected], query
        for g, e in zip(got, expected):
            assert g[1] == pytest.approx(e["score"], abs=1e-9)


def test_compact_stream_index_preserves_results(spark, tmp_path):
    """Compaction merges per-batch posting rows into coarse splits with
    zero re-encode: row count drops, every query answer is identical."""
    from datastream_io_spark.streaming.incremental import (
        compact_stream_index,
    )

    n = 120
    corpus = corpus_df(spark, n, n_partitions=4)
    src = str(tmp_path / "corpus_stream_c")
    schema = stage_restream(corpus, src, n_chunks=6, order_col=None)
    idx = str(tmp_path / "stream_c_index")
    stream = read_restream(spark, src, schema)
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: ingest_batch(
             spark, df, bid, idx, tokenizer="code", positions=True))
         .option("checkpointLocation", str(tmp_path / "ckpt_c"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    finalize_stream_index(spark, idx, n_buckets=8, tokenizer="code")

    queries = [("parseConfig", "and"), ("import os error", "or"),
               ("parse config", "phrase")]
    before = {
        (t, m): [(r.doc_id, round(r.score, 9)) for r in
                 search_indexed(spark, idx, t, 10, m).collect()]
        for t, m in queries
    }
    rows_before = spark.read.parquet(f"{idx}/postings").count()
    stats = compact_stream_index(spark, idx, target_splits=2)
    assert stats["n_splits"] == 2
    rows_after = spark.read.parquet(f"{idx}/postings").count()
    assert rows_after < rows_before
    # coarse split doc ranges must stay disjoint (the merge invariant)
    pr = spark.read.parquet(f"{idx}/postings").groupBy("split_id").agg(
        F.min("first_doc_id").alias("lo"),
        F.max("last_doc_id").alias("hi")).orderBy("lo").collect()
    for a, b in zip(pr, pr[1:]):
        assert a.hi < b.lo
    for (t, m), exp in before.items():
        got = [(r.doc_id, round(r.score, 9)) for r in
               search_indexed(spark, idx, t, 10, m).collect()]
        assert got == exp, (t, m)


def test_ingest_ids_partition_invariant(spark, tmp_path):
    """r3: batch ids come from the two-level hash-split scheme (no
    single-task global window) — the assigned ids must be dense and
    IDENTICAL regardless of how the incoming micro-batch is partitioned,
    and the id window must run multi-partition."""
    from datastream_io_spark.corpus import corpus_df
    from datastream_io_spark.streaming import incremental as INC

    corpus = corpus_df(spark, 120, n_partitions=2)
    ids = {}
    for name, df in [("p1", corpus.coalesce(1)),
                     ("p7", corpus.repartition(7))]:
        idx = str(tmp_path / f"ing_{name}")
        INC._WATERMARK_CACHE.pop(__import__("os").path.abspath(idx), None)
        ingest_batch(spark, df, 0, idx, tokenizer="code")
        staged = spark.read.parquet(f"{idx}/docs_staged/batch_0000")
        ids[name] = {(r.repo, r.path, r.commit): r.doc_id
                     for r in staged.collect()}
        vals = sorted(ids[name].values())
        assert vals == list(range(120))  # dense from the batch offset
    assert ids["p1"] == ids["p7"]
