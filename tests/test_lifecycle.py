"""End-to-end lifecycle integration: stream-ingest a positional index
in micro-batches, compact it, tombstone-delete docs, physically purge —
and at every stage each query mode must match the pandas brute-force
reference over the then-live corpus. This is the path an operator of a
long-running deployment actually walks."""

import pytest
from pyspark.sql import functions as F

from datastream_io_spark.corpus import corpus_df
from datastream_io_spark.golden import brute_force_topk
from datastream_io_spark.operators.boolean_search import search_boolean
from datastream_io_spark.operators.build import purge_deleted
from datastream_io_spark.operators.indexed_search import (
    delete_docs,
    search_indexed,
)
from datastream_io_spark.streaming.incremental import (
    compact_stream_index,
    finalize_stream_index,
    ingest_batch,
)
from datastream_io_spark.streaming.restream import read_restream, stage_restream

QUERIES = [("parse config", "and"), ("import os error", "or"),
           ("parse config", "phrase")]


def _check_all_modes(spark, idx, live_pdf):
    for q, mode in QUERIES:
        exp = brute_force_topk(live_pdf, q, 10, mode, tokenizer="code")
        got = [(r.doc_id, r.score) for r in
               search_indexed(spark, idx, q, 10, mode).collect()]
        assert [g[0] for g in got] == [e["doc_id"] for e in exp], (q, mode)
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e["score"], abs=1e-9)


def test_stream_compact_delete_purge_lifecycle(spark, tmp_path):
    n = 150
    corpus = corpus_df(spark, n, n_partitions=4)
    src = str(tmp_path / "life_stream")
    schema = stage_restream(corpus, src, n_chunks=5, order_col=None)
    idx = str(tmp_path / "life_index")

    q = (read_restream(spark, src, schema).writeStream
         .foreachBatch(lambda df, bid: ingest_batch(
             spark, df, bid, idx, tokenizer="code", positions=True))
         .option("checkpointLocation", str(tmp_path / "life_ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    finalize_stream_index(spark, idx, n_buckets=8, tokenizer="code")

    def live_pdf():
        return (spark.read.parquet(f"{idx}/docs")
                .join(corpus, ["repo", "path", "commit"])
                .select("doc_id", F.col("content").alias("text"))
                .toPandas())

    full = live_pdf()
    _check_all_modes(spark, idx, full)

    # 1. compact 5 batch splits → 2 coarse splits: answers unchanged
    compact_stream_index(spark, idx, target_splits=2)
    _check_all_modes(spark, idx, full)

    # 2. tombstone the current top hits. Live-docs semantics: victims
    # vanish but corpus STATISTICS still include them until purge — so
    # the reference is the full-corpus ranking minus victims, NOT a
    # survivors-only rescore.
    victims = [r.doc_id for r in
               search_indexed(spark, idx, "import os error", 5, "or").collect()]
    delete_docs(spark, idx, doc_ids=victims)
    vs = set(victims)
    for q, mode in QUERIES:
        allr = brute_force_topk(full, q, 10 ** 6, mode, tokenizer="code")
        exp = [(r["doc_id"], r["score"]) for r in allr
               if r["doc_id"] not in vs][:10]
        got = [(r.doc_id, r.score) for r in
               search_indexed(spark, idx, q, 10, mode).collect()]
        assert [g[0] for g in got] == [e[0] for e in exp], (q, mode)
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], abs=1e-9)
    surv = full[~full.doc_id.isin(victims)]
    # boolean path honors tombstones too
    got_bool = {r.doc_id for r in
                search_boolean(spark, idx, "import OR error", 20).collect()}
    assert not (got_bool & set(victims))

    # 3. physical purge: stats rebuilt, tombstones gone, answers over
    # survivors (scores now use the REBUILT df/avgdl → compare against
    # brute force computed on the surviving corpus only)
    stats = purge_deleted(spark, idx)
    assert stats["n_docs"] == len(surv)
    import os
    assert not os.path.exists(f"{idx}/tombstones")
    _check_all_modes(spark, idx, surv.reset_index(drop=True))

    # 4. a purged STREAMING index must refuse re-feed/re-finalize: the
    # *_staged batches still hold the purged docs, so either call would
    # silently resurrect them (review r3 finding #1)
    with pytest.raises(ValueError, match="purged"):
        finalize_stream_index(spark, idx, n_buckets=8, tokenizer="code")
    with pytest.raises(ValueError, match="purged"):
        ingest_batch(spark, spark.createDataFrame(
            [("r", "p", "c", "py", "x y z")],
            "repo string, path string, commit string, lang string, "
            "content string"), 99, idx, tokenizer="code")
