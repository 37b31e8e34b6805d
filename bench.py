"""Headline benchmark (SURVEY.md §6/§7 M7).

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extra": {"corpus_files_per_sec": ..., "query_p95_ms": ...}}

Headline pieces (BASELINE.json:2 — build throughput + query p95):
  * build a block-compressed inverted index over the sf documents table
  * build one over an N-file synthetic code corpus → files/sec
  * timed top-k BM25 searches (block-max WAND path) → p95 latency

Scaling-efficiency evidence (two parallelism levels) is produced by
``scripts/scaling_bench.py``, which shells out to this file at
local[8] and local[32] and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _timed(thunk) -> float:
    t0 = time.time()
    thunk()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_n = int(os.environ.get("BENCH_CORPUS_N", "20000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from datastream_io_spark.corpus import corpus_df
    from datastream_io_spark.operators.build import build_index
    from datastream_io_spark.session import get_spark
    from datastream_io_spark.sources.scan import documents_as_corpus

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)
    tmp = tempfile.mkdtemp(prefix="bench_idx_")
    timings: dict[str, float] = {}

    # host-state calibration (VERDICT r4 #9): a fixed micro-workload
    # measured BEFORE the suite so cross-round comparisons on this
    # virtualized host (±40% same-code swings observed) can decompose
    # "engine got slower" from "host got slower". Three probes:
    # cpu = single-core numpy matmul GFLOP/s-ish scalar; spark_job_ms =
    # best-of-5 one-task Spark job (the fixed per-query floor every
    # latency key pays); spark_sql_ms = best-of-5 `select 1` collect
    # (Py4J + analysis floor, no job).
    rng = np.random.default_rng(0)
    a = rng.random((1024, 1024))
    t0 = time.time()
    n_mm = 0
    while time.time() - t0 < 2.0:
        a @ a
        n_mm += 1
    cpu_score = n_mm * 2 * 1024**3 / (time.time() - t0) / 1e9
    spark.range(1, numPartitions=1).count()  # JVM warm
    job_ms = min(
        _timed(lambda: spark.range(1, numPartitions=1).count())
        for _ in range(5)) * 1000
    sql_ms = min(_timed(lambda: spark.sql("select 1").collect())
                 for _ in range(5)) * 1000
    calibration = {"cpu_matmul_gflops": round(cpu_score, 2),
                   "spark_job_ms": round(job_ms, 1),
                   "spark_sql_ms": round(sql_ms, 1)}

    t_suite = time.time()

    # 1. documents index (the driver fixture corpus) — POSITIONAL since
    # r2, so the timing covers the posexplode/positions-stream overhead
    # and the query set can include a phrase
    doc_idx = os.path.join(tmp, "docs")
    t0 = time.time()
    build_index(spark, documents_as_corpus(spark, sf_dir), doc_idx,
                n_splits=4, n_buckets=16, tokenizer="simple",
                salt_threshold=1000, n_salts=8, positions=True,
                source_desc=f"{sf_dir}/documents.parquet")
    timings["build_documents_index"] = time.time() - t0

    # expansion sidecars (dict_sorted + dict_ngrams): own timing key so
    # the O(dictionary) cost is visible and never pollutes files/sec
    from datastream_io_spark.operators.dictindex import build_term_sidecars

    t0 = time.time()
    build_term_sidecars(spark, doc_idx)
    timings["build_doc_sidecars"] = time.time() - t0

    # 2. synthetic code corpus index → files/sec headline. The corpus is
    # materialized to parquet FIRST (outside the timed region): the real
    # input is an Iceberg/parquet table scan, not an in-flight generator,
    # and the build re-scans its input once per segment job.
    corpus_path = os.path.join(tmp, "corpus_src")
    corpus_df(spark, corpus_n).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    # best-of-2 full rebuilds: same-code runs on this virtualized host
    # swing ±40% with VM steal (r2's 441→301 files/s "regression" was
    # host load, phase timings proved it) — the query latencies already
    # take best-of-3 for the same reason; both runs are reported
    build_secs = []
    for i in range(2):
        code_idx = os.path.join(tmp, f"code{i}")
        t0 = time.time()
        build_index(spark, corpus, code_idx, n_splits=16, n_buckets=32,
                    tokenizer="code", salt_threshold=100_000, n_salts=8,
                    max_concurrent_splits=8,
                    source_desc=f"synthetic n={corpus_n}")
        build_secs.append(time.time() - t0)
    code_idx = os.path.join(tmp, f"code{build_secs.index(min(build_secs))}")
    build_sec = min(build_secs)
    timings[f"build_corpus_{corpus_n}"] = build_sec
    files_per_sec = corpus_n / build_sec

    # 3. query latencies (block-max WAND path via a warm Searcher —
    # dict/stats/doc-lens loaded once, one Spark job per query), 3 rounds
    from datastream_io_spark.operators.indexed_search import Searcher

    doc_queries = [("scan", "and"), ("window agg", "and"),
                   ("window agg", "or"), ("spark stream batch", "and"),
                   ("window agg", "phrase")]
    code_queries = [("parseConfig", "and"), ("parse config", "and"),
                    ("import os error", "or"), ("def", "and")]
    lat_ms: list[float] = []
    doc_searcher = None
    for idx, qs, tag in [(doc_idx, doc_queries, "doc"),
                         (code_idx, code_queries, "code")]:
        searcher = Searcher(spark, idx)
        if tag == "doc":
            doc_searcher = searcher  # reused by the expansion keys below
        for qi, (q, mode) in enumerate(qs):
            best = None
            for _ in range(3):
                t0 = time.time()
                rows = searcher.search(q, 10, mode).collect()
                dt = time.time() - t0
                lat_ms.append(dt * 1000)
                best = dt if best is None else min(best, dt)
            timings[f"q_{tag}{qi}_{mode}"] = best
            assert rows is not None

    # expansion rewrites (Q18 wildcard / Q20 fuzzy, warm Searcher path:
    # expansion from the driver-cached dict costs zero extra jobs) +
    # full-match-set facets (Q19) over the documents index, best-of-3.
    # NOT appended to lat_ms: query_p95_ms stays the top-k-suite metric
    # it has been since r1 (facets enumerate the full match set —
    # structurally slower — and would redefine p95 across rounds).
    from datastream_io_spark.operators.indexed_search import (
        facet_counts,
        facet_counts_grouped,
        more_like_this,
    )

    doc_corpus = documents_as_corpus(spark, sf_dir)
    mlt_src = doc_searcher.search("window agg", 1, "and").collect()[0].doc_id
    for key, fn in [
        ("q_doc_wildcard", lambda: doc_searcher.search_wildcard(
            "s*", 10).collect()),
        ("q_doc_fuzzy", lambda: doc_searcher.search_fuzzy(
            "hast", 10, max_dist=2).collect()),
        # r5 additions: proximity (warm, positional), regex expansion
        # (warm dict cache), more-like-this (corpus-backed content)
        ("q_doc_near", lambda: doc_searcher.search_near(
            "window agg", 10, slop=1, ordered=True).collect()),
        ("q_doc_regex", lambda: doc_searcher.search_regex(
            "s.*a.*", 10).collect()),
        ("q_doc_mlt", lambda: more_like_this(
            spark, doc_idx, mlt_src, 10, 20,
            corpus=doc_corpus).collect()),
        ("q_doc_facet", lambda: facet_counts(
            spark, doc_idx, "window agg", "lang", "and").collect()),
        # non-partition-column facet path (r5): exact counts with no
        # match-set join — per-split value arrays + kernel counters
        ("q_doc_facet_nonpart", lambda: facet_counts_grouped(
            spark, doc_idx, "window agg", "lang", "and").collect()),
    ]:
        best = None
        for _ in range(3):
            t0 = time.time()
            rows = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[key] = best
        assert rows is not None

    # 4. batched serving (Q13): the same doc AND-queries answered in ONE
    # Spark job — amortizes the fixed per-job cost that dominates p95
    from datastream_io_spark.operators.indexed_search import search_many

    batch = {f"q{i}": q for i, (q, m) in enumerate(doc_queries)
             if m == "and"}
    search_many(spark, doc_idx, {"warm": "scan"}, 10, "and").collect()
    t0 = time.time()
    search_many(spark, doc_idx, batch, 10, "and").collect()
    timings[f"q_doc_batch{len(batch)}_and"] = time.time() - t0

    # phrase batching (r3): the positional doc index answers K phrase
    # queries in one job — same amortization as the AND batch
    pbatch = {"p0": "window agg", "p1": "spark stream batch",
              "p2": "scan merge"}
    t0 = time.time()
    search_many(spark, doc_idx, pbatch, 10, "phrase").collect()
    timings[f"q_doc_batch{len(pbatch)}_phrase"] = time.time() - t0

    # expansion-mode batching (r4): warm Searcher resolves every
    # wildcard/fuzzy expansion from the cached dict, then ONE job
    wbatch = {"w0": "s*", "w1": "wind*", "w2": "gr*"}
    t0 = time.time()
    doc_searcher.search_many(wbatch, 10, "wildcard").collect()
    timings[f"q_doc_batch{len(wbatch)}_wildcard"] = time.time() - t0
    fbatch = {"f0": "windoq", "f1": "scam", "f2": "merga"}
    t0 = time.time()
    doc_searcher.search_many(fbatch, 10, "fuzzy", max_dist=1).collect()
    timings[f"q_doc_batch{len(fbatch)}_fuzzy"] = time.time() - t0

    total = time.time() - t_suite
    p95 = float(np.percentile(np.array(lat_ms), 95))
    with open(os.path.join(code_idx, "manifest", "merge.json")) as f:
        merge = json.load(f)
    bpp = (merge["compressed_bytes"] / merge["n_postings"]
           if merge.get("n_postings") else 0.0)
    out = {
        "metric": "fulltext_index_build_plus_bm25_topk_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf,
        "extra": {
            "cpus": cpus,
            "corpus_files": corpus_n,
            "corpus_files_per_sec": round(files_per_sec, 2),
            "corpus_build_runs_sec": [round(s, 2) for s in build_secs],
            "query_p95_ms": round(p95, 1),
            "n_queries_timed": len(lat_ms),
            "index_bytes_per_posting": round(bpp, 3),
            "index_postings": merge.get("n_postings", 0),
            # per-phase breakdown of the headline build so a throughput
            # delta attributes to a phase, not just the total
            "corpus_build_phase_sec": merge.get("phase_sec", {}),
            "host_calibration": calibration,
        },
    }
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
