"""3.1 build_index — the batch index build (SURVEY.md §3.1, §2.4).

Three phases, each a separate Spark job boundary so the build is
resumable (C6, BASELINE.json:14):

  A. docs pass (once, then FROZEN): dedupe doc keys, assign dense
     deterministic doc ids (two-level scheme, no global sort), compute
     doc_len + content_sha256, write ``docs/`` + ``stats.json``.
  B. per-split segment jobs: re-scan only that split's corpus rows,
     tokenize (vectorized pandas UDF — Python boundary #1), tf via
     partial+final hash agg, range-salt hot terms (C4), encode sorted
     posting runs into delta+varint blocks inside ``applyInPandas``
     (Python boundary #2), atomic segment write + manifest.
  C. merge (C5): union all segments → one shuffle on term → concatenate
     runs IN PURE COLUMN OPS (runs are doc-id-disjoint by construction,
     so merge = sort_array on first_doc_id + flatten — zero Python, no
     re-encode) → write ``postings/`` partitioned by term_bucket +
     broadcastable ``dict/``.

Skew (C4): ``documents``-style corpora where every term is hot
(FIXTURES.md §1) would put each term's whole split on one task. Terms
whose in-split df exceeds ``salt_threshold`` are range-salted on doc_id
(salts are CONTIGUOUS doc ranges, so salted runs stay disjoint and the
merge remains a concat). AQE cannot do this — it splits skewed join
partitions, not aggregation groups (SURVEY.md §4.2).

Index layout:
  docs/        doc_id, repo, path, commit, lang, dl, content_sha256, split_id
  stats.json   n_docs, avgdl, n_splits, split_offsets/counts, n_buckets, tokenizer
  segments/split_NNNN/   term, term_bucket, split_id, salt, first_doc_id,
                         last_doc_id, df_run, cf_run, blocks
  manifest/split_NNNN.json   lineage + metrics per split
  postings/term_bucket=K/    term, df, cf, first_doc_id, last_doc_id, blocks
  dict/        term, term_bucket, df, cf, idf
  stats (N, avgdl) give every later consumer the frozen BM25 context.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datastream_io_spark import B, K1
from datastream_io_spark.operators import postings as P
from datastream_io_spark.operators.codec import encode_blocks
from datastream_io_spark.sources import manifest as M

BLOCKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("first_doc_id", T.LongType()),
            T.StructField("max_doc_id", T.LongType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("max_tf", T.IntegerType()),
            T.StructField("max_tfn", T.FloatType()),
            T.StructField("docs", T.BinaryType()),
            T.StructField("tfs", T.BinaryType()),
        ]
    )
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("last_doc_id", T.LongType()),
        T.StructField("df_run", T.LongType()),
        T.StructField("cf_run", T.LongType()),
        T.StructField("blocks", BLOCKS_TYPE),
    ]
)


def _stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def read_stats(index_dir: str) -> dict:
    with open(_stats_path(index_dir)) as f:
        return json.load(f)


def _doc_key_split(n_splits: int):
    return F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_splits)).cast("int")


def build_docs(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_splits: int,
    n_buckets: int,
    tokenizer: str,
) -> dict:
    """Phase A. Returns the frozen stats dict. Skipped if already built —
    doc ids are FROZEN across resumes (SURVEY.md §3.1)."""
    if os.path.exists(_stats_path(index_dir)):
        return read_stats(index_dir)

    deduped = corpus.dropDuplicates(["repo", "path", "commit"])
    with_split = deduped.withColumn("split_id", _doc_key_split(n_splits))
    counts = {
        int(r["split_id"]): int(r["n"])
        for r in with_split.groupBy("split_id").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for s in range(n_splits):
        offsets[s] = acc
        acc += counts.get(s, 0)

    offset_col = F.element_at(
        F.array(*[F.lit(offsets[s]) for s in range(n_splits)]), F.col("split_id") + 1
    ).cast("long")
    w = Window.partitionBy("split_id").orderBy("repo", "path", "commit")
    # doc_id window first (slim rows, n_splits-way parallel), THEN
    # repartition so the tokenize UDF runs at full parallelism instead of
    # inside the window stage
    with_ids = (
        with_split
        .withColumn("doc_id", offset_col + F.row_number().over(w).cast("long") - 1)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    docs = (
        P.with_tokens(with_ids, "content", mode=tokenizer, use_udf=True)
        .withColumn("dl", F.size("tokens").cast("long"))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .select("doc_id", "repo", "path", "commit", "lang", "dl",
                "content_sha256", "split_id")
    )
    docs.write.mode("overwrite").parquet(os.path.join(index_dir, "docs"))

    docs_done = spark.read.parquet(os.path.join(index_dir, "docs"))
    row = docs_done.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"]),
        "n_splits": n_splits,
        "n_buckets": n_buckets,
        "tokenizer": tokenizer,
        "split_counts": {str(k): v for k, v in counts.items()},
        "split_offsets": {str(k): v for k, v in offsets.items()},
        "k1": K1,
        "b": B,
    }
    tmp = _stats_path(index_dir) + ".tmp"
    os.makedirs(index_dir, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, _stats_path(index_dir))
    return stats


def _encode_run(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (term, salt) group → one posting run."""
    pdf = pdf.sort_values("doc_id")
    ids = pdf["doc_id"].to_numpy()
    tfs = pdf["tf"].to_numpy()
    tfns = pdf["tfn"].to_numpy()
    blocks = encode_blocks(ids, tfs, tfns)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "first_doc_id": [int(ids[0])],
            "last_doc_id": [int(ids[-1])],
            "df_run": [int(ids.size)],
            "cf_run": [int(tfs.sum())],
            "blocks": [blocks],
        }
    )


def build_segment(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    split_id: int,
    stats: dict,
    salt_threshold: int = 1 << 20,
    n_salts: int = 8,
    source_desc: str = "",
) -> dict:
    """Phase B for one split. Atomic: temp write → rename → manifest."""
    n_splits = stats["n_splits"]
    tokenizer = stats["tokenizer"]
    offset = stats["split_offsets"][str(split_id)]
    count = stats["split_counts"].get(str(split_id), 0)
    seg_dir = os.path.join(index_dir, "segments", f"split_{split_id:04d}")
    tmp_dir = os.path.join(index_dir, "segments", f"_tmp_split_{split_id:04d}")

    if count == 0:
        empty = spark.createDataFrame([], SEGMENT_SCHEMA).select(
            "term",
            F.lit(0).cast("int").alias("term_bucket"),
            F.lit(split_id).cast("int").alias("split_id"),
            "salt", "first_doc_id", "last_doc_id", "df_run", "cf_run", "blocks",
        )
        empty.write.mode("overwrite").parquet(seg_dir)
        metrics = {"n_docs": 0, "n_postings": 0, "n_terms": 0,
                   "compressed_bytes": 0, "cf": 0, "sha_crc_sum": 0,
                   "input": source_desc}
        M.write_split_manifest(index_dir, split_id, metrics)
        return metrics

    # deterministic re-derivation of this split's rows + doc ids (no join
    # against docs/ needed: same dedupe, same hash-split, same in-split order)
    split_rows = (
        corpus.dropDuplicates(["repo", "path", "commit"])
        .withColumn("split_id", _doc_key_split(n_splits))
        .where(F.col("split_id") == split_id)
    )
    w = Window.partitionBy("split_id").orderBy("repo", "path", "commit")
    with_ids = (
        split_rows
        .withColumn("doc_id", F.lit(offset).cast("long")
                    + F.row_number().over(w).cast("long") - 1)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    tok = (
        P.with_tokens(with_ids, "content", mode=tokenizer, use_udf=True)
        .select("doc_id", "tokens", F.sha2("content", 256).alias("content_sha256"))
    )
    dl = tok.select("doc_id", F.size("tokens").cast("long").alias("dl"),
                    "content_sha256")
    tf = P.term_freq(P.doc_terms(tok))
    tf = tf.join(dl.select("doc_id", "dl"), "doc_id")
    avgdl = float(stats["avgdl"])
    tfn = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
    )
    tf = tf.withColumn("tfn", tfn.cast("float"))

    # C4 — range-salt hot terms: salt = which n_salts-quantile of the
    # split's contiguous doc range the doc falls in → runs stay disjoint
    df_seg = tf.groupBy("term").agg(F.count("*").alias("df_seg"))
    hot = df_seg.where(F.col("df_seg") > salt_threshold).select("term")
    salt_expr = F.floor(
        (F.col("doc_id") - F.lit(offset)) * F.lit(n_salts) / F.lit(max(count, 1))
    ).cast("int")
    tf = tf.join(F.broadcast(hot.withColumn("is_hot", F.lit(True))), "term", "left")
    tf = tf.withColumn(
        "salt", F.when(F.col("is_hot").isNotNull(), salt_expr).otherwise(F.lit(0))
    ).drop("is_hot")

    runs = tf.groupBy("term", "salt").applyInPandas(_encode_run, SEGMENT_SCHEMA)
    seg = runs.select(
        "term",
        F.pmod(F.xxhash64("term"), F.lit(stats["n_buckets"])).cast("int").alias("term_bucket"),
        F.lit(split_id).alias("split_id"),
        "salt", "first_doc_id", "last_doc_id", "df_run", "cf_run", "blocks",
    )
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    seg.write.mode("overwrite").parquet(tmp_dir)
    if os.path.exists(seg_dir):
        shutil.rmtree(seg_dir)
    os.replace(tmp_dir, seg_dir)

    # metrics from the durably written segment (BASELINE.json:6 lineage:
    # postings count, compressed bytes, term cardinality)
    seg_done = spark.read.parquet(seg_dir)
    mrow = seg_done.agg(
        F.sum("df_run").alias("n_postings"),
        F.countDistinct("term").alias("n_terms"),
        F.sum("cf_run").alias("cf"),
        F.sum(
            F.aggregate(
                "blocks", F.lit(0).cast("long"),
                lambda acc, b: acc + F.length(b["docs"]) + F.length(b["tfs"]),
            )
        ).alias("compressed_bytes"),
    ).collect()[0]
    # lineage fingerprint straight off the corpus rows (no tokenize recompute)
    sha_crc = split_rows.agg(
        F.sum(F.crc32(F.sha2("content", 256))).alias("s")
    ).collect()[0]["s"]
    metrics = {
        "n_docs": int(count),
        "n_postings": int(mrow["n_postings"] or 0),
        "n_terms": int(mrow["n_terms"] or 0),
        "compressed_bytes": int(mrow["compressed_bytes"] or 0),
        "cf": int(mrow["cf"] or 0),
        "sha_crc_sum": int(sha_crc or 0),
        "input": source_desc,
    }
    M.write_split_manifest(index_dir, split_id, metrics)
    return metrics


def merge_segments(spark: SparkSession, index_dir: str, stats: dict) -> None:
    """Phase C — global index. Runs are doc-id-disjoint (splits own
    contiguous id ranges; salted runs are contiguous sub-ranges), so the
    per-term merge is concat-in-order: pure Column ops, no Python, no
    block re-encode. One shuffle, hash-partitioned on term."""
    seg_glob = os.path.join(index_dir, "segments", "split_*")
    segs = spark.read.parquet(seg_glob)
    # one row per (term, split): salted runs inside a split are merged
    # (concat of disjoint contiguous ranges); rows stay document-range-
    # partitioned so the query-side WAND distributes by split — the
    # standard document-partitioned search architecture. At 10^12 docs a
    # fully-compacted single row per hot term would not fit anywhere.
    merged = (
        segs.repartition(spark.sparkContext.defaultParallelism, "term")
        .groupBy("term", "term_bucket", "split_id")
        .agg(
            F.sum("df_run").alias("df"),
            F.sum("cf_run").alias("cf"),
            F.min("first_doc_id").alias("first_doc_id"),
            F.max("last_doc_id").alias("last_doc_id"),
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("first_doc_id", "blocks"))),
                    lambda x: x["blocks"],
                )
            ).alias("blocks"),
        )
    )
    (
        merged.repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(index_dir, "postings"))
    )
    n_docs = stats["n_docs"]
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    dictionary = postings.groupBy("term", "term_bucket").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).select(
        "term", "term_bucket", "df", "cf",
        F.log1p((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
    )
    dictionary.write.mode("overwrite").parquet(os.path.join(index_dir, "dict"))
    with open(os.path.join(index_dir, "_INDEX_SUCCESS"), "w") as f:
        json.dump({"n_terms": dictionary.count()}, f)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_splits: int = 4,
    n_buckets: int = 8,
    tokenizer: str = "simple",
    salt_threshold: int = 1 << 20,
    n_salts: int = 8,
    source_desc: str = "",
    fail_after_splits: int | None = None,
    max_concurrent_splits: int = 4,
) -> dict:
    """End-to-end resumable build. ``fail_after_splits`` is a test hook
    (C6 kill-resume test): raise after that many segment jobs complete.

    Returns the stats dict. Re-invoking after a crash resumes: phase A
    is skipped if frozen, done splits are skipped via the manifest,
    merge re-runs idempotently (overwrite of a deterministic result).

    Segment jobs are independent (disjoint inputs, disjoint outputs,
    per-split manifests), so up to ``max_concurrent_splits`` run as
    concurrent Spark jobs from driver threads — the Spark scheduler
    interleaves their stages, which hides per-job fixed overhead without
    weakening atomicity or resume semantics.
    """
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(index_dir, exist_ok=True)
    stats = build_docs(spark, corpus, index_dir, n_splits, n_buckets, tokenizer)
    pending = M.pending_splits(index_dir, stats["n_splits"])
    if fail_after_splits is not None:
        to_run, to_fail = pending[:fail_after_splits], pending[fail_after_splits:]
    else:
        to_run, to_fail = pending, []

    def run(split_id: int) -> None:
        build_segment(
            spark, corpus, index_dir, split_id, stats,
            salt_threshold=salt_threshold, n_salts=n_salts,
            source_desc=source_desc,
        )

    if max_concurrent_splits <= 1 or len(to_run) <= 1:
        for split_id in to_run:
            run(split_id)
    else:
        with ThreadPoolExecutor(max_workers=max_concurrent_splits) as pool:
            for _ in pool.map(run, to_run):
                pass
    if to_fail:
        raise RuntimeError(f"injected failure before splits {to_fail}")
    merge_segments(spark, index_dir, stats)
    return stats
