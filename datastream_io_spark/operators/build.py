"""3.1 build_index — the batch index build (SURVEY.md §3.1, §2.4).

Three phases, each a separate Spark job boundary so the build is
resumable (C6, BASELINE.json:14):

  A. staging (once, then FROZEN): dedupe doc keys, assign dense
     deterministic doc ids (two-level hash-split scheme — per-split
     counts + prefix-sum offsets + in-split row_number; no global
     sort), add content_sha256, write the corpus back PARTITIONED BY
     split_id. Doc ids never change across resumes.
  B. per-split tf jobs: read ONLY that split's staged partition
     (directory-level partition pruning), tokenize ONCE (vectorized
     pandas UDF — the build's only Python stage besides encode),
     aggregate (doc, term) → tf with doc_len carried through the
     explode (no extra join), stage raw tf rows + a lineage manifest
     with per-split metrics. Independent jobs → resumable + runnable
     concurrently.
  C. finalize: exact global stats from the manifests (avgdl needs ALL
     docs — this is why encode waits), range-salt hot terms (C4),
     block-encode per (term, split, salt) run inside ``applyInPandas``
     (delta+varint, block maxima), merge runs per (term, split) IN PURE
     COLUMN OPS (runs are doc-id-disjoint by construction: splits own
     contiguous id ranges, salted sub-ranges are contiguous too — so
     merge = sort_array + flatten, zero re-encode), write ``postings/``
     partitioned by term_bucket + broadcastable ``dict/`` + ``docs/``.

Why staging instead of re-deriving splits from the source every job
(the v1 design): each segment job used to re-shuffle the WHOLE corpus
for dedupe + window, and tokenization ran twice (doc_len pass + tf
pass). Staging costs one extra write of the corpus but makes every
split job a pruned scan, halves the tokenize work, and collapses the
job count — measured scaling efficiency went from 0.37 to this design.
At petabyte scale you skip the copy by partitioning the source table
itself on the split expression (Iceberg partition transform) — the
split jobs then prune on the source directly; the engine only needs
"read split i cheaply".

Skew (C4): ``documents``-style corpora where every term is hot
(FIXTURES.md §1) would put a term's whole split into one encode task.
Terms whose GLOBAL df exceeds ``salt_threshold`` are range-salted on
doc_id (salts are CONTIGUOUS doc ranges inside a split, so runs stay
disjoint). AQE cannot do this — it splits skewed join partitions, not
aggregation groups (SURVEY.md §4.2).

Index layout (consumed by indexed_search / streaming finalize alike):
  staged_corpus/split_id=N/   doc_id, repo, path, commit, lang,
                              content_sha256, content   (build-time only)
  tf_staged/split_NNNN/       doc_id, term, tf, dl
  manifest/split_NNNN.json    lineage + metrics per split
  docs/        doc_id, repo, path, commit, lang, dl, content_sha256, split_id
  stats.json   n_docs, avgdl, n_splits, n_buckets, tokenizer, k1, b
  postings/term_bucket=K/     term, split_id, df, cf, first/last_doc_id, blocks
  dict/        term, term_bucket, df, cf, idf
  manifest/merge.json         global metrics (compressed_bytes, n_terms, …)
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

RUN_SCHEMA = T.StructType(
    list(SEGMENT_SCHEMA.fields) + [T.StructField("split_id", T.IntegerType())]
)


def _stats_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats.json")


def _staging_path(index_dir: str) -> str:
    return os.path.join(index_dir, "staging.json")


def read_stats(index_dir: str) -> dict:
    with open(_stats_path(index_dir)) as f:
        return json.load(f)


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def _doc_key_split(n_splits: int):
    return F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_splits)).cast("int")


def stage_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_splits: int,
    n_buckets: int,
    tokenizer: str,
) -> dict:
    """Phase A. Returns the frozen staging info. Skipped when already
    staged — doc ids are FROZEN across resumes (SURVEY.md §3.1)."""
    if os.path.exists(_staging_path(index_dir)):
        with open(_staging_path(index_dir)) as f:
            return json.load(f)
    os.makedirs(index_dir, exist_ok=True)

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
    staged = (
        with_split
        .withColumn("doc_id", offset_col + F.row_number().over(w).cast("long") - 1)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .select("split_id", "doc_id", "repo", "path", "commit", "lang",
                "content_sha256", "content")
    )
    (staged.write.mode("overwrite").partitionBy("split_id")
     .parquet(os.path.join(index_dir, "staged_corpus")))

    info = {
        "n_docs": acc,
        "n_splits": n_splits,
        "n_buckets": n_buckets,
        "tokenizer": tokenizer,
        "split_counts": {str(k): v for k, v in counts.items()},
        "split_offsets": {str(k): v for k, v in offsets.items()},
    }
    _write_json_atomic(_staging_path(index_dir), info)
    return info


def build_split_tf(
    spark: SparkSession,
    index_dir: str,
    split_id: int,
    info: dict,
    source_desc: str = "",
) -> dict:
    """Phase B for one split: pruned scan → tokenize once → tf + dl.
    Atomic: temp write → rename → manifest."""
    tokenizer = info["tokenizer"]
    count = info["split_counts"].get(str(split_id), 0)
    out_dir = os.path.join(index_dir, "tf_staged", f"split_{split_id:04d}")
    tmp_dir = os.path.join(index_dir, "tf_staged", f"_tmp_split_{split_id:04d}")
    tf_schema = "doc_id long, term string, tf long, dl long"

    if count == 0:
        spark.createDataFrame([], tf_schema).write.mode("overwrite").parquet(out_dir)
        metrics = {"n_docs": 0, "n_postings": 0, "n_terms": 0, "cf": 0,
                   "sum_dl": 0, "sha_crc_sum": 0, "input": source_desc}
        M.write_split_manifest(index_dir, split_id, metrics)
        return metrics

    split_rows = spark.read.parquet(
        os.path.join(index_dir, "staged_corpus")
    ).where(F.col("split_id") == split_id)  # directory partition pruning

    tok = P.with_tokens(
        split_rows.select("doc_id", "content", "content_sha256"),
        "content", mode=tokenizer, use_udf=True,
    ).select("doc_id", "tokens", "content_sha256")
    # carry dl through the explode → tf agg needs no doc_len join
    exploded = tok.select(
        "doc_id",
        F.size("tokens").cast("long").alias("dl"),
        F.explode("tokens").alias("term"),
    )
    tf = exploded.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    ).select("doc_id", "term", "tf", "dl")

    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    tf.write.mode("overwrite").parquet(tmp_dir)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp_dir, out_dir)

    # metrics from the durably written data (BASELINE.json:6 lineage)
    done = spark.read.parquet(out_dir)
    mrow = done.agg(
        F.count("*").alias("n_postings"),
        F.countDistinct("term").alias("n_terms"),
        F.sum("tf").alias("cf"),
    ).collect()[0]
    drow = done.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs_tok"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    sha_crc = split_rows.agg(
        F.sum(F.crc32("content_sha256")).alias("s")).collect()[0]["s"]
    metrics = {
        "n_docs": int(count),
        "n_docs_tokenized": int(drow["n_docs_tok"] or 0),
        "n_postings": int(mrow["n_postings"] or 0),
        "n_terms": int(mrow["n_terms"] or 0),
        "cf": int(mrow["cf"] or 0),
        "sum_dl": int(drow["sum_dl"] or 0),
        "sha_crc_sum": int(sha_crc or 0),
        "input": source_desc,
    }
    M.write_split_manifest(index_dir, split_id, metrics)
    return metrics


def _encode_run(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (term[, split], salt) group → one
    sorted, block-compressed posting run."""
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


def _encode_run_with_split(pdf: pd.DataFrame) -> pd.DataFrame:
    out = _encode_run(pdf)
    out["split_id"] = int(pdf["split_id"].iloc[0])
    return out


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    info: dict,
    salt_threshold: int = 1 << 20,
    n_salts: int = 8,
) -> dict:
    """Phase C — exact stats, salted block encode, run merge, final
    layout. Idempotent (pure function of the staged data)."""
    n_splits = info["n_splits"]
    n_buckets = info["n_buckets"]
    manifests = [M.read_split_manifest(index_dir, s) for s in range(n_splits)]
    n_docs = sum(m["n_docs"] for m in manifests)
    sum_dl = sum(m["sum_dl"] for m in manifests)
    n_docs_tok = sum(m.get("n_docs_tokenized", m["n_docs"]) for m in manifests)
    # docs with zero tokens contribute dl=0 to avgdl
    avgdl = sum_dl / n_docs if n_docs else 0.0

    staged = spark.read.parquet(os.path.join(index_dir, "tf_staged", "split_*"))

    # C4: global hot-term detection (exact df), broadcast the hot set
    df_global = staged.groupBy("term").agg(F.count("*").alias("df"))
    hot = df_global.where(F.col("df") > salt_threshold).select("term")
    offsets = {int(k): v for k, v in info["split_offsets"].items()}
    counts = {int(k): max(v, 1) for k, v in info["split_counts"].items()}
    split_ids = sorted(offsets)
    off_arr = F.array(*[F.lit(offsets[s]) for s in split_ids])
    cnt_arr = F.array(*[F.lit(counts.get(s, 1)) for s in split_ids])
    # doc_id → split via offset bisect-free lookup: splits own contiguous
    # ranges [offset, offset+count); derive split from the staged layout
    # instead of re-hashing keys (content keys aren't in tf rows)
    split_col = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_splits - 1)),
        F.lit(0),
        lambda acc, s: F.when(
            F.col("doc_id") >= F.element_at(off_arr, s + 1), s
        ).otherwise(acc),
    ).cast("int")
    tfn = (F.col("tf") * F.lit(K1 + 1.0)) / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(float(avgdl or 1.0)))
    )
    enriched = (
        staged.withColumn("split_id", split_col)
        .withColumn("tfn", tfn.cast("float"))
        .join(F.broadcast(hot.withColumn("is_hot", F.lit(True))), "term", "left")
    )
    offset_col = F.element_at(off_arr, F.col("split_id") + 1)
    span_col = F.element_at(cnt_arr, F.col("split_id") + 1)
    salt_expr = F.floor(
        (F.col("doc_id") - offset_col) * F.lit(n_salts) / span_col).cast("int")
    enriched = enriched.withColumn(
        "salt", F.when(F.col("is_hot").isNotNull(), salt_expr).otherwise(F.lit(0))
    ).drop("is_hot")

    runs = enriched.groupBy("term", "split_id", "salt").applyInPandas(
        _encode_run_with_split, RUN_SCHEMA)
    merged = (
        runs
        .withColumn("term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
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
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    dictionary = postings.groupBy("term", "term_bucket").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    ).select(
        "term", "term_bucket", "df", "cf",
        F.log1p((F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)).alias("idf"),
    )
    dictionary.write.mode("overwrite").parquet(os.path.join(index_dir, "dict"))

    # docs/: staged metadata + dl (docs with no tokens → dl 0)
    dl_per_doc = staged.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    docs = (
        spark.read.parquet(os.path.join(index_dir, "staged_corpus"))
        .select("doc_id", "repo", "path", "commit", "lang",
                "content_sha256", "split_id")
        .join(dl_per_doc, "doc_id", "left")
        .withColumn("dl", F.coalesce("dl", F.lit(0)).cast("long"))
        .select("doc_id", "repo", "path", "commit", "lang", "dl",
                "content_sha256", "split_id")
    )
    docs.write.mode("overwrite").parquet(os.path.join(index_dir, "docs"))

    merge_metrics_row = postings.agg(
        F.count("*").alias("n_rows"),
        F.sum(
            F.aggregate(
                "blocks", F.lit(0).cast("long"),
                lambda acc, b: acc + F.length(b["docs"]) + F.length(b["tfs"]),
            )
        ).alias("compressed_bytes"),
        F.sum("df").alias("n_postings"),
    ).collect()[0]
    n_terms = dictionary.count()
    stats = {
        "n_docs": n_docs,
        "n_docs_tokenized": n_docs_tok,
        "avgdl": avgdl,
        "n_splits": n_splits,
        "n_buckets": n_buckets,
        "tokenizer": info["tokenizer"],
        "split_counts": info["split_counts"],
        "split_offsets": info["split_offsets"],
        "k1": K1,
        "b": B,
    }
    _write_json_atomic(_stats_path(index_dir), stats)
    merge_metrics = {
        "n_terms": int(n_terms),
        "n_posting_rows": int(merge_metrics_row["n_rows"] or 0),
        "n_postings": int(merge_metrics_row["n_postings"] or 0),
        "compressed_bytes": int(merge_metrics_row["compressed_bytes"] or 0),
        "salt_threshold": salt_threshold,
        "n_salts": n_salts,
    }
    _write_json_atomic(os.path.join(index_dir, "manifest", "merge.json"),
                       merge_metrics)
    with open(os.path.join(index_dir, "_INDEX_SUCCESS"), "w") as f:
        json.dump(merge_metrics, f)
    return stats


def drop_staged_corpus(index_dir: str) -> None:
    """Reclaim the staging copy once a build is final (content itself is
    not part of the served index)."""
    p = os.path.join(index_dir, "staged_corpus")
    if os.path.exists(p):
        shutil.rmtree(p)


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
    (C6 kill-resume test): raise after that many split jobs complete.

    Re-invoking after a crash resumes: staging is skipped if frozen,
    done splits are skipped via the manifest, finalize re-runs
    idempotently. Split jobs are independent (disjoint pruned inputs,
    disjoint outputs, per-split manifests), so up to
    ``max_concurrent_splits`` run as concurrent Spark jobs from driver
    threads — the scheduler interleaves their stages, hiding per-job
    fixed overhead without weakening atomicity or resume semantics.
    """
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(index_dir, exist_ok=True)
    info = stage_corpus(spark, corpus, index_dir, n_splits, n_buckets, tokenizer)
    pending = M.pending_splits(index_dir, info["n_splits"])
    if fail_after_splits is not None:
        to_run, to_fail = pending[:fail_after_splits], pending[fail_after_splits:]
    else:
        to_run, to_fail = pending, []

    def run(split_id: int) -> None:
        build_split_tf(spark, index_dir, split_id, info, source_desc=source_desc)

    if max_concurrent_splits <= 1 or len(to_run) <= 1:
        for split_id in to_run:
            run(split_id)
    else:
        with ThreadPoolExecutor(max_workers=max_concurrent_splits) as pool:
            for _ in pool.map(run, to_run):
                pass
    if to_fail:
        raise RuntimeError(f"injected failure before splits {to_fail}")
    return finalize_index(spark, index_dir, info,
                          salt_threshold=salt_threshold, n_salts=n_salts)
