"""Q1–Q6 relational BM25 path (SURVEY.md §3.2 fallback / §2.5).

Index-free scoring: tokenize → tf/df/dl → Column-arithmetic BM25 →
groupBy(doc) fold → top-k. This is (a) the self-oracle for the WAND
indexed path (must match bit-for-bit on ranks), (b) directly
DuckDB-expressible, so it anchors the driver correctness gate.

Determinism: per-doc score is a fold over ``sort_array(collect_list(
struct(term, score)))`` — fixed term order, so float summation is
identical at every parallelism level (BASELINE.json:14, SURVEY.md §4.2).

Scale notes: the query-term filter (``term isin q``) lands *before* the
tf aggregate, so the shuffle carries only matching (doc, term) partial
counts; top-k is ``orderBy().limit(k)`` → physical TakeOrderedAndProject
(per-partition heaps + driver merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datastream_io_spark.functions.bm25 import idf_col, tf_norm_col
from datastream_io_spark.functions.tokenize import tokenizer_for
from datastream_io_spark.operators import postings as P


def parse_query(query: str, mode: str = "simple") -> list[str]:
    """Q1 — query string → sorted deduped terms via the exact T1 chain."""
    pure, _ = tokenizer_for(mode)
    return sorted(set(pure(query)))


def parse_phrase(query: str, mode: str = "simple") -> list[str]:
    """Q1 (phrase form) — ORDERED token stream, duplicates kept: phrase
    adjacency is defined over the same token stream the index stores
    (for the ``code`` tokenizer that includes sub-tokens, so the phrase
    ``"parse config"`` matches inside ``parseConfig``)."""
    pure, _ = tokenizer_for(mode)
    return pure(query)


def score_query_terms(
    docs: DataFrame,
    terms: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "simple",
    use_udf: bool = True,
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores for the query terms.

    Returns DataFrame[doc_id, term, score] with df/idf computed over the
    whole corpus (exact) and scoring in pure Column arithmetic.
    """
    tok = P.with_tokens(docs.select(doc_col, F.col(text_col)), text_col,
                        mode=tokenizer, use_udf=use_udf).select(doc_col, "tokens")
    dl = P.doc_len(tok, doc_col)
    n_docs, avgdl = P.corpus_stats(dl)
    terms_df = P.doc_terms(tok, doc_col)
    tf_q = P.term_freq(terms_df.where(F.col("term").isin(terms)), doc_col)
    df_q = P.doc_freq(tf_q)  # df of query terms == df over full corpus
    return (
        tf_q.join(F.broadcast(df_q), "term")
        .join(dl, doc_col)
        .select(
            doc_col,
            "term",
            (idf_col(F.col("df"), n_docs)
             * tf_norm_col(F.col("tf"), F.col("dl"), avgdl)).alias("score"),
        )
    )


def topk_from_scored(scored: DataFrame, n_terms: int, k: int, mode: str,
                     doc_col: str = "doc_id") -> DataFrame:
    """Q4/Q5 + Q6: AND/OR combine with deterministic fold, then top-k."""
    per_doc = scored.groupBy(doc_col).agg(
        F.count("*").alias("n_matched"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "score"))),
            F.lit(0.0),
            lambda acc, x: acc + x["score"],
        ).alias("score"),
    )
    if mode == "and":
        per_doc = per_doc.where(F.col("n_matched") == n_terms)
    return (
        per_doc.select(doc_col, "score")
        .orderBy(F.desc("score"), F.asc(doc_col))
        .limit(k)
    )


def search_relational(
    docs: DataFrame,
    query: str,
    k: int = 10,
    mode: str = "and",
    doc_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "simple",
    use_udf: bool = True,
) -> DataFrame:
    """Q8 (relational form) — full-scan exact BM25 top-k.

    Returns DataFrame[doc_id, score] ordered (score desc, doc_id asc).
    Unknown terms: dropped from scoring; in AND mode a term with df=0
    yields an empty result (docs must match ALL parsed terms).
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    terms = parse_query(query, tokenizer)
    if not terms:
        return docs.select(F.col(doc_col), F.lit(0.0).alias("score")).limit(0)
    scored = score_query_terms(docs, terms, doc_col, text_col, tokenizer, use_udf)
    return topk_from_scored(scored, len(terms), k, mode, doc_col)
