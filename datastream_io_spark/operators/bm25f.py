"""BM25F per-field scoring (SURVEY.md §2 r4 candidate; VERDICT r3
Missing #3): code-search users expect a path/identifier-field match to
outweigh a body match.

This implements the *simple BM25F* variant (Robertson & Zaragoza,
"The Probabilistic Relevance Framework", 2009 §6.2) with INTEGER field
weights: the per-doc weighted term frequency is

    tf'(t, d) = Σ_f w_f · tf_f(t, d),       dl'(d) = Σ_f w_f · len_f(d)

and the ordinary BM25 saturation is applied to tf'/dl' with shared
length normalization. With integer w_f this is EXACTLY BM25 over a
derived document whose text is each field repeated w_f times — so the
entire existing engine (fused build kernel, codec, block-max WAND,
phrase positions, deletes, streaming) serves BM25F unchanged: the
field weighting is compiled INTO the index at build time, costing
index size proportional to Σ w_f · field_len instead of a second
per-field posting stream, and the query path needs zero changes. The
trade-off vs per-field postings (Lucene's approach): weights are fixed
at build time — re-weighting means re-indexing — which is the right
trade for a serving index whose weights change rarely; the oracle
(DuckDB BM25 over the same repeated-field text) pins the semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fielded_text(field_weights: dict[str, int]):
    """Column: the fields concatenated with each repeated ``w`` times
    (insertion order — deterministic, oracle-replicable). Separators
    are single spaces; both tokenizers treat runs of separators as one
    boundary, so repetition only multiplies token counts."""
    parts = []
    for col, w in field_weights.items():
        if int(w) < 1 or int(w) != w:
            raise ValueError(
                f"field weight for {col!r} must be a positive integer, "
                f"got {w!r} (integer-repetition BM25F)")
        parts.extend([F.col(col)] * int(w))
    return F.concat_ws(" ", *parts)


def bm25f_corpus(corpus: DataFrame,
                 field_weights: dict[str, int]) -> DataFrame:
    """The derived corpus whose plain-BM25 index scores BM25F: content
    is replaced by the weighted field concatenation; doc keys and
    metadata pass through unchanged."""
    missing = [c for c in field_weights if c not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks field columns: {missing}")
    return corpus.withColumn("content", fielded_text(field_weights))


def build_bm25f_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    field_weights: dict[str, int] | None = None,
    **build_kw,
) -> dict:
    """Build a field-weighted index: ``field_weights`` maps corpus
    columns to integer boosts (default: path³ + content¹ — the classic
    code-search shape). Everything else — resume, salting, positions,
    multi-worker fleets — is inherited from :func:`build_index`; the
    recorded weights land in stats.json for introspection."""
    from datastream_io_spark.operators.build import (
        _write_json_atomic,
        build_index,
        read_stats,
    )

    if field_weights is None:
        field_weights = {"path": 3, "content": 1}
    derived = bm25f_corpus(corpus, field_weights)
    stats = build_index(spark, derived, index_dir, **build_kw)
    stats["bm25f_weights"] = {k: int(v) for k, v in field_weights.items()}
    _write_json_atomic(os.path.join(index_dir, "stats.json"), stats)
    return read_stats(index_dir)
