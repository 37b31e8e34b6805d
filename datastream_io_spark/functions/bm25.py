"""Q3 — BM25 scoring math (SURVEY.md §2.5).

Okapi BM25 with the Lucene-style non-negative idf
(Robertson & Spärck Jones / TREC-3 Okapi; see PAPERS.md notes):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d)   = Σ_{t ∈ q} idf(t) * tf_norm(t, d)      (t in sorted order)

k1 = 1.2, b = 0.75 (package constants). The summation over query terms is
ALWAYS performed in sorted term order — float addition is non-associative
and BASELINE.json:14 requires score-identical results at every parallelism
level, so no engine path may rely on shuffle arrival order for the sum.

Two mirrors of the same formula: Column arithmetic (JVM whole-stage
codegen — the hot path never crosses into Python for scoring) and plain
Python floats (driver-side WAND bounds, brute-force golden scorer).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from datastream_io_spark import B, K1


def idf_col(df_col: Column, n_docs) -> Column:
    """idf as a Column expression; ``n_docs`` is a literal or Column."""
    n = n_docs if isinstance(n_docs, Column) else F.lit(float(n_docs))
    return F.log1p((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tf_norm_col(tf_col: Column, dl_col: Column, avgdl) -> Column:
    """tf normalization as a Column expression; ``avgdl`` literal/Column."""
    a = avgdl if isinstance(avgdl, Column) else F.lit(float(avgdl))
    return (tf_col * F.lit(K1 + 1.0)) / (
        tf_col + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_col / a)
    )


def idf_py(df: int, n_docs: int) -> float:
    return math.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_norm_py(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


# ANSI-SQL mirror for DuckDB oracles (same constants inlined).
IDF_SQL = "ln(1 + (({n}) - df + 0.5) / (df + 0.5))"
TFN_SQL = "(tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / ({avgdl})))"
