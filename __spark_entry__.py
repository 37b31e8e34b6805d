"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full engine path (phase-A docs → salted
segment build → codec → merge → block-max WAND top-k) over sf0.001
documents. ``queries()``/``oracle_sql()`` — operator catalog from
SURVEY.md §2, implemented in ``datastream_io_spark.driver_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from datastream_io_spark.operators.build import build_index
    from datastream_io_spark.operators.indexed_search import search_indexed
    from datastream_io_spark.sources.scan import documents_as_corpus

    from datastream_io_spark.driver_queries import _dq_tmpdir

    sf_dir = "/root/testdata/sf0.001"
    corpus = documents_as_corpus(spark, sf_dir)
    idx = _dq_tmpdir("entry_index_")
    build_index(spark, corpus, idx, n_splits=2, n_buckets=8,
                tokenizer="simple", salt_threshold=100, n_salts=4,
                source_desc=f"{sf_dir}/documents.parquet")
    topk = search_indexed(spark, idx, "window agg", k=10, mode="and",
                          with_doc_cols=True)
    return topk.select("doc_id", "repo", "path", "lang",
                       F.round("score", 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from datastream_io_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key (keys without
    an oracle get the driver's weaker rows-only check)."""
    from datastream_io_spark.driver_queries import ORACLES

    return dict(ORACLES)
