import pytest

from datastream_io_spark.corpus import corpus_df
from datastream_io_spark.operators.build import build_index
from datastream_io_spark.session import get_spark
from datastream_io_spark.sources.scan import documents_as_corpus, load_table

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
CORPUS_SMALL_N = 600


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests", cores=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def documents(spark):
    return load_table(spark, SF0001, "documents")


@pytest.fixture(scope="session")
def doc_index(spark, tmp_path_factory):
    """Shared index over sf0.001 documents (simple tokenizer). The tiny
    salt_threshold forces the C4 salting path on this all-hot corpus."""
    idx = str(tmp_path_factory.mktemp("doc_index"))
    corpus = documents_as_corpus(spark, SF0001)
    build_index(spark, corpus, idx, n_splits=3, n_buckets=8,
                tokenizer="simple", salt_threshold=50, n_salts=4,
                source_desc=f"{SF0001}/documents.parquet")
    return idx


@pytest.fixture(scope="session")
def pos_index(spark, tmp_path_factory):
    """Positional documents index (phrase/highlight/boolean suites)."""
    idx = str(tmp_path_factory.mktemp("pos_index"))
    corpus = documents_as_corpus(spark, SF0001)
    build_index(spark, corpus, idx, n_splits=3, n_buckets=8,
                tokenizer="simple", salt_threshold=50, n_salts=4,
                positions=True)
    return idx


@pytest.fixture(scope="session")
def pos_pdf(spark, pos_index):
    corpus = documents_as_corpus(spark, SF0001)
    return docs_with_text(spark, pos_index, corpus).toPandas()


@pytest.fixture(scope="session")
def code_corpus(spark):
    return corpus_df(spark, CORPUS_SMALL_N, n_partitions=8)


@pytest.fixture(scope="session")
def code_index(spark, code_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("code_index"))
    build_index(spark, code_corpus, idx, n_splits=3, n_buckets=16,
                tokenizer="code", salt_threshold=200, n_salts=4,
                source_desc=f"synthetic corpus n={CORPUS_SMALL_N}")
    return idx


def docs_with_text(spark, index_dir, corpus):
    """Docs table in the index's id space, with text joined back."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{index_dir}/docs")
    return docs.join(corpus, ["repo", "path", "commit"]).select(
        "doc_id", F.col("content").alias("text")
    )
