"""T1 tokenizer tests: golden camelCase cases, pure-fn ≡ pandas-UDF ≡
Column-op equivalence, and DuckDB regexp oracle for the simple chain."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from datastream_io_spark.functions.tokenize import (
    tokenize_code,
    tokenize_simple,
    tokenize_simple_col,
)
from datastream_io_spark.operators.postings import with_tokens
from tests.conftest import SF0001


def test_simple_golden():
    assert tokenize_simple("the Fast  key!") == ["the", "fast", "key"]
    assert tokenize_simple("") == []
    assert tokenize_simple("  ") == []
    assert tokenize_simple("a_b c") == ["a_b", "c"]


def test_code_golden():
    assert tokenize_code("parseConfig") == ["parseconfig", "parse", "config"]
    assert tokenize_code("def parse_config(x):") == [
        "def", "parse_config", "parse", "config", "x"]
    assert tokenize_code("HTTPServer2") == ["httpserver2", "http", "server", "2"]
    assert tokenize_code("maxRetries") == ["maxretries", "max", "retries"]
    assert tokenize_code("snake_caseAndCamel") == [
        "snake_caseandcamel", "snake", "case", "and", "camel"]
    assert tokenize_code("x") == ["x"]


def test_udf_matches_pure_and_column(spark, documents):
    sample = documents.limit(100)
    udf_rows = with_tokens(sample, "text", "simple", use_udf=True).select(
        "doc_id", "tokens").collect()
    col_rows = with_tokens(sample, "text", "simple", use_udf=False).select(
        "doc_id", "tokens").collect()
    pdf = sample.select("doc_id", "text").toPandas()
    pure = {int(r.doc_id): tokenize_simple(r.text) for r in pdf.itertuples()}
    for u, c in zip(sorted(udf_rows, key=lambda r: r.doc_id),
                    sorted(col_rows, key=lambda r: r.doc_id)):
        assert u.tokens == c.tokens == pure[u.doc_id]


def test_code_udf_matches_pure(spark):
    texts = ["def parseConfig(cfgPath):", "let firstDocId = 0;",
             "impl Iterator for BlockCursor {", ""]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)),
                                             "text": texts}))
    rows = with_tokens(df, "text", "code", use_udf=True).orderBy("doc_id").collect()
    for r, t in zip(rows, texts):
        assert r.tokens == tokenize_code(t)


def test_simple_vs_duckdb_oracle(documents):
    pdf = documents.limit(200).select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    duck = con.sql(
        "SELECT doc_id, list_filter(regexp_split_to_array(lower(text),"
        "'[^a-z0-9_]+'), t -> t <> '') AS toks FROM d ORDER BY doc_id"
    ).fetchall()
    for doc_id, toks in duck:
        assert toks == tokenize_simple(pdf[pdf.doc_id == doc_id].text.iloc[0])


def test_n_chars_matches_length_column(spark, documents):
    # FIXTURES.md: n_chars = length(text) — string-function sanity
    bad = documents.where(F.length("text") != F.col("n_chars")).count()
    assert bad == 0
