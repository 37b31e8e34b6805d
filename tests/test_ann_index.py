"""Persisted IVF ANN index: partition pruning + recall + parity with
the in-flight ivf_topk path. Plus the §2.11 UDTF demo."""

import pytest
from pyspark.sql import functions as F

from datastream_io_spark.operators import dataprep as DP


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ann_index_prunes_and_matches(spark, embeddings, tmp_path):
    cents = DP.train_centroids(embeddings, n_clusters=8, n_iters=5)
    idx = str(tmp_path / "ann")
    DP.build_ann_index(embeddings, idx, cents)

    q = [float(v) for v in
         embeddings.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
    got = DP.search_ann_index(spark, idx, q, k=10, nprobe=3)

    # physical plan proves directory-level partition pruning on cluster
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan.replace("#", " #").replace(
        "cluster #", "cluster#") or "PartitionFilters" in plan
    fs_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert fs_line and "cluster" in fs_line[0]

    inflight = DP.ivf_topk(embeddings, cents, q, k=10, nprobe=3)
    a = [(r.vec_id, round(r.cos, 9)) for r in got.collect()]
    b = [(r.vec_id, round(r.cos, 9)) for r in inflight.collect()]
    assert a == b
    assert a[0][0] == 7  # query vector finds itself

    exact = [r.vec_id for r in
             DP.cosine_topk_bruteforce(embeddings, q, k=10).collect()]
    recall = len({x[0] for x in a} & set(exact)) / 10
    assert recall >= 0.5


def test_udtf_explode_identifiers(spark):
    """§2.11 UDTF demo (Spark 4 @udtf): content → (term, pos) rows via
    the code tokenizer chain."""
    from pyspark.sql.functions import lit, udtf

    from datastream_io_spark.functions.tokenize import tokenize_code

    @udtf(returnType="term: string, pos: int")
    class ExplodeIdentifiers:
        def eval(self, content: str):
            for pos, term in enumerate(tokenize_code(content or "")):
                yield term, pos

    rows = ExplodeIdentifiers(lit("def parseConfig(x):")).collect()
    assert [(r.term, r.pos) for r in rows] == [
        ("def", 0), ("parseconfig", 1), ("parse", 2), ("config", 3), ("x", 4)]
