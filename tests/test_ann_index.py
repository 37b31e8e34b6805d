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


def test_ivf_assign_kernel_parity_and_no_literal_tree(spark, embeddings):
    """r6: past IVF_COLUMN_MAX_CENTROIDS the assigner must switch to
    the broadcast-matrix mapInPandas kernel (no nlist×dim literal tree
    in the plan) and agree with the Column-literal path row for row on
    the same codebook."""
    import numpy as np

    cents = DP.train_centroids(embeddings, n_clusters=16, n_iters=5)
    col_path = DP.ivf_assign(embeddings, cents)
    old = DP.IVF_COLUMN_MAX_CENTROIDS
    DP.IVF_COLUMN_MAX_CENTROIDS = 8  # force the kernel for 16 cents
    try:
        kern_path = DP.ivf_assign(embeddings, cents)
    finally:
        DP.IVF_COLUMN_MAX_CENTROIDS = old
    plan = kern_path._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "ArrowEval" in plan
    # the plan must NOT inline the codebook as literals
    assert str(round(float(cents[7][3]), 6))[:6] not in plan
    a = {r["vec_id"]: r["cluster"] for r in col_path.collect()}
    b = {r["vec_id"]: r["cluster"] for r in kern_path.collect()}
    assert a == b


def test_ivf_large_codebook_recall_sweep(spark):
    """r6: nlist=256 through the kernel assigner — recall@10 vs brute
    force must be perfect at full probe and monotone-ish in nprobe."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n, dim = 3000, 16
    X = rng.normal(size=(n, dim))
    pdf = pd.DataFrame({"vec_id": np.arange(n),
                        "embedding": [list(map(float, r)) for r in X]})
    emb = spark.createDataFrame(pdf)
    cents = DP.train_centroids(emb, n_clusters=256, n_iters=4)
    assert len(cents) == 256 > DP.IVF_COLUMN_MAX_CENTROIDS
    assigned = DP.ivf_assign(emb, cents)
    assert assigned.select("cluster").distinct().count() > 32

    q = [float(v) for v in X[123]]
    exact = [r.vec_id for r in
             DP.cosine_topk_bruteforce(emb, q, k=10).collect()]
    recalls = []
    for nprobe in (4, 64, 256):
        got = [r.vec_id for r in
               DP.ivf_topk(assigned, cents, q, k=10,
                           nprobe=nprobe).collect()]
        recalls.append(len(set(got) & set(exact)) / 10)
    assert recalls[-1] == 1.0          # full probe == brute force
    assert recalls[0] <= recalls[-1]   # more probes never lose recall
    assert recalls[1] >= 0.5           # quarter of the codebook: decent
