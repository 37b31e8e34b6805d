"""Training-data-pipeline operators: dedup (exact / jaccard / minhash /
simhash), ANN (brute force + IVF), text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datastream_io_spark.operators import dataprep as DP
from datastream_io_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs_with_dups(spark, documents):
    """documents plus exact duplicates of the first 20 docs (new ids)."""
    dups = (documents.orderBy("doc_id").limit(20)
            .withColumn("doc_id", F.col("doc_id") + 100000))
    return documents.unionByName(dups)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_dedup_exact(spark, documents, docs_with_dups):
    groups = DP.dedup_exact_groups(docs_with_dups)
    assert groups.where(F.col("n_dups") >= 2).count() >= 20
    survivors = DP.dedup_exact_keep_first(docs_with_dups)
    assert survivors.count() == documents.select("text").distinct().count()
    # survivors keep the LOWEST id → none of the +100000 clones survive
    # unless their original text was itself a dup with a lower clone id
    assert survivors.where(F.col("doc_id") >= 100000).count() == 0


def test_fingerprint_catches_whitespace_only_dups(spark, documents):
    messy = documents.limit(10).withColumn(
        "text", F.concat(F.lit("  "), F.upper("text"), F.lit("   "))
    ).withColumn("doc_id", F.col("doc_id") + 200000)
    both = documents.limit(10).unionByName(messy)
    fp = DP.doc_fingerprint(both)
    # every messy clone shares its original's fingerprint
    assert fp.groupBy("fingerprint").count().where("count = 2").count() == 10


def test_ngram_jaccard_pairs(spark, docs_with_dups):
    pairs = DP.ngram_jaccard_pairs(docs_with_dups, n=3, threshold=0.99)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # each injected exact dup pairs with its original at jaccard 1.0
    expect = {(i, i + 100000) for i in range(20)}
    assert expect <= got
    for r in pairs.collect():
        assert 0.99 <= r.jaccard <= 1.0


def test_minhash_lsh_finds_exact_dups(spark, docs_with_dups):
    cand = DP.minhash_lsh_candidates(docs_with_dups, n_hashes=32, n_bands=8)
    got = {(r.doc_a, r.doc_b): r.n_bands_agree for r in cand.collect()}
    for i in range(20):
        assert got.get((i, i + 100000)) == 8, \
            f"exact dup {i} not found in all bands"


def test_minhash_deterministic_across_runs(spark, documents):
    s1 = DP.minhash_signatures(documents.limit(50)).collect()
    s2 = DP.minhash_signatures(documents.limit(50).repartition(7)).collect()
    d1 = {r.id: r.sig for r in s1}
    d2 = {r.id: r.sig for r in s2}
    assert d1 == d2


def test_simhash_prefix_candidates(spark, docs_with_dups):
    sims = DP.simhash64(docs_with_dups)
    by_id = {r.id: r.simhash for r in sims.collect()}
    for i in range(20):
        assert by_id[i] == by_id[i + 100000]  # identical docs → same hash
    cand = DP.simhash_prefix_candidates(docs_with_dups, prefix_bits=12,
                                        max_hamming=0)
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert {(i, i + 100000) for i in range(20)} <= got


def test_cosine_bruteforce_vs_numpy(spark, embeddings):
    pdf = embeddings.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = mat[0]
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:10]
    expect = [(int(pdf["vec_id"].iloc[i]), cos[i]) for i in order]
    got = DP.cosine_topk_bruteforce(embeddings, [float(v) for v in q],
                                    k=10).collect()
    assert [r.vec_id for r in got] == [e[0] for e in expect]
    for r, e in zip(got, expect):
        assert r.cos == pytest.approx(e[1], abs=1e-9)


def test_ivf_recall(spark, embeddings):
    cents = DP.train_centroids(embeddings, n_clusters=8, n_iters=5)
    pdf = embeddings.toPandas()
    q = list(map(float, pdf["embedding"].iloc[3]))
    exact = [r.vec_id for r in
             DP.cosine_topk_bruteforce(embeddings, q, k=10).collect()]
    approx = [r.vec_id for r in
              DP.ivf_topk(embeddings, cents, q, k=10, nprobe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    assert approx[0] == exact[0] == 3  # the query vector itself


def test_text_quality_and_token_counts(spark, documents):
    tq = DP.text_quality(documents).toPandas().set_index("doc_id")
    docs = documents.select("doc_id", "text", "n_chars").toPandas()
    for _, row in docs.head(50).iterrows():
        toks = row.text.split()
        assert tq.loc[row.doc_id, "n_tokens"] == len(toks)
        assert tq.loc[row.doc_id, "stopword_ratio"] >= 0
    tc = DP.token_count_bpe_ish(documents).toPandas().set_index("doc_id")
    assert (tc["n_words"] == tq["n_tokens"]).all()
    assert (tc["n_bpe_pieces"] >= tc["n_words"]).all()


def test_lang_id_heuristic(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps", "你好 世界 这是 中文 文本 测试",
                 "càfé déjà vu naïve résumé"],
    }))
    got = {r.doc_id: r.lang_guess
           for r in DP.lang_id_heuristic(df).collect()}
    assert got == {1: "en-like", 2: "zh", 3: "latin-ext"}


def test_multimodal_features(spark):
    media = MM.synth_media_df(spark, n=48)
    feats = MM.extract_features(media, feat_dim=8)
    rows = feats.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r.feat) == 8
        assert r.n_bytes == r.width * r.height
        assert len(r.sha256) == 64
    # deterministic across partitioning
    feats2 = MM.extract_features(media.repartition(11), feat_dim=8)
    a = {r.media_id: (r.sha256, r.feat) for r in rows}
    b = {r.media_id: (r.sha256, r.feat) for r in feats2.collect()}
    assert a == b


def test_multimodal_stub_guard(spark):
    media = MM.synth_media_df(spark, n=4)
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, use_real_decoder=True)


def test_frame_sample_plan(spark):
    media = MM.synth_media_df(spark, n=30)
    plan = MM.frame_sample_plan(media, every_n=3)
    rows = plan.collect()
    assert all(r.frame_idx % 3 == 0 for r in rows)
    videos = media.where("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == videos


def test_mulmod_m61_matches_python_bigint():
    """The uint64 limb-split mulmod must equal exact Python-int math on
    random 61-bit operands (including the a=M-1, x=M-1 extremes)."""
    M = (1 << 61) - 1
    rng = np.random.default_rng(3)
    a = np.concatenate([rng.integers(1, M, 2000), [1, M - 1, M - 1]]).astype(np.uint64)
    x = np.concatenate([rng.integers(0, M, 2000), [M - 1, 1, M - 1]]).astype(np.uint64)
    got = DP._mulmod_m61(a, x)
    exp = [(int(ai) * int(xi)) % M for ai, xi in zip(a, x)]
    assert [int(v) for v in got] == exp


def test_fnv_hash_matches_reference():
    """Vectorized byte-column FNV-1a must equal the scalar definition."""
    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for c in b:
            h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    toks = [b"a", b"quick", b"brown_fox", b"x" * 40, b"\xc3\xa9t\xc3\xa9"]
    arr = np.array(toks, dtype=np.bytes_)
    got = DP._hash_tokens_u64(arr)
    assert [int(v) for v in got] == [fnv(t) for t in toks]


def test_minhash_pinned_signatures(spark):
    """Frozen r2 signatures (deliberate re-freeze after the vectorized
    refactor, VERDICT r1 #5): catches any accidental future change to
    the hash function, permutation params, or empty-doc sentinel."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox", "", "the the the repeated token stream"],
    }))
    got = {r.id: list(r.sig) for r in
           DP.minhash_signatures(df, n_hashes=8).collect()}
    M = (1 << 61) - 1
    assert got[1] == [600382608101394898, 962596368954793391,
                      409667055127982167, 77296394005221511,
                      37590851779411518, 364315699182626964,
                      78911783084588567, 188673007753320157]
    assert got[2] == [M] * 8
    assert got[3] == [851563980120501981, 9661444814473076,
                      69254620799244216, 262624996605791070,
                      987350586890891551, 364315699182626964,
                      82612517590492345, 188673007753320157]


def test_ngram_jaccard_max_shingle_df(spark):
    """A block-ubiquitous shingle must stop generating candidates under
    the df ceiling while true near-dup pairs survive."""
    import pandas as pd
    texts = {0: "alpha beta gamma delta unique0 thing0",
             1: "alpha beta gamma delta unique0 thing0"}
    for i in range(2, 10):
        texts[i] = f"alpha beta gamma delta unique{i} thing{i}"
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(texts), "source": "s",
        "text": [texts[i] for i in texts]}))

    loose = DP.ngram_jaccard_pairs(df, n=3, threshold=0.01)
    capped = DP.ngram_jaccard_pairs(df, n=3, threshold=0.01,
                                    max_shingle_df=3)
    n_loose, n_capped = loose.count(), capped.count()
    assert n_capped < n_loose  # hot shingles no longer pair everyone
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (0, 1) in got  # the real dup pair survives the ceiling


def test_embedding_neardup_pairs(spark, embeddings):
    """SRP-LSH near-dup: planted noisy clones are all recovered, every
    reported pair is truly >= threshold (numpy oracle), deterministic
    across partitioning."""
    pdf = embeddings.limit(64).toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    rng = np.random.default_rng(9)
    clones = mat[:8] + rng.normal(0, 0.01, mat[:8].shape)  # cos ≈ 0.999+
    import pandas as pd
    all_pdf = pd.DataFrame({
        "vec_id": list(pdf["vec_id"]) + [10_000 + i for i in range(8)],
        "embedding": [list(map(float, v)) for v in mat]
                     + [list(map(float, v)) for v in clones],
    })
    df = spark.createDataFrame(all_pdf)
    got = DP.embedding_neardup_pairs(df, threshold=0.99, n_bits=12,
                                     n_bands=6).collect()
    pairs = {(r.vec_a, r.vec_b) for r in got}
    for i in range(8):
        assert (int(pdf["vec_id"].iloc[i]), 10_000 + i) in pairs
    # numpy verification of every reported cosine
    vecs = {int(r): np.array(v, np.float64)
            for r, v in zip(all_pdf["vec_id"], all_pdf["embedding"])}
    for r in got:
        a, b = vecs[r.vec_a], vecs[r.vec_b]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.cos == pytest.approx(round(cos, 6), abs=1e-6)
        assert cos >= 0.99
    got2 = {(r.vec_a, r.vec_b) for r in
            DP.embedding_neardup_pairs(df.repartition(13), threshold=0.99,
                                       n_bits=12, n_bands=6).collect()}
    assert pairs == got2


def test_simhash_rotations_recover_prefix_split_pairs(spark):
    """A hamming-1 pair differing in the TOP bit is invisible to the
    rotation-0 prefix bucket but found once a rotation moves the
    matching low bits into the prefix."""
    import pandas as pd
    sims = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2],
        "simhash": [int(np.int64(np.uint64(0x8000000000000001).astype(np.int64))),
                    1],
    }))
    none = DP._simhash_prefix_pairs(sims, prefix_bits=16, max_hamming=2,
                                    n_rotations=1)
    assert none.count() == 0
    found = DP._simhash_prefix_pairs(sims, prefix_bits=16, max_hamming=2,
                                     n_rotations=2)
    assert [(r.doc_a, r.doc_b, r.hamming) for r in found.collect()] == [(1, 2, 1)]


def test_embedding_neardup_empty_input(spark, embeddings):
    empty = embeddings.where("vec_id < 0")
    assert DP.embedding_neardup_pairs(empty, threshold=0.9).count() == 0


def test_multimodal_resize(spark):
    """Resize keeps the media schema (composes with extract_features),
    hits the exact target shape, and is deterministic + correct against
    a numpy nearest-neighbor reference."""
    media = MM.synth_media_df(spark, n=12)
    resized = MM.resize_media(media, target_w=6, target_h=4)
    rows = {r.media_id: r for r in resized.collect()}
    import json as _json
    for r in spark.createDataFrame(media.collect()).collect():
        meta = _json.loads(r.meta)
        img = np.frombuffer(r.payload, np.uint8)[
            : meta["width"] * meta["height"]
        ].reshape(meta["height"], meta["width"])
        ys = np.linspace(0, img.shape[0] - 1, 4).round().astype(int)
        xs = np.linspace(0, img.shape[1] - 1, 6).round().astype(int)
        exp = img[ys][:, xs]
        got = rows[r.media_id]
        gmeta = _json.loads(got.meta)
        assert (gmeta["width"], gmeta["height"]) == (6, 4)
        assert np.array_equal(
            np.frombuffer(got.payload, np.uint8).reshape(4, 6), exp)
    # downstream composition: features over resized media see 6x4
    feats = MM.extract_features(resized).collect()
    assert all((r.width, r.height) == (6, 4) for r in feats)
    assert all(r.n_bytes == 24 for r in feats)
    # stub guard intact
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        MM.resize_media(media, 4, 4, use_real_decoder=True)


def test_connected_components_vs_union_find(spark):
    """Large-star/small-star CC ≡ pure-Python union-find on random
    graphs with chains, cliques, cycles and singletons."""
    import random

    from datastream_io_spark.operators.dataprep import (
        connected_components, dedup_cluster_assign)

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = set()
        # chains (long diameter), a clique, a cycle, random noise
        for s in (0, 10, 20):
            for i in range(s, s + 7):
                edges.add((i, i + 1))
        for a in range(30, 35):
            for b in range(a + 1, 35):
                edges.add((a, b))
        edges |= {(40, 41), (41, 42), (42, 40)}
        for _ in range(15):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))

        par = list(range(n))

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                par[max(ra, rb)] = min(ra, rb)
        exp = {}
        nodes_in_pairs = {x for e in edges for x in e}
        for x in nodes_in_pairs:
            exp[x] = find(x)
        # canonical: component = min member id
        min_of = {}
        for x, r in exp.items():
            min_of[r] = min(min_of.get(r, x), x)
        exp = {x: min_of[r] for x, r in exp.items()}

        pairs = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "doc_a long, doc_b long")
        got = {int(r["doc_id"]): int(r["component"]) for r in
               connected_components(spark, pairs).collect()}
        assert got == exp, trial

        # survivor assignment over the full node range incl. singletons
        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        assign = {int(r["doc_id"]): (int(r["component"]), bool(r["keep"]))
                  for r in dedup_cluster_assign(docs, pairs).collect()}
        assert len(assign) == n
        for i in range(n):
            comp = exp.get(i, i)
            assert assign[i] == (comp, i == comp), i


def test_connected_components_empty_pairs(spark):
    from datastream_io_spark.operators.dataprep import (
        connected_components, dedup_cluster_assign)

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(spark, pairs).count() == 0
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = {int(r["doc_id"]): (int(r["component"]), bool(r["keep"]))
            for r in dedup_cluster_assign(docs, pairs).collect()}
    assert rows == {1: (1, True), 2: (2, True)}
