"""Multi-worker build contract (jobs/build_worker.py semantics): two
workers building disjoint split subsets of a shared index, then a
separate finalize, must produce an index identical to a single-process
build — the basis of the N→4N executor scaling evidence."""

from pyspark.sql import functions as F

from datastream_io_spark.operators.build import (
    build_index,
    build_segment,
    finalize_index,
    stage_corpus,
)
from datastream_io_spark.sources.manifest import done_splits, pending_splits
from datastream_io_spark.sources.scan import documents_as_corpus
from tests.conftest import SF0001


def _fingerprint(spark, index_dir):
    rows = spark.read.parquet(f"{index_dir}/postings").select(
        "term", "split_id", "df", "cf",
        F.md5(F.to_json("blocks")).alias("h"),
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_worker_partitioned_build_equals_single(spark, tmp_path):
    corpus = documents_as_corpus(spark, SF0001)
    multi, single = str(tmp_path / "multi"), str(tmp_path / "single")

    # coordinator: stage-only
    info = stage_corpus(spark, corpus, multi, 4, 8, "simple")
    # "worker 0" and "worker 1" each own split_id % 2 == worker_id
    for wid in (0, 1):
        mine = [s for s in pending_splits(multi, info["n_splits"])
                if s % 2 == wid]
        for s in mine:
            build_segment(spark, multi, s, info, salt_threshold=50, n_salts=4)
    assert done_splits(multi) == {0, 1, 2, 3}
    finalize_index(spark, multi, info, salt_threshold=50, n_salts=4)

    build_index(spark, corpus, single, n_splits=4, n_buckets=8,
                tokenizer="simple", salt_threshold=50, n_salts=4)
    assert _fingerprint(spark, multi) == _fingerprint(spark, single)


def test_dynamic_claims_disjoint_and_complete(spark, tmp_path):
    """Dynamic split claiming (jobs/build_worker.py default): claims are
    exclusive, a claiming fleet builds every split exactly once, and
    release_claims drops only stale (undone) claims."""
    from datastream_io_spark.sources.manifest import (
        claim_split, release_claims)

    corpus = documents_as_corpus(spark, SF0001)
    multi = str(tmp_path / "claimed")
    info = stage_corpus(spark, corpus, multi, 4, 8, "simple")

    assert claim_split(multi, 0, "w0") is True
    assert claim_split(multi, 0, "w1") is False  # exclusive

    # two "workers" pulling lazily: every split claimed exactly once
    built = {"w0": [], "w1": []}
    for wid in ("w0", "w1"):
        for s in pending_splits(multi, info["n_splits"]):
            if claim_split(multi, s, wid):
                build_segment(spark, multi, s, info,
                              salt_threshold=50, n_salts=4)
                built[wid].append(s)
    # w0 already held split 0's claim from the exclusivity probe: it was
    # never built. release stale claims (only undone ones) and re-pull.
    assert done_splits(multi) == {1, 2, 3}
    assert release_claims(multi) == 1  # just split 0's stale claim
    for s in pending_splits(multi, info["n_splits"]):
        if claim_split(multi, s, "w1"):
            build_segment(spark, multi, s, info, salt_threshold=50, n_salts=4)
            built["w1"].append(s)
    assert done_splits(multi) == {0, 1, 2, 3}
    assert sorted(built["w0"] + built["w1"]) == [0, 1, 2, 3]
    assert not (set(built["w0"]) & set(built["w1"]))

    finalize_index(spark, multi, info, salt_threshold=50, n_salts=4)
    single = str(tmp_path / "single2")
    build_index(spark, corpus, single, n_splits=4, n_buckets=8,
                tokenizer="simple", salt_threshold=50, n_salts=4)
    assert _fingerprint(spark, multi) == _fingerprint(spark, single)
