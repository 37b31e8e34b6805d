"""Doc store (VERDICT r4 Missing #2): ``store_content=True`` carries
raw content into ``docs/`` so the served index answers snippets with
the source corpus unmounted. Pins: parity with the corpus-arg path,
source-deleted serving, column pruning of metadata reads, lifecycle
survival (delete + purge), and the frozen-settings contract."""

import os
import shutil

import pytest

from datastream_io_spark.corpus import corpus_df
from datastream_io_spark.operators.build import (
    build_index,
    drop_staged_corpus,
    purge_deleted,
    stage_plan,
)
from datastream_io_spark.operators.indexed_search import (
    delete_docs,
    snippets,
)


@pytest.fixture(scope="module")
def store_setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("docstore")
    src = str(root / "corpus_src")
    corpus_df(spark, 300, n_partitions=4).write.mode("overwrite").parquet(src)
    idx = str(root / "idx_store")
    build_index(spark, spark.read.parquet(src), idx, n_splits=2,
                n_buckets=8, tokenizer="code", positions=True,
                store_content=True)
    return src, idx


def test_store_serves_snippets_without_corpus(spark, store_setup,
                                              tmp_path):
    src, idx = store_setup
    corpus = spark.read.parquet(src)
    want = [tuple(r) for r in
            snippets(spark, idx, corpus, "parse config", 5,
                     "and").collect()]
    assert want, "fixture query must match"
    got = [tuple(r) for r in
           snippets(spark, idx, None, "parse config", 5,
                    "and").collect()]
    assert got == want

    # the store keeps serving with BOTH the source corpus and the
    # staging copy gone — the index is self-contained
    moved = str(tmp_path / "idx_moved")
    shutil.copytree(idx, moved)
    drop_staged_corpus(moved)
    assert not os.path.exists(os.path.join(moved, "staged_corpus"))
    got2 = [tuple(r) for r in
            snippets(spark, moved, None, "parse config", 5,
                     "and").collect()]
    assert got2 == want


def test_store_invisible_to_metadata_reads(spark, store_setup):
    """Column pruning: the display join must not drag the content
    column through the scan (ReadSchema excludes it)."""
    from datastream_io_spark.operators.indexed_search import Searcher

    _, idx = store_setup
    s = Searcher(spark, idx)
    df = s.search("parse config", 5, "and", with_doc_cols=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    for m in re.finditer(r"ReadSchema: [^\n]*", plan):
        if "repo" in m.group(0):  # the docs-side scan
            assert "content:" not in m.group(0), m.group(0)
    assert df.count() > 0


def test_store_without_flag_raises(spark, tmp_path):
    idx = str(tmp_path / "idx_nostore")
    build_index(spark, corpus_df(spark, 120, n_partitions=2), idx,
                n_splits=2, n_buckets=8, tokenizer="code",
                positions=True)
    with pytest.raises(ValueError, match="stores no content"):
        snippets(spark, idx, None, "parse config", 3, "and").collect()


def test_store_survives_delete_and_purge(spark, store_setup, tmp_path):
    _, idx = store_setup
    victim = str(tmp_path / "idx_lifecycle")
    shutil.copytree(idx, victim)
    # wide baseline: deletes promote lower-ranked docs into the top-10
    before = {r.doc_id: r.snippet for r in
              snippets(spark, victim, None, "parse config", 500,
                       "and").collect()}
    delete_docs(spark, victim, where="lang = 'go'", max_frac=None)
    live = [tuple(r) for r in
            snippets(spark, victim, None, "parse config", 10,
                     "and").collect()]
    assert live and all(d in before for d, *_ in live)
    purge_deleted(spark, victim)
    after = [tuple(r) for r in
             snippets(spark, victim, None, "parse config", 10,
                      "and").collect()]
    # purge keeps doc_ids, so the surviving docs' snippets are stable
    assert {d for d, *_ in after} == {d for d, *_ in live}
    for d, _, snip, _ in after:
        assert before[d] == snip


def test_store_is_a_frozen_setting(spark, store_setup):
    """A resume/worker that disagrees on store_content must fail loudly
    — half-stored docs splits would silently serve partial snippets."""
    src, idx = store_setup
    with pytest.raises(ValueError, match="staged with"):
        stage_plan(spark, spark.read.parquet(src), idx, 2, 8, "code",
                   positions=True, store_content=False)
