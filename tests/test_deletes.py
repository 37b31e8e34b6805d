"""Q15 tombstone deletes: deleted docs vanish from EVERY query mode,
survivors keep their exact scores (live-docs semantics — corpus stats
unchanged until rebuild, as documented)."""

import pytest

from datastream_io_spark.operators.boolean_search import search_boolean
from datastream_io_spark.operators.build import build_index
from datastream_io_spark.operators.indexed_search import (
    delete_docs,
    search_indexed,
    search_many,
)
from datastream_io_spark.sources.scan import documents_as_corpus
from tests.conftest import SF0001


@pytest.fixture()
def del_index(spark, tmp_path):
    idx = str(tmp_path / "del_idx")
    build_index(spark, documents_as_corpus(spark, SF0001), idx,
                n_splits=2, n_buckets=8, tokenizer="simple",
                positions=True)
    return idx


def _ids(rows):
    return [r.doc_id for r in rows]


def test_deletes_apply_to_every_mode(spark, del_index):
    q = "window agg"
    before = {
        mode: search_indexed(spark, del_index, q, 10, mode).collect()
        for mode in ("and", "or", "phrase")
    }
    bool_before = search_boolean(spark, del_index, "window OR agg", 10).collect()
    victims = set(_ids(before["and"])[:3])

    n = delete_docs(spark, del_index, doc_ids=sorted(victims))
    assert n == 3
    # idempotent + mergeable
    assert delete_docs(spark, del_index, doc_ids=sorted(victims)) == 3

    for mode, prev in before.items():
        got = search_indexed(spark, del_index, q, 10, mode).collect()
        assert not (set(_ids(got)) & victims), mode
        # survivors keep their exact scores and relative order
        surv = [(r.doc_id, round(r.score, 9)) for r in prev
                if r.doc_id not in victims]
        gotp = [(r.doc_id, round(r.score, 9)) for r in got]
        assert gotp[:len(surv)] == surv, mode
        # the freed slots are refilled (corpus has >10 matches)
        assert len(got) == 10, mode

    got_bool = search_boolean(spark, del_index, "window OR agg", 10).collect()
    assert not (set(_ids(got_bool)) & victims)
    surv = [(r.doc_id, round(r.score, 9)) for r in bool_before
            if r.doc_id not in victims]
    assert [(r.doc_id, round(r.score, 9)) for r in got_bool][:len(surv)] == surv

    batch = search_many(spark, del_index, {"q": q}, 10, "and").collect()
    assert not ({r.doc_id for r in batch} & victims)


def test_delete_by_predicate(spark, del_index):
    n = delete_docs(spark, del_index, where="lang = 'de'")
    assert n > 0
    got = search_indexed(spark, del_index, "window", 50, "or",
                         with_doc_cols=True).collect()
    assert all(r.lang != "de" for r in got)


def test_delete_args_validated(spark, del_index):
    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, del_index)
    with pytest.raises(ValueError, match="exactly one"):
        delete_docs(spark, del_index, doc_ids=[1], where="lang='x'")
