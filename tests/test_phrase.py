"""Phrase-query tests: positional codec → posexplode build → indexed
phrase search, golden-checked against the pandas brute-force phrase
matcher (SURVEY.md §2.5; VERDICT r1 'What's missing' #3)."""

import pytest
from pyspark.sql import functions as F

from datastream_io_spark.golden import brute_force_topk
from datastream_io_spark.operators.build import build_index, read_stats
from datastream_io_spark.operators.indexed_search import (
    Searcher,
    search_indexed,
)
from datastream_io_spark.sources.scan import documents_as_corpus
from tests.conftest import SF0001, docs_with_text


def _check(rows, expected):
    got = [(int(r.doc_id), float(r.score)) for r in rows]
    assert [g[0] for g in got] == [e["doc_id"] for e in expected]
    for g, e in zip(got, expected):
        assert g[1] == pytest.approx(e["score"], abs=1e-9)


PHRASES = ["window agg", "scan merge", "agg window", "sort merge scan",
           "window window"]


def test_phrase_rank_identity_vs_bruteforce(spark, pos_index, pos_pdf):
    for q in PHRASES:
        exp = brute_force_topk(pos_pdf, q, k=10, mode="phrase")
        got = search_indexed(spark, pos_index, q, 10, "phrase").collect()
        _check(got, exp)
        # phrase hits are a subset of the AND hits with identical scores
        and_ids = {r.doc_id for r in
                   search_indexed(spark, pos_index, q, 500, "and").collect()}
        assert {r.doc_id for r in got} <= and_ids


def test_phrase_warm_searcher_matches_cold(spark, pos_index, pos_pdf):
    s = Searcher(spark, pos_index)
    q = "window agg"
    exp = brute_force_topk(pos_pdf, q, k=10, mode="phrase")
    _check(s.search(q, 10, "phrase").collect(), exp)


def test_single_token_phrase_equals_and(spark, pos_index):
    a = [(r.doc_id, round(r.score, 9)) for r in
         search_indexed(spark, pos_index, "window", 10, "phrase").collect()]
    b = [(r.doc_id, round(r.score, 9)) for r in
         search_indexed(spark, pos_index, "window", 10, "and").collect()]
    assert a == b


def test_phrase_on_nonpositional_index_raises(spark, doc_index):
    assert not read_stats(doc_index).get("positions", False)
    with pytest.raises(ValueError, match="positional"):
        search_indexed(spark, doc_index, "window agg", 10, "phrase")


def test_phrase_unknown_term_is_empty(spark, pos_index):
    out = search_indexed(spark, pos_index, "window zzzzunknown", 5, "phrase")
    assert out.count() == 0


def test_phrase_code_tokenizer_subtokens(spark, tmp_path):
    """The code chain stores sub-token positions, so the phrase
    'parse config' matches inside camelCase parseConfig."""
    import pandas as pd

    corpus = spark.createDataFrame(pd.DataFrame({
        "repo": ["r"] * 3, "path": ["a.py", "b.py", "c.py"],
        "commit": ["c"] * 3, "lang": ["py"] * 3,
        "content": ["def parseConfig(x): return x",
                    "def parse(conf): config = conf",
                    "nothing relevant here"],
    }))
    idx = str(tmp_path / "code_pos")
    build_index(spark, corpus, idx, n_splits=2, n_buckets=4,
                tokenizer="code", positions=True)
    got = search_indexed(spark, idx, "parse config", 10, "phrase",
                         with_doc_cols=True).collect()
    assert [r.path for r in got] == ["a.py"]  # b.py has both, not adjacent


def test_and_or_unchanged_on_positional_index(spark, pos_index, pos_pdf):
    """Positions are additive: non-phrase modes on a positional index
    reproduce the brute-force golden exactly."""
    for q, m in [("window agg", "and"), ("scan merge sort", "or")]:
        exp = brute_force_topk(pos_pdf, q, k=10, mode=m)
        _check(search_indexed(spark, pos_index, q, 10, m).collect(), exp)


def test_old_format_index_rejected(spark, tmp_path):
    """A format-1 stats.json (pre per-posting dls) must fail at the
    surface with an actionable message, not an executor KeyError."""
    import json

    idx = str(tmp_path / "old_idx")
    import os
    os.makedirs(idx)
    with open(f"{idx}/stats.json", "w") as f:
        json.dump({"n_docs": 1, "avgdl": 5.0, "n_buckets": 4,
                   "tokenizer": "simple", "n_splits": 1}, f)
    with pytest.raises(ValueError, match="format"):
        search_indexed(spark, idx, "anything", 5, "and")


def test_match_positions_vs_bruteforce(spark, pos_index, pos_pdf):
    """Q10 highlight: per-occurrence (doc, term, pos) from the index
    must equal re-tokenizing the original text."""
    from datastream_io_spark.functions.tokenize import tokenize_simple
    from datastream_io_spark.operators.indexed_search import match_positions

    q = "window agg scan"
    top = search_indexed(spark, pos_index, q, 5, "or").collect()
    ids = [r.doc_id for r in top]
    got = sorted((r.doc_id, r.term, r.pos) for r in
                 match_positions(spark, pos_index, q, ids).collect())
    text_of = dict(zip(pos_pdf["doc_id"], pos_pdf["text"]))
    exp = sorted(
        (d, t, p)
        for d in ids
        for p, t in enumerate(tokenize_simple(text_of[d]))
        if t in {"window", "agg", "scan"})
    assert got == exp


def test_match_positions_guards(spark, pos_index, doc_index):
    from datastream_io_spark.operators.indexed_search import match_positions

    assert match_positions(spark, pos_index, "", [1, 2]).count() == 0
    assert match_positions(spark, pos_index, "window", []).count() == 0
    with pytest.raises(ValueError, match="positional"):
        match_positions(spark, doc_index, "window", [1])


def test_snippets_densest_window(spark, pos_index, pos_pdf):
    """r3 Q16: snippet = width-token window anchored at the match
    position with the most query-term matches inside (tie → smallest
    start), verified against an independent brute-force over every
    anchor; scores/docs must equal the phrase top-k."""
    from datastream_io_spark.functions.tokenize import tokenize_simple
    from datastream_io_spark.operators.indexed_search import (
        search_indexed,
        snippets,
    )
    from datastream_io_spark.sources.scan import documents_as_corpus
    from tests.conftest import SF0001

    width, q = 9, "window agg"
    corpus = documents_as_corpus(spark, SF0001)
    got = snippets(spark, pos_index, corpus, q, k=10, mode="phrase",
                   width=width).collect()
    top = search_indexed(spark, pos_index, q, 10, "phrase").collect()
    assert [(r.doc_id, round(r.score, 9)) for r in got] == \
        [(r.doc_id, round(r.score, 9)) for r in top]

    text_of = dict(zip(pos_pdf["doc_id"], pos_pdf["text"]))
    for r in got:
        toks = tokenize_simple(text_of[r.doc_id])
        hits = [i for i, t in enumerate(toks) if t in ("window", "agg")]
        best = max(hits, key=lambda p: (
            sum(1 for x in hits if p <= x < p + width), -p))
        n_best = sum(1 for x in hits if best <= x < best + width)
        assert r.snippet == " ".join(toks[best:best + width]), r.doc_id
        assert r.n_hits == n_best


# ---------------------------------------------------------------- near/slop


def _brute_near_ids(pdf, query, slop, ordered, tokenizer="simple"):
    """Independent proximity reference: slide every window of
    ``bound+1`` tokens; unordered needs all terms inside the window,
    ordered needs them as an in-order subsequence of the window (greedy
    within a fixed window is exact for subsequence existence). A
    position set with span ≤ bound fits in such a window and vice
    versa, so this enumerates the same predicate search_near computes
    via per-doc chains/two-pointers — by a different algorithm."""
    from datastream_io_spark.functions.tokenize import tokenizer_for

    pure, _ = tokenizer_for(tokenizer)
    terms = list(dict.fromkeys(pure(query)))
    bound = (len(terms) - 1) + slop
    need = set(terms)
    out = set()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = pure(text)
        if not need <= set(toks):
            continue
        hit = False
        for s in range(len(toks)):
            win = toks[s:s + bound + 1]
            if ordered:
                it = iter(win)
                hit = all(any(w == t for w in it) for t in terms)
            else:
                hit = need <= set(win)
            if hit:
                break
        if hit:
            out.add(int(doc_id))
    return out


def test_near_matches_windowed_bruteforce(spark, pos_index, pos_pdf):
    from datastream_io_spark.operators.indexed_search import search_near

    and_scores = {}
    for q in ["window agg", "agg window scan", "sort merge"]:
        and_scores[q] = {r.doc_id: r.score for r in search_indexed(
            spark, pos_index, q, 10**6, "and").collect()}
    for q in ["window agg", "agg window scan", "sort merge"]:
        for slop in (0, 1, 3):
            for ordered in (False, True):
                got = search_near(spark, pos_index, q, 10**6, slop,
                                  ordered).collect()
                exp = _brute_near_ids(pos_pdf, q, slop, ordered)
                assert {r.doc_id for r in got} == exp, (q, slop, ordered)
                # proximity gates membership, never changes the score
                for r in got:
                    assert r.score == pytest.approx(
                        and_scores[q][r.doc_id], abs=1e-9)


def test_near_degenerate_forms(spark, pos_index, doc_index):
    from datastream_io_spark.operators.indexed_search import search_near

    # ordered slop=0 on a duplicate-free query ≡ exact phrase
    a = sorted((r.doc_id, round(r.score, 9)) for r in search_near(
        spark, pos_index, "window agg", 10**6, 0, True).collect())
    b = sorted((r.doc_id, round(r.score, 9)) for r in search_indexed(
        spark, pos_index, "window agg", 10**6, "phrase").collect())
    assert a == b and a
    # unordered huge slop ≡ AND
    c = sorted((r.doc_id, round(r.score, 9)) for r in search_near(
        spark, pos_index, "window agg", 10**6, 10**6, False).collect())
    d = sorted((r.doc_id, round(r.score, 9)) for r in search_indexed(
        spark, pos_index, "window agg", 10**6, "and").collect())
    assert c == d
    # single term ≡ AND on that term
    e = [(r.doc_id, round(r.score, 9)) for r in search_near(
        spark, pos_index, "window", 10, 2, True).collect()]
    f = [(r.doc_id, round(r.score, 9)) for r in search_indexed(
        spark, pos_index, "window", 10, "and").collect()]
    assert e == f
    with pytest.raises(ValueError, match="slop"):
        search_near(spark, pos_index, "window agg", 10, -1)
    with pytest.raises(ValueError, match="positional"):
        search_near(spark, doc_index, "window agg", 10, 1)
    # absent term → empty (conjunctive semantics)
    assert search_near(spark, pos_index, "window zzznope", 10, 5).count() == 0


def test_snippets_near_mode(spark, pos_index, pos_pdf):
    """r5: snippets(mode='near') gates the hit set with the proximity
    predicate (docs/scores == search_near) while the window anchoring
    stays the standard densest-window rule."""
    from datastream_io_spark.functions.tokenize import tokenize_simple
    from datastream_io_spark.operators.indexed_search import (
        search_near, snippets)
    from datastream_io_spark.sources.scan import documents_as_corpus
    from tests.conftest import SF0001

    width, q, slop = 9, "window agg", 1
    corpus = documents_as_corpus(spark, SF0001)
    got = snippets(spark, pos_index, corpus, q, k=10, mode="near",
                   width=width, slop=slop, ordered=True).collect()
    top = search_near(spark, pos_index, q, 10, slop, True).collect()
    assert got and [(r.doc_id, round(r.score, 9)) for r in got] == \
        [(r.doc_id, round(r.score, 9)) for r in top]
    text_of = dict(zip(pos_pdf["doc_id"], pos_pdf["text"]))
    for r in got:
        toks = tokenize_simple(text_of[r.doc_id])
        hits = [i for i, t in enumerate(toks) if t in ("window", "agg")]
        best = max(hits, key=lambda p: (
            sum(1 for x in hits if p <= x < p + width), -p))
        assert r.snippet == " ".join(toks[best:best + width]), r.doc_id


def test_near_two_term_fast_path_matches_general_kernels():
    """Randomized pin: the vectorized 2-term searchsorted window test
    must agree with the general per-doc chain/two-pointer algorithms on
    adversarial position layouts (boundary positions, dense repeats,
    adjacent-doc collisions in the combined key space)."""
    import numpy as np

    from datastream_io_spark.operators.codec import encode_blocks
    from datastream_io_spark.operators.indexed_search import (
        NearSpec, _near_filter, _ordered_chain, _unordered_window)

    rng = np.random.default_rng(42)
    for trial in range(20):
        n_docs = 40
        pos_a, pos_b = {}, {}
        for d in range(n_docs):
            # cluster positions low AND high to stress the clamped
            # window edges (p±bound near 0 and near the field max)
            na, nb = rng.integers(0, 6, size=2)
            pool = np.concatenate([
                rng.integers(0, 12, size=30),
                rng.integers(0, 200, size=30)])
            pa = np.unique(rng.choice(pool, size=na)) if na else \
                np.array([], np.int64)
            pb = np.unique(rng.choice(pool, size=nb)) if nb else \
                np.array([], np.int64)
            # a position holds ONE token: drop collisions from b
            pb = np.setdiff1d(pb, pa)
            if len(pa):
                pos_a[d] = pa.astype(np.int64)
            if len(pb):
                pos_b[d] = pb.astype(np.int64)

        def blocks_for(pos_of):
            ids = np.array(sorted(pos_of), np.int64)
            tfs = np.array([len(pos_of[d]) for d in ids], np.int64)
            dls = np.full(ids.size, 50, np.int64)
            poss = (np.concatenate([pos_of[d] for d in ids])
                    if len(ids) else np.array([], np.int64))
            return encode_blocks(ids, tfs, dls, positions=poss)

        blocks_of = {"a": blocks_for(pos_a), "b": blocks_for(pos_b)}
        both = np.array(sorted(set(pos_a) & set(pos_b)), np.int64)
        if not len(both):
            continue
        for slop in (0, 1, 4):
            for ordered in (False, True):
                spec = NearSpec(["a", "b"], slop, ordered)
                got = _near_filter(both, spec, blocks_of, {})
                bound = 1 + slop
                exp = [d for d in both
                       if (_ordered_chain([pos_a[d], pos_b[d]], bound)
                           if ordered else
                           _unordered_window([pos_a[d], pos_b[d]],
                                             bound))]
                assert list(got) == exp, (trial, slop, ordered)


def test_near_multi_term_vectorized_matches_scalar_kernels():
    """Randomized pin for the r6 vectorized T≥3 proximity kernel: the
    all-candidates searchsorted chain (ordered) / running-max window
    scan (unordered) must agree with the scalar per-doc reference
    algorithms for T = 3 and 4 on adversarial layouts."""
    import numpy as np

    from datastream_io_spark.operators.codec import encode_blocks
    from datastream_io_spark.operators.indexed_search import (
        NearSpec, _near_filter, _ordered_chain, _unordered_window)

    rng = np.random.default_rng(7)
    for n_terms in (3, 4):
        terms = [chr(ord("a") + i) for i in range(n_terms)]
        for trial in range(15):
            n_docs = 30
            pos_of = {t: {} for t in terms}
            for d in range(n_docs):
                used = np.array([], np.int64)
                for t in terms:
                    n = int(rng.integers(0, 5))
                    pool = np.concatenate([
                        rng.integers(0, 10, size=25),
                        rng.integers(0, 120, size=25)])
                    p = (np.unique(rng.choice(pool, size=n)) if n
                         else np.array([], np.int64))
                    p = np.setdiff1d(p, used)  # one token per position
                    used = np.union1d(used, p)
                    if len(p):
                        pos_of[t][d] = p.astype(np.int64)

            def blocks_for(pmap):
                ids = np.array(sorted(pmap), np.int64)
                tfs = np.array([len(pmap[d]) for d in ids], np.int64)
                dls = np.full(ids.size, 50, np.int64)
                poss = (np.concatenate([pmap[d] for d in ids])
                        if len(ids) else np.array([], np.int64))
                return encode_blocks(ids, tfs, dls, positions=poss)

            blocks_of = {t: blocks_for(pos_of[t]) for t in terms}
            cand = set(range(n_docs))
            for t in terms:
                cand &= set(pos_of[t])
            cand = np.array(sorted(cand), np.int64)
            if not len(cand):
                continue
            for slop in (0, 1, 3):
                for ordered in (False, True):
                    spec = NearSpec(terms, slop, ordered)
                    got = _near_filter(cand, spec, blocks_of, {})
                    bound = (n_terms - 1) + slop
                    exp = [d for d in cand
                           if (_ordered_chain(
                                   [pos_of[t][d] for t in terms], bound)
                               if ordered else
                               _unordered_window(
                                   [pos_of[t][d] for t in terms],
                                   bound))]
                    assert list(got) == exp, (n_terms, trial, slop,
                                              ordered)
