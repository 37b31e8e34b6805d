"""Brute-force exact BM25 scorer (FIXTURES.md §3).

Pure pandas/numpy full scan with the exact same tokenizer chain and
constants as the engine. This produces the frozen golden top-k sets that
stand in for the reference query set (the reference checkout is empty —
SURVEY.md §0): both engine paths (relational + WAND) must reproduce
docIDs exactly and scores to 1e-9 at every parallelism level
(BASELINE.json:14).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from datastream_io_spark.functions.bm25 import idf_py, tf_norm_py
from datastream_io_spark.functions.tokenize import tokenizer_for


def brute_force_topk(
    docs: pd.DataFrame,
    query: str,
    k: int = 10,
    mode: str = "and",
    text_col: str = "text",
    tokenizer: str = "simple",
) -> list[dict]:
    """Returns [{doc_id, score}] sorted (score desc, doc_id asc).
    ``mode='phrase'``: keep only docs whose token stream contains the
    query's token sequence contiguously; rank by BM25 over the phrase's
    distinct terms (same scoring the indexed phrase path uses)."""
    pure, _ = tokenizer_for(tokenizer)
    seq = pure(query)
    terms = sorted(set(seq))
    if not terms:
        return []
    toks = [pure(t) for t in docs[text_col]]
    ids = docs["doc_id"].tolist()
    dls = [len(t) for t in toks]
    n = len(ids)
    avgdl = sum(dls) / n
    tfs = [Counter(t) for t in toks]
    df = {t: sum(1 for c in tfs if c[t] > 0) for t in terms}

    def has_phrase(stream: list[str]) -> bool:
        m = len(seq)
        return any(stream[p:p + m] == seq
                   for p in range(len(stream) - m + 1))

    out = []
    for i in range(n):
        matched = [t for t in terms if tfs[i][t] > 0]
        if not matched:
            continue
        if mode in ("and", "phrase") and len(matched) < len(terms):
            continue
        if mode == "phrase" and not has_phrase(toks[i]):
            continue
        score = 0.0
        for t in matched:  # sorted term order — same fold order as engine
            score += idf_py(df[t], n) * tf_norm_py(tfs[i][t], dls[i], avgdl)
        out.append({"doc_id": int(ids[i]), "score": float(score)})
    out.sort(key=lambda r: (-r["score"], r["doc_id"]))
    return out[:k]
