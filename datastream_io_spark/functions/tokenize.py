"""T1 — tokenizers (SURVEY.md §2.3).

Two analysis chains, each a *pure function of the content string* so the
exact same code runs in three places (rank-identity requires an identical
chain end to end, SURVEY.md §2.5 Q1):

  1. inside the vectorized pandas UDF on executors (Arrow batches,
     BASELINE.json:6 "vectorized Arrow/pandas UDFs"),
  2. in the driver-side query parser,
  3. in the brute-force golden scorer (tests).

``simple``: lowercase, split on ``[^a-z0-9_]+`` — equals whitespace split
on the ``documents`` fixture (31-word lowercase vocabulary, FIXTURES.md §1)
and is DuckDB-oracle-expressible as
``list_filter(regexp_split_to_array(lower(text),'[^a-z0-9_]+'), t -> t<>'')``.

``code``: source-code aware — extract identifiers ``[A-Za-z0-9_]+``, emit
the lowercased identifier, and when it decomposes (snake_case / camelCase /
digit boundaries) also emit the lowercased sub-tokens. So ``parseConfig``
→ ``['parseconfig', 'parse', 'config']``: both the query ``parseConfig``
and the query ``parse config`` match. Golden-tested (no SQL oracle).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_SIMPLE_RE = re.compile(r"[a-z0-9_]+")
_IDENT_RE = re.compile(r"[A-Za-z0-9_]+")
# camelCase / ALLCAPS / digit-run boundaries inside one identifier segment
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z]+|[A-Z]+|[0-9]+")


def tokenize_simple(text: str) -> list[str]:
    """Pure simple tokenizer; identical semantics to the DuckDB oracle."""
    return _SIMPLE_RE.findall(text.lower())


def _split_ident(ident: str) -> list[str]:
    parts: list[str] = []
    for seg in ident.split("_"):
        if seg:
            parts.extend(m.lower() for m in _CAMEL_RE.findall(seg))
    return parts


@lru_cache(maxsize=1 << 20)
def _expand_ident(ident: str) -> tuple[str, ...]:
    """ident → (lowered whole, *sub-tokens if it decomposes). Memoized:
    identifier frequency is Zipfian, so within an Arrow batch (and
    across batches in a long-lived Python worker) almost every lookup
    is a cache hit — this is the hot inner loop of the build."""
    low = ident.lower()
    parts = _split_ident(ident)
    if len(parts) > 1:
        return (low, *parts)
    return (low,)


def tokenize_code(text: str) -> list[str]:
    """Pure code tokenizer: whole identifier + sub-tokens when it splits."""
    out: list[str] = []
    for ident in _IDENT_RE.findall(text):
        out.extend(_expand_ident(ident))
    return out


def tokenize_simple_col(col: Column) -> Column:
    """JVM-only variant of ``simple`` (zero-UDF fast path, whole-stage
    codegen): split + filter empties. Semantically identical to
    :func:`tokenize_simple`."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9_]+"), lambda t: t != "")


def tokenize_series(s: pd.Series, mode: str) -> pd.Series:
    """Vectorized tokenize of a pandas Series — the ONE chain shared by
    the pandas UDFs below and the fused build kernel
    (:func:`~datastream_io_spark.operators.postings.term_stats_fused`),
    so build-time and query-time tokenization cannot drift (the
    engine's rank-identity invariant rides on it). Nulls tokenize to
    []. simple: pandas .str ops over the whole Arrow batch; code:
    vectorized identifier extraction + the memoized _expand_ident
    (Zipfian reuse) per batch."""
    if mode == "simple":
        out = s.str.lower().str.findall(_SIMPLE_RE)
    elif mode == "code":
        idents = s.str.findall(_IDENT_RE)

        def expand(lst):
            if not isinstance(lst, list):
                return []  # null content
            toks: list[str] = []
            for ident in lst:
                toks.extend(_expand_ident(ident))
            return toks

        return idents.map(expand)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return out.map(lambda v: v if isinstance(v, list) else [])


@F.pandas_udf(ArrayType(StringType()))
def tokenize_simple_udf(s: pd.Series) -> pd.Series:
    return tokenize_series(s, "simple")


@F.pandas_udf(ArrayType(StringType()))
def tokenize_code_udf(s: pd.Series) -> pd.Series:
    return tokenize_series(s, "code")


def tokenizer_for(mode: str):
    """(pure_fn, udf) pair for a tokenizer mode."""
    if mode == "simple":
        return tokenize_simple, tokenize_simple_udf
    if mode == "code":
        return tokenize_code, tokenize_code_udf
    raise ValueError(f"unknown tokenizer mode: {mode}")
