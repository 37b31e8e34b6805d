"""Synthetic source-code corpus generator (FIXTURES.md §2).

The north rule's input is a corpus table ``(repo, path, commit, lang,
content)`` (BASELINE.json:15). No external data is allowed, so this
module synthesizes one deterministically: every row is reproducible from
its index ``i`` alone (seeded per-row RNG stream), so generation
parallelizes via ``mapInPandas`` with no coordination and re-runs
identically — which the resume/determinism tests rely on.

Term statistics are the complement of the all-hot ``documents`` fixture:
a Zipf(1.2) identifier vocabulary of 20k terms gives a few very hot
terms and a long rare tail, plus per-language template lines carrying
snake_case/camelCase identifiers for the code tokenizer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
LANGS = ["py", "java", "go", "js", "rs"]
_EXT = {"py": "py", "java": "java", "go": "go", "js": "js", "rs": "rs"}

_TEMPLATES = {
    "py": [
        "def parseConfig(cfg_path):",
        "import os",
        "import sys",
        "from collections import defaultdict",
        "class StreamReader:",
        "    def read_batch(self, max_rows):",
        "for idx, row in enumerate(rows):",
        "    result_list.append(transform_row(row))",
        "if error_count > max_retries:",
        "    raise RuntimeError('too many failures')",
        "logger.warning('retrying fetchData %s', attempt_id)",
        "return merged_output",
    ],
    "java": [
        "public class IndexMerger {",
        "private static final int MAX_BUFFER = 4096;",
        "public void mergeSegments(List<Segment> segments) {",
        "for (int i = 0; i < postings.size(); i++) {",
        "if (docId > lastDocId) throw new IllegalStateException();",
        "return CompressedBlock.encode(deltaValues);",
        "} catch (IOException e) {",
        "    logger.error(\"flush failed\", e);",
    ],
    "go": [
        "func parseConfig(path string) (*Config, error) {",
        "package indexer",
        "import \"fmt\"",
        "for i, block := range postingBlocks {",
        "if err != nil { return nil, err }",
        "defer file.Close()",
        "var docCount int64",
        "return &Index{segments: segs}, nil",
    ],
    "js": [
        "function parseConfig(cfgPath) {",
        "const fs = require('fs');",
        "export default class QueryPlanner {",
        "for (const term of queryTerms) {",
        "if (!postings.has(term)) continue;",
        "return results.sort((a, b) => b.score - a.score);",
        "await flushSegment(buffer);",
        "let docId = firstDocId;",
    ],
    "rs": [
        "fn parse_config(path: &Path) -> Result<Config> {",
        "use std::collections::HashMap;",
        "pub struct PostingList {",
        "for (doc_id, tf) in postings.iter() {",
        "if delta == 0 { return Err(Error::Corrupt); }",
        "let mut encoder = BlockEncoder::new();",
        "impl Iterator for BlockCursor {",
        "return Ok(top_k);",
    ],
}

_VOCAB_SIZE = 20_000


def _vocab() -> list[str]:
    return [f"ident_{j}" for j in range(_VOCAB_SIZE)]


def _row(i: int, vocab: list[str]) -> dict:
    lang = LANGS[i % 5]
    rng = np.random.default_rng((SEED << 32) | i)  # per-row stream
    n_lines = int(rng.integers(20, 201))
    bank = _TEMPLATES[lang]
    lines = []
    for _ in range(n_lines):
        if rng.random() < 0.6:
            lines.append(bank[int(rng.integers(0, len(bank)))])
        else:
            zipf_ids = np.minimum(rng.zipf(1.2, size=3) - 1, _VOCAB_SIZE - 1)
            lines.append(" ".join(vocab[int(z)] for z in zipf_ids))
    content = "\n".join(lines)
    return {
        "repo": f"org{i % 97}/proj{i % 1013}",
        "path": f"src/{'ab'[i % 2]}/{i // 1013}/file_{i}.{_EXT[lang]}",
        "commit": hashlib.sha256(f"commit-{i // 50}".encode()).hexdigest()[:40],
        "lang": lang,
        "content": content,
    }


def corpus_pandas(n_rows: int, start: int = 0) -> pd.DataFrame:
    vocab = _vocab()
    return pd.DataFrame([_row(i, vocab) for i in range(start, start + n_rows)])


def corpus_df(spark: SparkSession, n_rows: int, n_partitions: int | None = None) -> DataFrame:
    """Distributed generation: each partition materializes its own row
    range independently (mapInPandas over a range frame)."""
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n_rows, 1, n_partitions)

    def gen(it):
        vocab = _vocab()
        for pdf in it:
            idx = pdf["id"].to_numpy()
            yield pd.DataFrame([_row(int(i), vocab) for i in idx])

    return rng_df.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )
