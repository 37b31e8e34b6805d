"""C2/C3 — posting-list block codec: delta + varint, PForDelta-style
blocks with block-max metadata (SURVEY.md §2.4; BASELINE.json:6).

Layout follows the columnar-inverted-index design (ICDE 2025, PAPERS.md)
and classic PForDelta (Zukowski et al., ICDE 2006): postings are split
into blocks of ≤128 doc ids; per block we store

    first_doc_id : int64   absolute — blocks are position-independent,
                           so merging runs never re-encodes
    max_doc_id   : int64   block-skip bound (intersection)
    n            : int32   postings in the block
    max_tf       : int32   raw tf bound
    min_dl       : int32   smallest doc_len in the block — the BM25
                           tf-normalization is increasing in tf and
                           decreasing in dl, so idf(t) * tfn(max_tf,
                           min_dl, avgdl) is a valid per-block score
                           upper bound (block-max WAND, Ding & Suel
                           SIGIR 2011) computable at QUERY time; storing
                           (max_tf, min_dl) instead of a precomputed
                           bound lets segments be fully encoded before
                           the global avgdl exists — the per-split jobs
                           checkpoint compressed blocks, not raw tf rows
    docs         : binary  varint deltas of doc_ids[1:] (doc_ids[0] ==
                           first_doc_id); strictly positive
    tfs          : binary  varint tfs (n values)
    dls          : binary  varint doc_lens (n values) — per-POSTING doc
                           length so BM25 needs no side lookup at query
                           time: the old design broadcast an int32
                           dl array built from a driver-side
                           ``docs.toPandas()``, which dies past ~10^9
                           docs; storing dl next to tf keeps the query
                           path executor-local at any corpus size for
                           ~1 extra varint byte per posting
    poss         : binary  OPTIONAL (None when the index is built
                           without positions): per-posting token
                           positions, sum(tfs) varints — each posting's
                           run starts with (first_pos + 1) followed by
                           strictly-positive within-doc deltas; posting
                           boundaries are recovered from the decoded
                           tfs, so no extra length stream is stored.
                           Powers phrase queries.

Everything is numpy-vectorized (no per-row Python): encode loops only
over byte-positions (≤10), decode has a fast path for the dominant
all-single-byte case and an ``np.add.at`` scatter otherwise.
"""

from __future__ import annotations

import numpy as np

from datastream_io_spark import BLOCK_SIZE

_U64_7 = np.uint64(7)
_U64_0x7F = np.uint64(0x7F)

# phrase keys pack (doc_id << POS_BITS) | position into one int64:
# positions < 2^22 (4.2M tokens/doc) leaves 2^41 ≈ 2·10^12 doc ids —
# the north-rule corpus bound. Enforced at ENCODE time so the query
# side can rely on it instead of silently corrupting keys.
POS_BITS = 22


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-style varint pack of a uint64 array, vectorized."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, np.int64)
    x = v >> _U64_7
    while x.any():
        nb += (x > 0)
        x = x >> _U64_7
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), np.uint8)
    for j in range(int(nb.max())):
        mask = nb > j
        idx = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & _U64_0x7F).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8)
        out[idx] = byte | (cont << 7)
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Inverse of :func:`varint_encode`; returns uint64[n]."""
    if n == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    if b.size == n:  # fast path: every value fit in one byte
        return (b & 0x7F).astype(np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    lens = np.diff(ends, prepend=-1)  # bytes per value
    starts = ends - lens + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    val_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
    vals = np.zeros(n, np.uint64)
    np.add.at(
        vals, val_of_byte,
        (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64),
    )
    return vals


def _encode_positions(seg: np.ndarray, tfs: np.ndarray) -> bytes:
    """Position stream of one block: per posting, (first_pos + 1) then
    strictly-positive deltas — all values ≥ 1 so varints stay tight."""
    gs = np.cumsum(tfs) - tfs  # posting starts within the stream
    d = np.empty(seg.size, np.int64)
    d[0] = 0
    d[1:] = seg[1:] - seg[:-1]
    d[gs] = seg[gs] + 1
    return varint_encode(d.astype(np.uint64))


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """C2 — sorted (doc_id, tf, doc_len) arrays → list of block dicts.

    ``doc_ids`` must be strictly increasing int64. ``positions``, when
    given, is the FLAT ascending within-doc token-position stream whose
    posting boundaries are ``tfs`` (posting i owns tfs[i] positions).
    Blocks need no global statistics (see ``min_dl`` above), so segments
    are encodable the moment a split is tokenized.
    """
    doc_ids = np.ascontiguousarray(doc_ids, np.int64)
    tfs = np.ascontiguousarray(tfs, np.int64)
    if positions is not None:
        positions = np.ascontiguousarray(positions, np.int64)
        if positions.size and int(positions.max()) >= (1 << POS_BITS):
            raise ValueError(
                f"token position {int(positions.max())} >= 2^{POS_BITS}: "
                f"documents longer than {1 << POS_BITS} tokens are not "
                "supported by the positional index (phrase-key packing)")
        pbounds = np.concatenate(([0], np.cumsum(tfs)))
    blocks: list[dict] = []
    for s in range(0, doc_ids.size, block_size):
        e = min(s + block_size, doc_ids.size)
        ids = doc_ids[s:e]
        deltas = np.diff(ids).astype(np.uint64)  # strictly positive
        blocks.append(
            {
                "first_doc_id": int(ids[0]),
                "max_doc_id": int(ids[-1]),
                "n": int(e - s),
                "max_tf": int(tfs[s:e].max()),
                "min_dl": int(dls[s:e].min()),
                "docs": varint_encode(deltas),
                "tfs": varint_encode(tfs[s:e].astype(np.uint64)),
                "dls": varint_encode(
                    np.ascontiguousarray(dls[s:e], np.int64).astype(np.uint64)),
                "poss": (
                    _encode_positions(positions[pbounds[s]:pbounds[e]],
                                      tfs[s:e])
                    if positions is not None else None
                ),
            }
        )
    return blocks


def decode_block_docs(block) -> np.ndarray:
    """Doc ids of one block (int64, sorted). ``block`` is a dict or Row."""
    n = block["n"]
    first = block["first_doc_id"]
    deltas = varint_decode(block["docs"], n - 1)
    out = np.empty(n, np.int64)
    out[0] = first
    if n > 1:
        np.cumsum(deltas.astype(np.int64), out=out[1:])
        out[1:] += first
    return out


def decode_block_tfs(block) -> np.ndarray:
    return varint_decode(block["tfs"], block["n"]).astype(np.int64)


def decode_block_dls(block) -> np.ndarray:
    return varint_decode(block["dls"], block["n"]).astype(np.int64)


def decode_block_positions(block, tfs: np.ndarray | None = None) -> np.ndarray:
    """Flat position stream of one block (posting boundaries = its tfs).
    Pass the already-decoded ``tfs`` to skip re-decoding them."""
    if block["poss"] is None:
        raise ValueError("index was built without positions "
                         "(build_index(..., positions=True))")
    if tfs is None:
        tfs = decode_block_tfs(block)
    total = int(tfs.sum())
    d = varint_decode(block["poss"], total).astype(np.int64)
    gs = np.cumsum(tfs) - tfs
    d[gs] -= 1  # undo the +1 on posting-first positions
    c = np.cumsum(d)
    base = c[gs] - d[gs]  # running total just before each posting
    return c - np.repeat(base, tfs)


def decode_blocks(blocks) -> tuple[np.ndarray, np.ndarray]:
    """C3 — full posting list back from a list of blocks."""
    if not blocks:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ids = np.concatenate([decode_block_docs(b) for b in blocks])
    tfs = np.concatenate([decode_block_tfs(b) for b in blocks])
    return ids, tfs
