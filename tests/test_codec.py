"""C2/C3 codec tests (SURVEY.md §5.2): property-style roundtrips over
seeded random gap distributions, block-boundary edges, varint extremes."""

import numpy as np
import pytest

from datastream_io_spark.operators.codec import (
    decode_blocks,
    encode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_extremes():
    v = np.array([0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**40, 2**63, 2**64 - 1],
                 dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v), v.size), v)


def test_varint_empty():
    assert varint_encode(np.array([], np.uint64)) == b""
    assert varint_decode(b"", 0).size == 0


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 257, 1000])
def test_block_boundaries(n):
    ids = np.arange(n, dtype=np.int64) * 3 + 7
    tfs = (np.arange(n, dtype=np.int64) % 50) + 1
    blocks = encode_blocks(ids, tfs, np.ones(n, np.int64))
    di, dt = decode_blocks(blocks)
    assert np.array_equal(di, ids)
    assert np.array_equal(dt, tfs)
    assert all(b["n"] <= 128 for b in blocks)
    assert blocks[0]["first_doc_id"] == 7
    assert blocks[-1]["max_doc_id"] == ids[-1]


def test_random_gap_distributions():
    rng = np.random.default_rng(42)
    for _ in range(100):
        n = int(rng.integers(1, 500))
        hi = int(rng.choice([2, 128, 2**20, 2**40]))
        gaps = rng.integers(1, hi + 1, size=n).astype(np.int64)
        ids = np.cumsum(gaps)
        tfs = rng.integers(1, 10_000, size=n).astype(np.int64)
        dls = rng.integers(1, 5_000, size=n).astype(np.int64)
        blocks = encode_blocks(ids, tfs, dls)
        di, dt = decode_blocks(blocks)
        assert np.array_equal(di, ids)
        assert np.array_equal(dt, tfs)
        # block bounds are true extrema (WAND correctness depends on this:
        # tfn is increasing in tf, decreasing in dl)
        off = 0
        for b in blocks:
            sl = slice(off, off + b["n"])
            assert b["max_tf"] == tfs[sl].max()
            assert b["min_dl"] == dls[sl].min()
            assert b["max_doc_id"] == ids[sl][-1]
            off += b["n"]


def test_compression_is_compact():
    # dense doc ids (delta=1) must take ~1 byte per posting for docs
    ids = np.arange(10_000, dtype=np.int64)
    tfs = np.ones(10_000, np.int64)
    blocks = encode_blocks(ids, tfs, np.ones(10_000, np.int64))
    total = sum(len(b["docs"]) + len(b["tfs"]) for b in blocks)
    assert total < 10_000 * 2.1


def test_positions_roundtrip_property():
    """C7: flat position stream survives encode/decode across block
    boundaries for randomized tf distributions."""
    import numpy as np

    from datastream_io_spark.operators.codec import (
        decode_block_positions,
        decode_block_tfs,
        encode_blocks,
    )

    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 700))
        ids = np.cumsum(rng.integers(1, 9, n)).astype(np.int64)
        tfs = rng.integers(1, 7, n).astype(np.int64)
        dls = rng.integers(1, 500, n).astype(np.int64)
        parts = [np.sort(rng.choice(4000, size=t, replace=False)).astype(np.int64)
                 for t in tfs]
        flat = np.concatenate(parts)
        blocks = encode_blocks(ids, tfs, dls, positions=flat)
        got = np.concatenate([
            decode_block_positions(b, decode_block_tfs(b)) for b in blocks])
        assert np.array_equal(got, flat)


def test_positions_over_bound_rejected():
    import numpy as np
    import pytest

    from datastream_io_spark.operators.codec import POS_BITS, encode_blocks

    ids = np.array([1], np.int64)
    tfs = np.array([1], np.int64)
    dls = np.array([5], np.int64)
    with pytest.raises(ValueError, match="not.*supported|supported"):
        encode_blocks(ids, tfs, dls,
                      positions=np.array([1 << POS_BITS], np.int64))
