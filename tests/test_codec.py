"""Posting codec invariants (BasePostingsFormatTestCase-style contract,
lucene/test-framework/.../index/BasePostingsFormatTestCase.java)."""

import numpy as np
import pytest

from lucene_solr_spark.index.codec import (
    BLOCK_SIZE,
    decode_posting_list,
    encode_blocks,
    vbyte_decode,
    vbyte_encode,
)


def test_block_size_matches_reference():
    assert BLOCK_SIZE == 128  # Lucene50PostingsFormat.java:397


@pytest.mark.parametrize("seed", range(10))
def test_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    docs = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    d, t = decode_posting_list(encode_blocks(docs, tfs))
    assert np.array_equal(docs, d)
    assert np.array_equal(tfs, t)


def test_all_equal_block_is_degenerate():
    # consecutive docIDs, all tf=1 -> bpv 0 blocks (ForUtil bpv=0 case):
    # payload is just headers + two uint32s
    docs = np.arange(1000, 1000 + BLOCK_SIZE, dtype=np.int64)
    tfs = np.ones(BLOCK_SIZE, dtype=np.int64)
    blocks = encode_blocks(docs, tfs)
    assert len(blocks) == 1
    b = blocks[0]
    # first delta is 0, rest 1 -> bpv 1 for docs; tf-1 all 0 -> bpv 0
    # (bpv-0 single value is 8 bytes since the 64-bit-clean format)
    assert len(b["payload"]) <= 2 + (BLOCK_SIZE // 8) + 8
    d, t = decode_posting_list(blocks)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)


def test_tail_freq1_trick_compact():
    # all tf==1 tail entries use a single vint each ((delta<<1)|1)
    docs = np.array([5, 9, 10, 200], dtype=np.int64)
    tfs = np.ones(4, dtype=np.int64)
    blocks = encode_blocks(docs, tfs)
    assert blocks[0]["kind"] == 1
    assert len(blocks[0]["payload"]) <= 2 * 4  # <= 2 bytes per entry here
    d, t = decode_posting_list(blocks)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs)


def test_vbyte_edge_values():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**31, 2**56], dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(v), len(v)), v)


def test_block_metadata():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(100_000, size=300, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=300).astype(np.int64)
    blocks = encode_blocks(docs, tfs)
    assert [b["block_id"] for b in blocks] == [0, 1, 2]
    assert blocks[0]["first_doc"] == docs[0]
    assert blocks[-1]["last_doc"] == docs[-1]
    assert blocks[1]["doc_count"] == 128 and blocks[2]["doc_count"] == 44
    # strictly increasing doc ranges (CheckIndex invariant)
    for a, b in zip(blocks, blocks[1:]):
        assert a["last_doc"] < b["first_doc"]
        assert a["max_tf"] == tfs[a["block_id"] * 128:(a["block_id"] + 1) * 128].max()
