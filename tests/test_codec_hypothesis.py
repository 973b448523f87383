"""Property-based codec round-trips (BasePostingsFormatTestCase strategy:
randomized write/read round-trips over adversarial shapes)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.codec import (
    BLOCK_SIZE,
    block_starts_for_lists,
    delta_decode_lists,
    delta_encode_lists,
    for_pack,
    for_unpack,
    vbyte_decode,
    vbyte_encode,
)

u64s = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400
)


@settings(max_examples=200, deadline=None)
@given(u64s)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf, nb = vbyte_encode(arr)
    assert nb.sum() == len(buf)
    out = vbyte_decode(buf)
    assert np.array_equal(out, arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 20) - 1), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=40),
)
def test_for_pack_roundtrip(values, width):
    arr = np.array(values, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    arr = arr & mask
    buf = for_pack(arr, width)
    out = for_unpack(buf, len(arr), width)
    assert np.array_equal(out, arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50),
        min_size=1,
        max_size=20,
    )
)
def test_delta_lists_roundtrip(lists):
    # each list must be ascending (docID lists are)
    lists = [sorted(set(l)) for l in lists]
    flat = np.array([x for l in lists for x in l], dtype=np.int64)
    starts = np.cumsum([0] + [len(l) for l in lists[:-1]]).astype(np.int64)
    deltas = delta_encode_lists(flat, starts)
    out = delta_decode_lists(deltas, starts)
    assert np.array_equal(out, flat)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=30))
def test_block_starts_cover_every_posting(lens):
    starts = np.cumsum([0] + lens[:-1]).astype(np.int64)
    total = int(sum(lens))
    flat, list_id = block_starts_for_lists(starts, total)
    # blocks never span list boundaries and cover each list exactly
    for i, (s, ln) in enumerate(zip(starts, lens)):
        blocks = flat[list_id == i]
        assert blocks[0] == s
        assert np.array_equal(blocks, s + np.arange(0, ln, BLOCK_SIZE))
