"""Codec round-trip property tests (BasePostingsFormatTestCase-style, SURVEY §5.6)."""

import numpy as np
import pytest
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


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=50, deadline=None)
def test_vbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    buf, nb = vbyte_encode(a)
    out = vbyte_decode(buf)
    assert len(out) == len(a)
    assert (out == a).all()
    # byte length accounting matches the buffer
    assert (nb.sum() if len(a) else 0) == len(buf)


@pytest.mark.parametrize("width", [1, 2, 5, 7, 8, 9, 16, 20, 31, 32, 40])
def test_for_roundtrip(width):
    rng = np.random.RandomState(width)
    for n in [1, 127, 128, 129, 1000]:
        vals = rng.randint(0, 2**min(width, 62), n).astype(np.uint64)
        assert (for_unpack(for_pack(vals, width), n, width) == vals).all()


@given(
    st.lists(
        st.lists(st.integers(0, 10**6), min_size=1, max_size=300).map(
            lambda xs: sorted(set(xs))
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=30, deadline=None)
def test_delta_lists_roundtrip(lists):
    flat = np.array([x for lst in lists for x in lst], dtype=np.int64)
    starts = np.cumsum([0] + [len(lst) for lst in lists[:-1]]).astype(np.int64)
    enc = delta_encode_lists(flat, starts)
    dec = delta_decode_lists(enc, starts)
    assert (dec == flat).all()


def test_block_starts():
    # lists of length 1, 128, 129, 300
    starts = np.array([0, 1, 129, 258], dtype=np.int64)
    total = 558
    flat, list_id = block_starts_for_lists(starts, total)
    assert list(flat) == [0, 1, 129, 257, 258, 386, 514]
    assert list(list_id) == [0, 1, 2, 2, 3, 3, 3]
    assert BLOCK_SIZE == 128
