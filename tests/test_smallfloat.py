"""SmallFloat exactness tests — semantics from reference SmallFloat.java:101-169.

Golden values computed by hand-evaluating the Java algorithm (not by running
the reference): intToByte4 is identity below 24, and 4-significant-bit
quantization with offset 24 above.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_solr_spark.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
)


def test_constants():
    assert NUM_FREE_VALUES == 24  # 255 - longToInt4(Integer.MAX_VALUE)


def test_exact_below_24():
    v = np.arange(24)
    assert (int_to_byte4(v) == v).all()
    assert (byte4_to_int(np.arange(24, dtype=np.uint8)) == v).all()


def test_golden_values():
    # hand-computed: intToByte4(i) = 24 + longToInt4(i - 24) for i >= 24
    # longToInt4: subnormal below 8; normal packs 3 mantissa bits + shift+1
    cases = {
        24: 24,        # 24 + longToInt4(0) = 24
        25: 25,        # + longToInt4(1) = 1
        31: 31,        # + longToInt4(7) = 7
        32: 32,        # longToInt4(8): numBits=4, shift=0, enc=0|((1)<<3)=8 -> 32
        39: 39,        # longToInt4(15) = 7|8 = 15 -> 39
        40: 40,        # longToInt4(16): numBits=5 shift=1 enc=(16>>1)&7=0 |16 = 16 -> 40
        41: 40,        # 17>>1=8 &7=0 |16 -> 40 (first lossy value)
        2**31 - 1: 255,
    }
    for i, expect in cases.items():
        assert int(int_to_byte4(np.array([i]))[0]) == expect, i


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_properties(i):
    b = int(int_to_byte4(np.array([i]))[0])
    dec = int(byte4_to_int(np.array([b], dtype=np.uint8))[0])
    # decode is a lower bound and re-encodes to the same byte (idempotent)
    assert dec <= i
    assert int(int_to_byte4(np.array([dec]))[0]) == b
    # order preserving
    if i > 0:
        b_prev = int(int_to_byte4(np.array([i - 1]))[0])
        assert b_prev <= b


def test_length_table_monotone():
    assert LENGTH_TABLE[0] == 0.0
    assert (np.diff(LENGTH_TABLE) >= 0).all()
    assert LENGTH_TABLE[24] == 24.0
    # the table stores float32 (Java float[]) — compare after the same cast
    assert LENGTH_TABLE[255] == np.float32(byte4_to_int(np.array([255], np.uint8))[0])
