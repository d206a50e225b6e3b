"""Varbyte/delta codec roundtrip — unit + property tests (SURVEY.md §5.2.1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from garamond_jl_spark.functions.codec import (delta_decode, delta_encode,
                                               pack_f32, pack_ids,
                                               unpack_f32, unpack_ids,
                                               varbyte_decode, varbyte_encode)


def test_varbyte_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**35], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varbyte_decode(b"")) == 0


def test_single_byte_compression():
    # ids < 128 take exactly one byte each
    vals = np.arange(100, dtype=np.uint64)
    assert len(varbyte_encode(vals)) == 100


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varbyte_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**50), max_size=500))
def test_pack_ids_roundtrip_property(xs):
    ids = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(unpack_ids(pack_ids(ids)), ids)


def test_delta_monotone():
    ids = np.array([5, 9, 10, 1000, 10**12], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_f32_roundtrip():
    vals = np.array([0.0, 1.5, -2.25, 3.4e38], dtype=np.float32)
    assert np.array_equal(unpack_f32(pack_f32(vals)), vals)
