"""Hypothesis property tests: decode(encode(x)) == x over the full
signed domain of every integer width, and order-consistency of the
native vs UDF morton paths — random coverage beyond the lineitem-
derived round-trip queries (SURVEY §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lindel_spark import curve

WIDTHS = [(8, np.int8), (16, np.int16), (32, np.int32), (64, np.int64)]


def _rt(kernel_enc, kernel_dec, xs, bits, n):
    X = np.array(xs, dtype=np.int64).reshape(1, n)
    U = curve.bitcast_to_unsigned(
        np.ascontiguousarray(X.astype({8: np.int8, 16: np.int16,
                                       32: np.int32, 64: np.int64}[bits])),
        bits)
    hi, lo = kernel_enc(U, bits)
    out = kernel_dec(hi, lo, n, bits)
    return out


@settings(max_examples=200, deadline=None)
@given(st.integers(-128, 127), st.integers(-128, 127),
       st.integers(-128, 127))
def test_hilbert_i8_3_roundtrip(a, b, c):
    out = _rt(curve.hilbert_encode_batch, curve.hilbert_decode_batch,
              [a, b, c], 8, 3)
    signed = out.astype(np.int8).astype(np.int64)
    assert list(signed[0]) == [a, b, c]


@settings(max_examples=200, deadline=None)
@given(st.integers(-2**31, 2**31 - 1), st.integers(-2**31, 2**31 - 1))
def test_morton_i32_2_roundtrip(a, b):
    out = _rt(curve.morton_encode_batch, curve.morton_decode_batch,
              [a, b], 32, 2)
    signed = out.astype(np.int32).astype(np.int64)
    assert list(signed[0]) == [a, b]


@settings(max_examples=100, deadline=None)
@given(st.integers(-2**63, 2**63 - 1), st.integers(-2**63, 2**63 - 1))
def test_hilbert_i64_2_roundtrip(a, b):
    out = _rt(curve.hilbert_encode_batch, curve.hilbert_decode_batch,
              [a, b], 64, 2)
    assert list(out.view(np.int64)[0]) == [a, b]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=32), min_size=2,
                max_size=2))
def test_hilbert_f32_2_roundtrip(vals):
    X = np.array(vals, dtype=np.float32).reshape(1, 2)
    U = curve.bitcast_to_unsigned(np.ascontiguousarray(X), 32)
    hi, lo = curve.hilbert_encode_batch(U, 32)
    out = curve.hilbert_decode_batch(hi, lo, 2, 32)
    back = out.astype(np.uint32).view(np.float32)
    assert np.array_equal(back.reshape(-1), X.reshape(-1))
