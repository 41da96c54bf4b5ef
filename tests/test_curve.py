"""Golden + property tests for the pure-NumPy curve kernels.

Goldens come from the reference's own corpus:
test/sql/lindel.test:15-111 and docs/README.md:117-287.
"""

import itertools

import numpy as np
import pytest

from lindel_spark import curve

# 5x5 grids, a-major order — test/sql/lindel.test:30-111
GRID_HILBERT = [0, 3, 4, 5, 58, 1, 2, 7, 6, 57, 14, 13, 8, 9, 54,
                15, 12, 11, 10, 53, 16, 17, 30, 31, 32]
GRID_MORTON = [0, 1, 4, 5, 16, 2, 3, 6, 7, 18, 8, 9, 12, 13, 24,
               10, 11, 14, 15, 26, 32, 33, 36, 37, 48]


def _grid(dtype):
    return np.array(list(itertools.product(range(5), range(5))), dtype=dtype)


def test_scalar_goldens():
    X = np.array([[1, 2, 3]], dtype=np.uint8)
    assert curve.hilbert_encode_batch(X, 8)[1][0] == 22
    assert curve.morton_encode_batch(X, 8)[1][0] == 29


@pytest.mark.parametrize("dtype,bits", [(np.uint8, 8), (np.uint32, 32)])
def test_grid_goldens(dtype, bits):
    X = _grid(dtype)
    assert curve.hilbert_encode_batch(X, bits)[1].tolist() == GRID_HILBERT
    assert curve.morton_encode_batch(X, bits)[1].tolist() == GRID_MORTON


def test_decode_goldens():
    hi = np.zeros(1, np.uint64)
    lo = np.array([22], np.uint64)
    assert curve.hilbert_decode_batch(hi, lo, 3, 8).tolist() == [[1, 2, 3]]
    lo = np.array([29], np.uint64)
    assert curve.morton_decode_batch(hi, lo, 3, 8).tolist() == [[1, 2, 3]]


def test_float_goldens_bitcast():
    f = np.array([[37.8, 0.2]], dtype=np.float32)
    _, lo = curve.hilbert_encode_batch(curve.bitcast_to_unsigned(f, 32), 32)
    assert lo[0] == 2303654869236839926  # docs/README.md:173-179

    d = np.array([[37.8, 0.2]], dtype=np.float64)
    hi, lo = curve.hilbert_encode_batch(curve.bitcast_to_unsigned(d, 64), 64)
    assert curve.lanes_to_ints(hi, lo)[0] == \
        42534209309512799991913666633619307890  # docs/README.md:181-188

    f3 = np.array([[1.0, 5.0, 6.0]], dtype=np.float32)
    hi, lo = curve.hilbert_encode_batch(curve.bitcast_to_unsigned(f3, 32), 32)
    assert curve.lanes_to_ints(hi, lo)[0] == 8002395622101954260073409974

    s = np.array([[97, 98, 99, 100]], dtype=np.uint8)  # 'abcd' ordinals
    assert curve.hilbert_encode_batch(s, 8)[1][0] == 178258816


def test_signed_bigint_roundtrip():
    b = np.array([[1, -2]], dtype=np.int64)  # docs/README.md:265-271
    hi, lo = curve.hilbert_encode_batch(curve.bitcast_to_unsigned(b, 64), 64)
    dec = curve.hilbert_decode_batch(hi, lo, 2, 64)
    assert curve.bitcast_from_unsigned(dec, np.int64).tolist() == [[1, -2]]


@pytest.mark.parametrize("bits", [8, 16, 32, 64])
def test_roundtrip_every_arity(bits):
    rng = np.random.default_rng(42)
    for n in range(1, 128 // bits + 1):
        X = rng.integers(0, 2 ** bits, size=(500, n), dtype=np.uint64).astype(
            curve.unsigned_dtype(bits)
        )
        for enc, dec in (
            (curve.hilbert_encode_batch, curve.hilbert_decode_batch),
            (curve.morton_encode_batch, curve.morton_decode_batch),
        ):
            hi, lo = enc(X, bits)
            back = dec(hi, lo, n, bits).astype(curve.unsigned_dtype(bits))
            assert (back == X).all(), (bits, n, enc.__name__)


def test_hilbert_adjacency():
    """Consecutive Hilbert indices differ by 1 in exactly one coordinate."""
    side = 16  # full 4-bit 2-D grid... use 8-bit space restricted to 16x16
    X = np.array(list(itertools.product(range(side), range(side))), dtype=np.uint8)
    _, lo = curve.hilbert_encode_batch(X, 8)
    order = np.argsort(lo)
    # the 16x16 corner of the 256x256 space is not contiguous in the curve,
    # so check adjacency only along consecutive curve indices
    sorted_idx = lo[order]
    pts = X[order]
    consec = np.where(np.diff(sorted_idx) == 1)[0]
    assert len(consec) > 0
    d = np.abs(pts[consec + 1].astype(int) - pts[consec].astype(int)).sum(axis=1)
    assert (d == 1).all()


def test_morton_matches_naive():
    rng = np.random.default_rng(7)
    X = rng.integers(0, 256, size=(100, 3), dtype=np.uint64).astype(np.uint8)
    _, lo = curve.morton_encode_batch(X, 8)
    for row, got in zip(X.tolist(), lo.tolist()):
        want = 0
        for b in range(8):
            for i, v in enumerate(row):
                want |= ((v >> b) & 1) << (b * 3 + (2 - i))
        assert got == want


def test_lanes_bytes_roundtrip():
    rng = np.random.default_rng(3)
    for w in (1, 2, 4, 8, 16):
        hi = rng.integers(0, 2 ** 63, size=64, dtype=np.uint64).astype(np.uint64)
        lo = rng.integers(0, 2 ** 63, size=64, dtype=np.uint64).astype(np.uint64)
        if w <= 8:
            hi = np.zeros(64, np.uint64)
            if w < 8:
                lo = lo & np.uint64((1 << (8 * w)) - 1)
        elif w < 16:
            hi = hi & np.uint64((1 << (8 * (w - 8))) - 1)
        buf = curve.lanes_to_bytes(hi, lo, w)
        h2, l2 = curve.bytes_to_lanes(buf)
        assert (h2 == hi).all() and (l2 == lo).all()
        # big-endian bytes sort == unsigned numeric sort
        ints = curve.lanes_to_ints(hi, lo)
        raw = [bytes(buf[i]) for i in range(64)]
        assert sorted(range(64), key=lambda i: raw[i]) == \
            sorted(range(64), key=lambda i: ints[i])


def test_magic_interleave_matches_per_bit_reference():
    """Exhaustive (elem_bits, n) sweep: the staged magic-number spread
    must equal the naive per-bit interleave, both directions."""
    import numpy as np
    from lindel_spark import curve

    def ref_interleave(X, elem_bits):
        rows, n = X.shape
        lo = np.zeros(rows, np.uint64)
        hi = np.zeros(rows, np.uint64)
        Xu = X.astype(np.uint64)
        for b in range(elem_bits):
            for i in range(n):
                p = b * n + (n - 1 - i)
                bit = (Xu[:, i] >> np.uint64(b)) & np.uint64(1)
                if p < 64:
                    lo |= bit << np.uint64(p)
                else:
                    hi |= bit << np.uint64(p - 64)
        return hi, lo

    rng = np.random.RandomState(0)
    for elem_bits in (8, 16, 32, 64):
        dt = curve.unsigned_dtype(elem_bits)
        max_n = 128 // elem_bits
        for n in range(1, max_n + 1):
            X = rng.randint(0, 2 ** 63, size=(257, n)).astype(np.uint64)
            X = (X & np.uint64((1 << elem_bits) - 1)).astype(dt)
            # include all-ones / zero edge rows
            X[0] = dt(0)
            X[1] = dt((1 << elem_bits) - 1)
            hi, lo = curve.interleave_bits(X.astype(np.uint64), elem_bits)
            rhi, rlo = ref_interleave(X, elem_bits)
            assert (hi == rhi).all() and (lo == rlo).all(), (elem_bits, n)
            back = curve.deinterleave_bits(hi, lo, n, elem_bits)
            assert (back == X.astype(np.uint64)).all(), (elem_bits, n)
