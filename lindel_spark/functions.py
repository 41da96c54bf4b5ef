"""The four lindel SQL functions as Spark Column factories.

hilbert_encode / morton_encode / hilbert_decode / morton_decode —
reference registration surface: src/lindel_extension.cpp:948-1026.

Design (SURVEY §3.1): the Python wrapper does DuckDB-style *bind* work
at DataFrame-construction time — element type + arity resolve the
output Spark type from the ladder in :mod:`lindel_spark.types` — and
execution is an Arrow-vectorized pandas UDF over whole batches
(replacing the reference's per-row Rust FFI calls,
src/lindel_extension.cpp:708,735,771).

Morton (both directions) additionally has a pure-Column "native" path
for integer inputs with total width <= 64 bits: staged magic-number
bit spreading that stays inside JVM whole-stage codegen with no
Python round-trip at all.  Prefer it in hot paths.

NULL semantics (reference src/lindel_extension.cpp:684-694, 437-441):
NULL array/input -> NULL result; NULL *element* inside an array ->
error "Lindel functions cannot handle arrays containing NULL values".
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import ArrowUDFType, arrow_udf

from lindel_spark import curve
from lindel_spark.types import (
    DecodePlan,
    ElemType,
    elem_type,
    encode_output_bits,
    encode_output_spark_type,
    resolve_decode,
    signed_np_dtype,
)

_NULL_ELEM_MSG = "Lindel functions cannot handle arrays containing NULL values"


# ---------------------------------------------------------------------------
# Arrow plumbing (zero-copy between the JVM batch and the NumPy kernel)
# ---------------------------------------------------------------------------

def _chunked(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _np_bool(a: pa.Array) -> np.ndarray:
    return _chunked(a).to_numpy(zero_copy_only=False).astype(bool, copy=False)


def _np_to_binary_array(data2d: np.ndarray, mask: np.ndarray) -> pa.Array:
    """(rows, w) uint8 matrix -> variable-width pa.binary() without any
    per-row Python objects: one offsets buffer + the matrix itself."""
    rows, w = data2d.shape
    offsets = pa.py_buffer(np.arange(rows + 1, dtype=np.int32) * w)
    databuf = pa.py_buffer(np.ascontiguousarray(data2d))
    validity = None
    nulls = 0
    if mask.any():
        validity = pa.py_buffer(np.packbits(~mask, bitorder="little"))
        nulls = int(mask.sum())
    return pa.Array.from_buffers(
        pa.binary(), rows, [validity, offsets, databuf], null_count=nulls
    )


def _binary_to_matrix(v: pa.Array, in_bytes: int,
                      mask: np.ndarray) -> np.ndarray:
    """pa.binary() array -> (rows, in_bytes) uint8 matrix, vectorized.

    Raises if any non-null value has the wrong width (the reference's
    unsigned input types make that unrepresentable)."""
    rows = len(v)
    lengths = pc.binary_length(v).fill_null(in_bytes).to_numpy(
        zero_copy_only=False
    )
    if (lengths != in_bytes).any():
        bad = int(lengths[lengths != in_bytes][0])
        raise ValueError(
            f"LINDEL: decode expected {in_bytes}-byte binary, got {bad} bytes"
        )
    filled = pc.fill_null(v, b"\x00" * in_bytes)
    validity, offbuf, databuf = filled.buffers()
    off = np.frombuffer(offbuf, np.int32, rows + 1 + filled.offset)[
        filled.offset:
    ]
    data = np.frombuffer(databuf, np.uint8)
    return data[off[0]:off[0] + rows * in_bytes].reshape(rows, in_bytes)


def _list_array(values: pa.Array, n: int, mask: np.ndarray) -> pa.Array:
    """Flat values + fixed arity -> pa.list_ with nulls from ``mask``."""
    rows = len(mask)
    offs = np.arange(rows + 1, dtype=np.int32) * n
    if mask.any():
        offsets = pa.array(offs, pa.int32(),
                           mask=np.append(mask, False))
    else:
        offsets = pa.array(offs, pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def _lanes_to_decimal128(hi: np.ndarray, lo: np.ndarray,
                         mask: np.ndarray) -> pa.Array:
    """(hi, lo) u64 lane pairs -> pa.decimal128(38, 0), vectorized.

    Arrow decimal128 storage is a little-endian 128-bit integer; at
    scale=0 the storage value IS the value, so the array is assembled
    straight from the lane bytes — no per-row Python Decimal objects.
    Callers guarantee values < 10^38 (the ≤126-bit bind-time cap in
    types.py keeps 2^126 ≈ 8.5e37 inside decimal(38)).
    """
    rows = len(lo)
    buf = np.empty((rows, 16), np.uint8)
    buf[:, :8] = np.ascontiguousarray(
        lo.astype("<u8", copy=False)).view(np.uint8).reshape(rows, 8)
    buf[:, 8:] = np.ascontiguousarray(
        hi.astype("<u8", copy=False)).view(np.uint8).reshape(rows, 8)
    validity = None
    nulls = 0
    if mask.any():
        validity = pa.py_buffer(np.packbits(~mask, bitorder="little"))
        nulls = int(mask.sum())
    return pa.Array.from_buffers(
        pa.decimal128(38, 0), rows, [validity, pa.py_buffer(buf)],
        null_count=nulls,
    )


def _encode_output(ret_type, hi, lo, mask, width_bytes) -> pa.Array:
    if isinstance(ret_type, T.LongType):
        return pa.array(lo.view(np.int64), pa.int64(), mask=mask)
    if isinstance(ret_type, T.BinaryType):
        return _np_to_binary_array(
            curve.lanes_to_bytes(hi, lo, width_bytes), mask
        )
    # Decimal(38,0) output (opt-in; the 128-bit width is rejected at
    # bind time in types.py — u128 values overflow 38 digits)
    return _lanes_to_decimal128(hi, lo, mask)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _encode_kernel(kind: str):
    return curve.hilbert_encode_batch if kind == "hilbert" else curve.morton_encode_batch


def _decode_kernel(kind: str):
    return curve.hilbert_decode_batch if kind == "hilbert" else curve.morton_decode_batch


def _make_encode_udf(kind: str, et: ElemType, n: int, out_mode: str):
    total_bits = encode_output_bits(et.bits, n)
    ret_type = encode_output_spark_type(total_bits, out_mode)
    width_bytes = total_bits // 8
    kernel = _encode_kernel(kind)
    np_dtype = et.np_dtype
    elem_bits = et.bits

    def fn(*cols: pa.Array) -> pa.Array:
        null_a, bad_a = _chunked(cols[0]), _chunked(cols[1])
        elems = [_chunked(c) for c in cols[2:]]
        mask = _np_bool(null_a)
        bad = _np_bool(bad_a)
        if (bad & ~mask).any():
            raise ValueError(_NULL_ELEM_MSG + f" (or array length != {n})")
        X = np.column_stack(
            [
                e.to_numpy(zero_copy_only=False).astype(np_dtype, copy=False)
                for e in elems
            ]
        )
        U = curve.bitcast_to_unsigned(np.ascontiguousarray(X), elem_bits)
        hi, lo = kernel(U, elem_bits)
        return _encode_output(ret_type, hi, lo, mask, width_bytes)

    return arrow_udf(fn, ret_type, ArrowUDFType.SCALAR)


def _infer_elem(df, arr) -> str:
    """Element type from ``df.schema`` — the PySpark equivalent of the
    reference's bind-time type derivation (the bound argument's element
    type, src/lindel_extension.cpp:516-519). Only *named* columns can
    be looked up in a schema; expressions still need an explicit
    ``elem=``.
    """
    if isinstance(arr, (list, tuple)):
        names = [c for c in arr if isinstance(c, str)]
        if len(names) != len(arr):
            raise ValueError(
                "LINDEL: elem inference needs plain column names; pass "
                "elem= for column expressions"
            )
        ets = [elem_type(df.schema[c].dataType) for c in names]
        if len({e.name for e in ets}) != 1:
            raise TypeError(
                "LINDEL: input columns have mixed element types "
                f"({sorted({e.name for e in ets})}); pass elem= to pick "
                "the encode width explicitly"
            )
        return ets[0].name
    if not isinstance(arr, str):
        raise ValueError(
            "LINDEL: elem inference needs a plain column name; pass "
            "elem= for column expressions"
        )
    dt = df.schema[arr].dataType
    if not isinstance(dt, T.ArrayType):
        raise TypeError(
            f"LINDEL: column {arr!r} is {dt.simpleString()}, expected an "
            "array column (or pass a list of scalar columns)"
        )
    return elem_type(dt.elementType).name


def _resolve_elem(arr, elem, df):
    if elem is not None:
        return elem
    if df is None:
        raise ValueError(
            "LINDEL: pass elem= (element type) or df= (a DataFrame whose "
            "schema to infer it from, reference bind-time semantics)"
        )
    return _infer_elem(df, arr)


def _encode(kind: str, arr, elem, n, output):
    et = elem_type(elem)
    if isinstance(arr, (list, tuple)):
        cols = [c if isinstance(c, Column) else F.col(c) for c in arr]
        n = len(cols)
        encode_output_bits(et.bits, n)  # validate arity early
        udf = _make_encode_udf(kind, et, n, output)
        is_null = F.lit(False)
        for c in cols:
            is_null = is_null | c.isNull()
        bad = F.lit(False)
        elems = [F.coalesce(c.cast(et.spark_type), F.lit(0).cast(et.spark_type))
                 for c in cols]
        return udf(is_null, bad, *elems)
    col = arr if isinstance(arr, Column) else F.col(arr)
    if n is None:
        raise ValueError(
            "LINDEL: pass n= (array length) when encoding an array column; "
            "Spark arrays carry no bind-time length (SURVEY §7.4)"
        )
    encode_output_bits(et.bits, n)
    udf = _make_encode_udf(kind, et, n, output)
    is_null = col.isNull()
    bad = F.when(
        col.isNull(), F.lit(False)
    ).otherwise(
        (F.size(col) != F.lit(n)) | F.exists(col, lambda x: x.isNull())
    )
    elems = [
        F.coalesce(
            F.element_at(col, i + 1).cast(et.spark_type),
            F.lit(0).cast(et.spark_type),
        )
        for i in range(n)
    ]
    return udf(is_null, bad, *elems)


def hilbert_encode(arr, elem: str | None = "int32", n: int | None = None,
                   output: str = "auto", df=None) -> Column:
    """Hilbert-curve index of an N-dimensional point.

    ``arr`` is an array Column (pass ``n``) or a list of scalar Columns.
    ``elem`` names the element width/kind (int8/int16/int32/int64/
    float32/float64 and SQL aliases); floats and signed ints are
    *bit-cast* (reference semantics, src/lindel_extension.cpp:735-752).
    Pass ``elem=None`` with ``df=`` to infer the element type from the
    DataFrame's schema (the reference derives it from the bound input
    type at bind time, src/lindel_extension.cpp:516-519); an explicit
    ``elem`` always wins.
    ``output``: auto|long|binary|decimal — long for total width <= 64,
    big-endian binary (unsigned sort order) otherwise.

    NULL handling differs by call form: the array-column form raises on
    NULL *elements* (reference semantics,
    src/lindel_extension.cpp:690-694), while the list-of-scalar-columns
    form follows SQL scalar-function null propagation — a NULL in any
    input column yields a NULL key for that row. Multi-column relational
    inputs have no "array with a hole" to reject; the row is simply
    incomplete. A NULL array (as opposed to a NULL element) maps to a
    NULL key in both forms.

    Reference: hilbert_encode, src/lindel_extension.cpp:495-660,950-967.
    """
    return _encode("hilbert", arr, _resolve_elem(arr, elem, df), n, output)


def morton_encode(arr, elem: str | None = "int32", n: int | None = None,
                  output: str = "auto", df=None) -> Column:
    """Morton (Z-order) index — MSB-first bit-interleave; element 0 is
    most significant.  Same signature as :func:`hilbert_encode`
    (including ``elem=None`` + ``df=`` schema inference).

    Reference: morton_encode, src/lindel_extension.cpp:498-510,969-978.
    Note: for integer inputs with total width <= 64 prefer
    :func:`morton_encode_native` (pure-Column, no Python round-trip).
    """
    return _encode("morton", arr, _resolve_elem(arr, elem, df), n, output)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _make_decode_udf(kind: str, plan: DecodePlan, binary_input: bool):
    ret_type = T.ArrayType(plan.spark_elem, containsNull=False)
    kernel = _decode_kernel(kind)
    n, elem_bits, in_width = plan.nparts, plan.elem_bits, plan.input_width
    in_bytes = in_width // 8

    def fn(v: pa.Array) -> pa.Array:
        v = _chunked(v)
        mask = _np_bool(v.is_null())
        rows = len(v)
        if binary_input:
            hi, lo = curve.bytes_to_lanes(_binary_to_matrix(v, in_bytes, mask))
        else:
            lo = (
                pc.fill_null(v, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
                .view(np.uint64)
            )
            if in_width < 64:
                # The reference's unsigned input types make out-of-range
                # values unrepresentable (src/lindel_extension.cpp:983-
                # 1001); raise rather than silently truncate to
                # plausible coordinates.
                excess = (lo & ~np.uint64((1 << in_width) - 1)) != 0
                if (excess & ~mask).any():
                    raise ValueError(
                        f"LINDEL: decode input exceeds u{in_width} range; "
                        "pass the correct input_width"
                    )
            hi = np.zeros(rows, np.uint64)
        if in_width == 128 and n == 1:
            # u128 round-trip: 16-byte big-endian binary carrier.
            values = _np_to_binary_array(
                curve.lanes_to_bytes(hi, lo, 16), np.zeros(rows, bool)
            )
            return _list_array(values, 1, mask)
        Xu = kernel(hi, lo, n, elem_bits)
        if plan.want_float:
            dt = np.float32 if elem_bits == 32 else np.float64
            Xc = curve.bitcast_from_unsigned(
                Xu.astype(curve.unsigned_dtype(elem_bits)), dt
            )
        elif plan.want_unsigned:
            if elem_bits == 64:
                flat = np.ascontiguousarray(Xu.ravel().astype(np.uint64))
                vals = _lanes_to_decimal128(
                    np.zeros(flat.size, np.uint64), flat,
                    np.zeros(flat.size, bool),
                )
                return _list_array(vals, n, mask)
            Xc = Xu.astype(signed_np_dtype(elem_bits * 2))
        else:
            Xc = curve.bitcast_from_unsigned(
                Xu.astype(curve.unsigned_dtype(elem_bits)),
                signed_np_dtype(elem_bits),
            )
        return _list_array(pa.array(Xc.ravel()), n, mask)

    return arrow_udf(fn, ret_type, ArrowUDFType.SCALAR)


def _decode(kind: str, col, nparts: int, want_float: bool, want_unsigned: bool,
            input_width: int | None, binary_input: bool | None):
    col = col if isinstance(col, Column) else F.col(col)
    if input_width is None:
        # The reference derives the width from the input's unsigned type
        # (src/lindel_extension.cpp:983-1001); Spark carries every width
        # in LongType/BinaryType, so a default would silently mis-decode
        # (e.g. a u32 key decoded as u64). Require it.
        raise ValueError(
            "LINDEL: pass input_width= (8/16/32/64/128) — the unsigned "
            "width the value was encoded at; Spark's carrier types do "
            "not determine it"
        )
    plan = resolve_decode(input_width, nparts, want_float, want_unsigned)
    if binary_input is None:
        binary_input = input_width == 128
    udf = _make_decode_udf(kind, plan, binary_input)
    return udf(col)


def hilbert_decode(col, nparts: int, want_float: bool = False,
                   want_unsigned: bool = False, input_width: int | None = None,
                   binary_input: bool | None = None) -> Column:
    """Inverse of :func:`hilbert_encode`.

    ``nparts``/flags are plain Python args — inherently constant,
    matching the reference's constant-foldability requirement
    (src/lindel_extension.cpp:171-187).  ``input_width`` is the
    unsigned width of the encoded value (8/16/32/64/128) and is
    **required** — the reference derives it from its unsigned input
    types, which Spark lacks; pass ``binary_input=True`` when ``col``
    is the big-endian BinaryType form (default for width 128).

    Reference: hilbert_decode, src/lindel_extension.cpp:152-274,457-490.
    """
    return _decode("hilbert", col, nparts, want_float, want_unsigned,
                   input_width, binary_input)


def morton_decode(col, nparts: int, want_float: bool = False,
                  want_unsigned: bool = False, input_width: int | None = None,
                  binary_input: bool | None = None) -> Column:
    """Inverse of :func:`morton_encode` (bit de-interleave).

    Reference: morton_decode, src/lindel_extension.cpp:997-1023.
    """
    return _decode("morton", col, nparts, want_float, want_unsigned,
                   input_width, binary_input)


# ---------------------------------------------------------------------------
# Morton native-Column fast path (whole-stage codegen, no Python)
# ---------------------------------------------------------------------------

_MAGIC2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _to_unsigned_long(c: Column, bits: int) -> Column:
    u = c.cast(T.LongType())
    if bits < 64:
        u = u.bitwiseAND(F.lit((1 << bits) - 1))
    return u


def _spread2(u: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of u to even positions (stride 2)."""
    x = u
    for shift, mask in _MAGIC2:
        if shift >= bits:
            continue
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _compact2(v: Column, bits: int) -> Column:
    """Inverse of _spread2: gather even-position bits into the low half."""
    x = v.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in [
        (1, 0x3333333333333333),
        (2, 0x0F0F0F0F0F0F0F0F),
        (4, 0x00FF00FF00FF00FF),
        (8, 0x0000FFFF0000FFFF),
        (16, 0x00000000FFFFFFFF),
    ]:
        if shift >= bits * 2:
            break
        x = (x.bitwiseOR(F.shiftrightunsigned(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_encode_native(cols: Sequence, elem: str | None = "int32",
                         df=None) -> Column:
    """Pure-Column Morton encode for integer inputs, total width <= 64.

    Generates staged shift-or bit spreading that runs entirely inside
    JVM whole-stage codegen — the scale path for z-order writes (no
    JVM<->Python Arrow hop).  Bit-identical to :func:`morton_encode`.
    ``elem=None`` + ``df=`` infers the element type from the schema.
    """
    et = elem_type(_resolve_elem(cols, elem, df))
    if et.is_float:
        raise ValueError(
            "LINDEL: native morton path is integer-only (floats need a "
            "bit-cast Spark lacks); use morton_encode()"
        )
    cols = [c if isinstance(c, Column) else F.col(c) for c in cols]
    n = len(cols)
    total = encode_output_bits(et.bits, n)
    if total > 64:
        raise ValueError(
            f"LINDEL: native morton limited to 64-bit outputs "
            f"(got {et.bits}x{n}={et.bits * n}); use morton_encode(output='binary')"
        )
    us = [_to_unsigned_long(c, et.bits) for c in cols]
    return _interleave_native(us, et.bits, n)


def _interleave_native(us: list, bits: int, n: int) -> Column:
    """MSB-first bit-interleave of unsigned-in-long Columns (pure Column)."""
    if n == 1:
        return us[0]
    if n == 2:
        # element 0 most significant within each bit pair
        return F.shiftleft(_spread2(us[0], bits), 1).bitwiseOR(
            _spread2(us[1], bits)
        )
    # generic n: one OR-term per (coordinate, bit)
    result = F.lit(0).cast(T.LongType())
    for i, u in enumerate(us):
        for b in range(bits):
            p = b * n + (n - 1 - i)
            bit = F.shiftrightunsigned(u, b).bitwiseAND(F.lit(1))
            result = result.bitwiseOR(F.shiftleft(bit, p))
    return result


def morton_decode_native(col: Column, nparts: int, elem="int32",
                         signed: bool = True) -> Column:
    """Pure-Column Morton decode (inverse of morton_encode_native).

    Returns ``array<long>`` of the ``nparts`` coordinates; with
    ``signed=True`` values are two's-complement re-signed at the
    element width (matching want_unsigned=false decode).
    """
    et = elem_type(elem)
    if et.is_float:
        raise ValueError("LINDEL: native morton decode is integer-only")
    if encode_output_bits(et.bits, nparts) > 64:
        raise ValueError(
            f"LINDEL: native morton limited to 64-bit inputs "
            f"(got {et.bits}x{nparts}={et.bits * nparts}); use morton_decode()"
        )
    col = col if isinstance(col, Column) else F.col(col)
    n = nparts
    bits = et.bits

    def resign(x: Column) -> Column:
        if not signed or bits == 64:
            return x
        half = 1 << (bits - 1)
        return F.when(x >= F.lit(half), x - F.lit(1 << bits)).otherwise(x)

    coords = _deinterleave_native(col, n, bits)
    return F.array(*[resign(x) for x in coords])


def _deinterleave_native(col: Column, n: int, bits: int) -> list:
    """Inverse of :func:`_interleave_native` → unsigned-in-long Columns."""
    coords = []
    for i in range(n):
        if n == 1:
            x = col
        elif n == 2:
            x = _compact2(F.shiftrightunsigned(col, n - 1 - i), bits)
        else:
            x = F.lit(0).cast(T.LongType())
            for b in range(bits):
                p = b * n + (n - 1 - i)
                bit = F.shiftrightunsigned(col, p).bitwiseAND(F.lit(1))
                x = x.bitwiseOR(F.shiftleft(bit, b))
        coords.append(x)
    return coords


def _resign_native(x: Column, bits: int) -> Column:
    """Two's-complement re-sign of an unsigned-in-long value at ``bits``."""
    if bits == 64:
        return x
    half = 1 << (bits - 1)
    return F.when(x >= F.lit(half), x - F.lit(1 << bits)).otherwise(x)


# ---------------------------------------------------------------------------
# Hilbert native-Column fast path (whole-stage codegen, no Python)
# ---------------------------------------------------------------------------

def _q_lit(q: int) -> Column:
    """The bit mask 1<<k as a long literal (sign-bit safe at k=63)."""
    return F.lit(q if q < (1 << 63) else -(1 << 63)).cast(T.LongType())


def hilbert_encode_native(df, cols: Sequence, elem: str | None = "int32",
                          out_col: str = "__lindel_hilbert__"):
    """Pure-Column Hilbert encode for integer inputs, total width <= 64.

    Returns ``df`` with ``out_col`` added — a DataFrame transform, not
    a single Column, because Skilling's axes→transpose pass
    (curve.py:168-207; J. Skilling, AIP Conf. Proc. 707, 2004) is a
    sequential per-bit state machine: each bit level rewrites the
    coordinates in terms of the previous level.  Expressed as one
    Column expression the state would be inlined multiplicatively
    (~6^bits nodes); expressed as one Project per (level, dimension)
    with named intermediate columns, each stage's outputs are
    referenced more than once so Catalyst's CollapseProject keeps the
    stages separate and whole-stage codegen fuses them into
    straight-line JVM bytecode with local variables — the same code a
    hand-written Java kernel would produce, with no JVM↔Python hop.

    .. warning::
       Experimental — measured and kept for the record, but
       :func:`hilbert_encode` (Arrow UDF) remains the recommended
       path (BASELINE.md round 7): on a cached in-memory frame the
       chain wins ~1.25x (0.70s vs 0.87s, 6M rows), but on a real
       parquet scan the two are equal (~0.8s vs ~0.7s at sf0.1) while
       the chain costs ~2s of driver-side plan construction, and a
       ``filter`` (or join condition) referencing ``out_col`` placed
       directly above the chain makes Catalyst's predicate-pushdown
       substitute the whole state machine into the predicate level by
       level — exponential in ``bits`` (measured: OOM at 31 levels).
       Consume the result straight into a sink or aggregate only.

    Bit-identical to :func:`hilbert_encode` (asserted over random
    inputs in tests/test_native_hilbert.py and against an independent
    DuckDB recursive-CTE oracle in the ``hilbert_native_vals_i32``
    registry query).  Reference semantics:
    src/lindel_extension.cpp:495-660 (hilbert_encode bind + kernel
    dispatch into duckdb_lindel_rust/src/lib.rs hilbert_index).
    """
    et = elem_type(_resolve_elem(list(cols), elem, df))
    if et.is_float:
        raise ValueError(
            "LINDEL: native hilbert path is integer-only (floats need a "
            "bit-cast Spark lacks); use hilbert_encode()"
        )
    cols = [c if isinstance(c, Column) else F.col(c) for c in cols]
    n = len(cols)
    total = encode_output_bits(et.bits, n)
    if total > 64:
        raise ValueError(
            f"LINDEL: native hilbert limited to 64-bit outputs "
            f"(got {et.bits}x{n}={et.bits * n}); use hilbert_encode(output='binary')"
        )
    bits = et.bits
    tmp = [f"__lindel_h{i}__" for i in range(n)]
    out = df.withColumns(
        {t: _to_unsigned_long(c, bits) for t, c in zip(tmp, cols)}
    )
    X = [F.col(t) for t in tmp]

    # Skilling inverse-undo pass, top bit down to 2 (curve.py:183-198).
    for k in range(bits - 1, 0, -1):
        Q = 1 << k
        P = F.lit(Q - 1).cast(T.LongType())
        QL = _q_lit(Q)
        cond0 = X[0].bitwiseAND(QL) != 0
        out = out.withColumn(
            tmp[0], F.when(cond0, X[0].bitwiseXOR(P)).otherwise(X[0])
        )
        for i in range(1, n):
            cond = X[i].bitwiseAND(QL) != 0
            t = F.when(cond, F.lit(0).cast(T.LongType())).otherwise(
                X[0].bitwiseXOR(X[i]).bitwiseAND(P)
            )
            out = out.withColumns({
                tmp[0]: F.when(cond, X[0].bitwiseXOR(P)).otherwise(
                    X[0].bitwiseXOR(t)
                ),
                tmp[i]: X[i].bitwiseXOR(t),
            })
    # Gray encode across dimensions (sequential, uses updated neighbor;
    # curve.py:199-201).
    for i in range(1, n):
        out = out.withColumn(tmp[i], X[i].bitwiseXOR(X[i - 1]))
    # curve.py:202-206 in closed form: bit j of t = parity of the last
    # coordinate's bits strictly above j = (suffix-XOR cascade) >> 1.
    y = X[n - 1]
    s = 1
    while s < bits:
        y = y.bitwiseXOR(F.shiftrightunsigned(y, s))
        s <<= 1
    tcol = "__lindel_ht__"
    out = out.withColumn(tcol, F.shiftrightunsigned(y, 1))
    tref = F.col(tcol)
    out = out.withColumns(
        {tmp[i]: X[i].bitwiseXOR(tref) for i in range(n)}
    )
    out = out.withColumn(out_col, _interleave_native(X, bits, n))
    return out.drop(tcol, *tmp)


def hilbert_decode_native(df, col, nparts: int, elem: str = "int32",
                          signed: bool = True,
                          out_col: str = "__lindel_axes__"):
    """Pure-Column Hilbert decode (inverse of hilbert_encode_native).

    Returns ``df`` with ``out_col`` added as ``array<long>`` of the
    ``nparts`` coordinates; ``signed=True`` re-signs two's-complement
    at the element width (want_unsigned=false decode semantics,
    reference DECODE_TYPE_MAPPINGS src/lindel_extension.cpp:64-97).
    Same DataFrame-transform shape as :func:`hilbert_encode_native`
    (the transpose→axes pass, curve.py:210-237, is the mirrored state
    machine).
    """
    et = elem_type(elem)
    if et.is_float:
        raise ValueError("LINDEL: native hilbert decode is integer-only")
    if encode_output_bits(et.bits, nparts) > 64:
        raise ValueError(
            f"LINDEL: native hilbert limited to 64-bit inputs "
            f"(got {et.bits}x{nparts}={et.bits * nparts}); use hilbert_decode()"
        )
    col = col if isinstance(col, Column) else F.col(col)
    n = nparts
    bits = et.bits
    tmp = [f"__lindel_h{i}__" for i in range(n)]
    coords = _deinterleave_native(col, n, bits)
    out = df.withColumns(dict(zip(tmp, coords)))
    X = [F.col(t) for t in tmp]

    # Gray decode (curve.py:217-221): t from the ORIGINAL last
    # coordinate; the descending update uses the not-yet-updated
    # neighbor, which a descending withColumn chain preserves.
    tcol = "__lindel_ht__"
    out = out.withColumn(tcol, F.shiftrightunsigned(X[n - 1], 1))
    for i in range(n - 1, 0, -1):
        out = out.withColumn(tmp[i], X[i].bitwiseXOR(X[i - 1]))
    out = out.withColumn(tmp[0], X[0].bitwiseXOR(F.col(tcol)))

    # Undo-excess pass, bit 2 up to the top (curve.py:223-236): inner
    # loop runs dimensions high→low with dim 0 last.
    for k in range(1, bits):
        Q = 1 << k
        P = F.lit(Q - 1).cast(T.LongType())
        QL = _q_lit(Q)
        for i in range(n - 1, 0, -1):
            cond = X[i].bitwiseAND(QL) != 0
            t = F.when(cond, F.lit(0).cast(T.LongType())).otherwise(
                X[0].bitwiseXOR(X[i]).bitwiseAND(P)
            )
            out = out.withColumns({
                tmp[0]: F.when(cond, X[0].bitwiseXOR(P)).otherwise(
                    X[0].bitwiseXOR(t)
                ),
                tmp[i]: X[i].bitwiseXOR(t),
            })
        cond0 = X[0].bitwiseAND(QL) != 0
        out = out.withColumn(
            tmp[0], F.when(cond0, X[0].bitwiseXOR(P)).otherwise(X[0])
        )
    if signed:
        axes = [_resign_native(x, bits) for x in X]
    else:
        axes = list(X)
    out = out.withColumn(out_col, F.array(*axes))
    return out.drop(tcol, *tmp)


# ---------------------------------------------------------------------------
# SQL registration (reference: catalog registration with metadata,
# src/lindel_extension.cpp:948-1026; no telemetry — deliberately omitted)
# ---------------------------------------------------------------------------

def _make_encode_array_udf(kind: str, et: ElemType, n: int, out_mode: str):
    """Array-column-input variant for SQL registration (one arg).

    Fully vectorized: Arrow keeps NULL list elements as true nulls (no
    pandas NaN ambiguity), so the null-element error (reference
    src/lindel_extension.cpp:690-694) is one ``null_count`` check and a
    genuine float NaN remains a legal bit-cast input.
    """
    total_bits = encode_output_bits(et.bits, n)
    ret_type = encode_output_spark_type(total_bits, out_mode)
    width_bytes = total_bits // 8
    kernel = _encode_kernel(kind)
    np_dtype = et.np_dtype
    elem_bits = et.bits

    def fn(v: pa.Array) -> pa.Array:
        v = _chunked(v)
        rows = len(v)
        mask = _np_bool(v.is_null())
        lengths = pc.list_value_length(v).fill_null(n).to_numpy(
            zero_copy_only=False
        )
        if (lengths != n).any():
            bad = int(lengths[lengths != n][0])
            raise ValueError(
                f"LINDEL: expected array of length {n}, got ({bad},)"
            )
        flat = v.flatten()  # non-null lists' values, in row order
        if flat.null_count:
            raise ValueError(_NULL_ELEM_MSG)
        vals = flat.to_numpy(zero_copy_only=False).astype(np_dtype, copy=False)
        if mask.any():
            X = np.zeros((rows, n), dtype=np_dtype)
            X[~mask] = vals.reshape(-1, n)
        else:
            X = vals.reshape(rows, n)
        U = curve.bitcast_to_unsigned(np.ascontiguousarray(X), elem_bits)
        hi, lo = kernel(U, elem_bits)
        return _encode_output(ret_type, hi, lo, mask, width_bytes)

    return arrow_udf(fn, ret_type, ArrowUDFType.SCALAR)


def register(spark: SparkSession, elems=("int8", "int16", "int32", "int64",
                                         "float32", "float64")) -> list[str]:
    """Register SQL-callable variants in the session catalog.

    ``{hilbert,morton}_encode_{elem}_{n}(array)`` for every legal arity
    of each element type, and ``{hilbert,morton}_decode_{width}_{n}``
    (plus ``..._f`` float / ``..._u`` unsigned forms) for every legal
    decode combination.  Spark UDF registration fixes the return type
    per name, so DuckDB's overload-on-input-type sets become families
    of explicit names.  Returns the registered names.

    Reference registration surface: src/lindel_extension.cpp:948-1026
    (docs metadata → Python docstrings; telemetry deliberately omitted).
    """
    names = []
    for kind in ("hilbert", "morton"):
        for e in elems:
            et = elem_type(e)
            max_n = 128 // et.bits
            for n in range(1, max_n + 1):
                name = f"{kind}_encode_{et.name}_{n}"
                impl = f"__lindel_impl_{name}"
                spark.udf.register(impl, _make_encode_array_udf(kind, et, n, "auto"))
                # SQL-UDF wrapper: NULL array -> NULL, NULL element ->
                # error (reference src/lindel_extension.cpp:684-694),
                # checked natively *before* Arrow->pandas conversion —
                # float NULL elements would otherwise arrive as NaN and
                # be indistinguishable from legal bit-cast NaN inputs.
                total = encode_output_bits(et.bits, n)
                ret = encode_output_spark_type(total, "auto").simpleString()
                arr_t = f"array<{et.spark_type.simpleString()}>"
                curve_desc = ("Hilbert curve index" if kind == "hilbert"
                              else "Morton (Z-order) index")
                comment = (
                    f"{curve_desc} of a {n}-element {et.name} array as a "
                    f"u{total} ({ret}). Raises on NULL elements or wrong "
                    f"length; NULL array returns NULL. Example: "
                    f"SELECT {name}(array({', '.join(['1'] * n)}))"
                )
                spark.sql(f"""
                    CREATE OR REPLACE TEMPORARY FUNCTION {name}(arr {arr_t})
                    RETURNS {ret}
                    COMMENT '{comment}'
                    RETURN CASE
                      WHEN arr IS NULL THEN NULL
                      WHEN size(arr) != {n} THEN
                        raise_error('LINDEL: expected array of length {n}')
                      WHEN exists(arr, x -> x IS NULL) THEN
                        raise_error('{_NULL_ELEM_MSG}')
                      ELSE {impl}(arr) END
                """)
                names.append(name)
        for width in (8, 16, 32, 64, 128):
            for n in range(1, 17):
                for wf, wu, suffix in ((False, False, ""), (False, True, "_u"),
                                       (True, False, "_f")):
                    try:
                        plan = resolve_decode(width, n, wf, wu)
                    except ValueError:
                        continue
                    name = f"{kind}_decode_{width}_{n}{suffix}"
                    impl = f"__lindel_impl_{name}"
                    spark.udf.register(
                        impl, _make_decode_udf(kind, plan, width == 128)
                    )
                    in_t = "binary" if width == 128 else "bigint"
                    ret_t = T.ArrayType(
                        plan.spark_elem, False).simpleString()
                    flavor = {"": "signed", "_u": "unsigned",
                              "_f": "float"}[suffix]
                    comment = (
                        f"Decode a u{width} {kind} key into {n} {flavor} "
                        f"coordinate(s) as {ret_t}. Inverse of "
                        f"{kind}_encode_*_{n}. Example: SELECT "
                        f"{name}({'X' if width == 128 else '7'})"
                    )
                    spark.sql(f"""
                        CREATE OR REPLACE TEMPORARY FUNCTION
                        {name}(v {in_t})
                        RETURNS {ret_t}
                        COMMENT '{comment}'
                        RETURN {impl}(v)
                    """)
                    names.append(name)
    return names
