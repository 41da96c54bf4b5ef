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

import decimal
from typing import Iterator, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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

    def fn(it: Iterator[Tuple[pd.Series, ...]]) -> Iterator[pd.Series]:
        for cols in it:
            null_s, bad_s = cols[0], cols[1]
            elems = cols[2:]
            mask = null_s.to_numpy(dtype=bool, na_value=True)
            bad = bad_s.to_numpy(dtype=bool, na_value=False)
            if (bad & ~mask).any():
                raise ValueError(_NULL_ELEM_MSG + f" (or array length != {n})")
            X = np.column_stack(
                [e.to_numpy(dtype=np_dtype, na_value=0) for e in elems]
            )
            U = curve.bitcast_to_unsigned(np.ascontiguousarray(X), elem_bits)
            hi, lo = kernel(U, elem_bits)
            if isinstance(ret_type, T.LongType):
                out = pd.array(lo.view(np.int64), dtype="Int64")
                if mask.any():
                    out[mask] = pd.NA
                yield pd.Series(out)
            elif isinstance(ret_type, T.BinaryType):
                buf = curve.lanes_to_bytes(hi, lo, width_bytes)
                raw = buf.tobytes()
                yield pd.Series(
                    [
                        None if m else raw[i * width_bytes:(i + 1) * width_bytes]
                        for i, m in enumerate(mask)
                    ],
                    dtype=object,
                )
            else:  # Decimal(38,0)
                ints = curve.lanes_to_ints(hi, lo)
                yield pd.Series(
                    [None if m else decimal.Decimal(v) for v, m in zip(ints, mask)],
                    dtype=object,
                )

    return pandas_udf(ret_type)(fn)


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


def hilbert_encode(arr, elem="int32", n: int | None = None,
                   output: str = "auto") -> Column:
    """Hilbert-curve index of an N-dimensional point.

    ``arr`` is an array Column (pass ``n``) or a list of scalar Columns.
    ``elem`` names the element width/kind (int8/int16/int32/int64/
    float32/float64 and SQL aliases); floats and signed ints are
    *bit-cast* (reference semantics, src/lindel_extension.cpp:735-752).
    ``output``: auto|long|binary|decimal — long for total width <= 64,
    big-endian binary (unsigned sort order) otherwise.

    Reference: hilbert_encode, src/lindel_extension.cpp:495-660,950-967.
    """
    return _encode("hilbert", arr, elem, n, output)


def morton_encode(arr, elem="int32", n: int | None = None,
                  output: str = "auto") -> Column:
    """Morton (Z-order) index — MSB-first bit-interleave; element 0 is
    most significant.  Same signature as :func:`hilbert_encode`.

    Reference: morton_encode, src/lindel_extension.cpp:498-510,969-978.
    Note: for integer inputs with total width <= 64 prefer
    :func:`morton_encode_native` (pure-Column, no Python round-trip).
    """
    return _encode("morton", arr, elem, n, output)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_fn_and_type(kind: str, plan: DecodePlan, binary_input: bool):
    ret_type = T.ArrayType(plan.spark_elem, containsNull=False)
    kernel = _decode_kernel(kind)
    n, elem_bits, in_width = plan.nparts, plan.elem_bits, plan.input_width
    in_bytes = in_width // 8

    def fn(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for null_s, v_s in it:
            mask = null_s.to_numpy(dtype=bool, na_value=True)
            rows = len(mask)
            if binary_input:
                buf = np.zeros((rows, in_bytes), np.uint8)
                for i, b in enumerate(v_s):
                    if mask[i] or b is None:
                        continue
                    if len(b) != in_bytes:
                        raise ValueError(
                            f"LINDEL: decode expected {in_bytes}-byte binary, "
                            f"got {len(b)} bytes"
                        )
                    buf[i] = np.frombuffer(b, np.uint8)
                hi, lo = curve.bytes_to_lanes(buf)
            else:
                lo = v_s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
                if in_width < 64:
                    # The reference's unsigned input types make
                    # out-of-range values unrepresentable
                    # (src/lindel_extension.cpp:983-1001); raise rather
                    # than silently truncate to plausible coordinates.
                    excess = (lo & ~np.uint64((1 << in_width) - 1)) != 0
                    if (excess & ~mask).any():
                        raise ValueError(
                            f"LINDEL: decode input exceeds u{in_width} range; "
                            "pass the correct input_width"
                        )
                hi = np.zeros(rows, np.uint64)
            if in_width == 128 and n == 1:
                # u128 round-trip: 16-byte big-endian binary carrier.
                buf = curve.lanes_to_bytes(hi, lo, 16)
                raw = buf.tobytes()
                yield pd.Series(
                    [
                        None if m else [raw[i * 16:(i + 1) * 16]]
                        for i, m in enumerate(mask)
                    ],
                    dtype=object,
                )
                continue
            Xu = kernel(hi, lo, n, elem_bits)
            if plan.want_float:
                dt = np.float32 if elem_bits == 32 else np.float64
                Xc = curve.bitcast_from_unsigned(
                    Xu.astype(curve.unsigned_dtype(elem_bits)), dt
                )
            elif plan.want_unsigned:
                if elem_bits == 64:
                    ints = [
                        [decimal.Decimal(int(v)) for v in row]
                        for row in Xu.tolist()
                    ]
                    yield pd.Series(
                        [None if m else r for r, m in zip(ints, mask)],
                        dtype=object,
                    )
                    continue
                else:
                    Xc = Xu.astype(signed_np_dtype(elem_bits * 2))
            else:
                Xc = curve.bitcast_from_unsigned(
                    Xu.astype(curve.unsigned_dtype(elem_bits)),
                    signed_np_dtype(elem_bits),
                )
            yield pd.Series(
                [None if m else Xc[i] for i, m in enumerate(mask)], dtype=object
            )

    return fn, ret_type


def _make_decode_udf(kind: str, plan: DecodePlan, binary_input: bool):
    fn, ret_type = _decode_fn_and_type(kind, plan, binary_input)
    return pandas_udf(ret_type)(fn)


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
    return udf(col.isNull(), col)


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


def morton_encode_native(cols: Sequence, elem="int32") -> Column:
    """Pure-Column Morton encode for integer inputs, total width <= 64.

    Generates staged shift-or bit spreading that runs entirely inside
    JVM whole-stage codegen — the scale path for z-order writes (no
    JVM<->Python Arrow hop).  Bit-identical to :func:`morton_encode`.
    """
    et = elem_type(elem)
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
    if n == 1:
        return _to_unsigned_long(cols[0], et.bits)
    us = [_to_unsigned_long(c, et.bits) for c in cols]
    if n == 2:
        # element 0 most significant within each bit pair
        return F.shiftleft(_spread2(us[0], et.bits), 1).bitwiseOR(
            _spread2(us[1], et.bits)
        )
    # generic n: one OR-term per (coordinate, bit)
    result = F.lit(0).cast(T.LongType())
    for i, u in enumerate(us):
        for b in range(et.bits):
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

    coords = []
    for i in range(n):
        if n == 2:
            x = _compact2(F.shiftrightunsigned(col, n - 1 - i), bits)
        else:
            x = F.lit(0).cast(T.LongType())
            for b in range(bits):
                p = b * n + (n - 1 - i)
                bit = F.shiftrightunsigned(col, p).bitwiseAND(F.lit(1))
                x = x.bitwiseOR(F.shiftleft(bit, b))
        coords.append(resign(x))
    return F.array(*coords)


# ---------------------------------------------------------------------------
# SQL registration (reference: catalog registration with metadata,
# src/lindel_extension.cpp:948-1026; no telemetry — deliberately omitted)
# ---------------------------------------------------------------------------

def _make_encode_array_udf(kind: str, et: ElemType, n: int, out_mode: str):
    """Array-column-input variant for SQL registration (one arg)."""
    total_bits = encode_output_bits(et.bits, n)
    ret_type = encode_output_spark_type(total_bits, out_mode)
    width_bytes = total_bits // 8
    kernel = _encode_kernel(kind)
    np_dtype = et.np_dtype
    elem_bits = et.bits

    def fn(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            rows = len(s)
            mask = np.zeros(rows, bool)
            X = np.zeros((rows, n), dtype=np_dtype)
            for i, v in enumerate(s):
                if v is None:
                    mask[i] = True
                    continue
                # NULL elements surface as None (object arrays/lists) or,
                # for float element types after Arrow->pandas, as NaN in
                # a float ndarray. NaN is a *legal* bit-cast input for
                # float elems only when the source really was NaN, which
                # Arrow keeps as None in object form — so an object dtype
                # here always means a NULL element.
                if isinstance(v, (list, tuple)):
                    if any(x is None for x in v):
                        raise ValueError(_NULL_ELEM_MSG)
                a = np.asarray(v)
                if a.dtype == object:
                    if any(x is None for x in v):
                        raise ValueError(_NULL_ELEM_MSG)
                    a = a.astype(np_dtype)
                if a.dtype.kind == "f" and not et.is_float and np.isnan(a).any():
                    raise ValueError(_NULL_ELEM_MSG)
                if a.shape != (n,):
                    raise ValueError(
                        f"LINDEL: expected array of length {n}, got {a.shape}"
                    )
                X[i] = a
            U = curve.bitcast_to_unsigned(np.ascontiguousarray(X), elem_bits)
            hi, lo = kernel(U, elem_bits)
            if isinstance(ret_type, T.LongType):
                out = pd.array(lo.view(np.int64), dtype="Int64")
                if mask.any():
                    out[mask] = pd.NA
                yield pd.Series(out)
            elif isinstance(ret_type, T.BinaryType):
                buf = curve.lanes_to_bytes(hi, lo, width_bytes)
                raw = buf.tobytes()
                yield pd.Series(
                    [
                        None if m else raw[i * width_bytes:(i + 1) * width_bytes]
                        for i, m in enumerate(mask)
                    ],
                    dtype=object,
                )
            else:
                ints = curve.lanes_to_ints(hi, lo)
                yield pd.Series(
                    [None if m else decimal.Decimal(v) for v, m in zip(ints, mask)],
                    dtype=object,
                )

    return pandas_udf(ret_type)(fn)


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
                ret = encode_output_spark_type(
                    encode_output_bits(et.bits, n), "auto"
                ).simpleString()
                arr_t = f"array<{et.spark_type.simpleString()}>"
                spark.sql(f"""
                    CREATE OR REPLACE TEMPORARY FUNCTION {name}(arr {arr_t})
                    RETURNS {ret}
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
                    spark.udf.register(
                        name, _make_decode_sql_udf(kind, plan, width == 128)
                    )
                    names.append(name)
    return names


def _make_decode_sql_udf(kind: str, plan: DecodePlan, binary_input: bool):
    """One-arg decode UDF for SQL registration (derives null mask itself)."""
    inner_fn, ret_type = _decode_fn_and_type(kind, plan, binary_input)

    def outer(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield from inner_fn(iter([(s.isna(), s)]))

    return pandas_udf(ret_type)(outer)
