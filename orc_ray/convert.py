"""Reader-schema conversion matrix — the ConvertColumnReader analog
(apache/orc c++/src/ConvertColumnReader.cc, ~1000 LoC; java
ConvertTreeReaderFactory).

The reference's schema-evolution reader converts every (file type, reader
type) pair in a fixed matrix, with *forgiving* semantics: a value that
cannot be represented in the reader type (integer overflow, unparseable
string, NaN) becomes NULL rather than failing the read.  Arrow's safe
``cast`` covers the lossless part of the matrix but raises on lossy
values, so :func:`convert_column` tries the safe cast first and falls
back to the forgiving per-kind paths below:

- numeric -> narrower integer: out-of-range values null (ORC
  ConvertToLongColumnReader range check); floats truncate toward zero
  (static_cast semantics), NaN/inf null
- string -> numeric: unparseable null (ConvertTreeReaderFactory
  parseLongFromString behavior)
- string -> timestamp: unparseable null
- decimal rescale / decimal -> numeric: digits beyond the target scale
  are truncated (allow_decimal_truncate)

Everything vectorized: numpy range masks + Arrow cast kernels; the only
per-row work is pandas' C parser on the (rare) string->numeric fallback.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INT_BOUNDS = {
    pa.int8(): (-(2**7), 2**7 - 1),
    pa.int16(): (-(2**15), 2**15 - 1),
    pa.int32(): (-(2**31), 2**31 - 1),
    pa.int64(): (-(2**63), 2**63 - 1),
    pa.uint8(): (0, 2**8 - 1),
    pa.uint16(): (0, 2**16 - 1),
    pa.uint32(): (0, 2**32 - 1),
    pa.uint64(): (0, 2**64 - 1),
}


def _merge_null_mask(arr: pa.Array, extra_invalid: np.ndarray) -> pa.Array:
    """Null out positions where ``extra_invalid`` is True."""
    if not extra_invalid.any():
        return arr
    valid = np.asarray(pc.is_valid(arr)) & ~extra_invalid
    idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=~valid)
    return arr.take(idx)


def _is_string(ty: pa.DataType) -> bool:
    return pa.types.is_string(ty) or pa.types.is_large_string(ty)


import re as _re

_CHAR_SPEC = _re.compile(r"^(char|varchar)\((\d+)\)$")


def _char_convert(arr: pa.Array, kind: str, n: int) -> pa.Array:
    """CHAR(n)/VARCHAR(n) reader semantics (apache/orc
    c++/src/ColumnWriter.cc ≈1700 Char/VarcharColumnWriter; Arrow has no
    fixed-length char type, so these are read-time conversions): both
    truncate to n code points; CHAR additionally space-pads to exactly n."""
    s = arr if _is_string(arr.type) else arr.cast(pa.string())
    s = pc.utf8_slice_codeunits(s, 0, n)
    if kind == "char":
        s = pc.utf8_rpad(s, width=n, padding=" ")
    return s


def convert_column(arr: pa.Array | pa.ChunkedArray, target) -> pa.Array | pa.ChunkedArray:
    """Convert ``arr`` to ``target`` with ORC schema-evolution semantics.

    ``target`` is an Arrow DataType, or the string spec "char(n)" /
    "varchar(n)" for the two ORC types with no Arrow analog."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(target, str):
        m = _CHAR_SPEC.match(target.strip().lower())
        if not m:
            raise ValueError(f"unknown target type spec {target!r}")
        return _char_convert(arr, m.group(1), int(m.group(2)))
    if arr.type.equals(target):
        return arr
    # naive <-> tz-aware timestamps need the wall-clock semantics BELOW,
    # not Arrow's default cast (which silently relabels naive as UTC) —
    # skip the generic safe-cast shortcut for that pair
    _tz_pair = (
        pa.types.is_timestamp(arr.type)
        and pa.types.is_timestamp(target)
        and (arr.type.tz is None) != (target.tz is None)
    )
    if not _tz_pair:
        try:
            return arr.cast(target)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass

    src = arr.type

    # numeric -> integer: truncate floats toward zero, null out-of-range
    if (pa.types.is_integer(src) or pa.types.is_floating(src)) and pa.types.is_integer(target):
        lo, hi = _INT_BOUNDS[target]
        orig_null = ~np.asarray(pc.is_valid(arr))
        v = arr.fill_null(0).to_numpy(zero_copy_only=False)
        if pa.types.is_floating(src):
            # exclusive float bounds: lo and hi+1 are powers of two (or 0),
            # hence exactly representable — comparing v > float(hi) would
            # miss values that round UP to the bound (float64(2**63 - 1)
            # == 2**63) and silently wrap on the trunc/astype below
            bad = ~np.isfinite(v) | (v < float(lo)) | (v >= float(hi + 1))
            safe = np.where(bad, 0.0, v)
            ints = np.trunc(safe).astype("int64" if lo < 0 else "uint64")
        else:
            # exact integer-domain range check (float compare is lossy at
            # the int64 boundary: uint64 2**63 -> float 2**63 == int64.max
            # rounded, so out-of-range values escaped and crashed the cast)
            if v.dtype.kind == "u":
                bad = v > np.uint64(hi) if hi < 2**64 else np.zeros(v.size, bool)
            else:
                bad = (v < max(lo, -(2**63))) | (v > min(hi, 2**63 - 1))
            ints = np.where(bad, 0, v)
        out = pa.array(ints).cast(target)
        return _merge_null_mask(out, bad | orig_null)

    # integer -> float (uint64 > 2**63 etc.): lossy but total — force it
    if pa.types.is_integer(src) and pa.types.is_floating(target):
        return pc.cast(arr, target, safe=False)

    # string -> numeric: unparseable values null (C parser via pandas)
    if _is_string(src) and (pa.types.is_integer(target) or pa.types.is_floating(target)):
        import pandas as pd

        parsed = pd.to_numeric(arr.to_pandas(), errors="coerce")
        out = pa.Array.from_pandas(parsed)
        return convert_column(out, target)  # range-check via the numeric path

    # string -> timestamp/date: unparseable values null
    if _is_string(src) and (pa.types.is_timestamp(target) or pa.types.is_date(target)):
        import pandas as pd

        parsed = pd.to_datetime(arr.to_pandas(), errors="coerce")
        out = pa.Array.from_pandas(parsed)
        return out.cast(target)

    # decimal rescale / decimal <-> numeric: truncate extra digits
    if pa.types.is_decimal(src) or pa.types.is_decimal(target):
        opts = pc.CastOptions(target_type=target, allow_decimal_truncate=True)
        return pc.cast(arr, options=opts)

    # timestamp <-> timestamp: timezone semantics first (the reference's
    # Timezone layer, apache/orc c++/src/Timezone.cc — a TIMESTAMP is a
    # WALL CLOCK, a TIMESTAMP_INSTANT (tz-aware) is an absolute instant),
    # then precision narrowing (ns -> s etc.: truncate).
    if pa.types.is_timestamp(src) and pa.types.is_timestamp(target):
        if src.tz is None and target.tz is not None:
            # naive wall clock localized IN THE TARGET tz (the writer-tz
            # interpretation a reader applies to ORC TIMESTAMP values) —
            # a bare cast would mislabel the wall clock as UTC.  Ambiguous
            # / nonexistent wall clocks at DST transitions resolve
            # "earliest" — the reference's getVariant lower-bound pick.
            local = pc.assume_timezone(
                arr, target.tz, ambiguous="earliest", nonexistent="earliest"
            )
            return pc.cast(local, target, safe=False)
        if src.tz is not None and target.tz is None:
            # instant -> the SOURCE zone's wall clock (what a reader in
            # that zone sees), then drop the zone
            wall = pc.local_timestamp(arr)
            return pc.cast(wall, target, safe=False)
        # tz -> tz (or same-kind): the instant is preserved; only the
        # display zone / unit changes
        return pc.cast(arr, target, safe=False)

    # boolean <- numeric: ORC nonzero -> true
    if pa.types.is_boolean(target):
        return pc.not_equal(arr, pa.scalar(0).cast(src))

    # last resort: unsafe cast (caller asked for the conversion explicitly)
    return pc.cast(arr, target, safe=False)


def convert_table(t: pa.Table, cast_schema: dict) -> pa.Table:
    """Apply a {column -> target type} reader-schema mapping to a table."""
    for name, ty in cast_schema.items():
        if name in t.column_names:
            i = t.column_names.index(name)
            t = t.set_column(i, name, convert_column(t.column(name), ty))
    return t
