"""Data-masking stages — the reference's DataMask SPI analog.

apache/orc masks columns at write time through pluggable DataMask
implementations (java/core/.../org/apache/orc/impl/mask/*: NullifyMask,
RedactMaskFactory, SHA256MaskFactory ≈600 LoC).  Column ENCRYPTION stays
out of scope (Java-only, needs a KMS); masking does not — it is a pure
batch transform, so here it is a composable ``map_batches`` stage applied
before encode (or anywhere in a pipeline).

Masks:
  nullify — replace every value with null (NullifyMask);
  redact  — lowercase -> 'x', uppercase -> 'X', digit -> '9', other
            characters kept (RedactMaskFactory's default char map),
            fully vectorized Arrow regex;
  sha256  — hex SHA-256 of the utf-8 value (SHA256MaskFactory), via the
            block-parallel NumPy kernel (sha256vec.py) — no per-row loop;
            bit-exact vs hashlib, null-preserving.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .sha256vec import sha256_hex


def _mask_nullify(col: pa.Array) -> pa.Array:
    return pa.nulls(len(col), col.type)


def _mask_redact(col: pa.Array) -> pa.Array:
    s = col.cast(pa.string())
    s = pc.replace_substring_regex(s, pattern="[a-z]", replacement="x")
    s = pc.replace_substring_regex(s, pattern="[A-Z]", replacement="X")
    return pc.replace_substring_regex(s, pattern="[0-9]", replacement="9")


def _mask_sha256(col: pa.Array) -> pa.Array:
    hx = sha256_hex(col)
    if col.null_count:
        hx = pc.if_else(pc.is_null(col), pa.scalar(None, pa.string()), hx)
    return hx


_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def _mask_scrub_pii(col: pa.Array) -> pa.Array:
    """Replace emails / phone-number-shaped runs with typed placeholders —
    the text-curation PII scrub (RE2-safe patterns, fully vectorized)."""
    s = col.cast(pa.string())
    s = pc.replace_substring_regex(s, pattern=_EMAIL_RE, replacement="[EMAIL]")
    return pc.replace_substring_regex(s, pattern=_PHONE_RE, replacement="[PHONE]")


_MASKS = {
    "nullify": _mask_nullify,
    "redact": _mask_redact,
    "sha256": _mask_sha256,
    "scrub_pii": _mask_scrub_pii,
}


def apply_masks(batch: pa.Table, masks: dict[str, str]) -> pa.Table:
    """Apply per-column masks ({column: mask_name}) to one batch."""
    for name, mask in masks.items():
        if name not in batch.column_names:
            raise KeyError(f"mask column {name!r} not in batch {batch.column_names}")
        fn = _MASKS.get(mask)
        if fn is None:
            raise ValueError(f"unknown mask {mask!r}; choose from {sorted(_MASKS)}")
        col = batch.column(name)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        batch = batch.set_column(batch.column_names.index(name), name, fn(col))
    return batch


def mask_columns(ds, masks: dict[str, str]):
    """Masking pipeline stage: ``mask_columns(ds, {"ssn": "sha256"})``."""
    import functools

    return ds.map_batches(
        functools.partial(apply_masks, masks=masks),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
