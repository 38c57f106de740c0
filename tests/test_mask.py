"""Data-masking stages (functions/mask.py) — the impl/mask/* analog."""

import hashlib

import pyarrow as pa
import pytest

from orc_ray.functions.mask import apply_masks, mask_columns


def _t():
    return pa.table(
        {
            "id": pa.array([1, 2, 3]),
            "text": pa.array(["Ab1 c?", "ZZ 99", None]),
            "ssn": pa.array(["123-45-6789", "000-00-0000", "x"]),
        }
    )


def test_redact_char_map():
    out = apply_masks(_t(), {"text": "redact"})
    assert out.column("text").to_pylist() == ["Xx9 x?", "XX 99", None]


def test_sha256_matches_hashlib_and_keeps_nulls():
    out = apply_masks(_t(), {"text": "sha256"})
    got = out.column("text").to_pylist()
    assert got[0] == hashlib.sha256(b"Ab1 c?").hexdigest()
    assert got[2] is None


def test_nullify_keeps_type():
    out = apply_masks(_t(), {"ssn": "nullify"})
    col = out.column("ssn")
    assert col.null_count == 3 and col.type == pa.string()


def test_unknown_mask_and_column_raise():
    with pytest.raises(ValueError):
        apply_masks(_t(), {"text": "rot13"})
    with pytest.raises(KeyError):
        apply_masks(_t(), {"nope": "redact"})


def test_write_side_mask_through_store(ray_session, tmp_path):
    """EncodeOptions.masks (the writer-option analog): the chunk store
    must contain MASKED values — decode shows them, raw values are gone."""
    import pyarrow.parquet as pq

    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.decode import decode_dataset
    from orc_ray.pipeline.encode import encode_dataset

    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"id": [1, 2, 3], "ssn": ["123-45", "678-90", "ab"], "note": ["x", "y", "z"]}),
        src,
    )
    out = tmp_path / "store"
    opts = EncodeOptions(masks={"ssn": "redact", "note": "nullify"})
    encode_dataset([str(src)], str(out), opts)
    t = pa.concat_tables(
        list(decode_dataset(str(out)).iter_batches(batch_format="pyarrow", batch_size=None))
    ).sort_by("id")
    assert t.column("ssn").to_pylist() == ["999-99", "999-99", "xx"]
    assert t.column("note").null_count == 3
    # raw values never reached the chunk files
    import glob

    blob = b"".join(open(p, "rb").read() for p in glob.glob(str(out / "chunks" / "*")))
    assert b"123-45" not in blob


def test_mask_columns_stage(ray_session):
    import ray

    ds = ray.data.from_arrow(_t()).repartition(2)
    out = mask_columns(ds, {"ssn": "redact", "text": "nullify"})
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    t = t.sort_by("id")
    assert t.column("ssn").to_pylist() == ["999-99-9999", "999-99-9999", "x"]
    assert t.column("text").null_count == 3


def test_write_side_mask_typo_fails_loudly(ray_session, tmp_path):
    """Regression (review finding): a mask naming a missing column must
    FAIL the encode, not silently write the raw data."""
    import pyarrow.parquet as pq

    from orc_ray.chunk import EncodeOptions
    from orc_ray.pipeline.encode import encode_dataset

    src = tmp_path / "in.parquet"
    pq.write_table(pa.table({"id": [1], "ssn": ["123"]}), src)
    with pytest.raises(Exception) as ei:
        encode_dataset([str(src)], str(tmp_path / "store"), EncodeOptions(masks={"ssN": "sha256"}))
    assert "ssN" in str(ei.value)


def test_scrub_pii_mask():
    t = pa.table(
        {
            "id": [1, 2, 3],
            "text": pa.array(
                [
                    "contact me at jane.doe+x@example.co.uk or call +1 (415) 555-0199 today",
                    "no pii here",
                    None,
                ]
            ),
        }
    )
    out = apply_masks(t, {"text": "scrub_pii"})
    got = out.column("text").to_pylist()
    assert got[0] == "contact me at [EMAIL] or call [PHONE] today"
    assert got[1] == "no pii here"
    assert got[2] is None
