"""Golden-corpus conformance: the committed chunk blobs pin the on-disk
format within a FORMAT_VERSION — the analog of apache/orc's examples/
ORC files + expected JSON dumps asserted by tools/test/TestFileContents.cc
(SURVEY.md §5 level 3).

Three guarantees:
  1. byte stability  — re-encoding the pinned fixtures reproduces the
     committed blobs bit-for-bit (deterministic encoder; catches silent
     format drift from codec edits);
  2. decode fidelity — the committed blobs decode to the committed
     canonical JSON values (old files stay readable and correct);
  3. corpus integrity — sha256 manifest matches the files on disk.
"""

import hashlib
import json
import os
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, GOLDEN)

from golden_cases import CASE_KEYS, CASES, canon_table  # noqa: E402

from orc_ray.chunk import FORMAT_VERSION, decode_chunk, encode_chunk  # noqa: E402

with open(os.path.join(GOLDEN, "MANIFEST.json")) as f:
    MANIFEST = json.load(f)


def _blob(name: str) -> bytes:
    with open(os.path.join(GOLDEN, f"{name}.oray"), "rb") as f:
        return f.read()


def test_manifest_covers_all_cases():
    assert MANIFEST["format_version"] == FORMAT_VERSION, (
        "FORMAT_VERSION changed: regenerate the golden corpus deliberately "
        "(python tests/golden/gen_golden.py) and review the diff"
    )
    assert set(MANIFEST["cases"]) == set(CASES)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_corpus_integrity(name):
    blob = _blob(name)
    rec = MANIFEST["cases"][name]
    assert len(blob) == rec["bytes"]
    assert hashlib.sha256(blob).hexdigest() == rec["sha256"]


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_byte_stability(name):
    """Encoder determinism + format stability: same input, same options,
    same bytes.  A diff here means the on-disk format drifted WITHIN a
    FORMAT_VERSION — either revert the codec change or bump the version
    and regenerate."""
    builder, opts = CASES[name]
    assert encode_chunk(builder(), opts) == _blob(name)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_decode_fidelity(name):
    """Committed blobs decode to the committed canonical values.  For
    encrypted cases the keyless decode is the MASKED public view — that
    masked contract is pinned too (a reader without keys must see the
    committed redaction, never ciphertext or plaintext)."""
    with open(os.path.join(GOLDEN, "expected", f"{name}.json")) as f:
        expected = json.load(f)
    got = canon_table(decode_chunk(_blob(name)))
    assert got == expected


@pytest.mark.parametrize("name", sorted(CASE_KEYS))
def test_golden_keyed_decode_fidelity(name):
    """Encrypted blobs decode bit-exactly to the committed plaintext when
    the right key is presented (the analog of apache/orc's encrypted
    examples read back with the test KeyProvider)."""
    with open(os.path.join(GOLDEN, "expected", f"{name}.keyed.json")) as f:
        expected = json.load(f)
    got = canon_table(decode_chunk(_blob(name), keys=CASE_KEYS[name]))
    assert got == expected
