"""Regenerate the golden chunk corpus.  Run ONLY on a deliberate format
change (FORMAT_VERSION bump); commit the resulting files.

    python tests/golden/gen_golden.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, HERE)

from golden_cases import CASE_KEYS, CASES, canon_table  # noqa: E402

from orc_ray.chunk import FORMAT_VERSION, decode_chunk, encode_chunk  # noqa: E402


def main() -> None:
    os.makedirs(os.path.join(HERE, "expected"), exist_ok=True)
    manifest = {"format_version": FORMAT_VERSION, "cases": {}}
    for name, (builder, opts) in CASES.items():
        table = builder()
        blob = encode_chunk(table, opts)
        keys = CASE_KEYS.get(name)
        if keys is None:
            assert decode_chunk(blob).equals(table), name  # sanity round-trip
            public = table
        else:
            assert decode_chunk(blob, keys=keys).equals(table), name  # keyed round-trip
            public = decode_chunk(blob)  # masked view — pinned as the keyless contract
            with open(os.path.join(HERE, "expected", f"{name}.keyed.json"), "w") as f:
                json.dump(canon_table(table), f, sort_keys=True)
        path = os.path.join(HERE, f"{name}.oray")
        with open(path, "wb") as f:
            f.write(blob)
        with open(os.path.join(HERE, "expected", f"{name}.json"), "w") as f:
            json.dump(canon_table(public), f, sort_keys=True)
        manifest["cases"][name] = {
            "sha256": hashlib.sha256(blob).hexdigest(),
            "bytes": len(blob),
            "rows": table.num_rows,
        }
        print(f"{name}: {len(blob)} B, {table.num_rows} rows")
    with open(os.path.join(HERE, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
