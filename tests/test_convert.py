"""CSV / JSONL ingestion (orc-tools `convert` analog, trust-mode commit)."""

import json
import os

import pyarrow as pa
import pytest

from orc_ray.pipeline.decode import decode_dataset
from orc_ray.pipeline.encode import encode_dataset


def _collect(ds) -> pa.Table:
    parts = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return pa.concat_tables([p for p in parts if p.num_rows]).combine_chunks()


def test_csv_roundtrip(ray_session, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for f in range(2):
        with open(src / f"part{f}.csv", "w") as fh:
            fh.write("id,name,score\n")
            for i in range(100):
                fh.write(f"{f * 100 + i},name{i % 7},{i * 2}\n")
    out = str(tmp_path / "store")
    rec = encode_dataset(str(src), out, file_format="csv", batch_size=50)
    assert rec["totals"]["rows"] == 200
    t = _collect(decode_dataset(out)).sort_by("id")
    assert t.num_rows == 200
    assert t.column("id").to_pylist() == list(range(200))
    assert t.column("name")[3].as_py() == "name3"


def test_jsonl_roundtrip(ray_session, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "data.jsonl", "w") as fh:
        for i in range(150):
            fh.write(json.dumps({"id": i, "text": f"doc text {i % 11}", "n": i * 3}) + "\n")
    out = str(tmp_path / "store")
    rec = encode_dataset(str(src), out, file_format="json", batch_size=64)
    assert rec["totals"]["rows"] == 150
    t = _collect(decode_dataset(out)).sort_by("id")
    assert t.column("n").to_pylist() == [i * 3 for i in range(150)]


def test_partitioned_parquet_export(tmp_path, ray_session):
    """decode --out --partition-by: hive-layout export (one directory per
    key) so a downstream consumer can skip finished partitions."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"id": list(range(40)), "grp": ["a", "b"] * 20}), src
    )
    store = tmp_path / "store"
    out = tmp_path / "export"
    env = {**os.environ, "RAY_ADDRESS": "local"}
    for args in (
        ["encode", str(src), str(store)],
        ["decode", str(store), "--out", str(out), "--partition-by", "grp"],
    ):
        r = subprocess.run(
            [sys.executable, "-m", "orc_ray", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
    dirs = sorted(p.name for p in out.iterdir() if p.is_dir())
    assert dirs == ["grp=a", "grp=b"]
    back = pq.read_table(str(out)).sort_by("id")
    assert back.column("id").to_pylist() == list(range(40))
