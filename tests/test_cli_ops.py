"""CLI surface for the round-3 operators: profile, text-index, bm25."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from orc_ray.__main__ import main
from orc_ray.pipeline.encode import encode_dataset


def test_profile_and_bm25_cli(ray_session, tmp_path, capsys):
    rng = np.random.default_rng(23)
    n = 2000
    vocab = [f"w{i}" for i in range(50)]
    t = pa.table(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, 12)) for _ in range(n)],
            "score": rng.uniform(0, 10, n).round(2),
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    store = str(tmp_path / "store")
    encode_dataset([src], store, batch_size=512)

    assert main(["profile", store, "--cols", "doc_id,score"]) == 0
    out = capsys.readouterr().out
    assert "doc_id" in out and "approx_distinct" in out

    idx = str(tmp_path / "idx")
    assert main(["text-index", store, idx]) == 0
    capsys.readouterr()
    assert main(["bm25", idx, "w7,w13", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert "score_e6" in out and len(out.strip().splitlines()) == 6
