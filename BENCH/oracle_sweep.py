"""Local replica of the driver's correctness gate: run every queries()
pipeline against its oracle_sql() DuckDB equivalent at a given scale and
report rows/schema/value-hash matches.

    python BENCH/oracle_sweep.py [sf_dir] [name1,name2,...]
(defaults: /root/testdata/sf0.01, all queries)
"""
import hashlib
import sys

import duckdb
import pandas as pd
import pyarrow as pa

import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except Exception:
        pass  # unsortable column types (lists): hash in input order of str
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()[:12]
    return len(df), tuple(df.columns), h


def main() -> int:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, log_to_driver=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    queries, oracles = E.queries(), E.oracle_sql()
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    bad = 0
    for name, fn in queries.items():
        try:
            res = fn(SF)
            if not isinstance(res, (pa.Table, pd.DataFrame)):
                res = pa.concat_tables(
                    list(res.iter_batches(batch_format="pyarrow", batch_size=None))
                )
            mine = res.to_pandas() if isinstance(res, pa.Table) else res
            if name in oracles:
                a, b = norm(mine), norm(con.execute(oracles[name]).df())
                st = "MATCH" if a == b else f"MISMATCH {a[:2]} vs {b[:2]}"
            else:
                st = f"rows_only({len(mine)})"
        except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
            st = f"ERROR {type(e).__name__}: {e}"
        bad += "MATCH" != st and "rows_only" not in st
        print(f"{name}: {st}")
    print(f"\n{len(queries) - bad} ok / {bad} bad; oracles: {len(oracles)}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
