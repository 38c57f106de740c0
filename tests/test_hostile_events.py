"""Hostile events corpus through the events-family queries.

The sf testdata's events table is fully non-null with distinct
timestamps, so it cannot catch the null-semantics divergences a real
event stream hits immediately: null user_id / event_type / value rows,
an event_type whose EVERY value is null, exact-duplicate timestamps,
and zero / extreme values.  This corpus pins all of those against the
same DuckDB oracles the driver gate runs.

Regressions this file guards (each was a live bug found by the
hostile-events sweep — 25 divergences at the time):
- np.rint(NaN)->INT64_MIN garbage in every *cents* stage (median_value,
  mad_value, time_weighted_value, window_hourly_events, ...)
- np.lexsort over object arrays raising None-vs-str '<' in epilogues
  (group_quantiles, argmax_events, winsorized_stats, percentile_cont)
- a null group key silently dropped by Arrow joins (first_last_touch)
  or folded into bucket 19 by DuckDB's null-ignoring LEAST
  (value_histogram oracle)
- COUNT(DISTINCT user_id) counting the NULL user (distinct_users_by_type)
- the NULL user missing from the CMS heavy-hitter top-K (heavy_users)
- group_median_disc comparing None keys inside Ray's sort (median_value)
- null map values / union branches dropped by roundtrip builders
  (map_tagged_values, union_tagged_values, struct_pruned_read)
"""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# every oracle-backed query the pre-fix sweep flagged on this corpus
QUERY_NAMES = [
    "window_hourly_events", "session_windows", "sliding_window_events",
    "median_value", "global_quantiles", "weekly_retention",
    "group_quantiles", "first_last_touch", "value_rank_events",
    "running_low_value", "median_interarrival", "hourly_seasonality",
    "percentile_ranks", "value_histogram", "mad_value", "heavy_users",
    "argmax_events", "distinct_users_by_type", "group_percentile_cont",
    "winsorized_stats", "union_tagged_values", "map_tagged_values",
    "struct_pruned_read", "time_weighted_value",
]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostileevents")
    rng = np.random.default_rng(41)
    n = 1200
    etypes = ["click", "view", "purchase", "signup", "error", None]
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC in us
    ts = base + np.cumsum(rng.integers(1, 900_000_000, n))
    rows = {
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.copy(),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "event_type": [etypes[i % 6] if i % 17 == 5 else etypes[i % 5] for i in range(n)],
        "value": np.round(rng.uniform(0, 500, n), 2),
        "props": ['{"k": %d}' % (i % 97) for i in range(n)],
    }
    uid_null = np.zeros(n, bool)
    val_null = np.zeros(n, bool)
    ts_null = np.zeros(n, bool)
    for i in range(n):
        if i % 13 == 3:
            uid_null[i] = True
        if i % 19 == 7:
            val_null[i] = True
        if i % 23 == 11:
            rows["value"][i] = 0.0
        if i % 29 == 13 and i > 0:
            rows["ts"][i] = rows["ts"][i - 1]  # exact duplicate timestamp
        if i % 31 == 17:
            ts_null[i] = True  # null event-time: windows/LAG/sessionization
    # one event_type whose EVERY value is null: SUM() must stay NULL
    for i in range(0, n, 151):
        rows["event_type"][i] = "ghost"
        val_null[i] = True
    t = pa.table(
        {
            "event_id": pa.array(rows["event_id"]),
            "ts": pa.array(rows["ts"], mask=ts_null).cast(pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], mask=uid_null),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], mask=val_null),
            "props": pa.array(rows["props"], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "events.parquet"))
    return str(d)


def _norm(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()
    return len(df), tuple(df.columns), h


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_events_query_on_hostile_corpus(name, sf_dir, ray_session):
    import ray as _ray

    from orc_ray.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](sf_dir)
    if isinstance(res, _ray.data.Dataset):
        res = pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        )
    mine = res.to_pandas() if isinstance(res, pa.Table) else res

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)


def test_approx_distinct_on_hostile_corpus(sf_dir, ray_session):
    """Self-asserting (HLL vs exact inside the query) — must tolerate the
    null event_type group and null user_ids without KeyError."""
    from orc_ray.queries import QUERIES

    out = QUERIES["approx_distinct_users"](sf_dir)
    df = out.to_pandas() if isinstance(out, pa.Table) else out
    assert len(df) > 0
