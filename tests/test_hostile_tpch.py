"""Hostile relational corpus through the TPC-H-family queries.

The sf testdata's relational tables are fully non-null, so they cannot
catch the null-semantics divergences real warehouse data hits
immediately: null foreign keys, null measures, null group keys, and
groups whose EVERY measure is null.  This corpus (sf0.001 with
deterministic index-based null injection) pins all 60 oracle-backed
relational queries against the same DuckDB oracles the driver gate runs.

Regressions this file guards (each was a live bug found by the
hostile-relational sweep — 36 divergences at the time):
- np.rint(NaN)->INT64_MIN garbage in every *cents* stage
  (prefix_scan_customers, full_join_daily, revenue_share, ...)
- INNER-join semantics on broadcast probes: null/unmatched keys
  surfaced phantom rows (join_orders_customer, returned_item_revenue)
- COUNT(*) vs COUNT(col) with null measures (agg_pricing_summary, Q17)
- NULL = / NULL LIKE predicates falling to the CASE ELSE arm
- window SUM skipping null terms and staying NULL until the first valid
  one (running_revenue's packed prefix sums, the _daily_revenue family)
- the NULL group key: one GROUP BY group (weighted_median's sentinel,
  dropped by the oracle's inner JOIN USING), a receive-only PageRank
  node, a dropped asof/range build row, a skyline pass-through
- all-null groups emitting SQL-NULL moments instead of dividing garbage
  (status_moments, pythagorean_means)
"""

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# every oracle-backed query that reads the relational tables (the full
# sweep list — 36 of these diverged before the hostile-null hardening)
QUERY_NAMES = [
    "agg_pricing_summary", "nation_revenue", "join_orders_customer",
    "join_lineitem_orders", "top_revenue_orders", "large_orders",
    "returned_item_revenue", "left_join_returns", "anti_join_customers",
    "above_avg_orders", "having_customers", "order_priority_exists",
    "bloom_join", "profit_by_nation", "promo_share", "small_qty_revenue",
    "disjunctive_revenue", "revenue_quartiles", "rollup_revenue",
    "cube_revenue", "grouping_sets_revenue", "top_segment_revenue",
    "linestatus_priority_mix", "mode_priority", "customer_order_overlap",
    "excess_suppliers", "waiting_suppliers", "supplier_cnt", "custdist",
    "market_share", "volume_shipping", "top_supplier", "sales_opportunity",
    "fuzzy_part_match", "skyline_parts", "moving_avg_revenue",
    "running_revenue", "order_gaps", "order_next_gap", "forecast_revenue",
    "gap_fill_revenue", "revenue_trend_slope", "revenue_share",
    "range_frame_revenue", "pivot_weekday", "unpivot_part",
    "weighted_median", "same_day_order_pairs", "order_clusters",
    "full_join_daily", "profile_lineitem", "corr_moments", "status_moments",
    "pythagorean_means", "percentile_cont", "prefix_scan_customers",
    "pagerank", "asof_join_events_orders", "range_join_events_orders",
    "gini_user_activity",
]


def _null_out(t: pa.Table, col: str, step: int, phase: int) -> pa.Table:
    """Deterministic index-based null injection so reruns agree."""
    mask = (np.arange(t.num_rows) % step) == phase
    arr = t.column(col).combine_chunks()
    new = pc.if_else(pa.array(~mask), arr, pa.scalar(None, arr.type))
    return t.set_column(t.schema.get_field_index(col), col, new)


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostilerel"))
    for name in TABLES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if name == "customer":
            t = _null_out(t, "c_nationkey", 11, 4)
            t = _null_out(t, "c_acctbal", 13, 6)
            t = _null_out(t, "c_mktsegment", 17, 9)
        elif name == "orders":
            t = _null_out(t, "o_custkey", 12, 5)
            t = _null_out(t, "o_totalprice", 19, 8)
            t = _null_out(t, "o_orderpriority", 23, 11)
        elif name == "lineitem":
            t = _null_out(t, "l_discount", 21, 3)
            t = _null_out(t, "l_tax", 27, 13)
            t = _null_out(t, "l_returnflag", 31, 17)
            t = _null_out(t, "l_quantity", 37, 19)
        elif name == "supplier":
            t = _null_out(t, "s_nationkey", 7, 2)
            t = _null_out(t, "s_acctbal", 9, 4)
        elif name == "part":
            t = _null_out(t, "p_size", 8, 3)
            t = _null_out(t, "p_type", 15, 7)
        pq.write_table(t, os.path.join(d, f"{name}.parquet"))
    return d


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256(
        pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()
    ).hexdigest()
    return len(df), tuple(df.columns), h


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_relational_query_on_hostile_corpus(name, sf_dir, oracle_con, ray_session):
    import ray as _ray

    from orc_ray.queries import ORACLE_SQL, QUERIES

    res = QUERIES[name](sf_dir)
    if isinstance(res, _ray.data.Dataset):
        res = pa.concat_tables(
            list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        )
    mine = res.to_pandas() if isinstance(res, pa.Table) else res
    exp = oracle_con.execute(ORACLE_SQL[name]).df()
    assert _norm(mine) == _norm(exp)
