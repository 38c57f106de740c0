"""Round-trip and pushdown queries (engine identity vs SQL identity).

Split from the monolithic queries.py (r3 verdict item 10); see the
package __init__ for the registry and the original design docstring.
"""

from __future__ import annotations

import functools
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..chunk import DEFAULT_OPTIONS
from ..pipeline.decode import decode_dataset
from ..pipeline.encode import encode_dataset
from ._shared import CACHE_ROOT, _decoded, _to_table, store_for


def _join_on_source(left: pa.Table, right: pa.Table) -> pa.Table:
    """O(sources) driver-side merge of the dual-read aggregates.  Arrow's
    Table.join drops NULL keys, so the SQL NULL source group would lose
    its right-side column; a sentinel-filled index_in keeps it."""
    SENT = "\x00"
    lk = pc.fill_null(left.column("source"), SENT).combine_chunks()
    rk = pc.fill_null(right.column("source"), SENT).combine_chunks()
    idx = pc.index_in(lk, value_set=rk)
    merged = left
    for name in right.column_names:
        if name == "source":
            continue
        merged = merged.append_column(
            name, pc.take(right.column(name).combine_chunks(), idx)
        )
    return merged.sort_by("source")


def q_roundtrip_documents(sf_dir: str):
    return _decoded(sf_dir, "documents")


def q_roundtrip_lineitem(sf_dir: str):
    return _decoded(sf_dir, "lineitem")


def q_roundtrip_events(sf_dir: str):
    return _decoded(sf_dir, "events")


def q_roundtrip_embeddings(sf_dir: str):
    return _decoded(sf_dir, "embeddings")


def q_recovered_roundtrip(sf_dir: str):
    """Damage-and-salvage through the driver gate (FileDump --recover /
    fsck+recover surface): the documents table is doc_id-sorted and
    encoded at 250 rows/chunk; the chunk holding the 250 SMALLEST doc_ids
    is deleted; recover_store salvages the remainder (recovery decode,
    checksum-forced, streaming into a fresh trust-mode encode); the
    decoded output must equal the table minus EXACTLY those rows —
    oracle: ORDER BY doc_id OFFSET 250.  Sorted input + fixed batch size
    pin deterministically which rows live in the dropped chunk."""
    import json as _json
    import shutil

    from ..pipeline.encode import recover_store
    from ..state import manifest as mstate

    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    dmg = os.path.join(CACHE_ROOT, f"documents-dmg-{tag}")
    rec = os.path.join(CACHE_ROOT, f"documents-rec-{tag}")
    shutil.rmtree(dmg, ignore_errors=True)
    shutil.rmtree(rec, ignore_errors=True)

    ds = ray.data.read_parquet(src).sort("doc_id")
    encode_dataset(None, dmg, ds=ds, batch_size=250)

    # locate the chunk whose doc_id range covers the global minimum (ids
    # are fixed-width 'doc-%016d', so truncated string stats stay ordered)
    man = mstate.read_manifest(dmg)
    mins = [_json.loads(s)["doc_id"]["min"] for s in man.column("stats").to_pylist()]
    first = mins.index(min(mins))
    cid = man.column("chunk_id")[first].as_py()
    n_drop = int(man.column("n_rows")[first].as_py())
    assert n_drop == 250, n_drop
    os.remove(os.path.join(mstate.chunk_dir(dmg), f"{cid}.oray"))

    recover_store(dmg, rec, batch_size=4096)
    return _to_table(decode_dataset(rec)).sort_by("doc_id")


def q_rekeyed_roundtrip(sf_dir: str):
    """Key ROTATION through the driver gate: the encrypted documents
    store (same build as encrypted_roundtrip) is rekeyed from k_text to a
    fresh master key; the keyed read of the ROTATED store must reproduce
    the exact plaintext (per-source COUNT + SUM(LENGTH(text)), oracle-
    exact vs raw parquet), while its keyless read still exposes zero text
    values (nullify mask)."""
    import shutil

    from ..chunk import EncodeOptions
    from ..functions.aggregates import agg_by_keys
    from ..pipeline.encode import rekey_store
    from ..state.manifest import load_committed

    src = os.path.join(sf_dir, "documents.parquet")
    old_key = hashlib.sha256(b"orc-ray-demo-master-key").digest()
    new_key = hashlib.sha256(b"orc-ray-rotated-master-key").digest()
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    enc = os.path.join(CACHE_ROOT, f"documents-enc-{tag}")
    rot = os.path.join(CACHE_ROOT, f"documents-rot-{tag}")

    # same cached build as q_encrypted_roundtrip (shared store, key k_text)
    expected = pq.read_metadata(src).num_rows
    if load_committed(enc)["files"].get(src) != expected:
        encode_dataset(
            [src], enc,
            EncodeOptions(encrypt={"text": "k_text"}, encryption_keys={"k_text": old_key}),
            resume=True, batch_size=16384,
        )

    shutil.rmtree(rot, ignore_errors=True)
    rekey_store(
        enc, rot,
        EncodeOptions(encrypt={"text": "k_rot"}, encryption_keys={"k_rot": new_key}),
        keys={"k_text": old_key}, batch_size=16384,
    )

    keyed = decode_dataset(rot, columns=["source", "text"], keys={"k_rot": new_key})

    def lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "text_len": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    agg = agg_by_keys(
        keyed.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("text_len", "sum", "len_sum"), ("text_len", "count_all", "n")],
    )

    # keyless read of the ROTATED store: nullify mask, zero values visible
    pub = decode_dataset(rot, columns=["source", "text"])

    def vals(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "vals": pc.is_valid(t.column("text")).cast(pa.int64()),
            }
        )

    pub_agg = agg_by_keys(
        pub.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("vals", "sum", "public_text_vals")],
    )
    left = _to_table(agg)
    right = _to_table(pub_agg)
    return _join_on_source(left, right)


def q_roundtrip_v011(sf_dir: str):
    """Old-file-version write path (EncodeOptions.file_version="0.11"):
    every integer stream — keys, timestamps, dictionary indices, string
    lengths — is written in the RLEv1-analog run/literal+varint layout
    (apache/orc c++/src/RLEv1.cc, probe [P9]) instead of the modern
    block layout.  Readers dispatch on the stream's layout byte with no
    knob (ORC reader semantics for old file versions), so the decode
    path here is the SAME code every other roundtrip uses; the oracle
    is full-table identity over events (timestamps + ints + floats +
    strings all routed through v1 integer streams)."""
    from ..chunk import EncodeOptions
    from ..state.manifest import load_committed

    src = os.path.join(sf_dir, "events.parquet")
    out = os.path.join(
        CACHE_ROOT,
        f"events-v011-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    expected = pq.read_metadata(src).num_rows
    if load_committed(out)["files"].get(src) != expected:
        encode_dataset(
            [src], out, EncodeOptions(file_version="0.11"), resume=True, batch_size=16384
        )
    return decode_dataset(out)


def q_encrypted_roundtrip(sf_dir: str):
    """Per-column AES-CTR encryption, dual-variant read (the reference's
    EncryptionTreeWriter + DataMask analog, apache/orc java/core/.../impl/
    writer/EncryptionTreeWriter.java; cipher in orc_ray/codecs/aes.py).

    The documents `text` column is encrypted under a named master key and
    encoded into its own store; the keyed read must reproduce the exact
    plaintext (checked here through per-source COUNT + SUM(LENGTH(text)),
    oracle-exact vs the raw parquet), while the keyless read sees only the
    nullify-masked public variant (surfaced as public_text_vals = 0).
    Both aggregates run distributed through agg_by_keys."""
    from ..chunk import EncodeOptions
    from ..functions.aggregates import agg_by_keys

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha256(b"orc-ray-demo-master-key").digest()  # AES-256
    opts = EncodeOptions(encrypt={"text": "k_text"}, encryption_keys={"k_text": key})
    out = os.path.join(
        CACHE_ROOT,
        f"documents-enc-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    from ..state.manifest import load_committed

    expected = pq.read_metadata(src).num_rows
    if load_committed(out)["files"].get(src) != expected:
        encode_dataset([src], out, opts, resume=True, batch_size=16384)

    keyed = decode_dataset(out, columns=["source", "text"], keys={"k_text": key})

    def lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "text_len": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    agg = agg_by_keys(
        keyed.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("text_len", "sum", "len_sum"), ("text_len", "count_all", "n")],
    )

    # keyless read: the masked public variant must expose zero text values
    pub = decode_dataset(out, columns=["source", "text"])

    def nonnull(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source"),
                "vals": pc.is_valid(t.column("text")).cast(pa.int64()),
            }
        )

    pub_agg = agg_by_keys(
        pub.map_batches(nonnull, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        [("vals", "sum", "public_text_vals")],
    )
    left = _to_table(agg)
    right = _to_table(pub_agg)
    return _join_on_source(left, right)


def q_orc_file_roundtrip(sf_dir: str):
    """Real Apache ORC file interop: lineitem streams out of the engine's
    chunk store through the partitioned ORC sink (one content-addressed
    .orc part per block, written by the compiled ORC C++ writer via
    pyarrow.orc) and back in through the stripe-parallel ORC source
    (orc_ray/pipeline/orcio.py — OrcInputFormat.getSplits /
    RecordReaderImpl analogs).  The full table must survive the format
    round-trip bit-exactly, so the oracle is SELECT * FROM lineitem.

    ORC stores timestamps at ns precision; the read applies the engine's
    reader-schema cast (timestamp[ns] -> timestamp[us]) — the same
    schema-evolution layer the convert matrix tests."""
    from ..pipeline.orcio import read_orc, write_orc

    src = os.path.join(sf_dir, "lineitem.parquet")
    out = os.path.join(
        CACHE_ROOT,
        f"lineitem-orc-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    expected = pq.read_metadata(src).num_rows
    man_path = os.path.join(out, "_written.json")
    import json as _json

    done = False
    if os.path.exists(man_path):
        with open(man_path) as f:
            done = _json.load(f).get("rows") == expected
    if not done:
        man = write_orc(
            decode_dataset(store_for(sf_dir, "lineitem")), out, batch_size=8192
        )
        with open(man_path, "w") as f:
            _json.dump({"rows": sum(man.column("rows").to_pylist())}, f)

    ts_us = {"l_shipdate": pa.timestamp("us")}
    return read_orc(out, cast_schema=ts_us)


def q_csv_roundtrip(sf_dir: str):
    """CSV text interop: orders streams out of the engine's chunk store
    through the partitioned CSV sink (one content-addressed .csv part per
    block, Arrow shortest-roundtrip float formatting) and back in through
    the typed csv-import source (orc_ray/pipeline/orcio.py — the
    orc-tools csv-import analog, tools/.../convert/CsvReader.java), then
    through a fresh chunk encode+decode.  The full table must survive the
    TEXT round-trip bit-exactly — doubles included — so the oracle is
    SELECT * FROM orders.  char(1) on o_orderstatus exercises write-side
    CHAR enforcement on the import (identity on width-1 values)."""
    import json as _json
    import shutil

    from ..pipeline.orcio import read_csv, write_csv_parts

    src = os.path.join(sf_dir, "orders.parquet")
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    csv_dir = os.path.join(CACHE_ROOT, f"orders-csv-{tag}")
    expected = pq.read_metadata(src).num_rows
    man_path = os.path.join(csv_dir, "_written.json")

    done = False
    if os.path.exists(man_path):
        with open(man_path) as f:
            done = _json.load(f).get("rows") == expected
    if not done:
        shutil.rmtree(csv_dir, ignore_errors=True)
        man = write_csv_parts(
            decode_dataset(store_for(sf_dir, "orders")), csv_dir, batch_size=8192
        )
        with open(man_path, "w") as f:
            _json.dump({"rows": sum(man.column("rows").to_pylist())}, f)

    ds, char_specs = read_csv(
        csv_dir,
        schema=(
            "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:char(1),"
            "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string"
        ),
    )
    store = os.path.join(CACHE_ROOT, f"orders-csvstore-{tag}")
    shutil.rmtree(store, ignore_errors=True)
    from ..chunk import EncodeOptions

    encode_dataset(None, store, EncodeOptions(char_specs=char_specs),
                   ds=ds, batch_size=8192)
    return decode_dataset(store)


def q_projection_pushdown(sf_dir: str):
    return _decoded(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])


def q_predicate_pushdown(sf_dir: str):
    return _decoded(sf_dir, "lineitem", predicates=[("l_orderkey", "<", 100)])


def acid_table_for(sf_dir: str) -> str:
    """Build (once, cached) the shared versioned orders table: base store
    + two deterministic delta commits (the q_acid_table_read fixture,
    factored out so ivm_revenue maintains its view over the SAME table).

    Deltas (deterministic, from the base itself):
      seq 1 'u': every o_orderkey % 97 == 0 -> totalprice + 1000,
                 priority '0-UPDATED'
      seq 2 'u': % 97 == 0 AND odd AND % 193 != 0 -> totalprice + 2000
                 (overwrites seq 1 — last writer wins)
      seq 2 'd': % 193 == 0 (deletes, incl. keys seq 1 updated)"""
    from ..state.table import append_delta, create_table, load_meta

    src = os.path.join(sf_dir, "orders.parquet")
    tdir = os.path.join(
        CACHE_ROOT,
        f"orders-acid-{hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]}",
    )
    marker = os.path.join(tdir, "_table.json")
    if not os.path.exists(marker) or load_meta(tdir)["version"] != 2:
        import shutil

        shutil.rmtree(tdir, ignore_errors=True)
        create_table(tdir, [src], key="o_orderkey", batch_size=16384)
        # delta rows are ~2% of the base (keys % 97 or % 193): stream the
        # scan with the selection pushed into the reader so only matching
        # rows ever materialize on the driver, never the whole table
        import pyarrow.dataset as pads

        picked = []
        for rb in pads.dataset(src).to_batches(batch_size=65536):
            kk = rb.column(rb.schema.get_field_index("o_orderkey")).to_numpy(zero_copy_only=False)
            m = (kk % 97 == 0) | (kk % 193 == 0)
            if m.any():
                picked.append(pa.Table.from_batches([rb]).filter(pa.array(m)))
        orders = pa.concat_tables(picked)
        k = orders.column("o_orderkey").to_numpy(zero_copy_only=False)

        def mk_delta(mask: np.ndarray, bump: float | None, op: str, prio: str | None):
            sub = orders.filter(pa.array(mask))
            cols = {c: sub.column(c) for c in sub.column_names}
            if bump is not None:
                cols["o_totalprice"] = pc.add(sub.column("o_totalprice"), bump)
            if prio is not None:
                cols["o_orderpriority"] = pa.array([prio] * sub.num_rows, pa.string())
            cols["_op"] = pa.array([op] * sub.num_rows, pa.string())
            return pa.table(cols)

        append_delta(tdir, mk_delta(k % 97 == 0, 1000.0, "u", "0-UPDATED"))
        d2u = mk_delta((k % 97 == 0) & (k % 2 == 1) & (k % 193 != 0), 2000.0, "u", "0-UPDATED")
        d2d = mk_delta(k % 193 == 0, None, "d", None)
        append_delta(tdir, pa.concat_tables([d2u, d2d]))
    return tdir


def q_acid_table_read(sf_dir: str):
    """Versioned keyed table (the Hive-ACID-on-ORC analog,
    orc_ray/state/table.py): orders becomes the base store, two delta
    commits apply updates, deletes and a last-writer-wins overwrite, and
    the merge-on-read stream is aggregated per order status.  The SQL
    oracle replays the same commit sequence with a seq-ordered
    ROW_NUMBER — value-exact, so upsert/delete/LWW semantics are pinned
    to SQL, not just to unit tests.

    Deltas (deterministic, from the base itself):
      seq 1 'u': every o_orderkey % 97 == 0 -> totalprice + 1000,
                 priority '0-UPDATED'
      seq 2 'u': % 97 == 0 AND odd AND % 193 != 0 -> totalprice + 2000
                 (overwrites seq 1 — last writer wins)
      seq 2 'd': % 193 == 0 (deletes, incl. keys seq 1 updated)"""
    from ..state.table import read_table

    ds = read_table(acid_table_for(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        # SUM skips the ROUND(NULL) term (fill 0); COUNT(*) keeps the row
        cents = pc.fill_null(
            pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), 100.0),
                             round_mode="half_towards_infinity"), pa.int64()),
            0,
        )
        upd = pc.equal(t.column("o_orderpriority"), "0-UPDATED").combine_chunks()
        g = (
            pa.table(
                {
                    "o_orderstatus": t.column("o_orderstatus"),
                    "price_e2": cents,
                    "n_updated": upd.cast(pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("o_orderstatus")
            .aggregate([("price_e2", "sum"), ("n_updated", "sum"), ("one", "sum")])
        )
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "price_e2": g.column("price_e2_sum"),
                "n_updated": g.column("n_updated_sum"),
                "n": g.column("one_sum"),
            }
        )

    parts = _to_table(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("o_orderstatus").aggregate(
        [("price_e2", "sum"), ("n_updated", "sum"), ("n", "sum")]
    )
    return pa.table(
        {
            "o_orderstatus": final.column("o_orderstatus"),
            "price_e2": final.column("price_e2_sum"),
            "n_updated": final.column("n_updated_sum"),
            "n": final.column("n_sum"),
        }
    ).sort_by("o_orderstatus")


def q_ivm_revenue(sf_dir: str):
    """Incremental view maintenance over the versioned orders table: the
    materialized view SUM(price)/COUNT(*) GROUP BY o_orderstatus is
    maintained commit-by-commit instead of recomputed — the lakehouse
    refresh pattern (Hive ACID / Delta incremental MV).

    Algorithm (exact delta-join IVM): aggregate the base (version 0)
    once; then for each commit v, ADD the commit's 'u' rows and SUBTRACT
    the previously-visible rows of every key the commit touches ('u'
    overwrites and 'd' deletes both retract their old row).  The old
    rows come from a time-travel read at version v-1 filtered to the
    commit's key set inside map_batches (bounded by the delta size — the
    base streams, nothing O(table) concentrates).  The SQL oracle
    recomputes the view from scratch over the replayed final state, so
    a drift anywhere in the incremental path is a hash mismatch."""
    import ray

    from ..functions.aggregates import agg_by_keys
    from ..state.table import load_meta, read_table

    tdir = acid_table_for(sf_dir)
    meta = load_meta(tdir)
    key = meta["key"]
    latest = meta["version"]
    spec_of = {v["version"]: v for v in meta["versions"]}
    COLS = [key, "o_orderstatus", "o_totalprice"]

    def stage(t: pa.Table) -> pa.Table:
        # ROUND(NULL)=NULL: SUM skips the term (fill 0) while COUNT(*)
        # still counts the row — np.rint(NaN) garbage previously drifted
        # the maintained view away from the recomputed oracle
        p = t.column("o_totalprice")
        cents = pc.fill_null(
            pc.cast(pc.round(pc.multiply(p, 100.0), round_mode="half_towards_infinity"),
                    pa.int64()),
            0,
        )
        return pa.table({"o_orderstatus": t.column("o_orderstatus"), "cents": cents})

    def agg_stream(ds) -> pa.Table:
        rows = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
        return _to_table(
            agg_by_keys(
                rows,
                ["o_orderstatus"],
                [("cents", "sum", "s"), ("cents", "count_all", "n")],
            )
        )

    view: dict[str, list[int]] = {}

    def apply(t: pa.Table, sign: int) -> None:
        for st_, s_, n_ in zip(
            t.column("o_orderstatus").to_pylist(),
            t.column("s").to_pylist(),
            t.column("n").to_pylist(),
        ):
            acc = view.setdefault(st_, [0, 0])
            acc[0] += sign * s_
            acc[1] += sign * n_

    apply(agg_stream(read_table(tdir, version=0, columns=COLS)), +1)

    for v in range(1, latest + 1):
        name = spec_of[v]["deltas"][-1]  # one delta store per commit
        commit = _to_table(decode_dataset(os.path.join(tdir, name)))
        ups = commit.filter(pc.equal(commit.column("_op"), "u"))
        if ups.num_rows:
            g = (
                pa.table(
                    {
                        "o_orderstatus": ups.column("o_orderstatus"),
                        "cents": pc.fill_null(
                            pc.cast(
                                pc.round(pc.multiply(ups.column("o_totalprice"), 100.0),
                                         round_mode="half_towards_infinity"),
                                pa.int64(),
                            ),
                            0,
                        ),
                        "one": pa.array(np.ones(ups.num_rows, np.int64)),
                    }
                )
                .group_by("o_orderstatus")
                .aggregate([("cents", "sum"), ("one", "sum")])
            )
            apply(
                pa.table(
                    {
                        "o_orderstatus": g.column("o_orderstatus"),
                        "s": g.column("cents_sum"),
                        "n": g.column("one_sum"),
                    }
                ),
                +1,
            )
        # retract the previously-visible row of EVERY touched key
        kref = ray.put(commit.column(key).combine_chunks())

        def touched(t: pa.Table, *, ref=kref) -> pa.Table:
            return t.filter(pc.is_in(t.column(key), value_set=ray.get(ref)))

        prev = read_table(tdir, version=v - 1, columns=COLS).map_batches(
            touched, batch_format="pyarrow", zero_copy_batch=True
        )
        apply(agg_stream(prev), -1)

    statuses = sorted(s for s, (sm, n) in view.items() if n > 0)
    return pa.table(
        {
            "o_orderstatus": pa.array(statuses, pa.string()),
            "revenue_cents": pa.array([view[s][0] for s in statuses], pa.int64()),
            "n_orders": pa.array([view[s][1] for s in statuses], pa.int64()),
        }
    )


def q_schema_union_read(sf_dir: str):
    """Union-by-name read across two stores whose schemas EVOLVED
    (pipeline/decode.decode_union — the Iceberg/Delta multi-snapshot
    scan; ORC SchemaEvolution applied ACROSS files): store A holds
    orders (o_orderkey int64, o_orderstatus, o_totalprice), store B a
    later layout (o_orderkey written as int32, o_orderpriority only).
    The unified reader schema promotes the key back to int64 through
    the convert layer, fills typed NULLs for absent columns, and the
    per-side aggregate (grouped on status presence) is oracle-exact —
    so promotion, null-fill and column-order normalization are all
    pinned to SQL."""
    from ..functions.aggregates import agg_by_keys
    from ..pipeline.decode import decode_union
    from ..state.manifest import load_committed

    src = os.path.join(sf_dir, "orders.parquet")
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    expected = pq.read_metadata(src).num_rows

    store_a = os.path.join(CACHE_ROOT, f"orders-evoA-{tag}")
    if load_committed(store_a)["files"].get(src) != expected:
        encode_dataset(
            [src], store_a, DEFAULT_OPTIONS,
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
            resume=True, batch_size=16384,
        )

    store_b = os.path.join(CACHE_ROOT, f"orders-evoB-{tag}")
    if load_committed(store_b)["totals"].get("rows") != expected:
        narrow = ray.data.read_parquet(src, columns=["o_orderkey", "o_orderpriority"])

        def narrow_key(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey").cast(pa.int32()),
                    "o_orderpriority": t.column("o_orderpriority"),
                }
            )

        encode_dataset(
            [], store_b, DEFAULT_OPTIONS,
            ds=narrow.map_batches(narrow_key, batch_format="pyarrow", zero_copy_batch=True),
            batch_size=16384,
        )

    u = decode_union([store_a, store_b])

    def stage(t: pa.Table) -> pa.Table:
        has_status = pc.is_valid(t.column("o_orderstatus")).cast(pa.int64())
        cents = pa.array(
            np.rint(
                pc.fill_null(t.column("o_totalprice"), 0.0).to_numpy(zero_copy_only=False)
                * 100
            ).astype(np.int64)
        )
        return pa.table(
            {
                "has_status": has_status,
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "okey": t.column("o_orderkey"),
                "cents": cents,
                "prio": pc.is_valid(t.column("o_orderpriority")).cast(pa.int64()),
            }
        )

    agg = agg_by_keys(
        u.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True),
        ["has_status"],
        [
            ("one", "sum", "n"),
            ("okey", "sum", "key_sum"),
            ("cents", "sum", "cents"),
            ("prio", "sum", "n_prio"),
        ],
    )
    return _to_table(agg).sort_by("has_status")


def q_purged_documents(sf_dir: str):
    """Physical hard delete (pipeline/encode.purge_store — the GDPR purge
    that complements the versioned table's logical deletes): every
    lang='de' row is dropped from the REWRITTEN store's chunks, then the
    purged store decodes in full.  The oracle reads the complement
    (lang <> 'de'), so both the predicate semantics and the rewrite's
    fidelity for survivors are pinned."""
    from ..pipeline.encode import purge_store
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "documents")
    out = os.path.join(CACHE_ROOT, f"purged-{os.path.basename(src_store)}")
    marker_rows = load_committed(out)["totals"].get("rows")
    if marker_rows is None:
        purge_store(src_store, out, [("lang", "==", "de")])
    return decode_dataset(out)


def q_shuffled_documents(sf_dir: str):
    """Deterministic global shuffle (pipeline/encode.shuffle_store) then
    full decode: content must be byte-identical to the source (the
    driver compare is order-insensitive), while the on-disk order is the
    splitmix64(doc_id ^ seed) pre-training permutation."""
    import os

    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import shuffle_store

    src_store = store_for(sf_dir, "documents")
    out = os.path.join(CACHE_ROOT, f"shuffled-{os.path.basename(src_store)}")
    from ..state.manifest import load_committed

    rows = load_committed(src_store)["totals"].get("rows", 0)
    if load_committed(out)["totals"].get("rows") != rows:
        shuffle_store(src_store, out, "doc_id", seed=42)
    return _to_table(decode_dataset(out))


def q_sampled_documents(sf_dir: str):
    """Deterministic 20% corpus sample through sample_store (md5 bucket
    rule) then full decode — the oracle mirrors the EXACT same md5
    arithmetic in SQL, so this pins the store-level sampler end-to-end,
    not just the kernel."""
    import os

    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import sample_store
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "documents")
    # cache key carries the SOURCE row count: a regenerated corpus with a
    # different size invalidates the derived store (a bare existence check
    # would silently serve stale samples)
    src_rows = load_committed(src_store)["totals"].get("rows", 0)
    out = os.path.join(CACHE_ROOT, f"sample20-{os.path.basename(src_store)}-{src_rows}")
    if load_committed(out)["totals"].get("rows") is None:
        sample_store(src_store, out, "doc_id", 20)
    return _to_table(decode_dataset(out))


def q_zorder_lookup(sf_dir: str):
    """Z-order clustering end-to-end: the events store re-clusters on the
    Morton curve over (user_id, value), and a two-column box query
    decodes only the chunks whose min/max intersect the box — BOTH curve
    columns prune (the lakehouse OPTIMIZE ZORDER property); the exact
    residual filter keeps correctness."""
    import os

    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import zorder_store
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "events")
    src_rows = load_committed(src_store)["totals"].get("rows", 0)
    out = os.path.join(CACHE_ROOT, f"zorder-{os.path.basename(src_store)}")
    if load_committed(out)["totals"].get("rows") != src_rows:
        zorder_store(src_store, out, ["user_id", "value"], batch_size=2048)
    ds = decode_dataset(
        out,
        columns=["event_id", "user_id", "value"],
        predicates=[
            ("user_id", "between", 3, 8),
            ("value", "between", 50.0, 100.0),
        ],
    )

    def cents(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "value_e2": pa.array([], pa.int64()),
                }
            )
        v = np.rint(t.column("value").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "value_e2": pa.array(v),
            }
        )

    return _to_table(ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)).sort_by(
        "event_id"
    )


def q_encoded_groupby(sf_dir: str):
    """Encoded-vector read through the driver gate: documents decode with
    encoded_vectors=True (dict codes + dictionary, no flat strings), and
    the per-source doc count/char sum aggregates over the int32 CODES
    inside each batch (np.bincount) — the EncodedStringVectorBatch
    consumer pattern, oracle-checked against a plain GROUP BY."""
    from ..pipeline.decode import decode_dataset

    ds = decode_dataset(store_for(sf_dir, "documents"), columns=["source", "n_chars"], encoded_vectors=True)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "chars": pa.array([], pa.int64()),
                }
            )
        d = t.column("source").combine_chunks()
        labels = d.dictionary
        nlab = len(labels)
        # a NULL source is a null CODE: bucket it at nlab (its own group);
        # a NULL n_chars counts in COUNT(*) but not the SUM (fill 0)
        codes = pc.fill_null(d.indices, nlab).to_numpy(zero_copy_only=False).astype(np.int64)
        nch_col = t.column("n_chars")
        nch = pc.fill_null(nch_col, 0).to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = np.bincount(codes, minlength=nlab + 1)
        tot = np.bincount(codes, weights=nch, minlength=nlab + 1).astype(np.int64)
        used = cnt > 0
        idx = np.flatnonzero(used)
        src_out = pa.concat_arrays(
            [labels.take(pa.array(idx[idx < nlab])).cast(pa.string()),
             pa.array([None] * int(used[nlab]), pa.string())]
        )
        return pa.table(
            {
                "source": src_out,
                "n_docs": pa.array(cnt[used].astype(np.int64)),
                "chars": pa.array(tot[used]),
            }
        )

    parts = _to_table(ds.map_batches(agg, batch_format="pyarrow", zero_copy_batch=True))
    final = parts.group_by("source").aggregate([("n_docs", "sum"), ("chars", "sum")])
    return pa.table(
        {
            "source": final.column("source"),
            "n_docs": final.column("n_docs_sum").cast(pa.int64()),
            "chars": final.column("chars_sum").cast(pa.int64()),
        }
    ).sort_by("source")


def q_union_tagged_values(sf_dir: str):
    """Union column through the driver gate (the UnionColumnWriter/Reader
    analog is otherwise unit-test-only — unions are unreachable from
    parquet).  Each event's value becomes a dense union: even event_ids
    carry int cents, odd ones carry the event_type string.  The union
    round-trips through the chunk store (ds= encode path), and the
    decoded branches aggregate to exact integers the oracle reproduces
    with CASE arms over the source table."""
    import ray as _ray

    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import encode_dataset
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "events")
    out = os.path.join(CACHE_ROOT, f"union-{os.path.basename(src_store)}")
    src_rows = load_committed(src_store)["totals"].get("rows", 0)
    if load_committed(out)["totals"].get("rows") != src_rows:

        def to_union(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            # null-propagating cents: a null value rides the int branch
            # AS NULL (exercising the union child's PRESENT stream)
            cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64()).combine_chunks()
            et = t.column("event_type").combine_chunks()
            codes = (eid % 2 != 0).astype(np.int8)  # 0 = int branch, 1 = string
            n0 = int((codes == 0).sum())
            offs = np.zeros(eid.size, np.int32)
            offs[codes == 0] = np.arange(n0, dtype=np.int32)
            offs[codes == 1] = np.arange(eid.size - n0, dtype=np.int32)
            ints = cents.filter(pa.array(codes == 0))
            strs = et.filter(pa.array(codes == 1))
            u = pa.UnionArray.from_dense(
                pa.array(codes, pa.int8()), pa.array(offs, pa.int32()),
                [ints, strs], ["cents", "etype"], [0, 1],
            )
            return pa.table({"event_id": t.column("event_id"), "v": u})

        ds = decode_dataset(src_store, columns=["event_id", "event_type", "value"]).map_batches(
            to_union, batch_format="pyarrow", zero_copy_batch=True
        )
        encode_dataset(None, out, ds=ds, batch_size=4096)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_int": pa.array([], pa.int64()), "sum_cents": pa.array([], pa.int64()),
                 "n_str": pa.array([], pa.int64())}
            )
        u = t.column("v").combine_chunks()
        codes = np.asarray(u.type_codes)
        offs = np.asarray(u.offsets)
        i_sel = offs[codes == 0]
        ints = u.field(0).take(pa.array(i_sel))
        return pa.table(
            {
                "n_int": pa.array([int((codes == 0).sum())], pa.int64()),
                # pc.sum ignores null cents (SQL SUM over the CASE arm)
                "sum_cents": pa.array([int(pc.sum(ints).as_py() or 0)], pa.int64()),
                "n_str": pa.array([int((codes == 1).sum())], pa.int64()),
            }
        )

    parts = _to_table(
        decode_dataset(out).map_batches(agg, batch_format="pyarrow", zero_copy_batch=True)
    )
    return pa.table(
        {
            c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)], pa.int64())
            for c in ["n_int", "sum_cents", "n_str"]
        }
    )


def q_map_tagged_values(sf_dir: str):
    """Map column through the driver gate (MapColumnWriter/Reader analog
    — maps are otherwise unit-test-only here).  Each event becomes a
    map<string,int64> with a VARIABLE entry count ({"k": props.k} plus
    {"u": user_id} for odd event_ids — exercising the LENGTH stream),
    round-trips through the chunk store, and the decoded flattened
    entries aggregate per key to exact integers the oracle reproduces
    from the source columns."""
    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import encode_dataset
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "events")
    out = os.path.join(CACHE_ROOT, f"mapcol-{os.path.basename(src_store)}")
    src_rows = load_committed(src_store)["totals"].get("rows", 0)
    if load_committed(out)["totals"].get("rows") != src_rows:

        def to_map(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            uid = t.column("user_id").to_numpy(zero_copy_only=False)
            m = pc.extract_regex(t.column("props").combine_chunks(), r'"k":\s*(?P<k>-?\d+)')
            k = pc.struct_field(m, "k").cast(pa.int64()).to_numpy(zero_copy_only=False)
            odd = eid % 2 == 1
            cnt = 1 + odd.astype(np.int64)
            off = np.zeros(eid.size + 1, np.int64)
            np.cumsum(cnt, out=off[1:])
            total = int(off[-1])
            keys = np.empty(total, object)
            vals = np.zeros(total, np.int64)
            vmask = np.zeros(total, bool)  # True = null item value
            keys[off[:-1]] = "k"
            vals[off[:-1]] = k
            extra = off[:-1][odd] + 1
            keys[extra] = "u"
            uodd = uid[odd]
            unull = np.isnan(uodd) if uodd.dtype.kind == "f" else np.zeros(uodd.size, bool)
            vals[extra] = np.where(unull, 0, np.nan_to_num(uodd)).astype(np.int64)
            vmask[extra] = unull  # a null user_id stays a NULL map value
            ma = pa.MapArray.from_arrays(
                pa.array(off.astype(np.int32), pa.int32()),
                pa.array(keys.tolist(), pa.string()),
                pa.array(vals, mask=vmask),
            )
            return pa.table({"event_id": t.column("event_id"), "m": ma})

        ds = decode_dataset(src_store, columns=["event_id", "user_id", "props"]).map_batches(
            to_map, batch_format="pyarrow", zero_copy_batch=True
        )
        encode_dataset(None, out, ds=ds, batch_size=4096)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                 "sum_v": pa.array([], pa.int64())}
            )
        ma = t.column("m").combine_chunks()
        g = (
            pa.table({"key": ma.keys, "v": ma.items})
            .group_by("key")
            .aggregate([([], "count_all"), ("v", "sum")])
        )
        return pa.table(
            {
                "key": g.column("key"),
                "n": g.column("count_all").cast(pa.int64()),
                "sum_v": g.column("v_sum").cast(pa.int64()),
            }
        )

    parts = _to_table(
        decode_dataset(out).map_batches(agg, batch_format="pyarrow", zero_copy_batch=True)
    )
    final = parts.group_by("key").aggregate([("n", "sum"), ("sum_v", "sum")])
    return pa.table(
        {
            "key": final.column("key"),
            "n": final.column("n_sum").cast(pa.int64()),
            "sum_v": final.column("sum_v_sum").cast(pa.int64()),
        }
    ).sort_by("key")


def q_struct_pruned_read(sf_dir: str):
    """Struct codec + NESTED-INCLUDE projection through the driver gate:
    events pack into struct{uid, etype, cents}, round-trip through the
    chunk store, and the read projects ONLY s.uid and s.cents
    (columns=["s.uid","s.cents"] — the RowReaderOptions subtree include;
    the etype child's buffers are never decompressed).  Exact integer
    aggregates mirror trivially in SQL."""
    from ..pipeline.decode import decode_dataset
    from ..pipeline.encode import encode_dataset
    from ..state.manifest import load_committed

    src_store = store_for(sf_dir, "events")
    out = os.path.join(CACHE_ROOT, f"structcol-{os.path.basename(src_store)}")
    src_rows = load_committed(src_store)["totals"].get("rows", 0)
    if load_committed(out)["totals"].get("rows") != src_rows:

        def to_struct(t: pa.Table) -> pa.Table:
            cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0)), pa.int64())
            s = pa.StructArray.from_arrays(
                [t.column("user_id").combine_chunks(),
                 t.column("event_type").combine_chunks(),
                 cents.combine_chunks()],
                names=["uid", "etype", "cents"],
            )
            return pa.table({"event_id": t.column("event_id"), "s": s})

        ds = decode_dataset(src_store, columns=["event_id", "user_id", "event_type", "value"]).map_batches(
            to_struct, batch_format="pyarrow", zero_copy_batch=True
        )
        encode_dataset(None, out, ds=ds, batch_size=4096)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()), "sum_uid": pa.array([], pa.int64()),
                 "sum_cents": pa.array([], pa.int64())}
            )
        s = t.column("s").combine_chunks()
        assert [f.name for f in s.type] == ["uid", "cents"], s.type  # etype pruned
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                # pc.sum ignores null children (SQL SUM); numpy would NaN out
                "sum_uid": pa.array([int(pc.sum(s.field("uid")).as_py() or 0)], pa.int64()),
                "sum_cents": pa.array([int(pc.sum(s.field("cents")).as_py() or 0)], pa.int64()),
            }
        )

    parts = _to_table(
        decode_dataset(out, columns=["s.uid", "s.cents"]).map_batches(
            agg, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return pa.table(
        {
            c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)], pa.int64())
            for c in ["n", "sum_uid", "sum_cents"]
        }
    )


# --- DuckDB oracle SQL for this domain's queries; assembled into the
# driver-contract registry by queries/__init__ (zero behavior change —
# the SQL lives beside the pipeline it mirrors).
ORACLE_SQL = {
    "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    # keyed read is exact -> plaintext aggregates; keyless read is all-null
    # masked -> public_text_vals is identically 0 by the encryption contract
    "encrypted_roundtrip": (
        "SELECT source, CAST(SUM(LENGTH(text)) AS BIGINT) AS len_sum, "
        "COUNT(*) AS n, CAST(0 AS BIGINT) AS public_text_vals "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    # key rotation: the rotated store's keyed read is STILL the exact
    # plaintext, and its keyless read still exposes zero text values
    "rekeyed_roundtrip": (
        "SELECT source, CAST(SUM(LENGTH(text)) AS BIGINT) AS len_sum, "
        "COUNT(*) AS n, CAST(0 AS BIGINT) AS public_text_vals "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    # salvage: everything except the dropped first chunk (250 smallest ids)
    "recovered_roundtrip": (
        "SELECT * FROM documents ORDER BY doc_id LIMIT 100000000 OFFSET 250"
    ),
    "roundtrip_lineitem": "SELECT * FROM lineitem",
    # full fidelity through REAL .orc files (engine sink -> C++ ORC -> engine source)
    "orc_file_roundtrip": "SELECT * FROM lineitem",
    # full fidelity through CSV text (engine sink -> csv-import -> fresh encode)
    "csv_roundtrip": "SELECT * FROM orders",
    # versioned-table merge-on-read: SQL replays the same commit sequence
    # (seq-ordered ROW_NUMBER = last writer wins; op 'd' rows delete)
    "schema_union_read": """
        WITH u AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   CAST(NULL AS VARCHAR) AS o_orderpriority
            FROM orders
            UNION ALL
            SELECT o_orderkey, NULL, NULL, o_orderpriority FROM orders
        )
        SELECT CASE WHEN o_orderstatus IS NULL THEN 0 ELSE 1 END AS has_status,
               COUNT(*) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(COALESCE(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0))
                    AS BIGINT) AS cents,
               COUNT(o_orderpriority) AS n_prio
        FROM u GROUP BY has_status ORDER BY has_status
    """,
    "ivm_revenue": """
        WITH all_rows AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS seq, 'u' AS op
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 1000, 1, 'u'
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 2000, 2, 'u'
            FROM orders
            WHERE o_orderkey % 97 = 0 AND o_orderkey % 2 = 1 AND o_orderkey % 193 <> 0
            UNION ALL
            SELECT o_orderkey, NULL, NULL, 2, 'd'
            FROM orders WHERE o_orderkey % 193 = 0
        ),
        latest AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
            FROM all_rows
        )
        SELECT o_orderstatus,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               COUNT(*) AS n_orders
        FROM latest WHERE rn = 1 AND op = 'u'
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "acid_table_read": """
        WITH all_rows AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
                   0 AS seq, 'u' AS op FROM orders
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 1000, '0-UPDATED', 1, 'u'
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice + 2000, '0-UPDATED', 2, 'u'
            FROM orders
            WHERE o_orderkey % 97 = 0 AND o_orderkey % 2 = 1 AND o_orderkey % 193 <> 0
            UNION ALL
            SELECT o_orderkey, NULL, NULL, NULL, 2, 'd'
            FROM orders WHERE o_orderkey % 193 = 0
        ),
        latest AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
            FROM all_rows
        )
        SELECT o_orderstatus,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_e2,
               CAST(SUM(CASE WHEN o_orderpriority = '0-UPDATED' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               COUNT(*) AS n
        FROM latest WHERE rn = 1 AND op = 'u'
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "roundtrip_events": "SELECT * FROM events",
    "roundtrip_v011": "SELECT * FROM events",
    # the purge predicate is lang = 'de': a NULL lang does not match, so
    # it SURVIVES the purge (IS DISTINCT FROM, not the null-dropping <>)
    "purged_documents": "SELECT * FROM documents WHERE lang IS DISTINCT FROM 'de'",
    "roundtrip_embeddings": "SELECT * FROM embeddings",
    "projection_pushdown": "SELECT l_orderkey, l_quantity FROM lineitem",
    "predicate_pushdown": "SELECT * FROM lineitem WHERE l_orderkey < 100",
    "shuffled_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "sampled_documents": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20
        ORDER BY doc_id
    """,
    "zorder_lookup": """
        SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS value_e2
        FROM events
        WHERE user_id BETWEEN 3 AND 8 AND value BETWEEN 50.0 AND 100.0
        ORDER BY event_id
    """,
    "encoded_groupby": """
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source ORDER BY source
    """,
    "union_tagged_values": """
        SELECT CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
               CAST(SUM(CASE WHEN event_id % 2 = 0
                             THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS sum_cents,
               CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_str
        FROM events
    """,
    "map_tagged_values": """
        WITH base AS (
          SELECT event_id, user_id,
                 CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT 'k' AS key, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_v FROM base
        UNION ALL
        SELECT 'u', COUNT(*), CAST(SUM(user_id) AS BIGINT)
        FROM base WHERE event_id % 2 = 1
        ORDER BY key
    """,
    "struct_pruned_read": """
        SELECT COUNT(*) AS n,
               CAST(SUM(user_id) AS BIGINT) AS sum_uid,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events
    """,
}
