"""CLI — the analog of the reference's tool surface (orc-tools Driver.java:
meta/data/scan/convert; C++ orc-metadata/orc-contents/orc-scan).

    python -m orc_ray encode  IN OUT_STORE [--batch-size N] [--resume]
                              [--columns a,b] [--partition-by COL --salt-col COL]
                              [--mask COL=M] [--encrypt COL=KEY --keystore F]
                              [--format parquet|csv|json]
    python -m orc_ray decode  STORE [--columns a,b] [--where PREDS] [--limit N]
                              [--out DIR [--partition-by a,b]] [--keystore F]
    python -m orc_ray inspect STORE [--chunks]     # meta/FileDump analog
    python -m orc_ray scan    STORE [--trust-stats]  # timed decode, orc-scan analog
    python -m orc_ray sort    STORE OUT --by a,b   # cluster for pruning
    python -m orc_ray zorder  STORE OUT --by x,y   # multi-column clustering
    python -m orc_ray compact STORE OUT            # small-files compaction
    python -m orc_ray shuffle STORE OUT --key id --seed 7   # deterministic global shuffle
    python -m orc_ray pack    STORE OUT --window 2048  # fixed-context training rows
    python -m orc_ray sample  STORE OUT --key id --pct 10    # deterministic hash sample
    python -m orc_ray merge   OUT STORE1 STORE2…   # orc-tools merge analog
    python -m orc_ray profile STORE --cols a,b     # one-pass numeric profile
    python -m orc_ray text-index STORE IDX / bm25 IDX terms -k 10
    python -m orc_ray import-orc F.orc STORE / export-orc STORE DIR
    python -m orc_ray import-csv F.csv STORE --schema 'struct<a:int,b:char(3)>'
    python -m orc_ray import-jsonl F.jsonl STORE / export-csv STORE DIR
    python -m orc_ray export-bin STORE DIR / import-bin DIR STORE  (training shards)
    python -m orc_ray table   create|delta|read|compact|vacuum|history DIR …
    python -m orc_ray query   NAME [--sf-dir D] [--limit N]   # run a library pipeline
    python -m orc_ray stats   STORE        # per-column file stats rollup (orc-statistics)
    python -m orc_ray memory  STORE [--columns a,b --workers N]  # orc-memory analog
    python -m orc_ray json-schema F.jsonl  # infer schema (JsonSchemaFinder analog)
    python -m orc_ray version
    python -m orc_ray key gen k1 --keystore /path/keys.json  # local KMS stand-in

Store paths may be local or any fsspec URL (file://, s3://, …).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ray_up():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)
    return ray


def cmd_encode(a) -> int:
    _ray_up()
    from .pipeline.encode import encode_dataset

    opts = _build_opts(a)
    rec = encode_dataset(
        a.input,
        a.store,
        opts,
        columns=a.columns.split(",") if a.columns else None,
        batch_size=a.batch_size,
        resume=a.resume,
        partition_by=a.partition_by,
        salt_length_col=a.salt_col,
        file_format=a.format,
    )
    print(json.dumps(rec["totals"]))
    return 0


def _build_opts(a) -> "EncodeOptions":
    """EncodeOptions from the shared encode-flag family (encode and the
    typed text importers accept the same --mask/--encrypt/--char/... set;
    absent attributes mean the subcommand doesn't expose that flag)."""
    from .chunk import EncodeOptions

    opts = EncodeOptions(
        strategy=getattr(a, "strategy", "speed"),
        file_version=getattr(a, "file_version", "0.12"),
    )
    if getattr(a, "zstd_level", None) is not None:
        opts.compression_level = a.zstd_level
    for flag, attr in [("mask", "masks"), ("encrypt", "encrypt"),
                       ("char", "char_specs"),
                       ("column_compression", "column_compression")]:
        vals = getattr(a, flag, None)
        if vals:
            for kv in vals:
                if "=" not in kv:
                    raise SystemExit(f"--{flag.replace('_','-')} expects COL=VALUE, got {kv!r}")
            setattr(opts, attr, dict(kv.split("=", 1) for kv in vals))
    if opts.encrypt:
        opts.encryption_keys = _load_keystore(getattr(a, "keystore", None))
    return opts


def _load_keystore(path: str | None) -> dict:
    """JSON keystore {key name -> hex key material} — the orc-tools `key` /
    InMemoryKeystore analog for local runs (a real deployment would resolve
    names through a KMS instead)."""
    if not path:
        raise SystemExit("--encrypt/--keys requires --keystore KEYS.json")
    with open(path) as f:
        raw = json.load(f)
    return {name: bytes.fromhex(hexkey) for name, hexkey in raw.items()}


def _parse_where(expr: str | None):
    """JSON predicate tree(s), e.g. '[["l_orderkey","<",100]]' or
    '[["and",["a",">",1],["b","==","x"]]]' — the SearchArgument grammar."""
    if not expr:
        return None
    preds = json.loads(expr)
    return [p for p in preds]


def cmd_decode(a) -> int:
    _ray_up()
    from .pipeline.decode import decode_dataset

    keys = _load_keystore(a.keystore) if a.keystore else None
    if a.union:
        if a.skip_corrupt:
            raise SystemExit("--skip-corrupt is not supported with --union "
                             "(recover each store individually first)")
        from .pipeline.decode import decode_union

        # union-by-name across evolved stores; limit/columns apply after
        ds = decode_union([a.store] + a.union, predicates=_parse_where(a.where), keys=keys)
        if a.columns:
            ds = ds.select_columns(a.columns.split(","))
        if not a.out:
            ds = ds.limit(a.limit)
    else:
        ds = decode_dataset(
            a.store,
            columns=a.columns.split(",") if a.columns else None,
            predicates=_parse_where(a.where),
            keys=keys,
            on_corrupt="skip" if a.skip_corrupt else "raise",
            # interactive preview: push the row cap into the chunk plan so a
            # 100-TB store answers `decode --limit 3` from one chunk
            limit=None if a.out else a.limit,
        )
    if a.out:
        # partitioned export: one directory per key value (hive layout) —
        # a failed downstream run skips finished partitions by directory
        ds.write_parquet(a.out, partition_cols=a.partition_by.split(",") if a.partition_by else None)
        print(f"wrote {a.out}")
    else:
        n = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
            for row in b.slice(0, max(0, a.limit - n)).to_pylist():
                print(json.dumps(row, default=str))
            n += b.num_rows
            if n >= a.limit:
                break
    return 0


def cmd_inspect(a) -> int:
    from .state import manifest as mstate

    man = mstate.read_manifest(a.store)
    committed = mstate.load_committed(a.store)
    print(json.dumps(committed["totals"], indent=1))
    if man.num_rows:
        import collections

        codec_counts: dict = collections.Counter()
        for c in man.column("codecs").to_pylist():
            for col, codec in json.loads(c).items():
                codec_counts[f"{col}:{codec}"] += 1
        print("codec usage:", json.dumps(dict(sorted(codec_counts.items())), indent=1))
    if a.chunks and man.num_rows:
        for row in man.to_pylist():
            print(json.dumps(row, default=str))
    return 0


def cmd_memory(a) -> int:
    """Reader memory estimate (orc-memory analog, tools/src/FileMemory.cc):
    how much heap a decode of STORE needs — per worker and at --workers
    concurrency — from the manifest plus a few sampled chunk HEADERS.
    Only header bytes are read, never data buffers, so this answers in
    O(manifest) for a 100-TB store.

    Per-column encoded sizes come from the sampled headers' buf_lens (the
    stream-size sums FileMemory.cc reads from the footer).  Decoded sizes
    are exact for fixed-width types (rows x width + validity) and an
    enc-share-proportional ESTIMATE for var-width columns — printed as
    *_est accordingly."""
    import base64
    import struct as _struct

    import pyarrow as pa

    from .chunk import MAGIC
    from .state import manifest as mstate
    from .state import storage as fstore

    man = mstate.read_manifest(a.store)
    if man.num_rows == 0:
        print(json.dumps({"chunks": 0, "rows": 0}))
        return 0
    rows = sum(man.column("n_rows").to_pylist())
    enc_total = sum(man.column("enc_bytes").to_pylist())
    raw_total = sum(man.column("raw_bytes").to_pylist())
    chunk_rows = man.column("n_rows").to_pylist()
    max_chunk_scale = max(chunk_rows) / (rows / len(chunk_rows))

    ids = man.column("chunk_id").to_pylist()
    step = max(1, len(ids) // a.sample)
    sample = ids[::step][: a.sample]
    cdir = mstate.chunk_dir(a.store)
    col_enc: dict[str, int] = {}
    schema = None
    for cid in sample:
        with fstore.open_file(f"{cdir}/{cid}.oray") as f:
            head = f.read(9)
            if bytes(head[:5]) != MAGIC:
                raise SystemExit(f"{cid}: not an ORAY1 chunk")
            (hlen,) = _struct.unpack_from("<I", head, 5)
            hdr = json.loads(f.read(hlen))
        if schema is None:
            schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(hdr["schema"])))
        for c in hdr["columns"]:
            col_enc[c["name"]] = col_enc.get(c["name"], 0) + sum(c["buf_lens"])

    all_cols = list(col_enc)
    selected = a.columns.split(",") if a.columns else all_cols
    unknown = [c for c in selected if c not in col_enc]
    if unknown:
        raise SystemExit(f"columns not in store: {unknown} (have {all_cols})")
    enc_all = sum(col_enc.values()) or 1
    sel_frac = sum(col_enc[c] for c in selected) / enc_all
    enc_sel_est = int(enc_total * sel_frac)

    # decoded sizes: exact for fixed-width arrow types, estimated for
    # var-width by their share of the var-width encoded bytes
    fixed_dec: dict[str, int] = {}
    var_cols: list[str] = []
    for c in all_cols:
        try:
            w = schema.field(c).type.bit_width // 8
            fixed_dec[c] = rows * w + rows // 8  # values + validity bitmap
        except (ValueError, KeyError):
            var_cols.append(c)
    var_raw = max(0, raw_total - sum(fixed_dec.values()))
    var_enc = sum(col_enc[c] for c in var_cols) or 1
    dec_bytes = {
        c: fixed_dec.get(c, int(var_raw * col_enc[c] / var_enc)) for c in all_cols
    }
    dec_sel_est = sum(dec_bytes[c] for c in selected)

    n_chunks = len(ids)
    per_worker = int((enc_sel_est + dec_sel_est) / n_chunks * max_chunk_scale)
    print(json.dumps({
        "chunks": n_chunks,
        "rows": rows,
        "headers_sampled": len(sample),
        "columns": selected,
        "enc_bytes_total": enc_total,
        "enc_bytes_selected_est": enc_sel_est,
        "decoded_bytes_selected_est": dec_sel_est,
        "per_column_decoded_est": {c: dec_bytes[c] for c in selected},
        "per_worker_peak_est": per_worker,
        "workers": a.workers,
        "peak_total_est": per_worker * a.workers,
    }))
    return 0


def cmd_stats(a) -> int:
    """File-level ColumnStatistics rollup (orc-statistics / FileStatistics.cc
    analog): per-column min-of-mins / max-of-maxes / null and row counts
    aggregated over the chunk manifest — zero chunk I/O."""
    from .state import manifest as mstate

    man = mstate.read_manifest(a.store)
    out: dict = {}
    n_rows = 0
    for srow, nrow in zip(man.column("stats").to_pylist(), man.column("n_rows").to_pylist()):
        n_rows += nrow
        for col, st in json.loads(srow).items():
            agg = out.setdefault(col, {})
            if "min" in st:
                agg["min"] = st["min"] if "min" not in agg else min(agg["min"], st["min"])
                agg["max"] = st["max"] if "max" not in agg else max(agg["max"], st["max"])
            if "nulls" in st:
                agg["nulls"] = agg.get("nulls", 0) + st["nulls"]
            if "bloom" in st:
                agg["has_bloom"] = True
    print(json.dumps({"rows": n_rows, "chunks": man.num_rows, "columns": out}, indent=1, default=str))
    return 0


def cmd_json_schema(a) -> int:
    """Schema inference from JSON-lines input (orc-tools JsonSchemaFinder
    analog) — pyarrow's JSON reader infers; printed as name -> type."""
    import pyarrow.json as pj

    t = pj.read_json(a.input)
    print(json.dumps({f.name: str(f.type) for f in t.schema}, indent=1))
    return 0


def cmd_version(a) -> int:
    from .chunk import FORMAT_VERSION

    print(json.dumps({"format_version": FORMAT_VERSION}))
    return 0


def cmd_sort(a) -> int:
    _ray_up()
    from .pipeline.encode import sort_store

    rec = sort_store(a.store, a.out, a.by.split(","), batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_zorder(a) -> int:
    _ray_up()
    from .pipeline.encode import zorder_store

    rec = zorder_store(a.store, a.out, a.by.split(","), batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_profile(a) -> int:
    _ray_up()
    from .functions.profile import profile_numeric
    from .pipeline.decode import decode_dataset

    cols = a.cols.split(",")
    t = profile_numeric(decode_dataset(a.store, columns=cols), cols)
    print(t.to_pandas().to_string(index=False))
    return 0


def cmd_text_index(a) -> int:
    _ray_up()
    from .functions.search import build_text_index
    from .pipeline.decode import decode_dataset

    build_text_index(
        decode_dataset(a.store, columns=[a.id_col, a.text_col]),
        a.out,
        id_col=a.id_col,
        text_col=a.text_col,
    )
    print(json.dumps({"index": a.out}))
    return 0


def cmd_bm25(a) -> int:
    _ray_up()
    from .functions.search import bm25_search

    t = bm25_search(a.index, a.terms.split(","), k=a.k)
    print(t.to_pandas().to_string(index=False))
    return 0


def cmd_import_orc(a) -> int:
    """Encode real .orc file(s) into a chunk store (convert-tool analog,
    ORC direction: tools/src/java/org/apache/orc/tools/convert/*)."""
    _ray_up()
    from .chunk import EncodeOptions
    from .pipeline.encode import encode_dataset
    from .pipeline.orcio import read_orc

    ds = read_orc(a.input, columns=a.columns.split(",") if a.columns else None)
    rec = encode_dataset(
        [], a.store, EncodeOptions(), ds=ds, batch_size=a.batch_size
    )
    print(json.dumps(rec["totals"]))
    return 0


def cmd_export_csv(a) -> int:
    """Decode a chunk store into content-addressed partitioned CSV parts
    (the export direction of the csv-import analog; doubles use Arrow's
    shortest-roundtrip formatting so they re-import bit-exact)."""
    _ray_up()
    from .pipeline.decode import decode_dataset
    from .pipeline.orcio import write_csv_parts

    man = write_csv_parts(
        decode_dataset(
            a.store,
            columns=a.columns.split(",") if a.columns else None,
            predicates=_parse_where(a.where),
        ),
        a.out,
    )
    print(json.dumps({"parts": man.num_rows,
                      "rows": sum(man.column("rows").to_pylist()),
                      "bytes": sum(man.column("bytes").to_pylist())}))
    return 0


def cmd_import_csv(a) -> int:
    """Encode CSV file(s) into a chunk store (orc-tools csv-import analog:
    tools/src/java/org/apache/orc/tools/convert/CsvReader.java).  An ORC
    schema string (--schema 'struct<a:int,b:char(3)>') pushes column types
    into the Arrow CSV parser and char(n)/varchar(n) into the write-side
    pad/truncate enforcement."""
    _ray_up()
    from .pipeline.encode import encode_dataset
    from .pipeline.orcio import read_csv

    ds, char_specs = read_csv(
        a.input,
        schema=a.schema,
        delimiter=a.delimiter,
        columns=a.columns.split(",") if a.columns else None,
    )
    opts = _build_opts(a)
    opts.char_specs = {**char_specs, **opts.char_specs}
    rec = encode_dataset([], a.store, opts, ds=ds, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_import_bin(a) -> int:
    """Encode training shards (.bin, ORBIN1) back into a chunk store —
    the re-ingestion direction of export-bin, so a shard set re-enters
    every store-side pipeline (dedup, pack, stats, queries)."""
    _ray_up()
    from .pipeline.encode import encode_dataset
    from .pipeline.orcio import read_bin

    rec = encode_dataset(
        [], a.store, _build_opts(a), ds=read_bin(a.input), batch_size=a.batch_size
    )
    print(json.dumps(rec["totals"]))
    return 0


def cmd_import_jsonl(a) -> int:
    """Encode JSON-lines file(s) into a chunk store (orc-tools json-import
    analog: tools/src/java/org/apache/orc/tools/convert/JsonReader.java;
    schema inference is the json-schema subcommand's finder)."""
    _ray_up()
    from .pipeline.encode import encode_dataset
    from .pipeline.orcio import read_jsonl

    ds = read_jsonl(a.input, columns=a.columns.split(",") if a.columns else None)
    rec = encode_dataset([], a.store, _build_opts(a), ds=ds, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_export_parquet(a) -> int:
    """Decode a chunk store into content-addressed partitioned parquet
    (the export direction back to the engine's own input format)."""
    _ray_up()
    from .pipeline.decode import decode_dataset
    from .pipeline.orcio import write_parquet_parts

    man = write_parquet_parts(
        decode_dataset(
            a.store,
            columns=a.columns.split(",") if a.columns else None,
            predicates=_parse_where(a.where),
        ),
        a.out,
        compression=a.compression if a.compression != "none" else "NONE",
    )
    print(
        json.dumps(
            {
                "parts": man.num_rows,
                "rows": sum(man.column("rows").to_pylist()),
                "bytes": sum(man.column("bytes").to_pylist()),
            }
        )
    )
    return 0


def cmd_export_bin(a) -> int:
    """Decode a (id, tokens:list<int32>) chunk store into self-indexed
    flat-token training shards (pipeline/orcio.write_bin_parts — the
    Megatron-LM indexed-dataset idea as content-addressed parts): the
    last stage of the pre-training data path, in the format a dataloader
    memory-maps."""
    _ray_up()
    from .pipeline.decode import decode_dataset
    from .pipeline.orcio import write_bin_parts

    man = write_bin_parts(
        decode_dataset(
            a.store,
            columns=[a.id_col, a.tokens_col],
            predicates=_parse_where(a.where),
        ),
        a.out,
        id_col=a.id_col,
        tokens_col=a.tokens_col,
        batch_size=a.batch_size,
    )
    print(
        json.dumps(
            {
                "parts": man.num_rows,
                "rows": sum(man.column("rows").to_pylist()),
                "bytes": sum(man.column("bytes").to_pylist()),
            }
        )
    )
    return 0


def cmd_export_orc(a) -> int:
    """Decode a chunk store into partitioned real .orc files."""
    _ray_up()
    from .pipeline.decode import decode_dataset
    from .pipeline.orcio import write_orc

    man = write_orc(
        decode_dataset(
            a.store,
            columns=a.columns.split(",") if a.columns else None,
            predicates=_parse_where(a.where),
        ),
        a.out,
        compression=a.compression,
    )
    print(
        json.dumps(
            {
                "parts": man.num_rows,
                "rows": sum(man.column("rows").to_pylist()),
                "bytes": sum(man.column("bytes").to_pylist()),
            }
        )
    )
    return 0


def cmd_shuffle(a) -> int:
    """Deterministic pre-training shuffle: splitmix64(key ^ seed) order."""
    _ray_up()
    from .pipeline.encode import shuffle_store

    rec = shuffle_store(a.store, a.out, a.key, seed=a.seed, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_pack(a) -> int:
    """Pack a pre-tokenized store into fixed-context training rows."""
    _ray_up()
    from .pipeline.encode import pack_store

    rec = pack_store(a.store, a.out, tokens_col=a.tokens_col, key_col=a.key,
                     window=a.window, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_dedup(a) -> int:
    """Exact-dedup store rewrite: one surviving row per distinct key."""
    _ray_up()
    from .pipeline.encode import dedup_store

    stats: dict = {}
    rec = dedup_store(a.store, a.out, key_col=a.key, id_col=a.id_col,
                      batch_size=a.batch_size, stats_out=stats)
    print(json.dumps({**rec["totals"], "rows_kept": stats.get("rows_kept")}))
    return 0


def cmd_tokenize(a) -> int:
    """Tokenize a text store into the pre-training token table with a
    byte-level BPE trained on the store's own word frequencies."""
    _ray_up()
    from .pipeline.encode import tokenize_store

    stats: dict = {}
    rec = tokenize_store(
        a.store, a.out, text_col=a.text_col, n_merges=a.merges,
        top_words=a.top_words, batch_size=a.batch_size,
        verify=not a.no_verify, model_path=a.model, stats_out=stats,
    )
    print(json.dumps({**rec["totals"], "n_merges": stats.get("n_merges"),
                      "vocab_rows": stats.get("vocab_rows")}))
    return 0


def cmd_sample(a) -> int:
    """Deterministic hash-fraction sample of a store (md5 bucket rule)."""
    _ray_up()
    from .pipeline.encode import sample_store

    rec = sample_store(a.store, a.out, a.key, a.pct, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_compact(a) -> int:
    """Small-files compaction: re-encode a store at a fresh chunk size."""
    _ray_up()
    from .pipeline.encode import compact_store

    rec = compact_store(a.store, a.out, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_purge(a) -> int:
    """Physical row deletion: rewrite the store dropping matched rows."""
    _ray_up()
    from .pipeline.encode import purge_store

    preds = _parse_where(a.where)
    if not preds:
        raise SystemExit("purge requires --where (refusing a no-op rewrite)")
    rec = purge_store(a.store, a.out, preds, batch_size=a.batch_size)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_dedup_cut(a) -> int:
    """Rewrite a store cutting duplicated-substring spans from the text
    column (Lee et al. 2022 substring dedup as a store op)."""
    _ray_up()
    from .pipeline.encode import dedup_cut_store

    stats: dict = {}
    rec = dedup_cut_store(
        a.store, a.out, id_col=a.id_col, text_col=a.text_col,
        window=a.window, batch_size=a.batch_size, stats_out=stats,
    )
    print(json.dumps({**rec["totals"], "arm": stats.get("arm"),
                      "dup_hashes": stats.get("dup_hashes")}))
    return 0


def cmd_recover(a) -> int:
    """Salvage a damaged store into a fresh consistent one."""
    _ray_up()
    from .pipeline.fsck import fsck_store
    from .pipeline.encode import recover_store

    rec = recover_store(a.store, a.out, batch_size=a.batch_size)
    before = fsck_store(a.store, deep=False)
    print(json.dumps({
        "recovered_rows": rec["totals"]["rows"],
        "damaged_manifest_rows": before["manifest_rows"],
        "rows_lost": before["manifest_rows"] - rec["totals"]["rows"],
    }))
    return 0


def cmd_rekey(a) -> int:
    """Encryption key rotation: keyed decode -> fresh encode, new keys."""
    _ray_up()
    from .chunk import EncodeOptions
    from .pipeline.encode import rekey_store

    old = _load_keystore(a.keystore)
    new = _load_keystore(a.new_keystore)
    opts = EncodeOptions(
        encrypt=dict(kv.split("=", 1) for kv in a.encrypt),
        encryption_keys=new,
    )
    if a.mask:
        opts.masks = dict(kv.split("=", 1) for kv in a.mask)
    rec = rekey_store(a.store, a.out, opts, keys=old, batch_size=a.batch_size,
                      on_corrupt="skip" if a.skip_corrupt else "raise")
    print(json.dumps(rec["totals"]))
    return 0


def cmd_table(a) -> int:
    """Versioned keyed tables (Hive-ACID analog, state/table.py):
    create / delta / read / compact / vacuum / history."""
    _ray_up()
    from .state import table as tbl

    if a.op == "create":
        meta = tbl.create_table(a.dir, [a.input], key=a.key, batch_size=a.batch_size)
        print(json.dumps({"version": meta["version"], "key": meta["key"]}))
    elif a.op == "delta":
        import pyarrow.parquet as pq

        meta = tbl.append_delta(a.dir, pq.read_table(a.input))
        print(json.dumps({"version": meta["version"]}))
    elif a.op == "read":
        ds = tbl.read_table(a.dir, version=a.version)
        shown = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for row in b.slice(0, max(a.limit - shown, 0)).to_pylist():
                print(json.dumps(row, default=str))
                shown += 1
            if shown >= a.limit:
                break
    elif a.op == "compact":
        meta = tbl.compact_table(a.dir)
        print(json.dumps({"version": meta["version"], "base": meta["versions"][-1]["base"]}))
    elif a.op == "vacuum":
        removed = tbl.vacuum_table(a.dir, keep_versions=a.keep)
        print(json.dumps({"removed": removed}))
    elif a.op == "history":
        print(json.dumps(tbl.load_meta(a.dir)["versions"], indent=1))
    elif a.op == "erase":
        if a.key_value is None:
            raise SystemExit("table erase requires --key-value")
        kv = json.loads(a.key_value)  # typed literal: 7 or "alice"
        print(json.dumps(tbl.erase_key(a.dir, kv)))
    elif a.op == "fsck":
        rep = tbl.fsck_table(a.dir)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1
    return 0


def cmd_merge(a) -> int:
    from .state.manifest import merge_stores

    rec = merge_stores(a.out, a.inputs)
    print(json.dumps(rec["totals"]))
    return 0


def cmd_scan(a) -> int:
    _ray_up()
    from .pipeline.decode import count_rows

    t0 = time.time()
    n = count_rows(a.store, predicates=_parse_where(a.where), trust_stats=a.trust_stats)
    dt = time.time() - t0
    print(json.dumps({"rows": n, "sec": round(dt, 3), "rows_per_s": int(n / max(dt, 1e-9))}))
    return 0


def cmd_fsck(a) -> int:
    _ray_up()
    from .pipeline.fsck import fsck_store

    rep = fsck_store(a.store, deep=not a.shallow)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def cmd_key(a) -> int:
    """Local keystore management (orc-tools `key` analog; a deployment
    would use a KMS).  gen: add a fresh random key under NAME; list:
    print key names (never material)."""
    import os

    ks = {}
    if os.path.exists(a.keystore):
        with open(a.keystore) as f:
            ks = json.load(f)
    if a.op == "list":
        print(json.dumps(sorted(ks)))
        return 0
    if a.op == "gen":
        if not a.name:
            raise SystemExit("key gen requires NAME")
        if a.name in ks:
            raise SystemExit(f"key {a.name!r} already exists (refusing to rotate implicitly)")
        ks[a.name] = os.urandom(32 if a.bits == 256 else 16).hex()
        tmp = a.keystore + ".tmp"
        # key material must never be world-readable (0600 from creation)
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        with os.fdopen(fd, "w") as f:
            json.dump(ks, f, indent=1)
        os.replace(tmp, a.keystore)
        print(json.dumps({"added": a.name, "bits": a.bits, "keystore": a.keystore}))
        return 0
    raise SystemExit(f"unknown key op {a.op!r}")


def cmd_query(a) -> int:
    """Run a registered analytics pipeline from the query library over a
    testdata-shaped table directory (orc-tools `data` analog for the
    query surface).  `query list` prints every registered name."""
    from .queries import QUERIES

    if a.name == "list":
        for n in sorted(QUERIES):
            print(n)
        return 0
    if a.name not in QUERIES:
        import difflib

        near = difflib.get_close_matches(a.name, QUERIES, n=3)
        raise SystemExit(f"unknown query {a.name!r}; close: {near} (use 'list')")
    _ray_up()
    import pyarrow as _pa

    res = QUERIES[a.name](a.sf_dir)
    if not isinstance(res, _pa.Table):
        parts = list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        res = _pa.concat_tables(parts) if parts else _pa.table({})
    for row in res.slice(0, a.limit).to_pylist():
        print(json.dumps(row, default=str))
    print(json.dumps({"rows": res.num_rows, "columns": res.column_names}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="orc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode")
    e.add_argument("--encrypt", action="append",
                   help="COL=KEYNAME: AES-CTR-encrypt a column under a keystore key (repeatable)")
    e.add_argument("--keystore", help="JSON file {key name: hex AES-128/256 key}")
    e.add_argument("input")
    e.add_argument("store")
    e.add_argument("--batch-size", type=int, default=16384)
    e.add_argument("--columns")
    e.add_argument("--resume", action="store_true")
    e.add_argument("--partition-by")
    e.add_argument("--salt-col")
    e.add_argument("--zstd-level", type=int, default=None,
                   help="default: EncodeOptions.compression_level (6)")
    e.add_argument("--strategy", default="speed", choices=["speed", "compression"])
    e.add_argument("--column-compression", action="append",
                   help="COL=codec second-stage override (none|zstd|lz4|snappy|gzip); "
                        "use none for already-compressed payloads (repeatable)")
    e.add_argument("--file-version", default="0.12", choices=["0.11", "0.12"],
                   help="0.11 writes integer streams in the RLEv1-analog "
                        "run/literal+varint layout (readers need no knob)")
    e.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    e.add_argument(
        "--mask",
        action="append",
        default=[],
        metavar="COL=MASK",
        help="write-side column mask (nullify|redact|sha256|scrub_pii), repeatable",
    )
    e.add_argument(
        "--char",
        action="append",
        default=[],
        metavar="COL=SPEC",
        help="write-side CHAR/VARCHAR enforcement, e.g. name=char(10) or "
        "name=varchar(10) (truncate to n; char space-pads), repeatable",
    )
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode")
    d.add_argument("store")
    d.add_argument("--columns")
    d.add_argument("--limit", type=int, default=20)
    d.add_argument("--out")
    d.add_argument("--partition-by", help="comma-separated hive partition columns for --out")
    d.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    d.add_argument("--union", action="append",
                   help="additional store(s) to union by name (schema-evolution "
                        "read: types promote, absent columns fill with NULLs)")
    d.add_argument("--keystore", help="JSON keystore to decrypt encrypted columns "
                   "(omit to read masked public variants)")
    d.add_argument("--skip-corrupt", action="store_true",
                   help="recovery read (FileDump --recover analog): drop chunks "
                        "failing their content hash instead of erroring")
    d.set_defaults(fn=cmd_decode)

    i = sub.add_parser("inspect")
    i.add_argument("store")
    i.add_argument("--chunks", action="store_true")
    i.set_defaults(fn=cmd_inspect)

    so = sub.add_parser("sort", help="re-encode a store sorted by key(s) for tight pruning")
    so.add_argument("store")
    so.add_argument("out")
    so.add_argument("--by", required=True, help="comma-separated sort columns")
    so.add_argument("--batch-size", type=int, default=16384)
    so.set_defaults(fn=cmd_sort)

    zo = sub.add_parser("zorder", help="re-encode clustered on a Z-order curve for multi-column pruning")
    zo.add_argument("store")
    zo.add_argument("out")
    zo.add_argument("--by", required=True, help="comma-separated numeric columns (>=2)")
    zo.add_argument("--batch-size", type=int, default=16384)
    zo.set_defaults(fn=cmd_zorder)

    pr = sub.add_parser("profile", help="one-pass numeric profile of a chunk store")
    pr.add_argument("store")
    pr.add_argument("--cols", required=True, help="comma-separated numeric columns")
    pr.set_defaults(fn=cmd_profile)

    ti = sub.add_parser("text-index", help="build a BM25 inverted index (chunk-store postings)")
    ti.add_argument("store")
    ti.add_argument("out")
    ti.add_argument("--id-col", default="doc_id")
    ti.add_argument("--text-col", default="text")
    ti.set_defaults(fn=cmd_text_index)

    bq = sub.add_parser("bm25", help="BM25 search against a text-index")
    bq.add_argument("index")
    bq.add_argument("terms", help="comma-separated query terms")
    bq.add_argument("-k", type=int, default=10)
    bq.set_defaults(fn=cmd_bm25)

    sa = sub.add_parser("sample", help="deterministic pct%% sample: md5(key) mod 100 < pct")
    sa.add_argument("store")
    sa.add_argument("out")
    sa.add_argument("--key", required=True)
    sa.add_argument("--pct", type=int, required=True)
    sa.add_argument("--batch-size", type=int, default=16384)
    sa.set_defaults(fn=cmd_sample)

    sh = sub.add_parser("shuffle", help="deterministic global shuffle (pre-training order), splitmix64(key ^ seed)")
    sh.add_argument("store")
    sh.add_argument("out")
    sh.add_argument("--key", required=True)
    sh.add_argument("--seed", type=int, default=0)
    sh.add_argument("--batch-size", type=int, default=16384)
    sh.set_defaults(fn=cmd_shuffle)

    pk = sub.add_parser("pack", help="pack a pre-tokenized store into fixed-context "
                                     "training rows (concat-then-chunk, docs split at "
                                     "window boundaries)")
    pk.add_argument("store")
    pk.add_argument("out")
    pk.add_argument("--window", type=int, default=2048)
    pk.add_argument("--key", default="doc_id")
    pk.add_argument("--tokens-col", default="tokens")
    pk.add_argument("--batch-size", type=int, default=None,
                    help="windows per chunk (default: ~16 MiB of tokens)")
    pk.set_defaults(fn=cmd_pack)

    dd = sub.add_parser("dedup", help="exact-dedup store rewrite: keep ONE row (the "
                                      "smallest id) per distinct key value (double-"
                                      "fingerprint grouping, distributed window-rank)")
    dd.add_argument("store")
    dd.add_argument("out")
    dd.add_argument("--key", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--batch-size", type=int, default=16384)
    dd.set_defaults(fn=cmd_dedup)

    tk = sub.add_parser("tokenize", help="tokenize a text store into the pre-training "
                                         "token table (byte-level BPE trained on the "
                                         "store's own word frequencies; model persisted "
                                         "as bpe_model.json)")
    tk.add_argument("store")
    tk.add_argument("out")
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--merges", type=int, default=256)
    tk.add_argument("--top-words", type=int, default=None,
                    help="cap the driver-side word table (open vocabularies)")
    tk.add_argument("--batch-size", type=int, default=8192)
    tk.add_argument("--no-verify", action="store_true",
                    help="skip the per-batch detokenization byte-identity assert")
    tk.add_argument("--model", default=None,
                    help="reuse a prior run's bpe_model.json (skip training)")
    tk.set_defaults(fn=cmd_tokenize)

    mem = sub.add_parser("memory",
                         help="reader memory estimate from manifest + sampled "
                              "chunk headers (orc-memory analog)")
    mem.add_argument("store")
    mem.add_argument("--columns")
    mem.add_argument("--workers", type=int, default=1)
    mem.add_argument("--sample", type=int, default=8)
    mem.set_defaults(fn=cmd_memory)

    st = sub.add_parser("stats", help="file-level per-column stats rollup from the manifest (orc-statistics analog)")
    st.add_argument("store")
    st.set_defaults(fn=cmd_stats)

    js = sub.add_parser("json-schema", help="infer a schema from JSON-lines input (JsonSchemaFinder analog)")
    js.add_argument("input")
    js.set_defaults(fn=cmd_json_schema)

    vs = sub.add_parser("version")
    vs.set_defaults(fn=cmd_version)

    ky = sub.add_parser("key", help="keystore management: gen NAME | list (orc-tools key analog)")
    ky.add_argument("op", choices=["gen", "list"])
    ky.add_argument("name", nargs="?")
    ky.add_argument("--keystore", required=True)
    ky.add_argument("--bits", type=int, default=256, choices=[128, 256])
    ky.set_defaults(fn=cmd_key)

    qy = sub.add_parser("query", help="run a registered analytics pipeline (or 'list')")
    qy.add_argument("name")
    qy.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qy.add_argument("--limit", type=int, default=20)
    qy.set_defaults(fn=cmd_query)

    cp = sub.add_parser("compact", help="re-encode a store at a fresh chunk size (small-files compaction)")
    cp.add_argument("store")
    cp.add_argument("out")
    cp.add_argument("--batch-size", type=int, default=16384)
    cp.set_defaults(fn=cmd_compact)

    pg = sub.add_parser("purge", help="rewrite a store DROPPING rows matching --where (hard delete)")
    pg.add_argument("store")
    pg.add_argument("out")
    pg.add_argument("--where", required=True, help='JSON predicates, e.g. \'[["user_id","==",7]]\'')
    pg.add_argument("--batch-size", type=int, default=16384)
    pg.set_defaults(fn=cmd_purge)

    dc = sub.add_parser("dedup-cut", help="rewrite a store cutting duplicated-"
                        "substring spans from the text column (Lee et al. 2022)")
    dc.add_argument("store")
    dc.add_argument("out")
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--window", type=int, default=32)
    dc.add_argument("--batch-size", type=int, default=16384)
    dc.set_defaults(fn=cmd_dedup_cut)

    rc = sub.add_parser("recover", help="salvage a damaged store (skip corrupt/"
                        "missing chunks) into a fresh consistent one")
    rc.add_argument("store")
    rc.add_argument("out")
    rc.add_argument("--batch-size", type=int, default=16384)
    rc.set_defaults(fn=cmd_recover)

    rk = sub.add_parser("rekey", help="rotate encryption keys: keyed decode -> "
                        "re-encode under a new keystore (plaintext never on disk)")
    rk.add_argument("store")
    rk.add_argument("out")
    rk.add_argument("--keystore", required=True, help="CURRENT keys (decrypt)")
    rk.add_argument("--new-keystore", required=True, help="NEW keys (re-encrypt)")
    rk.add_argument("--encrypt", action="append", required=True, metavar="COL=KEYNAME",
                    help="new column->key map (repeatable); columns omitted here "
                         "are DECRYPTED in the output")
    rk.add_argument("--mask", action="append", metavar="COL=MASK",
                    help="masking for the new public variants (default sha256)")
    rk.add_argument("--skip-corrupt", action="store_true",
                    help="salvage-rotate a DAMAGED encrypted store: drop chunks "
                         "failing their content hash, rotate the survivors")
    rk.add_argument("--batch-size", type=int, default=16384)
    rk.set_defaults(fn=cmd_rekey)

    tb = sub.add_parser("table", help="versioned keyed table: create|delta|read|compact|vacuum|history")
    tb.add_argument("op", choices=["create", "delta", "read", "compact", "vacuum", "history", "erase", "fsck"])
    tb.add_argument("dir")
    tb.add_argument("input", nargs="?", help="create: base parquet; delta: parquet with an _op column")
    tb.add_argument("--key", help="create: the table key column")
    tb.add_argument("--version", type=int, default=None, help="read: time-travel version")
    tb.add_argument("--limit", type=int, default=20)
    tb.add_argument("--keep", type=int, default=1, help="vacuum: versions to keep")
    tb.add_argument("--key-value", help="erase: JSON literal of the key to hard-erase "
                                        "from ALL versions (GDPR right-to-be-forgotten)")
    tb.add_argument("--batch-size", type=int, default=16384)
    tb.set_defaults(fn=cmd_table)

    io_ = sub.add_parser("import-orc", help="encode real .orc file(s)/dir into a chunk store")
    io_.add_argument("input")
    io_.add_argument("store")
    io_.add_argument("--columns")
    io_.add_argument("--batch-size", type=int, default=16384)
    io_.set_defaults(fn=cmd_import_orc)

    ec = sub.add_parser("export-csv",
                        help="decode a chunk store into partitioned .csv files")
    ec.add_argument("store")
    ec.add_argument("out")
    ec.add_argument("--columns")
    ec.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    ec.set_defaults(fn=cmd_export_csv)

    ic = sub.add_parser("import-csv",
                        help="encode CSV file(s)/dir into a chunk store (csv-import analog)")
    ic.add_argument("input")
    ic.add_argument("store")
    ic.add_argument("--schema", help="ORC schema string, e.g. 'struct<a:int,b:char(3)>'")
    ic.add_argument("--delimiter", default=",")
    ic.add_argument("--columns")
    ic.add_argument("--batch-size", type=int, default=16384)
    ic.add_argument("--mask", action="append", help="COL=nullify|redact|sha256")
    ic.add_argument("--encrypt", action="append", help="COL=KEYNAME (needs --keystore)")
    ic.add_argument("--keystore", help="JSON keystore path")
    ic.add_argument("--char", action="append", help="COL=char(n)|varchar(n)")
    ic.set_defaults(fn=cmd_import_csv)

    ij = sub.add_parser("import-jsonl",
                        help="encode JSON-lines file(s)/dir into a chunk store (json-import analog)")
    ij.add_argument("input")
    ij.add_argument("store")
    ij.add_argument("--columns")
    ij.add_argument("--batch-size", type=int, default=16384)
    ij.add_argument("--mask", action="append", help="COL=nullify|redact|sha256")
    ij.add_argument("--encrypt", action="append", help="COL=KEYNAME (needs --keystore)")
    ij.add_argument("--keystore", help="JSON keystore path")
    ij.set_defaults(fn=cmd_import_jsonl)

    eo = sub.add_parser("export-orc", help="decode a chunk store into partitioned .orc files")
    eo.add_argument("store")
    eo.add_argument("out")
    eo.add_argument("--columns")
    eo.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    eo.add_argument("--compression", default="zstd",
                    choices=["zstd", "zlib", "snappy", "lz4", "uncompressed"])
    eo.set_defaults(fn=cmd_export_orc)

    ep = sub.add_parser("export-parquet",
                        help="decode a chunk store into partitioned .parquet files")
    ep.add_argument("store")
    ep.add_argument("out")
    ep.add_argument("--columns")
    ep.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    ep.add_argument("--compression", default="zstd",
                    choices=["zstd", "snappy", "lz4", "gzip", "none"])
    ep.set_defaults(fn=cmd_export_parquet)

    eb = sub.add_parser("export-bin",
                        help="decode a token store into flat-token training shards (.bin)")
    eb.add_argument("store")
    eb.add_argument("out")
    eb.add_argument("--id-col", default="doc_id")
    eb.add_argument("--tokens-col", default="tokens")
    eb.add_argument("--batch-size", type=int, default=65536)
    eb.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    eb.set_defaults(fn=cmd_export_bin)

    ib = sub.add_parser("import-bin",
                        help="encode .bin training shards back into a chunk store")
    ib.add_argument("input")
    ib.add_argument("store")
    ib.add_argument("--batch-size", type=int, default=16384)
    ib.add_argument("--mask", action="append", help="COL=nullify|redact|sha256")
    ib.add_argument("--encrypt", action="append", help="COL=KEYNAME (needs --keystore)")
    ib.add_argument("--keystore", help="JSON keystore path")
    ib.add_argument("--char", action="append", help="COL=char(n)|varchar(n)")
    ib.add_argument("--file-version", default="0.12", choices=["0.11", "0.12"])
    ib.set_defaults(fn=cmd_import_bin)

    m = sub.add_parser("merge", help="merge committed stores (orc-tools merge analog)")
    m.add_argument("out")
    m.add_argument("inputs", nargs="+")
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("scan")
    s.add_argument("store")
    s.add_argument("--where", help='JSON predicates, e.g. \'[["col","<",100]]\'')
    s.add_argument("--trust-stats", action="store_true",
                   help="count from manifest stats (footer numberOfRows analog)")
    s.set_defaults(fn=cmd_scan)

    fk = sub.add_parser("fsck", help="store integrity audit: commit/manifest/"
                        "chunk consistency + distributed content-hash scan")
    fk.add_argument("store")
    fk.add_argument("--shallow", action="store_true",
                    help="metadata consistency only (skip the blob re-hash)")
    fk.set_defaults(fn=cmd_fsck)

    a = p.parse_args(argv)
    return a.fn(a)


if __name__ == "__main__":
    sys.exit(main())
