"""Distributed connected components — min-label propagation over an
edge Dataset.

The scale path for cluster resolution in dedup pipelines: the driver
union-find (dedup.py `_UnionFind`) is exact and fast while the dup-edge
set fits one process; this operator keeps the whole computation
distributed so the edge set never has to.  Every iteration each node
takes the minimum label among itself and its neighbours:

    messages  = labels(self) ∪ labels(neighbour via one hash join)
    new label = MIN(messages)    (agg_by_keys — sort + vectorized reduce)

which alone converges in O(graph diameter) rounds.  Pointer-doubling
shortcut messages (on by default) add ``label(label(v))`` each round —
the label table self-joined on (label -> node) — collapsing long chains
in O(log diameter) rounds (the Kiveris et al. "Connected Components in
MapReduce and Beyond", SoCC'14 family); dedup cluster graphs
(near-clique groups) usually finish in 2-4 rounds either way.

Convergence detection is exact and distributed: self-messages carry
their label in a separate ``selflab`` column (null on neighbour
messages, so ``min`` skips it), and after the reduce a node changed iff
``new label < min(selflab)``.  Only per-batch changed-counts (O(blocks)
ints) reach the driver.

Node ids may be any orderable Arrow type (ints, strings); the component
label is the minimum node id in the component — deterministic, so the
operator is retry-stable.
"""

from __future__ import annotations

import functools

import pyarrow as pa
import pyarrow.compute as pc


def _und_edges(t: pa.Table) -> pa.Table:
    """(a, b) edge rows -> both-direction (node, nbr) message edges."""
    if t.num_rows == 0:
        return pa.table({"node": t.column("a"), "nbr": t.column("b")})
    return pa.concat_tables(
        [
            pa.table({"node": t.column("a"), "nbr": t.column("b")}),
            pa.table({"node": t.column("b"), "nbr": t.column("a")}),
        ]
    )


def connected_components(
    edges,
    max_iters: int = 64,
    num_partitions: int = 8,
    driver_threshold: int = 1_000_000,
    shortcut: bool = True,
    stats_out: dict | None = None,
):
    """Label every node of the undirected graph ``edges`` (Dataset with
    columns ``a``, ``b``) with the minimum node id of its component.

    Returns a ray.data.Dataset with columns (node, label).  Raises if the
    graph has not converged after ``max_iters`` rounds (diameter too
    large for min-propagation — see module docstring for the O(log n)
    upgrade path).

    Adaptive backend (the join_adaptive pattern): at or below
    ``driver_threshold`` edge rows the exact union-find runs in one
    process — a distributed round costs a hash join + a sort-aggregate,
    which dwarfs a small graph.  Above it (or with threshold 0) the
    min-propagation rounds keep everything distributed.  Both backends
    produce identical labels (min node id per component).
    """
    import ray

    from .aggregates import agg_by_keys

    und = edges.map_batches(_und_edges, batch_format="pyarrow", zero_copy_batch=True).materialize()

    ntype = und.schema().base_schema.field("node").type
    # und carries BOTH directions (2x the input edge rows) — compare the
    # documented edge-row threshold against the input edge count
    if driver_threshold and und.count() <= 2 * driver_threshold:
        from .dedup import _UnionFind

        uf = _UnionFind()
        for b in und.iter_batches(batch_format="pyarrow", batch_size=None):
            for a_v, b_v in zip(b.column("node").to_pylist(), b.column("nbr").to_pylist()):
                uf.union(a_v, b_v)
        members = sorted(uf.parent)
        # same node/label types as the distributed backend (ntype), even
        # for the empty graph — the backends must be interchangeable
        return ray.data.from_arrow(
            pa.table({"node": pa.array(members, ntype),
                      "label": pa.array([uf.find(m) for m in members], ntype)})
        )

    def _lab_empty() -> pa.Table:
        return pa.table({"lnode": pa.array([], ntype), "label": pa.array([], ntype)})

    def _msg_empty() -> pa.Table:
        return pa.table(
            {"node": pa.array([], ntype), "label": pa.array([], ntype), "selflab": pa.array([], ntype)}
        )

    # initial labels: each distinct node labels itself
    distinct = agg_by_keys(und, ["node"], [("nbr", "min", "_drop")])
    labels = distinct.map_batches(
        lambda t: pa.table({"lnode": t.column("node"), "label": t.column("node")})
        if "node" in t.column_names and t.num_rows
        else _lab_empty(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def nbr_msgs(t: pa.Table) -> pa.Table:
        # joined row: (node, nbr, lnode=nbr, label) -> message (node, label)
        if t.num_rows == 0:
            return _msg_empty()
        null_self = pa.nulls(t.num_rows, t.column("label").type)
        return pa.table(
            {"node": t.column("node"), "label": t.column("label"), "selflab": null_self}
        )

    def self_msgs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _msg_empty()
        return pa.table(
            {"node": t.column("lnode"), "label": t.column("label"), "selflab": t.column("label")}
        )

    def changed_and_labels(t: pa.Table) -> pa.Table:
        # agg row: (node, label=min(all msgs), old=min(selflab)=own old label)
        if t.num_rows == 0 or "node" not in t.column_names:
            return _lab_empty().append_column("_changed", pa.array([], pa.int64()))
        import numpy as np

        ch = pc.sum(pc.cast(pc.less(t.column("label"), t.column("old")), pa.int64()))
        chc = np.zeros(t.num_rows, np.int64)
        chc[0] = ch.as_py() or 0
        return pa.table(
            {
                "lnode": t.column("node"),
                "label": t.column("label"),
                "_changed": pa.array(chc),
            }
        )

    # Ray's hash join builds a SCHEMA-LESS empty table for any partition
    # that receives zero rows (join.py ArrowBlockBuilder().build()) and
    # pyarrow then fails the key lookup — so bound the partition count by
    # the node count (>=2048 expected rows per partition makes an empty
    # partition vanishingly unlikely, and small graphs take 1 partition).
    n_nodes = labels.count()
    if n_nodes == 0:
        return labels.map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    np_eff = max(1, min(num_partitions, n_nodes // 2048))

    def shortcut_msgs(t: pa.Table) -> pa.Table:
        # self-joined row: (lnode=v, label=l, label2=label(l)) -> (v, label2)
        if t.num_rows == 0:
            return _msg_empty()
        null_self = pa.nulls(t.num_rows, t.column("label2").type)
        return pa.table(
            {"node": t.column("lnode"), "label": t.column("label2"), "selflab": null_self}
        )

    for it in range(max_iters):
        joined = und.join(
            labels,
            join_type="inner",
            num_partitions=np_eff,
            on=("nbr",),
            right_on=("lnode",),
        )
        msgs = joined.map_batches(nbr_msgs, batch_format="pyarrow", zero_copy_batch=True).union(
            labels.map_batches(self_msgs, batch_format="pyarrow", zero_copy_batch=True)
        )
        if shortcut:
            # pointer doubling: label(label(v)) messages via a label-table
            # self-join (every label IS a node, so the inner join is total)
            lab2 = labels.map_batches(
                lambda t: t.rename_columns(["lnode2", "label2"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            hopped = labels.join(
                lab2,
                join_type="inner",
                num_partitions=np_eff,
                on=("label",),
                right_on=("lnode2",),
            )
            msgs = msgs.union(
                hopped.map_batches(shortcut_msgs, batch_format="pyarrow", zero_copy_batch=True)
            )
        agg = agg_by_keys(
            msgs, ["node"], [("label", "min", "label"), ("selflab", "min", "old")]
        )
        mixed = agg.map_batches(
            changed_and_labels, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        changed = sum(
            b.column("_changed").to_numpy(zero_copy_only=False).sum()
            for b in mixed.iter_batches(batch_format="pyarrow", batch_size=None)
            if "_changed" in b.column_names and b.num_rows
        )
        labels = mixed.map_batches(
            lambda t: t.drop_columns(["_changed"]) if "_changed" in t.column_names else t,
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if changed == 0:
            if stats_out is not None:
                stats_out["rounds"] = it + 1
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "raise max_iters (pointer-doubling needs ~log2(diameter) + 2)"
    )
