"""Distributed union-find (connected components) over an edge Dataset.

The canonicalization primitive (SURVEY D4 / §7.3 shuffle #2): label
propagation to the minimum node id with pointer-jumping edges
(node <-> current label), two keyed shuffles per round:

  round:  (labels ∪ edges ∪ pointer-edges) bucketed by hash(src)
            -> vectorized per-bucket Arrow join: forward src's label
          messages bucketed by hash(node)
            -> vectorized per-bucket min + change count

Work is grouped by HASH BUCKET, not by node — each bucket group does a
vectorized Arrow join/aggregate over all its keys, so a round is O(P)
Python calls regardless of node count (a per-node map_groups would be
millions of tiny calls at corpus scale). Hot nodes only enlarge one
bucket's vectorized reduce, never a Python loop.

State between rounds is the node-sized labels Dataset (materialized —
that IS the algorithm state, never the edge set). Converges at the
unique fixpoint (label constant = component min); pointer edges give
near-logarithmic rounds on path-heavy graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bucketing import bucket_groupby

LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])
N_BUCKETS = 64


def _bucket_of(arr: pa.ChunkedArray, n: int) -> pa.Array:
    from .bucketing import fnv1a_hashes
    h = fnv1a_hashes(arr.to_pylist())
    return pa.array((h % np.uint64(n)).astype(np.int32), pa.int32())


def _init_labels_batch(batch: pa.Table) -> pa.Table:
    u = pc.unique(pa.concat_arrays([
        batch.column("src").combine_chunks().cast(pa.string()),
        batch.column("dst").combine_chunks().cast(pa.string())]))
    return pa.table({"node": u, "label": u})


def _dedup_nodes_bucket(group: pa.Table) -> pa.Table:
    g = group.group_by(["node"]).aggregate([("label", "min")])
    return g.rename_columns(["node", "label"])


def _propagate_bucket(group: pa.Table) -> pa.Table:
    """One hash bucket of srcs: label rows (dst null) + edge rows.
    Vectorized: join edges to labels on src, forward label to dst;
    every src also sends its own label to itself (is_old=1)."""
    is_label = pc.is_valid(group.column("label"))
    labels = group.filter(is_label).select(["src", "label"])
    labels = labels.group_by(["src"]).aggregate([("label", "min")]) \
        .rename_columns(["src", "label"])
    edges = group.filter(pc.invert(is_label)).select(["src", "dst"])
    fwd = edges.join(labels, keys="src", join_type="inner")
    n_fwd, n_self = fwd.num_rows, labels.num_rows
    return pa.table({
        "node": pa.concat_arrays([
            fwd.column("dst").combine_chunks(),
            labels.column("src").combine_chunks()]),
        "label": pa.concat_arrays([
            fwd.column("label").combine_chunks(),
            labels.column("label").combine_chunks()]),
        "is_old": pa.concat_arrays([
            pa.nulls(n_fwd, pa.string()),
            labels.column("label").combine_chunks()]),
    })


def _reduce_bucket(group: pa.Table) -> pa.Table:
    """One hash bucket of nodes: min label per node + change counter."""
    g = group.group_by(["node"]).aggregate([("label", "min"),
                                            ("is_old", "min")])
    g = g.rename_columns(["node", "label", "old"])
    changed = pc.cast(
        pc.not_equal(g.column("label"),
                     pc.fill_null(g.column("old"), "\x00")), pa.int64())
    return pa.table({"node": g.column("node"), "label": g.column("label"),
                     "changed": changed})


def connected_components(edges_ds, max_rounds: int = 32,
                         n_buckets: int = N_BUCKETS):
    """edges (src, dst) -> labels Dataset (node, label) where label is
    the minimum node id of the component. Requires an active Ray
    session. Undirectedness is handled by symmetrizing the edges."""
    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch.column("src").cast(pa.string()),
                        "dst": batch.column("dst").cast(pa.string())})
        rev = pa.table({"src": batch.column("dst").cast(pa.string()),
                        "dst": batch.column("src").cast(pa.string())})
        t = pa.concat_tables([fwd, rev])
        return t.append_column("bucket",
                               _bucket_of(t.column("src"), n_buckets))

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()

    def with_node_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", _bucket_of(batch.column("node"), n_buckets))

    def rebucket(fn):
        def wrapped(g: pa.Table) -> pa.Table:
            t = fn(g)
            return t.append_column(
                "bucket", _bucket_of(t.column("node"), n_buckets))
        return wrapped

    labels = bucket_groupby(
        edges.map_batches(_init_labels_batch, batch_format="pyarrow")
        .map_batches(with_node_bucket, batch_format="pyarrow"),
        rebucket(_dedup_nodes_bucket)).materialize()

    def as_label_row(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column("node"),
            "dst": pa.nulls(batch.num_rows, pa.string()),
            "label": batch.column("label"),
            "bucket": batch.column("bucket"),
        })

    def as_edge_row(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column("src"),
            "dst": batch.column("dst"),
            "label": pa.nulls(batch.num_rows, pa.string()),
            "bucket": batch.column("bucket"),
        })

    def as_pointer_edges(batch: pa.Table) -> pa.Table:
        # node <-> label extra edges: pointer jumping
        src = pa.concat_arrays([batch.column("node").combine_chunks(),
                                batch.column("label").combine_chunks()])
        dst = pa.concat_arrays([batch.column("label").combine_chunks(),
                                batch.column("node").combine_chunks()])
        t = pa.table({"src": src, "dst": dst,
                      "label": pa.nulls(len(src), pa.string())})
        return t.append_column("bucket",
                               _bucket_of(t.column("src"), n_buckets))

    import logging
    import time
    log = logging.getLogger(__name__)
    for rnd in range(max_rounds):
        t0 = time.time()
        mixed = labels.map_batches(as_label_row, batch_format="pyarrow") \
            .union(edges.map_batches(as_edge_row, batch_format="pyarrow")) \
            .union(labels.map_batches(as_pointer_edges,
                                      batch_format="pyarrow"))
        msgs = bucket_groupby(mixed, rebucket(_propagate_bucket))
        labels = bucket_groupby(msgs, rebucket(_reduce_bucket)) \
            .materialize()
        n_changed = labels.sum("changed")
        log.info("cc round %d: %s changed (%.2fs)", rnd, n_changed,
                 time.time() - t0)
        if not n_changed:
            break
    return labels.drop_columns(["bucket", "changed"])


def components_local(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Sequential union-find oracle for tests: node -> min-id label."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {n: find(n) for n in list(parent)}
