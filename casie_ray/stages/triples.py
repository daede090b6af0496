"""Triple emission + exact dedup + node/edge materialization.

Emission is the engine equivalent of the reference's brat frame writers
(report.py:260-481 → SURVEY S8). Dedup (SURVEY A7) is a salted
two-phase aggregate: a vectorized per-batch Arrow ``group_by`` combine
(pre-aggregation before the shuffle) followed by a bucketed
``groupby("bucket").map_groups`` final — the bucket column spreads hot
keys (e.g. hot-entity `targets` edges) across 4096 reducers, and each
reducer is itself vectorized Arrow, never per-key Python.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import TRIPLE_SCHEMA, row_to_event
from ..semantics import emit_triples

N_BUCKETS = 4096

RAW_TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("subj_type", pa.string()), ("obj_type", pa.string()),
    ("prov", pa.string()), ("count", pa.int64()), ("bucket", pa.int32()),
])


def _prov(conv_id: str, turn_idx: int, start: int, end: int) -> str:
    # \x00 separator sorts below every printable char, so the string min
    # over provenances orders exactly like the (conv_id, turn, start, end)
    # tuple even when one conv_id is a proper prefix of another
    return f"{conv_id}\x00{turn_idx:08d}\x00{start:08d}\x00{end:08d}"


def emit_triples_batch(batch: pa.Table) -> pa.Table:
    """Event rows -> raw triple rows (flat_map-style expansion)."""
    events = [row_to_event(r) for r in batch.to_pylist()]
    trips = emit_triples(events)
    if not trips:
        return RAW_TRIPLE_SCHEMA.empty_table()
    rows = [{
        "subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
        "subj_type": t["subj_type"], "obj_type": t["obj_type"],
        "prov": _prov(t["conv_id"], t["turn_idx"], t["ev_start"],
                      t["ev_end"]),
        "count": 1,
        "bucket": zlib.crc32(
            f"{t['subj']}\x00{t['pred']}\x00{t['obj']}".encode()) % N_BUCKETS,
    } for t in trips]
    return pa.Table.from_pylist(rows, schema=RAW_TRIPLE_SCHEMA)


_AGG = [("count", "sum"), ("prov", "min"), ("subj_type", "min"),
        ("obj_type", "min"), ("bucket", "min")]
_RENAME = {"count_sum": "count", "prov_min": "prov",
           "subj_type_min": "subj_type", "obj_type_min": "obj_type",
           "bucket_min": "bucket"}


def _dedup_table(t: pa.Table) -> pa.Table:
    """Vectorized exact dedup of one Arrow table on (subj, pred, obj):
    sum counts, keep the provenance-minimal row."""
    g = t.group_by(["subj", "pred", "obj"]).aggregate(_AGG)
    g = g.rename_columns([_RENAME.get(c, c) for c in g.column_names])
    return g.select(RAW_TRIPLE_SCHEMA.names).cast(RAW_TRIPLE_SCHEMA)


def partial_dedup(batch: pa.Table) -> pa.Table:
    """Per-batch combiner (runs before the shuffle)."""
    if batch.num_rows == 0:
        return RAW_TRIPLE_SCHEMA.empty_table()
    return _dedup_table(batch)


def final_dedup_group(group: pa.Table) -> pa.Table:
    """Per-bucket final dedup + decode provenance -> TRIPLE_SCHEMA."""
    if group.num_rows == 0:
        return TRIPLE_SCHEMA.empty_table()
    g = _dedup_table(group)
    prov = g.column("prov").to_pylist()
    conv, ti, st, en = [], [], [], []
    for p in prov:
        c, a, b, d = p.rsplit("\x00", 3)
        conv.append(c)
        ti.append(int(a))
        st.append(int(b))
        en.append(int(d))
    # deterministic output order within the bucket
    out = pa.table({
        "subj": g.column("subj"), "pred": g.column("pred"),
        "obj": g.column("obj"), "subj_type": g.column("subj_type"),
        "obj_type": g.column("obj_type"),
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(ti, pa.int32()),
        "ev_start": pa.array(st, pa.int32()),
        "ev_end": pa.array(en, pa.int32()),
        "weight": pa.array([1.0] * g.num_rows, pa.float32()),
        "count": g.column("count"),
    }).cast(TRIPLE_SCHEMA)
    return out.sort_by([("subj", "ascending"), ("pred", "ascending"),
                        ("obj", "ascending")])


NODE_SCHEMA = pa.schema([
    ("node_id", pa.string()), ("type", pa.string()),
    ("degree", pa.int64()), ("bucket", pa.int32()),
])


def emit_nodes_batch(batch: pa.Table) -> pa.Table:
    """Unique-triple rows -> (node_id, type, degree=1) rows for both
    endpoints, pre-aggregated within the batch."""
    if batch.num_rows == 0:
        return NODE_SCHEMA.empty_table()
    ones = pa.array([1] * batch.num_rows, pa.int64())
    subj = pa.table({"node_id": batch.column("subj"),
                     "type": batch.column("subj_type"), "degree": ones})
    obj = pa.table({"node_id": batch.column("obj"),
                    "type": batch.column("obj_type"), "degree": ones})
    t = pa.concat_tables([subj, obj])
    g = t.group_by(["node_id"]).aggregate([("degree", "sum"),
                                           ("type", "min")])
    g = g.rename_columns(["node_id", "degree", "type"])
    bucket = pa.array([zlib.crc32(x.encode()) % N_BUCKETS
                       for x in g.column("node_id").to_pylist()],
                      pa.int32())
    return pa.table({"node_id": g.column("node_id"),
                     "type": g.column("type"),
                     "degree": g.column("degree"),
                     "bucket": bucket}).cast(NODE_SCHEMA)


def final_nodes_group(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return NODE_SCHEMA.empty_table()
    g = group.group_by(["node_id"]).aggregate([("degree", "sum"),
                                               ("type", "min"),
                                               ("bucket", "min")])
    g = g.rename_columns(["node_id", "degree", "type", "bucket"])
    return g.select(NODE_SCHEMA.names).cast(NODE_SCHEMA) \
        .sort_by([("node_id", "ascending")])


# ---------------------------------------------------------------------------
# Cross-conversation entity canonicalization (SURVEY §7.3 shuffle #2):
# surface nodes -> entity blocks -> cosine merge edges -> distributed
# union-find -> node rewrite. Kernels shared with the sequential oracle
# (casie_ray.oracle.canonical_mapping) so both sides merge identically.
# ---------------------------------------------------------------------------

SURFACE_SCHEMA = pa.schema([("node", pa.string()), ("block", pa.string())])
CC_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


def extract_surface_nodes(batch: pa.Table) -> pa.Table:
    """Raw triple rows -> distinct (surface node, entity block) rows,
    bucketed by block hash for the canonicalization exchange. Arrow
    ``unique`` collapses repeats before the per-value parse, so the
    Python loop runs over distinct node ids only."""
    from ..semantics import canon_block_key, parse_surface_node
    uniq = pc.unique(pa.chunked_array([
        batch.column("subj").combine_chunks(),
        batch.column("obj").combine_chunks()]))
    nodes = set()
    for v in uniq.to_pylist():
        p = parse_surface_node(v)
        if p is not None:
            nodes.add((v, canon_block_key(*p)))
    pairs = sorted(nodes)
    return pa.table({
        "node": pa.array([n for n, _ in pairs], pa.string()),
        "block": pa.array([b for _, b in pairs], pa.string()),
        "bucket": pa.array([zlib.crc32(b.encode()) % N_BUCKETS
                            for _, b in pairs], pa.int32()),
    })


def surface_dedup_group(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def merge_edges_group(group: pa.Table) -> pa.Table:
    """One entity block -> pairwise cosine merge edges."""
    from ..semantics import canon_merge_edges
    edges = canon_merge_edges(group.column("node").to_pylist())
    if not edges:
        return CC_EDGE_SCHEMA.empty_table()
    return pa.table({"src": pa.array([a for a, _ in edges], pa.string()),
                     "dst": pa.array([b for _, b in edges], pa.string())})


def rewrite_triples(mapping_ref):
    """Apply the canonical mapping to subj/obj and recompute the dedup
    bucket (the key changed). mapping is broadcast once via ray.put —
    its size is proportional to the merged-variant mass, not the corpus."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        mapping = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) \
            else mapping_ref
        subj = [mapping.get(v, v)
                for v in batch.column("subj").to_pylist()]
        obj = [mapping.get(v, v) for v in batch.column("obj").to_pylist()]
        preds = batch.column("pred").to_pylist()
        bucket = [zlib.crc32(f"{s}\x00{p}\x00{o}".encode()) % N_BUCKETS
                  for s, p, o in zip(subj, preds, obj)]
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": batch.column("pred"),
            "obj": pa.array(obj, pa.string()),
            "subj_type": batch.column("subj_type"),
            "obj_type": batch.column("obj_type"),
            "prov": batch.column("prov"),
            "count": batch.column("count"),
            "bucket": pa.array(bucket, pa.int32()),
        }).cast(RAW_TRIPLE_SCHEMA)
    return fn


def merge_edges_multi(batch: pa.Table) -> pa.Table:
    """Whole hash-partitioned block -> merge edges for every complete
    entity block it contains (vectorized per block)."""
    if batch.num_rows == 0:
        return CC_EDGE_SCHEMA.empty_table()
    out = [CC_EDGE_SCHEMA.empty_table()]
    blocks = batch.column("block").to_pylist()
    nodes = batch.column("node").to_pylist()
    by_block: dict[str, list[str]] = {}
    for b, n in zip(blocks, nodes):
        by_block.setdefault(b, []).append(n)
    for b in sorted(by_block):
        t = merge_edges_group(pa.table({
            "node": pa.array(by_block[b], pa.string()),
            "block": pa.array([b] * len(by_block[b]), pa.string())}))
        if t.num_rows:
            out.append(t)
    return pa.concat_tables(out)
