"""General distributed equi-join: large x large, no broadcast side.

Ray Data has no native join operator; the engine's other joins either
broadcast a small dimension (``relational.segment_revenue``) or are
specialized interval probes (as-of / range join). This module is the
general case — both sides arbitrarily large — re-expressed with the
engine's standard bucketed-exchange shape (SURVEY §2 "custom
operators"; the reference's cursor-style joins are `code/link_coref.py`
file-at-a-time loops, re-architected here for a cluster):

    tag each side with ``bucket = hash(key)``
      -> harmonize to one carrier schema (other side's payload NULL)
      -> union (streaming, no barrier)
      -> ONE bucketed sort exchange on ``bucket``
      -> per bucket group: split sides, vectorized ``pa.Table.join``

Equal keys land in the same bucket group, so each per-bucket hash join
is exact; the union carries each row across the wire exactly once (the
minimum any repartition join moves), and no driver-side build or
whole-side broadcast ever happens. The output keeps the ``bucket``
column: downstream same-key stages (grouped aggregates, semi joins,
another join on the same key) are already co-partitioned and need no
further exchange — the classic "reuse one partitioning key across
stages" rule.

Skew: a hot join key enlarges one bucket's vectorized Arrow join, never
a Python loop; if one bucket group outgrows a task heap the fix is the
same salting escape hatch the as-of join documents (split the PROBE
side by a salt column, replicate only the matching build rows).

Within-group output order follows Arrow's hash join and is not
globally deterministic; callers needing a total order sort the (much
smaller) result, as ``order_lineitem_totals`` does per bucket group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bucketing import bucket_groupby, fnv1a_hashes, hash_bucket

_KEY = "__k"
_SIDE = "__side"


def _pa_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _key_hashes(col: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return fnv1a_hashes(col.to_pylist())
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _carrier(batch: pa.Table, key: str, key_type: pa.DataType, side: int,
             own: list[tuple[str, pa.DataType]],
             other: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Project one side's batch onto the shared carrier schema: cast
    key -> __k, NULL columns for the other side's payload, int8 side
    tag, int32 bucket. Column ORDER is fixed (key, side, bucket, left
    payload, right payload) so the union sees one schema."""
    n = batch.num_rows
    kcol = batch.column(key).cast(key_type)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        _KEY: kcol,
        _SIDE: pa.array(np.full(n, side, np.int8)),
        "bucket": pa.array(hash_bucket([_key_hashes(kcol)]), pa.int32()),
    }
    for name, typ in own:
        cols[name] = batch.column(name).cast(typ)
    for name, typ in other:
        cols[name] = pa.nulls(n, typ)
    order = ([_KEY, _SIDE, "bucket"] + [n for n, _ in own]
             + [n for n, _ in other]) if side == 0 else \
            ([_KEY, _SIDE, "bucket"] + [n for n, _ in other]
             + [n for n, _ in own])
    return pa.table({name: cols[name] for name in order})


def _join_bucket(key_out: str, how: str,
                 lnames: list[str], rnames: list[str], bucket_fn=None):
    def kernel(group: pa.Table) -> pa.Table:
        bucket = group.column("bucket")
        lmask = pc.equal(group.column(_SIDE), pa.scalar(0, pa.int8()))
        lt = group.filter(lmask).select([_KEY] + lnames)
        rt = group.filter(pc.invert(lmask)).select([_KEY] + rnames)
        j = lt.join(rt, keys=_KEY, join_type=how)
        j = j.rename_columns([key_out if c == _KEY else c
                              for c in j.column_names])
        if bucket_fn is not None:
            j = bucket_fn(j)
        b = bucket[0] if group.num_rows else pa.scalar(0, pa.int32())
        return j.append_column(
            "bucket", pa.array(np.full(j.num_rows, b.as_py(), np.int32)))
    return kernel


def hash_join(left_ds, right_ds, on: str, right_on: str | None = None,
              *, how: str = "inner", bucket_fn=None):
    """Distributed equi-join of two Datasets on one key column.

    ``on`` names the left key; ``right_on`` the right key (defaults to
    ``on``). Payload column names must be disjoint across sides (rename
    upstream — cheap inside the same ``map_batches`` that prunes
    columns). ``how``: "inner" or "left outer". Returns the joined rows
    with the left key name and a ``bucket`` column co-partitioned on
    the key for downstream reuse.

    ``bucket_fn``: optional vectorized Arrow kernel fused into the
    per-bucket join task (joined group table -> table). Because a
    bucket group holds EVERY row of its keys, a key-grouped aggregate
    here is already final — fusing it avoids materializing wide join
    output into the object store and needs no second exchange."""
    right_on = right_on or on
    ls, rs = _pa_schema(left_ds), _pa_schema(right_ds)
    key_type = ls.field(on).type
    if pa.types.is_integer(key_type):
        key_type = pa.int64()
    lpay = [(f.name, f.type) for f in ls if f.name != on]
    rpay = [(f.name, f.type) for f in rs if f.name != right_on]
    dup = {n for n, _ in lpay} & {n for n, _ in rpay}
    if dup:
        raise ValueError(f"colliding payload columns: {sorted(dup)}")

    left = left_ds.map_batches(
        lambda b: _carrier(b, on, key_type, 0, lpay, rpay),
        batch_format="pyarrow", batch_size=None)
    right = right_ds.map_batches(
        lambda b: _carrier(b, right_on, key_type, 1, rpay, lpay),
        batch_format="pyarrow", batch_size=None)
    return bucket_groupby(
        left.union(right),
        _join_bucket(on, how, [n for n, _ in lpay], [n for n, _ in rpay],
                     bucket_fn))


# ---------------------------------------------------------------------------
# Showcase query: per-order item totals = orders |><| lineitem, both
# sides large (no broadcast), then a grouped aggregate that REUSES the
# join's bucket partitioning (zero extra exchanges after the join's one).
# ---------------------------------------------------------------------------


def _order_totals_bucket(group: pa.Table) -> pa.Table:
    g = group.group_by(["o_orderkey", "o_orderpriority"]).aggregate(
        [("l_quantity", "sum"), ("cents", "sum"), ("o_orderkey", "count")])
    g = g.rename_columns(["o_orderkey", "o_orderpriority",
                          "sum_qty", "revenue_cents", "n_items"])
    return g.sort_by("o_orderkey").select(
        ["o_orderkey", "o_orderpriority", "n_items", "sum_qty",
         "revenue_cents"])


def order_lineitem_totals(sf_dir: str):
    """Per-order line totals via the general hash join: orders (15k x
    sf rows) inner-join lineitem (60k x sf rows) on orderkey — neither
    side broadcast — then count/sum per order. The aggregate runs as a
    whole-block Arrow ``group_by`` per joined bucket group: the join
    output is already exactly co-partitioned on the key, so every
    order's rows sit in one group and the aggregate is final with NO
    additional exchange."""
    from .relational import _cents, _read

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_quantity": b.column("l_quantity").cast(pa.int64()),
            "cents": _cents(b.column("l_extendedprice")),
        })

    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_prep, batch_format="pyarrow", batch_size=None)
    out = hash_join(orders, lineitem, on="o_orderkey",
                    right_on="l_orderkey",
                    bucket_fn=_order_totals_bucket)
    return out.drop_columns(["bucket"])


ORDER_LINEITEM_SQL = """
    SELECT o.o_orderkey, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority
"""
