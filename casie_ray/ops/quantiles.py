"""Exact distributed quantiles WITHOUT a global sort.

``sort``-then-index is the naive quantile plan and is an all-to-all
shuffle of every row — at 100 TB that is the single most expensive
operation an engine can run. This operator computes EXACT discrete
quantiles (DuckDB ``quantile_disc`` semantics: the element at rank
``max(1, ceil(q*n))``, the ceil taken in the same IEEE double
arithmetic) with iterative histogram refinement:

1. a streaming pass builds a fixed-width histogram over the integer
   value domain (per-batch Arrow ``group_by`` combiner; the tiny
   partial rows are combined on the driver — O(#buckets) state,
   never O(rows));
2. the driver walks the cumulative counts to locate, for every target
   rank, the bucket holding it, which becomes that rank's new value
   range;
3. ranges still holding more than ``collect_cap`` rows are refined at
   a 256x narrower bucket width (another pass restricted by a
   vectorized range mask) — geometric convergence, <= 3 passes from
   the 2^16-cent start; a width-1 bucket IS the answer outright;
4. one final pass collects ONLY the rows inside the surviving ranges
   (a vanishing fraction of the input) and indexes the exact ranks.

Every pass is a shuffle-free ``map_batches`` scan. Values are integer
cents (the same half-away-from-zero rounding as the SQL oracle) so the
result is value-exact vs DuckDB.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9)
COLLECT_CAP = 262_144        # max rows the final collect may touch
INIT_SHIFT = 16              # first-pass bucket width = 2^16 cents
REFINE_STEP = 8              # width shrinks 256x per refinement pass


def _cents_np(batch: pa.Table, column: str) -> np.ndarray:
    c = pc.round(pc.multiply(batch.column(column), pa.scalar(100.0)),
                 round_mode="half_towards_infinity").cast(pa.int64())
    return c.to_numpy(zero_copy_only=False)


def _hist_pass(ds_factory, column: str, shift: int,
               ranges: list[tuple[int, int]] | None) -> dict[int, int]:
    """Streaming histogram: counts per (value >> shift) bucket,
    restricted to the union of ``ranges`` (inclusive bounds; None =
    whole domain). The mask is a handful of vectorized comparisons
    (one per range, and #ranges <= #quantiles)."""
    def partial(batch: pa.Table) -> pa.Table:
        v = _cents_np(batch, column)
        if ranges is not None:
            m = np.zeros(len(v), dtype=bool)
            for lo, hi in ranges:
                m |= (v >= lo) & (v <= hi)
            v = v[m]
        t = pa.table({"bucket": pa.array(v >> shift, pa.int64()),
                      "n": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    # partials merged in ONE task; the driver holds the result table
    tbl = pa.concat_tables(
        ds_factory().map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow"))
    return dict(zip(tbl.column("bucket").to_pylist(),
                    tbl.column("n").to_pylist()))


def exact_quantiles(ds_factory, column: str, qs=DEFAULT_QS,
                    collect_cap: int = COLLECT_CAP) -> pa.Table:
    """``ds_factory`` builds a fresh Dataset per pass (each pass is one
    streaming scan of the pruned input column). Returns one
    (q, value_cents) row per entry of ``qs``, in order."""
    shift = INIT_SHIFT
    counts = _hist_pass(ds_factory, column, shift, None)
    n = sum(counts.values())
    if n == 0:
        return pa.table({"q": pa.array(list(qs), pa.float64()),
                         "value_cents": pa.array([None] * len(qs),
                                                 pa.int64())})
    # per-rank state: value range [lo, hi] known to hold the rank, and
    # the count of values strictly below lo
    ranks = {q: max(1, math.ceil(q * n)) for q in qs}
    state: dict[int, list] = {r: [None, None, 0] for r in ranks.values()}
    answer: dict[int, int] = {}

    def locate(cnts: dict[int, int], sh: int) -> None:
        keys = sorted(cnts)
        for r, st in state.items():
            if r in answer:
                continue
            lo, hi, below = st
            cum = below
            for k in keys:
                v0, v1 = k << sh, ((k + 1) << sh) - 1
                if lo is not None and (v1 < lo or v0 > hi):
                    continue
                if cum + cnts[k] >= r:
                    if sh == 0:
                        answer[r] = v0   # width-1 bucket IS the value
                    else:
                        st[:] = [v0, v1, cum]
                    break
                cum += cnts[k]

    locate(counts, shift)
    while shift > 0 and any(
            r not in answer
            and _range_count(counts, state[r], shift) > collect_cap
            for r in state):
        shift = max(0, shift - REFINE_STEP)
        ranges = sorted({(st[0], st[1]) for r, st in state.items()
                         if r not in answer})
        counts = _hist_pass(ds_factory, column, shift, ranges)
        locate(counts, shift)

    pending = [r for r in state if r not in answer]
    if pending:
        ranges = sorted({(state[r][0], state[r][1]) for r in pending})

        def collect(batch: pa.Table) -> pa.Table:
            v = _cents_np(batch, column)
            m = np.zeros(len(v), dtype=bool)
            for lo, hi in ranges:
                m |= (v >= lo) & (v <= hi)
            return pa.table({"v": pa.array(v[m], pa.int64())})

        vals = np.sort(np.array(
            [r["v"] for r in ds_factory().map_batches(
                collect, batch_format="pyarrow",
                batch_size=None).take_all()],
            dtype=np.int64))
        for r in pending:
            lo, hi, below = state[r]
            inrange = vals[(vals >= lo) & (vals <= hi)]
            answer[r] = int(inrange[r - below - 1])
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value_cents": pa.array([answer[ranks[q]] for q in qs],
                                pa.int64()),
    })


def _range_count(counts: dict[int, int], st: list, shift: int) -> int:
    lo, hi, _ = st
    return sum(c for k, c in counts.items()
               if not (((k + 1) << shift) - 1 < lo or (k << shift) > hi))


def lineitem_price_quantiles(sf_dir: str, qs=DEFAULT_QS):
    """Exact l_extendedprice quantiles (integer cents), value-exact vs
    ``quantile_disc`` — no sort, no shuffle, O(#buckets) driver state."""
    import ray.data

    def factory():
        return ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                     columns=["l_extendedprice"])
    return exact_quantiles(factory, "l_extendedprice", qs)


# ---------------------------------------------------------------------------
# Grouped exact quantiles: the same histogram-refinement plan keyed by
# (group, bucket). Designed for LOW-cardinality group columns (flags,
# languages, sources): driver state is O(#groups x #buckets-touched),
# every pass remains one shuffle-free scan, and a groupby(group) sort
# of the raw rows — which would funnel each group's whole mass through
# one reducer — never happens.
# ---------------------------------------------------------------------------


def _grouped_hist_pass(ds_factory, column: str, group_col: str,
                       shift: int, ranges_by_group) -> dict:
    def partial(batch: pa.Table) -> pa.Table:
        v = _cents_np(batch, column)
        gcol = batch.column(group_col)
        if ranges_by_group is not None:
            m = np.zeros(len(v), dtype=bool)
            for grp, ranges in ranges_by_group.items():
                gm = pc.equal(gcol, grp).to_numpy(zero_copy_only=False)
                for lo, hi in ranges:
                    m |= gm & (v >= lo) & (v <= hi)
            keep = pa.array(m)
            v = v[m]
            gcol = gcol.filter(keep)
        t = pa.table({"grp": gcol,
                      "bucket": pa.array(v >> shift, pa.int64()),
                      "n": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by(["grp", "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["grp", "bucket", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["grp", "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["grp", "bucket", "n"])

    tbl = pa.concat_tables(
        ds_factory().map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow"))
    out: dict = {}
    for grp, b, n in zip(tbl.column("grp").to_pylist(),
                         tbl.column("bucket").to_pylist(),
                         tbl.column("n").to_pylist()):
        out.setdefault(grp, {})[b] = out.get(grp, {}).get(b, 0) + n
    return out


def grouped_quantiles(ds_factory, column: str, group_col: str,
                      qs=DEFAULT_QS,
                      collect_cap: int = COLLECT_CAP) -> pa.Table:
    """One (group, q, value_cents) row per group per quantile —
    ``quantile_disc`` semantics per group, exact, sort-free."""
    shift = INIT_SHIFT
    counts = _grouped_hist_pass(ds_factory, column, group_col, shift,
                                None)
    groups = sorted(counts)
    n_of = {g: sum(counts[g].values()) for g in groups}
    ranks = {g: {q: max(1, math.ceil(q * n_of[g])) for q in qs}
             for g in groups}
    state: dict = {(g, r): [None, None, 0]
                   for g in groups for r in ranks[g].values()}
    answer: dict = {}

    def locate(cnts, sh):
        for (g, r), st in state.items():
            if (g, r) in answer or g not in cnts:
                continue
            lo, hi, below = st
            cum = below
            for k in sorted(cnts[g]):
                v0, v1 = k << sh, ((k + 1) << sh) - 1
                if lo is not None and (v1 < lo or v0 > hi):
                    continue
                if cum + cnts[g][k] >= r:
                    if sh == 0:
                        answer[(g, r)] = v0
                    else:
                        st[:] = [v0, v1, cum]
                    break
                cum += cnts[g][k]

    locate(counts, shift)

    def pending_ranges():
        rng: dict = {}
        for (g, r), st in state.items():
            if (g, r) not in answer:
                rng.setdefault(g, set()).add((st[0], st[1]))
        return {g: sorted(v) for g, v in rng.items()}

    def range_count(g, st, sh):
        lo, hi, _ = st
        return sum(c for k, c in counts.get(g, {}).items()
                   if not (((k + 1) << sh) - 1 < lo or (k << sh) > hi))

    while shift > 0 and any(
            (g, r) not in answer
            and range_count(g, state[(g, r)], shift) > collect_cap
            for (g, r) in state):
        shift = max(0, shift - REFINE_STEP)
        counts = _grouped_hist_pass(ds_factory, column, group_col,
                                    shift, pending_ranges())
        locate(counts, shift)

    pend = [(g, r) for (g, r) in state if (g, r) not in answer]
    if pend:
        rbg = pending_ranges()

        def collect(batch: pa.Table) -> pa.Table:
            v = _cents_np(batch, column)
            gcol = batch.column(group_col)
            m = np.zeros(len(v), dtype=bool)
            for grp, ranges in rbg.items():
                gm = pc.equal(gcol, grp).to_numpy(zero_copy_only=False)
                for lo, hi in ranges:
                    m |= gm & (v >= lo) & (v <= hi)
            keep = pa.array(m)
            return pa.table({"grp": gcol.filter(keep),
                             "v": pa.array(v[m], pa.int64())})

        rows = pa.concat_tables(
            ds_factory().map_batches(collect, batch_format="pyarrow",
                                     batch_size=None)
            .repartition(1)
            .map_batches(lambda t: t, batch_format="pyarrow",
                         batch_size=None)
            .iter_batches(batch_format="pyarrow"))
        by_g: dict = {}
        for grp, v in zip(rows.column("grp").to_pylist(),
                          rows.column("v").to_pylist()):
            by_g.setdefault(grp, []).append(v)
        for g, r in pend:
            lo, hi, below = state[(g, r)]
            vals = np.sort(np.array(
                [v for v in by_g.get(g, []) if lo <= v <= hi],
                dtype=np.int64))
            answer[(g, r)] = int(vals[r - below - 1])
    return pa.table({
        group_col: pa.array([g for g in groups for _ in qs]),
        "q": pa.array([q for _ in groups for q in qs], pa.float64()),
        "value_cents": pa.array(
            [answer[(g, ranks[g][q])] for g in groups for q in qs],
            pa.int64()),
    })


def lineitem_quantiles_by_flag(sf_dir: str, qs=DEFAULT_QS):
    """Exact per-returnflag price quantiles (integer cents), sort-free."""
    import ray.data

    def factory():
        return ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"])
    return grouped_quantiles(factory, "l_extendedprice", "l_returnflag",
                             qs)


GROUPED_QUANTILES_SQL = """
    SELECT l_returnflag, 0.25 AS q, CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25) AS BIGINT) AS value_cents FROM lineitem GROUP BY l_returnflag
    UNION ALL SELECT l_returnflag, 0.5 AS q, CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS BIGINT) AS value_cents FROM lineitem GROUP BY l_returnflag
    UNION ALL SELECT l_returnflag, 0.75 AS q, CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.75) AS BIGINT) AS value_cents FROM lineitem GROUP BY l_returnflag
    UNION ALL SELECT l_returnflag, 0.9 AS q, CAST(quantile_disc(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9) AS BIGINT) AS value_cents FROM lineitem GROUP BY l_returnflag
"""
