"""Sequential twins for the quantizer family (IVF top-k, SemDeDup
pairs, cluster assignment).

These ops are float-trained (k-means centroids) and therefore not
SQL-expressible, but their DECISIONS are exact under the quantized
integer metric (ops.ann: 2^14/2^20 grids, float64 dots < 2^53 —
bit-exact and batch-layout-independent). So, like the KG family's
sequential extractor oracle, a single-process numpy reimplementation
IS the reference: the driver persists its output as parquet and
DuckDB checks the distributed engine row-for-row against it
(__ray_entry__._ensure_gold_ann).

Shared parameters (not re-derived here, by design — they are inputs,
like a lexicon): the trained centroid matrix
(ops.ann.train_centroids, seeded + deterministic) and the splitmix64
mix (ops.bucketing.mix64). Everything downstream — normalization,
quantization, assignment, probing, top-k ordering, salting, pair
thresholding — is reimplemented sequentially below.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .ops.ann import (
    DEFAULT_K, DEFAULT_NQ, IVF_NPROBE, Q_CENT, Q_EMB, SEM_CLUSTER_CAP,
    SEM_THRESHOLD, derive_n_cells, train_centroids,
)
from .ops.bucketing import mix64


def _load_all(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return ids, (m / n).astype(np.float32)


def _q(m: np.ndarray, scale: float = Q_EMB) -> np.ndarray:
    return np.round(m.astype(np.float64) * scale)


def _assign(m_norm: np.ndarray, cents: np.ndarray) -> np.ndarray:
    return np.argmax(_q(m_norm) @ _q(cents, Q_CENT).T, axis=1) \
        .astype(np.int64)


def ivf_topk_local(sf_dir: str, k: int = DEFAULT_K,
                   n_queries: int = DEFAULT_NQ,
                   nprobe: int = IVF_NPROBE) -> pa.Table:
    """Sequential IVF top-k under the exact quantized metric."""
    ids, m = _load_all(sf_dir)
    qmask = ids < n_queries
    qorder = np.argsort(ids[qmask], kind="stable")
    q_ids = ids[qmask][qorder]
    qm = m[qmask][qorder]
    cents = train_centroids(sf_dir)
    qsims = _q(qm) @ _q(cents, Q_CENT).T
    probed = set()
    for row in np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]:
        probed.update(int(c) for c in row)
    keep = np.isin(_assign(m, cents),
                   np.fromiter(sorted(probed), np.int64, len(probed)))
    cids, cm = ids[keep], m[keep]
    sims = (_q(qm) @ _q(cm).T).astype(np.int64)
    out_q, out_n, out_r = [], [], []
    for qi, qid in enumerate(q_ids):
        mask = cids != qid
        cand_ids, cand_s = cids[mask], sims[qi][mask]
        order = np.lexsort((cand_ids, -cand_s))[:k]
        out_q.append(np.full(len(order), qid, np.int64))
        out_n.append(cand_ids[order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
        "rank": pa.array(np.concatenate(out_r), pa.int64()),
    })


def clusters_local(sf_dir: str, n_cells: int | None = None) -> pa.Table:
    """Sequential (vec_id, cluster) assignment."""
    ids, m = _load_all(sf_dir)
    if n_cells is None:
        n_cells = derive_n_cells(len(ids))
    a = _assign(m, train_centroids(sf_dir, n_cells=n_cells))
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(a, pa.int64())})


def lsh_topk_local(sf_dir: str, k: int = DEFAULT_K,
                   n_queries: int = DEFAULT_NQ) -> pa.Table:
    """Sequential twin of ops.ann.ann_topk_lsh: quantized hyperplane
    buckets (seed 99), single-probe filter, exact quantized top-k."""
    from .ops.ann import LSH_PLANES, LSH_SEED

    ids, m = _load_all(sf_dir)
    qmask = ids < n_queries
    qorder = np.argsort(ids[qmask], kind="stable")
    q_ids, qm = ids[qmask][qorder], m[qmask][qorder]
    planes = np.random.default_rng(LSH_SEED).standard_normal(
        (LSH_PLANES, m.shape[1])).astype(np.float32)
    pq_ = _q(planes, Q_CENT)

    def bucket(v):
        signs = (_q(v) @ pq_.T) > 0
        return (signs * (1 << np.arange(LSH_PLANES))).sum(axis=1)

    keep = np.isin(bucket(m), np.unique(bucket(qm)))
    cids, cm = ids[keep], m[keep]
    sims = (_q(qm) @ _q(cm).T).astype(np.int64)
    out_q, out_n, out_r = [], [], []
    for qi, qid in enumerate(q_ids):
        mask = cids != qid
        cand_ids, cand_s = cids[mask], sims[qi][mask]
        order = np.lexsort((cand_ids, -cand_s))[:k]
        out_q.append(np.full(len(order), qid, np.int64))
        out_n.append(cand_ids[order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
        "rank": pa.array(np.concatenate(out_r), pa.int64()),
    })


def lsh_pairs_local(sf_dir: str, threshold: float = 0.5,
                    n_bands: int = 16, band_planes: int = 2) -> pa.Table:
    """Sequential twin of ops.dedup.embedding_dup_pairs_lsh: quantized
    band signs (seed 7) -> same-(band, key) candidates -> exact
    quantized cosine verify -> distinct pairs."""
    ids, m = _load_all(sf_dir)
    planes = np.random.default_rng(7).standard_normal(
        (n_bands * band_planes, m.shape[1])).astype(np.float32)
    signs = (_q(m) @ _q(planes, Q_CENT).T) > 0
    mq = _q(m)
    thr_q = threshold * Q_EMB * Q_EMB
    pairs: set[tuple[int, int]] = set()
    for b in range(n_bands):
        sl = signs[:, b * band_planes:(b + 1) * band_planes]
        key = (sl * (1 << np.arange(band_planes))).sum(axis=1)
        for kv in np.unique(key):
            idx = np.nonzero(key == kv)[0]
            if len(idx) < 2:
                continue
            sims = mq[idx] @ mq[idx].T
            ia, ib = np.nonzero(sims > thr_q)
            sel = ia < ib
            for x, y in zip(ids[idx[ia[sel]]], ids[idx[ib[sel]]]):
                if x != y:
                    pairs.add((min(int(x), int(y)), max(int(x), int(y))))
    arr = sorted(pairs)
    return pa.table({
        "vec_id_a": pa.array([a for a, _ in arr], pa.int64()),
        "vec_id_b": pa.array([b for _, b in arr], pa.int64()),
    })


def semantic_pairs_local(sf_dir: str, n_cells: int | None = None,
                         threshold: float = SEM_THRESHOLD,
                         cluster_cap: int = SEM_CLUSTER_CAP) -> pa.Table:
    """Sequential SemDeDup pairs: same assignment, same fat-cluster
    salt plan, same exact-integer threshold — within-group pairs
    only."""
    ids, m = _load_all(sf_dir)
    if n_cells is None:
        n_cells = derive_n_cells(len(ids))
    a = _assign(m, train_centroids(sf_dir, n_cells=n_cells))
    if len(ids) > cluster_cap:
        u, cnt = np.unique(a, return_counts=True)
        sizes = dict(zip(u.tolist(), cnt.tolist()))
        next_id = n_cells
        h = mix64([ids])
        for c in sorted(k for k, v in sizes.items() if v > cluster_cap):
            n_salts = -(-sizes[c] // cluster_cap)
            sel = a == c
            a[sel] = next_id + (h[sel] % np.uint64(n_salts)) \
                .astype(np.int64)
            next_id += n_salts
    thr_q = threshold * Q_EMB * Q_EMB
    mq = _q(m)
    out_a, out_b = [], []
    for g in np.unique(a):
        idx = np.nonzero(a == g)[0]
        gids = ids[idx]
        sims = mq[idx] @ mq[idx].T
        ia, ib = np.nonzero(sims > thr_q)
        keep = ia < ib
        pa_, pb_ = gids[ia[keep]], gids[ib[keep]]
        swap = pa_ > pb_
        out_a.append(np.where(swap, pb_, pa_))
        out_b.append(np.where(swap, pa_, pb_))
    aarr = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    barr = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    return pa.table({"vec_id_a": pa.array(aarr, pa.int64()),
                     "vec_id_b": pa.array(barr, pa.int64())})


def pq_codes_local(sf_dir: str) -> pa.Table:
    """Sequential (vec_id, sub, code) PQ assignment — shares the
    trained codebooks (an input, like the IVF centroids) and
    reimplements normalization + the exact-integer sub-assignment."""
    from .ops.ann import PQ_M, train_pq_codebooks
    ids, m = _load_all(sf_dir)
    books = train_pq_codebooks(sf_dir)
    sd = m.shape[1] // PQ_M
    rows_id, rows_s, rows_c = [], [], []
    for s in range(PQ_M):
        xq = np.round(m[:, s * sd:(s + 1) * sd].astype(np.float64)
                      * Q_CENT).astype(np.int64)
        cq = np.round(books[s].astype(np.float64) * Q_CENT) \
            .astype(np.int64)
        d = np.sum((xq[:, None, :] - cq[None, :, :]) ** 2, axis=2)
        rows_id.append(ids)
        rows_s.append(np.full(len(ids), s, np.int64))
        rows_c.append(np.argmin(d, axis=1).astype(np.int64))
    return pa.table({
        "vec_id": pa.array(np.concatenate(rows_id), pa.int64()),
        "sub": pa.array(np.concatenate(rows_s), pa.int64()),
        "code": pa.array(np.concatenate(rows_c), pa.int64()),
    })
