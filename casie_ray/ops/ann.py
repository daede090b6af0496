"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — numpy float32 matmul per batch
against a broadcast query matrix (``ray.put`` once, read per actor/task,
never re-shipped per batch), per-batch partial top-k, then a tiny
``groupby(query_id)`` final merge. Only the partial top-k rows cross the
shuffle (k x n_blocks x n_queries rows), not the corpus.

Scale path: :func:`ann_topk_lsh` buckets the corpus by seeded
random-hyperplane signs and probes only the queries' buckets —
sublinear scanned fraction, approximate recall (rows-only check).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_K = 10
DEFAULT_NQ = 8
LSH_PLANES = 6
LSH_SEED = 99
IVF_CELLS = 16
IVF_NPROBE = 4
IVF_ITERS = 10
IVF_SAMPLE = 4096


def emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Arrow list<float> column -> (n, dim) float32 matrix without a
    Python list round-trip: flatten the values buffer zero-copy and
    reshape (embeddings are fixed-length per table)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if batch.num_rows == 0:
        return np.zeros((0, 0), dtype=np.float32)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float32, copy=False)
    return flat.reshape(batch.num_rows, -1)


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    import pyarrow.compute as pc
    tbl = tbl.filter(pc.less(tbl.column("vec_id"), n_queries))
    tbl = tbl.sort_by("vec_id")
    q_ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    q = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    return q_ids, q / qn


_PARTIAL_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
    ("sim", pa.float32()),
])
TOPK_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
    ("rank", pa.int64()),
])


def _partial_topk(q_ref, k: int):
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        q_ids, qm = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        m = emb_matrix(batch)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = qm @ (m / n).T                      # (nq, batch)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            s = sims[qi]
            mask = ids != qid                       # exclude self-match
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                # partial top-k under the SAME total order as the final
                # merge (sim desc, id asc): argpartition finds the kth
                # value, then every boundary tie enters the lexsort so a
                # tied smaller id can never be dropped block-locally
                part = np.argpartition(-cand_s, k - 1)[:k]
                vmin = cand_s[part].min()
                pool = np.nonzero(cand_s >= vmin)[0]
                idx = pool[np.lexsort((cand_ids[pool], -cand_s[pool]))[:k]]
            else:
                idx = np.arange(len(cand_ids))
            out_q.append(np.full(len(idx), qid, dtype=np.int64))
            out_n.append(cand_ids[idx])
            out_s.append(cand_s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float32()),
        })
    return fn


def _final_topk(k: int):
    def fn(group: pa.Table) -> pa.Table:
        sims = group.column("sim").to_numpy()
        nids = group.column("neighbor_id").to_numpy()
        order = np.lexsort((nids, -sims))[:k]  # sim desc, id asc tie-break
        return pa.table({
            "query_id": group.column("query_id").take(pa.array(order)),
            "neighbor_id": pa.array(nids[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })
    return fn


def ann_topk(sf_dir: str, k: int = DEFAULT_K, n_queries: int = DEFAULT_NQ):
    """Exact cosine top-k (self excluded) for queries vec_id < n_queries.
    Returns (query_id, neighbor_id, rank)."""
    import ray
    import ray.data

    q_ref = ray.put(_load_queries(sf_dir, n_queries))
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ds = ds.map_batches(_partial_topk(q_ref, k), batch_format="pyarrow",
                        batch_size=None)
    return ds.groupby("query_id").map_groups(_final_topk(k),
                                             batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed variant (the sublinear scale path)
# ---------------------------------------------------------------------------


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(LSH_SEED)
    return rng.standard_normal((LSH_PLANES, dim)).astype(np.float32)


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (vecs @ planes.T) > 0
    return (signs * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype(np.int32)


def ann_topk_lsh(sf_dir: str, k: int = DEFAULT_K,
                 n_queries: int = DEFAULT_NQ):
    """Approximate top-k: scan only vectors whose random-hyperplane
    bucket matches some query's bucket (single-probe). Same output
    schema as :func:`ann_topk`; recall < 1 by design."""
    import ray
    import ray.data

    q_ids, qm = _load_queries(sf_dir, n_queries)
    planes = _planes(qm.shape[1])
    q_buckets = set(_bucket_of(qm, planes).tolist())
    q_ref = ray.put((q_ids, qm))

    partial = _partial_topk(q_ref, k)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = emb_matrix(batch)
        keep = np.isin(_bucket_of(m, planes), list(q_buckets))
        return batch.filter(pa.array(keep))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ds = ds.map_batches(bucket_filter, batch_format="pyarrow")
    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("query_id").map_groups(_final_topk(k),
                                             batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF variant (data-adaptive coarse quantizer; the production scale path)
# ---------------------------------------------------------------------------


def train_centroids(sf_dir: str, n_cells: int = IVF_CELLS,
                    iters: int = IVF_ITERS,
                    sample_rows: int = IVF_SAMPLE) -> np.ndarray:
    """Deterministic Lloyd's k-means over a bounded head sample of the
    corpus (the classic IVF coarse quantizer). The sample is small-side
    by construction (first `sample_rows` of row-group 0), so training is
    a driver-local numpy job regardless of corpus size; the resulting
    (n_cells, dim) matrix broadcasts via ray.put like any lookup table.
    Seeded init (spread picks from the sample) + fixed iteration count
    => identical centroids on every run/worker."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    tbl = pf.read_row_group(0, columns=["embedding"])
    m = emb_matrix(tbl)[:sample_rows]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = m / norms
    n_cells = min(n_cells, len(m))
    rng = np.random.default_rng(LSH_SEED)
    cents = m[rng.choice(len(m), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_cells):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                nv = np.linalg.norm(v)
                cents[c] = v / nv if nv else cents[c]
    return cents


def ann_topk_ivf(sf_dir: str, k: int = DEFAULT_K,
                 n_queries: int = DEFAULT_NQ, nprobe: int = IVF_NPROBE):
    """Approximate top-k with an IVF coarse quantizer: every query
    probes its `nprobe` nearest cells; the corpus pass scans only rows
    assigned to a probed cell (scanned fraction ~ nprobe/n_cells, and
    unlike the LSH variant the cells adapt to the data distribution).
    Same output schema as :func:`ann_topk`; recall < 1 by design."""
    import ray
    import ray.data

    q_ids, qm = _load_queries(sf_dir, n_queries)
    cents = train_centroids(sf_dir)
    qsims = qm @ cents.T
    probed = set()
    for row in np.argsort(-qsims, axis=1)[:, :nprobe]:
        probed.update(int(c) for c in row)
    probed_arr = np.fromiter(sorted(probed), dtype=np.int64,
                             count=len(probed))
    q_ref = ray.put((q_ids, qm))
    cents_ref = ray.put(cents)
    partial = _partial_topk(q_ref, k)

    def cell_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        c = ray.get(cents_ref)
        m = emb_matrix(batch)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        assign = np.argmax((m / n) @ c.T, axis=1)
        return batch.filter(pa.array(np.isin(assign, probed_arr)))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ds = ds.map_batches(cell_filter, batch_format="pyarrow")
    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("query_id").map_groups(_final_topk(k),
                                             batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Semantic clustering / SemDeDup: cluster the embedding space with the
# same deterministic trained quantizer IVF uses, then (a) expose the
# assignment as a first-class operator and (b) run the SemDeDup scale
# path — exact cosine pairs WITHIN each cluster only (the standard
# trick that turns O(n^2) global pair search into per-cluster blocks).
# Rows-only in the driver contract: the assignment is a float argmax
# (not SQL-reproducible bit-exactly); determinism and recall are
# pinned by in-repo tests instead.
# ---------------------------------------------------------------------------

SEM_CELLS = 64
SEM_THRESHOLD = 0.5


def embedding_clusters(sf_dir: str, n_cells: int = SEM_CELLS):
    """(vec_id, cluster): nearest trained-centroid assignment for every
    vector. Centroids are the deterministic seeded quantizer
    (:func:`train_centroids`) broadcast once; the pass is one
    shuffle-free vectorized map."""
    import ray
    import ray.data

    cents_ref = ray.put(train_centroids(sf_dir, n_cells=n_cells))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = emb_matrix(batch)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        a = np.argmax((m / n) @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(a, pa.int64())})

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")


def semantic_dedup_pairs(sf_dir: str, n_cells: int = SEM_CELLS,
                         threshold: float = SEM_THRESHOLD):
    """SemDeDup: cosine-similar pairs found WITHIN clusters only — one
    cluster-keyed exchange, then a vectorized per-cluster pairwise
    matmul (block size = cluster mass, not corpus mass). A subset of
    the exact :func:`casie_ray.ops.dedup.embedding_dup_pairs` result
    by construction (cross-cluster pairs are unseen — the documented
    approximation that makes the 100 TB case tractable); recall on
    near-identical pairs is pinned in tests."""
    import ray
    import ray.data

    from .bucketing import bucket_groupby

    cents_ref = ray.put(train_centroids(sf_dir, n_cells=n_cells))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = emb_matrix(batch)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        nm = (m / norm).astype(np.float32)
        a = np.argmax(nm @ c.T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": pa.array(list(nm), pa.list_(pa.float32())),
            "bucket": pa.array(a.astype(np.int32), pa.int32()),
        })

    def cluster_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        m = emb_matrix(group)
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims > threshold, k=1))
        a, b = ids[ia], ids[ib]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({
            "vec_id_a": pa.array(a2, pa.int64()),
            "vec_id_b": pa.array(b2, pa.int64()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")
    return bucket_groupby(ds, cluster_pairs)
