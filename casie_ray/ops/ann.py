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

# ---- exact-integer contract for the quantizer family (r5) ----
# Raw float32 matmul results depend on BLAS blocking (a 7-row tail
# block rounds differently than the same rows inside a 500-row gemm),
# so float argmax/threshold decisions are NOT layout-independent and
# can never be hash-checked against a twin. The fix is the repo's
# usual exact-integer trick: quantize normalized embeddings to a
# 2^14 grid and centroids to 2^20, then compute scores as float64
# matmuls OF INTEGERS — every product is <= 2^34 and every dot sum
# <= 2^40 < 2^53, so dgemm is bit-exact and order-independent, at
# full BLAS speed. Assignment / probe / top-k decisions under these
# integer scores are identical for ANY batch layout, which is what
# lets ann_topk_ivf, semantic_dedup_pairs and embedding_clusters
# carry exact persisted-twin driver contracts (oracle_ann.py) instead
# of rows-only checks. Quantization costs ~6e-5 score resolution —
# recall is unchanged (pinned in tests).
Q_EMB = 16384.0        # 2^14
Q_CENT = 1048576.0     # 2^20


def quantize_rows(m: np.ndarray, scale: float = Q_EMB) -> np.ndarray:
    """float32 rows (already normalized) -> float64 integer grid."""
    return np.round(m.astype(np.float64) * scale)


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
    """Hyperplane-sign bucket under the exact quantized projections
    (vecs must be normalized) — layout-independent, twin-checkable."""
    signs = (quantize_rows(vecs) @ quantize_rows(planes, Q_CENT).T) > 0
    return (signs * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype(np.int32)


def ann_topk_lsh(sf_dir: str, k: int = DEFAULT_K,
                 n_queries: int = DEFAULT_NQ):
    """Approximate top-k: scan only vectors whose random-hyperplane
    bucket matches some query's bucket (single-probe). Same output
    schema as :func:`ann_topk`; recall < 1 by design (bucket pruning),
    exact under the quantized metric — hash-checked against
    oracle_ann.lsh_topk_local."""
    import ray
    import ray.data

    q_ids, qm = _load_queries(sf_dir, n_queries)
    planes = _planes(qm.shape[1])
    q_buckets = set(_bucket_of(qm, planes).tolist())
    q_ref = ray.put((q_ids, qm))

    partial = _partial_topk_q(q_ref, k)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = _normalize_rows(emb_matrix(batch))
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


def _sample_embeddings(path: str, sample_rows: int) -> np.ndarray:
    """Deterministic splitmix hash-sample of normalized embeddings
    across the WHOLE file: a vector is a candidate iff
    mix64(vec_id) < threshold, so the sample is layout-independent —
    a corpus sorted by time / source / cluster yields the same
    representative draw as a shuffled one (a head sample does not;
    r3 verdict item 3). The filtered read is a distributed streaming
    pass; only ~2 x sample_rows rows ever reach the driver, where a
    (hash, vec_id) sort makes the final cut order-deterministic."""
    import pyarrow.parquet as pq
    import ray.data

    from .bucketing import mix64

    total = pq.ParquetFile(path).metadata.num_rows
    frac = 2.0 * sample_rows / max(total, 1)   # 2x oversample
    thresh = np.uint64(int(frac * 2.0 ** 64)) if frac < 1.0 else None

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        h = mix64([ids])
        if thresh is not None:
            keep = h < thresh
            batch = batch.filter(pa.array(keep))
            h = h[keep]
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"]) \
        .map_batches(pick, batch_format="pyarrow", batch_size=None)
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    tbl = tbl.sort_by([("__h", "ascending"), ("vec_id", "ascending")]) \
        .slice(0, sample_rows)
    m = emb_matrix(tbl)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def train_centroids(sf_dir: str, n_cells: int = IVF_CELLS,
                    iters: int = IVF_ITERS,
                    sample_rows: int | None = None) -> np.ndarray:
    """Deterministic Lloyd's k-means over a bounded hash-sample of the
    corpus (the classic IVF coarse quantizer). The sample is drawn by
    vec_id hash across the whole file (:func:`_sample_embeddings`), so
    parquet layout never biases the cells; its size scales with the
    requested cell count (>= 8 rows per cell) and training stays a
    driver-local numpy job. The resulting (n_cells, dim) matrix
    broadcasts via ray.put like any lookup table. Seeded init (picks
    from the sample) + fixed iteration count => identical centroids on
    every run/worker."""
    if sample_rows is None:
        sample_rows = max(IVF_SAMPLE, 8 * n_cells)
    m = _sample_embeddings(f"{sf_dir}/embeddings.parquet", sample_rows)
    n_cells = min(n_cells, len(m))
    rng = np.random.default_rng(LSH_SEED)
    cents = m[rng.choice(len(m), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        # vectorized update: one scatter-add per iteration, never a
        # Python loop over cells (n_cells scales with corpus size)
        sums = np.zeros((n_cells, m.shape[1]), np.float64)
        np.add.at(sums, assign, m.astype(np.float64))
        counts = np.bincount(assign, minlength=n_cells)
        idx = np.nonzero(counts > 0)[0]
        v = (sums[idx] / counts[idx, None]).astype(np.float32)
        nv = np.linalg.norm(v, axis=1, keepdims=True)
        ok = nv.ravel() > 0
        cents[idx[ok]] = v[ok] / nv[ok]
    return cents


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return (m / n).astype(np.float32)


def assign_cells_q(m_norm: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Layout-independent nearest-centroid assignment: argmax of the
    exact-integer quantized scores (ties -> lowest cell, numpy argmax
    first-max semantics — identical in the sequential twin)."""
    scores = quantize_rows(m_norm) @ quantize_rows(cents, Q_CENT).T
    return np.argmax(scores, axis=1).astype(np.int64)


def _partial_topk_q(q_ref, k: int):
    """Quantized-integer partial top-k: sims are exact int64-valued
    float64 dots of the 2^14 grids, so the (sim desc, id asc) order is
    identical for any batch layout and in the sequential twin."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        q_ids, qm = ray.get(q_ref)
        qq = quantize_rows(qm)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        mq = quantize_rows(_normalize_rows(emb_matrix(batch)))
        sims = (qq @ mq.T).astype(np.int64)        # (nq, batch), exact
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            s = sims[qi]
            mask = ids != qid                       # exclude self-match
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
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
            "sim": pa.array(np.concatenate(out_s), pa.int64()),
        })
    return fn


def ivf_probe_cells(qm: np.ndarray, cents: np.ndarray,
                    nprobe: int) -> np.ndarray:
    """Sorted probed-cell set under the exact-integer scores (stable
    argsort -> lowest cell wins ties); shared with the twin."""
    qsims = quantize_rows(qm) @ quantize_rows(cents, Q_CENT).T
    probed = set()
    for row in np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]:
        probed.update(int(c) for c in row)
    return np.fromiter(sorted(probed), dtype=np.int64, count=len(probed))


def ann_topk_ivf(sf_dir: str, k: int = DEFAULT_K,
                 n_queries: int = DEFAULT_NQ, nprobe: int = IVF_NPROBE):
    """Approximate top-k with an IVF coarse quantizer: every query
    probes its `nprobe` nearest cells; the corpus pass scans only rows
    assigned to a probed cell (scanned fraction ~ nprobe/n_cells, and
    unlike the LSH variant the cells adapt to the data distribution).
    Same output schema as :func:`ann_topk`; recall < 1 by design
    (cell pruning), but the RESULT is exact under the quantized-integer
    metric — hash-checked against the sequential twin
    (oracle_ann.ivf_topk_local)."""
    import ray
    import ray.data

    q_ids, qm = _load_queries(sf_dir, n_queries)
    cents = train_centroids(sf_dir)
    probed_arr = ivf_probe_cells(qm, cents, nprobe)
    q_ref = ray.put((q_ids, qm))
    cents_ref = ray.put(cents)
    partial = _partial_topk_q(q_ref, k)

    def cell_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        c = ray.get(cents_ref)
        assign = assign_cells_q(_normalize_rows(emb_matrix(batch)), c)
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

SEM_CELLS = 64                    # cell-count floor (test-scale default)
SEM_THRESHOLD = 0.5
SEM_TARGET_CLUSTER_ROWS = 4096    # derive n_cells ~ corpus / this
SEM_CLUSTER_CAP = 65536           # max rows co-located per pair group
SEM_CHUNK = 2048                  # rows per within-cluster matmul slab


def derive_n_cells(total_rows: int) -> int:
    """Cell count scaled to corpus size so expected cluster mass stays
    ~SEM_TARGET_CLUSTER_ROWS regardless of scale (real SemDeDup uses
    ~100k cells for the same reason — a fixed cell count makes
    per-cluster work quadratic in corpus size; r3 verdict item 1).
    Floored at SEM_CELLS so small corpora keep useful granularity."""
    return max(SEM_CELLS, total_rows // SEM_TARGET_CLUSTER_ROWS)


def _corpus_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/embeddings.parquet") \
        .metadata.num_rows


def embedding_clusters(sf_dir: str, n_cells: int | None = None):
    """(vec_id, cluster): nearest trained-centroid assignment for every
    vector. Centroids are the deterministic seeded quantizer
    (:func:`train_centroids`) broadcast once; the pass is one
    shuffle-free vectorized map. ``n_cells=None`` derives the cell
    count from corpus size (:func:`derive_n_cells`)."""
    import ray
    import ray.data

    if n_cells is None:
        n_cells = derive_n_cells(_corpus_rows(sf_dir))
    cents_ref = ray.put(train_centroids(sf_dir, n_cells=n_cells))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        a = assign_cells_q(_normalize_rows(emb_matrix(batch)), c)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(a, pa.int64())})

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")


def _cluster_sizes(sf_dir: str, cents_ref, n_cells: int):
    """One counting pass: per-batch argmax assignment + bincount, then
    a distributed groupby-sum over at most n_cells keys. Returns the
    {cluster: n_rows} dict (bounded by n_cells — driver-safe)."""
    import ray
    import ray.data

    def count_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        a = assign_cells_q(_normalize_rows(emb_matrix(batch)), c)
        u, cnt = np.unique(a, return_counts=True)
        return pa.table({"cluster": pa.array(u.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    rows = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(count_partial, batch_format="pyarrow",
                     batch_size=None) \
        .groupby("cluster").sum("n").take_all()
    return {int(r["cluster"]): int(r["sum(n)"]) for r in rows}


def semantic_dedup_pairs(sf_dir: str, n_cells: int | None = None,
                         threshold: float = SEM_THRESHOLD,
                         cluster_cap: int = SEM_CLUSTER_CAP):
    """SemDeDup: cosine-similar pairs found WITHIN clusters only — one
    cluster-keyed exchange, then a vectorized per-cluster pairwise
    matmul. A subset of the exact
    :func:`casie_ray.ops.dedup.embedding_dup_pairs` result by
    construction (cross-cluster pairs are unseen — the documented
    approximation that makes the 100 TB case tractable); recall on
    near-identical pairs is pinned in tests.

    Cluster-mass bound (the scale contract): ``n_cells`` defaults to
    corpus_rows / SEM_TARGET_CLUSTER_ROWS (:func:`derive_n_cells`), so
    expected cluster mass is constant in corpus size; a SKEWED cluster
    that still exceeds ``cluster_cap`` rows is detected by a counting
    pass and salted into ceil(n/cap) sub-groups by vec_id hash (the
    band_cap escape from ops/dedup.py — cross-salt pairs inside a fat
    cluster are forgone, bounding any group at ``cluster_cap`` rows),
    and the within-group matmul runs in SEM_CHUNK x SEM_CHUNK slabs,
    so peak memory is O(cap x dim + SEM_CHUNK^2) independent of corpus
    size. The counting pass is skipped when the whole corpus fits
    under the cap (no cluster can exceed it)."""
    import ray
    import ray.data

    from .bucketing import bucket_groupby, mix64

    total = _corpus_rows(sf_dir)
    if n_cells is None:
        n_cells = derive_n_cells(total)
    cents_ref = ray.put(train_centroids(sf_dir, n_cells=n_cells))

    # salt plan for fat clusters: {cluster: (base_group_id, n_salts)}
    salt_plan: dict[int, tuple[int, int]] = {}
    if total > cluster_cap:
        sizes = _cluster_sizes(sf_dir, cents_ref, n_cells)
        next_id = n_cells
        for c in sorted(k for k, v in sizes.items() if v > cluster_cap):
            n_salts = -(-sizes[c] // cluster_cap)
            salt_plan[c] = (next_id, n_salts)
            next_id += n_salts
    plan_ref = ray.put(salt_plan)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "bucket": pa.array([], pa.int32()),
            })
        c = ray.get(cents_ref)
        plan = ray.get(plan_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        m = emb_matrix(batch)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        nm = (m / norm).astype(np.float32)
        a = assign_cells_q(nm, c)
        if plan:
            h = mix64([ids])
            for cl, (base, n_salts) in plan.items():
                sel = a == cl
                a[sel] = base + (h[sel] % np.uint64(n_salts)) \
                    .astype(np.int64)
        offsets = pa.array(
            np.arange(0, (len(ids) + 1) * nm.shape[1], nm.shape[1],
                      dtype=np.int32))
        emb = pa.ListArray.from_arrays(
            offsets, pa.array(nm.ravel(), pa.float32()))
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": emb,
            "bucket": pa.array(a.astype(np.int32), pa.int32()),
        })

    # exact-integer threshold: quantized sims are on the Q_EMB^2 grid,
    # so the > decision is layout-independent and twin-reproducible
    thr_q = threshold * Q_EMB * Q_EMB

    def cluster_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        m = quantize_rows(emb_matrix(group))
        n = len(ids)
        out_a, out_b = [], []
        # slab the pairwise matmul: peak sims allocation is
        # SEM_CHUNK^2 floats no matter how big the group is
        for i0 in range(0, n, SEM_CHUNK):
            i1 = min(i0 + SEM_CHUNK, n)
            for j0 in range(i0, n, SEM_CHUNK):
                j1 = min(j0 + SEM_CHUNK, n)
                sims = m[i0:i1] @ m[j0:j1].T
                ia, ib = np.nonzero(sims > thr_q)
                ga, gb = ia + i0, ib + j0
                keep = ga < gb
                if keep.any():
                    out_a.append(ids[ga[keep]])
                    out_b.append(ids[gb[keep]])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        else:
            a = b = np.empty(0, np.int64)
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


# ---------------------------------------------------------------------------
# Product quantization (PQ codes) — the compression half of the
# IVF+PQ recipe (Jégou et al. 2011) that makes billion-vector ANN fit
# in memory: split each embedding into PQ_M contiguous sub-vectors and
# store only the id of the nearest sub-codebook centroid (PQ_CODES
# entries each, trained on the same layout-independent hash-sample the
# IVF coarse quantizer uses). Assignment is argmin of the EXACT
# integer squared L2 on the common 2^20 grid (diffs <= 2^21, squared
# sums <= 2^46 over a 16-dim sub-block — int64-exact, so codes are
# identical at any batch layout / parallelism and a sequential numpy
# twin is the oracle, like the rest of the quantizer family).
# ---------------------------------------------------------------------------

PQ_M = 4
PQ_CODES = 16
PQ_ITERS = 8


def _pq_assign_sub(x_sub: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Exact-integer nearest sub-centroid (ties -> lowest code)."""
    xq = np.round(x_sub.astype(np.float64) * Q_CENT).astype(np.int64)
    cq = np.round(cb.astype(np.float64) * Q_CENT).astype(np.int64)
    d = np.sum((xq[:, None, :] - cq[None, :, :]) ** 2, axis=2)
    return np.argmin(d, axis=1).astype(np.int64)


def train_pq_codebooks(sf_dir: str, m_sub: int = PQ_M,
                       n_codes: int = PQ_CODES,
                       iters: int = PQ_ITERS) -> np.ndarray:
    """(m_sub, n_codes, dim // m_sub) float32 sub-codebooks: seeded
    Lloyd's per sub-block over the hash-sample (assignment under the
    exact integer metric, so training itself is reproducible)."""
    m = _sample_embeddings(f"{sf_dir}/embeddings.parquet",
                           max(IVF_SAMPLE, 8 * n_codes))
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sd = dim // m_sub
    books = np.empty((m_sub, n_codes, sd), np.float32)
    for s in range(m_sub):
        x = m[:, s * sd:(s + 1) * sd]
        rng = np.random.default_rng(LSH_SEED + 1000 + s)
        k = min(n_codes, len(x))
        cb = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(iters):
            a = _pq_assign_sub(x, cb)
            sums = np.zeros((k, sd), np.float64)
            np.add.at(sums, a, x.astype(np.float64))
            counts = np.bincount(a, minlength=k)
            nz = np.nonzero(counts > 0)[0]
            cb[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
        books[s, :k] = cb
        if k < n_codes:          # degenerate tiny sample: pad by repeat
            books[s, k:] = cb[0]
    return books


def embedding_pq_codes(sf_dir: str, m_sub: int = PQ_M,
                       n_codes: int = PQ_CODES):
    """(vec_id, sub, code) PQ assignment rows for every embedding —
    the compressed representation an IVF+PQ index stores. Codebooks
    broadcast once via ray.put; one streaming pass, no exchange."""
    import ray
    import ray.data

    books_ref = ray.put(train_pq_codebooks(sf_dir, m_sub, n_codes))

    def assign(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        m = _normalize_rows(emb_matrix(batch))
        sd = m.shape[1] // len(books)
        out_id, out_s, out_c = [], [], []
        for s in range(len(books)):
            code = _pq_assign_sub(m[:, s * sd:(s + 1) * sd], books[s])
            out_id.append(ids)
            out_s.append(np.full(len(ids), s, np.int64))
            out_c.append(code)
        return pa.table({
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "sub": pa.array(np.concatenate(out_s), pa.int64()),
            "code": pa.array(np.concatenate(out_c), pa.int64()),
        })

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow")
