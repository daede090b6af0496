"""Distributed PCA over the embedding table (training-data whitening /
dimensionality reduction, the standard preprocessing step before
clustering or SemDeDup).

Shape: PCA of N x d embeddings needs only the d x d Gram matrix, the
column-sum vector and the row count — all MERGEABLE one-pass block
partials, so the whole reduction is shuffle-free (the same register
pattern as the HLL/KMV sketches: per-block bounded partials, a
cluster-width tree-merge level, one tiny final task —
bucketing.register_reduce). The eigendecomposition then runs driver-side on
the d x d matrix — O(d^3) independent of corpus size.

Exactness contract: embeddings are quantized to fixed-point micro-units
(round(x * 1e6), half away from zero — the _cents rule), and every
register is the TRUE integer sum mod 2^64 (ring homomorphism:
continuously-wrapping uint64 block partials merge to exactly the true
sum mod 2^64 in any order), reproduced by a DuckDB HUGEINT twin — so
the register table is hash-stable at any scale and block layout.
Components/eigenvalues derive driver-side (pca_components) and are
pinned against a direct numpy covariance eigendecomposition in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PCA_SCALE = 1_000_000  # micro-unit quantization (the _cents rule x 1e4)


def _quantize(m: np.ndarray) -> np.ndarray:
    """float matrix -> int64 micro-units, rounding half away from zero
    (matches DuckDB round()), then two's-complement uint64 view so
    sums/products wrap mod 2^64."""
    v = m.astype(np.float64) * PCA_SCALE
    q = np.trunc(v + np.copysign(0.5, v)).astype(np.int64)
    return q.astype(np.uint64)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    emb = batch.column("embedding").combine_chunks()
    widths = np.asarray(emb.value_lengths())
    if len(widths) == 0:
        return np.zeros((0, 0), np.float32)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(widths), d)


def _register_rows(n: int, sums: np.ndarray, gram: np.ndarray) -> pa.Table:
    """(i, j, value) register layout: (0,0)=row count; (0,j)=column-sum
    of dimension j (1-based); (i,j) for 1<=i<=j = Gram entry."""
    d = len(sums)
    iu, ju = np.triu_indices(d)
    i = np.concatenate([[0], np.zeros(d, np.int64), iu + 1])
    j = np.concatenate([[0], np.arange(1, d + 1), ju + 1])
    v = np.concatenate([np.array([n], np.uint64), sums, gram[iu, ju]])
    return pa.table({
        "i": pa.array(i.astype(np.int64), pa.int64()),
        "j": pa.array(j.astype(np.int64), pa.int64()),
        "value": pa.array(v.astype(np.uint64), pa.uint64()),
    })


def pca_partial(batch: pa.Table) -> pa.Table:
    """One block's register partial."""
    m = _emb_matrix(batch)
    q = _quantize(m)
    sums = q.sum(axis=0, dtype=np.uint64)
    gram = q.T @ q  # uint64 matmul wraps mod 2^64
    return _register_rows(m.shape[0], sums, gram)


def pca_merge(batch: pa.Table) -> pa.Table:
    """Merge register partials: segment-sum on the (i, j) key (uint64
    wrap = exact mod-2^64 merge in any order/grouping)."""
    i = batch.column("i").to_numpy(zero_copy_only=False)
    j = batch.column("j").to_numpy(zero_copy_only=False)
    v = batch.column("value").to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    key = (i << np.int64(32)) | j
    order = np.argsort(key, kind="stable")
    key, v = key[order], v[order]
    seg = np.ones(len(key), bool)
    seg[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(seg)
    tot = np.add.reduceat(v, starts)  # uint64 wrap mod 2^64
    return pa.table({
        "i": pa.array((key[starts] >> np.int64(32))
                      .astype(np.int64), pa.int64()),
        "j": pa.array((key[starts] & np.int64(0xFFFFFFFF))
                      .astype(np.int64), pa.int64()),
        "value": pa.array(tot, pa.uint64()),
    })


def embedding_pca_gram(sf_dir: str):
    """The PCA register table over ``embeddings.embedding``: row count,
    per-dimension micro-unit sums, and the upper-triangle Gram matrix,
    all mod 2^64 (1 + d + d(d+1)/2 rows; d=64 -> 2145)."""
    import ray.data

    from .bucketing import register_reduce
    return register_reduce(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["embedding"])
        .map_batches(pca_partial, batch_format="pyarrow",
                     batch_size=None), pca_merge)


def pca_components(regs: pa.Table, k: int = 8):
    """Top-k principal components from a register table (valid while
    register mass stays below 2^63, i.e. no wrap at test scale; the
    registers themselves remain the hash contract past that).

    Returns (eigenvalues desc, components (k, d)) of the covariance of
    the micro-unit-quantized embeddings divided by PCA_SCALE^2 — i.e.
    the covariance of the quantized-then-rescaled data."""
    i = np.asarray(regs.column("i"))
    j = np.asarray(regs.column("j"))
    v = np.asarray(regs.column("value")).astype(np.uint64) \
        .astype(np.int64)  # two's-complement undo (no-wrap regime)
    n = int(v[(i == 0) & (j == 0)][0])
    d = int(j[(i == 0)].max())
    sums = np.zeros(d, np.float64)
    sums[j[(i == 0) & (j > 0)] - 1] = v[(i == 0) & (j > 0)]
    gram = np.zeros((d, d), np.float64)
    gi, gj = i[i > 0] - 1, j[i > 0] - 1
    gram[gi, gj] = v[i > 0]
    gram[gj, gi] = v[i > 0]
    cov = (gram - np.outer(sums, sums) / n) / n / (PCA_SCALE ** 2)
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return w[order], u[:, order].T
