"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the ``documents`` table, each expressed
Ray-Data-first (streaming ``map_batches`` + keyed shuffles — never a
driver-side loop over rows):

- exact: hash-partitioned ``groupby(text_hash)``, keep min doc_id.
- n-gram Jaccard: inverted index on word-3-gram shingles, shuffle by
  shingle, pair-count reduce — exact Jaccard, no broadcast anywhere.
- MinHash + LSH: 64-perm signatures, 16 bands x 4 rows, banded groupby
  for candidates, exact-Jaccard verification of the (rare) candidates.
- SimHash: 64-bit signatures, 4x16-bit band blocking (pigeonhole-exact
  for hamming <= 3), popcount verification.
- embedding cosine: batch matmul against the normalized matrix.

Integer outputs (ids / counts) so the DuckDB oracles compare exactly.

Scale notes (100 TB): the shingle shuffle is the widest step — hot
shingles (boilerplate) should be dropped by a document-frequency cap in
a pre-pass; pair emission is quadratic per shingle group but shingle
groups are tiny once boilerplate is removed. MinHash verification only
touches candidate docs (near-dup mass, not corpus mass).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SHINGLE_W = 3           # words per shingle
N_PERM = 64             # minhash permutations
# 16 bands x 4 rows: candidate recall 1-(1-J^4)^16 ~ 0.9998 at J=0.8
# (8x8 gave only ~0.77 at the threshold — qualifying pairs near J=0.8
# could miss every band; verification is exact, so the wider banding
# only costs extra candidates, never extra false pairs)
N_BANDS, BAND_R = 16, 4
SIM_BITS, SIM_BANDS = 64, 4
MINHASH_SEED = 1234


def _read_documents(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode(), digest_size=8).digest(), "big",
        signed=False)


def shingle_hashes(text: str, w: int = SHINGLE_W) -> np.ndarray:
    """Distinct word-w-gram shingle hashes (uint64). Tokenization =
    split on single spaces, matching the SQL oracle's string_split."""
    words = (text or "").split(" ")
    if len(words) < w:
        shingles = {" ".join(words)} if words else set()
    else:
        shingles = {" ".join(words[i:i + w])
                    for i in range(len(words) - w + 1)}
    return np.fromiter((_hash64(s) for s in sorted(shingles)),
                       dtype=np.uint64, count=len(shingles))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def _text_hash_batch(batch: pa.Table) -> pa.Table:
    hashes = [_hash64(t or "") for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_hash": pa.array(hashes, pa.uint64()),
    })


def _exact_group(group: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": pa.array([pc.min(group.column("doc_id")).as_py()],
                           pa.int64()),
        "n_copies": pa.array([group.num_rows], pa.int64()),
    })


def exact_dedup(sf_dir: str):
    """One row per distinct text: (representative min doc_id, copy count).
    Hash-partition + per-group first (SURVEY A7 pattern on documents)."""
    ds = _read_documents(sf_dir).map_batches(_text_hash_batch,
                                             batch_format="pyarrow")
    return ds.groupby("text_hash").map_groups(_exact_group,
                                              batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (inverted-index shuffle join)
# ---------------------------------------------------------------------------

_SHINGLE_ROW_SCHEMA = pa.schema([
    ("shingle", pa.uint64()), ("doc_id", pa.int64()), ("doc_n", pa.int64()),
])
_PAIR_PART_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("n_a", pa.int64()), ("n_b", pa.int64()), ("inter", pa.int64()),
])
PAIR_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()),
    ("inter", pa.int64()), ("uni", pa.int64()),
])


def _shingle_rows_batch(batch: pa.Table) -> pa.Table:
    """flat_map: doc -> one row per distinct shingle, carrying the doc's
    shingle count so the pair reduce needs no size join/broadcast."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sh, dids, dns = [], [], []
    for did, text in zip(doc_ids, texts):
        h = shingle_hashes(text)
        sh.append(h)
        dids.append(np.full(len(h), did, dtype=np.int64))
        dns.append(np.full(len(h), len(h), dtype=np.int64))
    return pa.table({
        "shingle": pa.array(np.concatenate(sh) if sh else [], pa.uint64()),
        "doc_id": pa.array(np.concatenate(dids) if dids else [], pa.int64()),
        "doc_n": pa.array(np.concatenate(dns) if dns else [], pa.int64()),
    })


def _pairs_from_shingle_group(group: pa.Table) -> pa.Table:
    """All ordered doc pairs sharing this shingle (inter contribution 1
    each). Groups are tiny for natural text; boilerplate shingles need
    the doc-frequency cap noted in the module docstring."""
    n = group.num_rows
    if n < 2:
        return _PAIR_PART_SCHEMA.empty_table()
    order = np.lexsort((np.zeros(n), group.column("doc_id").to_numpy()))
    dids = group.column("doc_id").to_numpy()[order]
    dns = group.column("doc_n").to_numpy()[order]
    ia, ib = np.triu_indices(n, 1)
    return pa.table({
        "doc_a": pa.array(dids[ia], pa.int64()),
        "doc_b": pa.array(dids[ib], pa.int64()),
        "n_a": pa.array(dns[ia], pa.int64()),
        "n_b": pa.array(dns[ib], pa.int64()),
        "inter": pa.array(np.ones(len(ia), dtype=np.int64), pa.int64()),
    })


def _combine_pairs(batch: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: sum inter per pair within the batch."""
    if batch.num_rows == 0:
        return _PAIR_PART_SCHEMA.empty_table()
    g = batch.group_by(["doc_a", "doc_b"]).aggregate(
        [("inter", "sum"), ("n_a", "min"), ("n_b", "min")])
    return g.rename_columns(
        ["doc_a", "doc_b", "inter", "n_a", "n_b"]).select(
        _PAIR_PART_SCHEMA.names).cast(_PAIR_PART_SCHEMA)


def _finalize_pairs(threshold_pct: int):
    def final(group: pa.Table) -> pa.Table:
        g = _combine_pairs(group)
        inter = g.column("inter")
        uni = pc.subtract(pc.add(g.column("n_a"), g.column("n_b")), inter)
        keep = pc.greater_equal(pc.multiply(inter, pa.scalar(100, pa.int64())),
                                pc.multiply(uni, pa.scalar(threshold_pct,
                                                           pa.int64())))
        g = g.append_column("uni", uni).filter(keep)
        return g.select(PAIR_SCHEMA.names).cast(PAIR_SCHEMA)
    return final


def jaccard_pairs(sf_dir: str, threshold_pct: int = 80):
    """Exact near-duplicate pairs: word-3-gram Jaccard >= threshold.
    documents -> shingle rows -> groupby(shingle) pair emit ->
    combiner -> groupby(pair) sum -> threshold filter."""
    ds = _read_documents(sf_dir)
    ds = ds.map_batches(_shingle_rows_batch, batch_format="pyarrow")
    ds = ds.groupby("shingle").map_groups(_pairs_from_shingle_group,
                                          batch_format="pyarrow")
    ds = ds.map_batches(_combine_pairs, batch_format="pyarrow")
    return ds.groupby(["doc_a", "doc_b"]).map_groups(
        _finalize_pairs(threshold_pct), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(MINHASH_SEED)
_MH_A = (_rng.integers(1, 2**63, N_PERM, dtype=np.uint64) << np.uint64(1)) \
    | np.uint64(1)  # odd multipliers (multiply-shift hashing)
_MH_B = _rng.integers(0, 2**63, N_PERM, dtype=np.uint64)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 signature; empty docs get all-max sentinel."""
    if len(shingles) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = _MH_A[:, None] * shingles[None, :] + _MH_B[:, None]
    return m.min(axis=1)


def _band_rows_batch(batch: pa.Table) -> pa.Table:
    """doc -> N_BANDS rows (band, band_hash, doc_id)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    bands, bhash, dids = [], [], []
    for did, text in zip(doc_ids, texts):
        sig = minhash_signature(shingle_hashes(text))
        for b in range(N_BANDS):
            chunk = sig[b * BAND_R:(b + 1) * BAND_R]
            bands.append(b)
            bhash.append(_hash64(chunk.tobytes().hex()))
            dids.append(did)
    return pa.table({
        "band": pa.array(bands, pa.int32()),
        "band_hash": pa.array(bhash, pa.uint64()),
        "doc_id": pa.array(dids, pa.int64()),
    })


_CAND_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _candidates_from_band_group(group: pa.Table) -> pa.Table:
    n = group.num_rows
    if n < 2:
        return _CAND_SCHEMA.empty_table()
    dids = np.sort(group.column("doc_id").to_numpy())
    ia, ib = np.triu_indices(n, 1)
    return pa.table({"doc_a": pa.array(dids[ia], pa.int64()),
                     "doc_b": pa.array(dids[ib], pa.int64())})


def _dedup_cand_group(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def minhash_lsh_pairs(sf_dir: str, threshold_pct: int = 80):
    """MinHash+LSH candidate generation, exact-Jaccard verification.

    Candidates (rare by construction) are verified against a broadcast
    {doc_id: shingles} map restricted to candidate docs only — at corpus
    scale this side stays proportional to the near-duplicate mass.
    Output schema matches :func:`jaccard_pairs` (same oracle)."""
    import ray
    import ray.data

    ds = _read_documents(sf_dir)
    cands = ds.map_batches(_band_rows_batch, batch_format="pyarrow") \
        .groupby(["band", "band_hash"]) \
        .map_groups(_candidates_from_band_group, batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]) \
        .map_groups(_dedup_cand_group, batch_format="pyarrow")
    cand_parts = list(cands.iter_batches(batch_format="pyarrow"))
    cand_tbl = pa.concat_tables(
        [_CAND_SCHEMA.empty_table()] + [p.cast(_CAND_SCHEMA)
                                        for p in cand_parts])
    cand_ids = set(cand_tbl.column("doc_a").to_pylist()) \
        | set(cand_tbl.column("doc_b").to_pylist())

    def shingles_of_cands(batch: pa.Table) -> pa.Table:
        rows = [(d, t) for d, t in zip(batch.column("doc_id").to_pylist(),
                                       batch.column("text").to_pylist())
                if d in cand_ids]
        return pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "shingles": pa.array([shingle_hashes(t).tolist()
                                  for _, t in rows],
                                 pa.list_(pa.uint64())),
        })

    sh_tbl = pa.concat_tables(
        list(_read_documents(sf_dir)
             .map_batches(shingles_of_cands, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")))
    sh_ref = ray.put({d: set(s) for d, s in zip(
        sh_tbl.column("doc_id").to_pylist(),
        sh_tbl.column("shingles").to_pylist())})

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        rows = []
        for a, b in zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist()):
            sa, sb = sh.get(a, set()), sh.get(b, set())
            inter = len(sa & sb)
            uni = len(sa | sb)
            if uni and inter * 100 >= threshold_pct * uni:
                rows.append({"doc_a": a, "doc_b": b,
                             "inter": inter, "uni": uni})
        return pa.Table.from_pylist(rows, schema=PAIR_SCHEMA) if rows \
            else PAIR_SCHEMA.empty_table()

    return ray.data.from_arrow(cand_tbl).map_batches(
        verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over distinct word hashes (weight 1 each)."""
    words = sorted(set((text or "").split(" ")))
    if not words:
        return 0
    acc = np.zeros(SIM_BITS, dtype=np.int64)
    for w in words:
        h = _hash64(w)
        for bit in range(SIM_BITS):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(SIM_BITS):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    bands, keys, dids, sigs = [], [], [], []
    width = SIM_BITS // SIM_BANDS
    mask = (1 << width) - 1
    for did, text in zip(doc_ids, texts):
        sig = simhash64(text)
        for b in range(SIM_BANDS):
            bands.append(b)
            keys.append((sig >> (b * width)) & mask)
            dids.append(did)
            sigs.append(sig)
    return pa.table({
        "band": pa.array(bands, pa.int32()),
        "key": pa.array(keys, pa.uint64()),
        "doc_id": pa.array(dids, pa.int64()),
        "sig": pa.array(np.array(sigs, dtype=np.uint64), pa.uint64()),
    })


_SIM_PAIR_SCHEMA = pa.schema([
    ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64()),
])


def _simhash_pairs_group(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _SIM_PAIR_SCHEMA.empty_table()
        order = np.argsort(group.column("doc_id").to_numpy(), kind="stable")
        dids = group.column("doc_id").to_numpy()[order]
        sigs = group.column("sig").to_numpy()[order]
        ia, ib = np.triu_indices(n, 1)
        x = sigs[ia] ^ sigs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(SIM_BITS):  # bounded popcount loop (vectorized)
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = (ham <= max_hamming) & (dids[ia] != dids[ib])
        return pa.table({
            "doc_a": pa.array(dids[ia][keep], pa.int64()),
            "doc_b": pa.array(dids[ib][keep], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64()),
        })
    return fn


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Exact hamming<=3 SimHash pairs: 4x16-bit band blocking guarantees
    (pigeonhole) every qualifying pair shares at least one band."""
    ds = _read_documents(sf_dir)
    ds = ds.map_batches(_simhash_band_rows, batch_format="pyarrow")
    ds = ds.groupby(["band", "key"]).map_groups(
        _simhash_pairs_group(max_hamming), batch_format="pyarrow")
    # same pair can match in multiple bands -> dedup
    return ds.groupby(["doc_a", "doc_b"]).map_groups(
        _dedup_cand_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.5):
    """All pairs with cosine(embedding) > threshold: per-batch float32
    matmul against the broadcast normalized matrix (the brute-force
    baseline; the 100 TB path buckets by random-hyperplane LSH first so
    the broadcast side shrinks to one bucket)."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bm = np.asarray(batch.column("embedding").to_pylist(),
                        dtype=np.float32)
        bn = np.linalg.norm(bm, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (bm / bn) @ all_mat.T
        ri, ci = np.nonzero((sims > threshold) & (bid[:, None] < all_ids[None, :]))
        return pa.table({
            "vec_id_a": pa.array(bid[ri], pa.int64()),
            "vec_id_b": pa.array(all_ids[ci], pa.int64()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(pairs, batch_format="pyarrow")
