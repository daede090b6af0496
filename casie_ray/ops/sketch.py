"""Sketch-accelerated EXACT heavy hitters — no shuffle at all.

``vocab_top_words`` (ops/text.py) is the one-scan + one-exchange shape:
word partials cross the wire. At 100 TB with a heavy-tailed vocabulary
the winning shape is usually TWO shuffle-free scans instead:

1. **Candidate pass** — every block computes its exact word counts
   (one vectorized Arrow ``group_by``) and keeps only its local top
   ``cand_k`` rows plus the block's kept-minimum count. A word absent
   from a block's kept set has count <= that block's kept-min there
   (Misra-Gries/SpaceSaving-style mergeable bound), so any word absent
   from EVERY kept set has global count <= T = sum of kept-mins. The
   driver state is #blocks x cand_k partial rows (tree-merge them for
   very large clusters), never the vocabulary.
2. **Verify pass** — exact counts for the candidate set only (a
   vectorized ``is_in`` filter + ``group_by`` per block; candidate
   partials to the driver). If the exact k-th count is > T the top-k
   is PROVEN exact (no unseen word can reach it, and ties are decided
   on exact counts); otherwise fall back to the exchange-based
   ``vocab_top_words`` — the operator is exact in every case, the
   sketch only changes the plan.

SQL-checked against the same DuckDB oracle as ``vocab_top_words``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CAND_K = 512


def _read_documents(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])


def _block_counts(batch: pa.Table) -> pa.Table:
    words: list[str] = []
    for t in batch.column("text").to_pylist():
        words.extend((t or "").split(" "))
    t = pa.table({"word": pa.array(words, pa.string()),
                  "n": pa.array(np.ones(len(words), np.int64))})
    g = t.group_by(["word"]).aggregate([("n", "sum")])
    return g.rename_columns(["word", "n"])


def top_words_sketch(sf_dir: str, k: int = 50, cand_k: int = CAND_K):
    """Exact top-``k`` words by corpus frequency (ties by word
    ascending), computed with zero exchanges via the two-pass
    candidate/verify plan above. Returns a pyarrow Table
    (word, n) — identical values to ``vocab_top_words``."""
    def candidates(batch: pa.Table) -> pa.Table:
        g = _block_counts(batch)
        n = g.column("n").to_numpy()
        w = g.column("word").to_pylist()
        order = sorted(range(len(w)), key=lambda i: (-n[i], w[i]))
        kept = order[:cand_k]
        # kept-min bound: 0 when the whole block vocabulary was kept;
        # carried on the block's FIRST row only (the driver needs just
        # the sum over blocks)
        bound = int(n[kept[-1]]) if len(order) > cand_k else 0
        out = g.take(pa.array(kept, pa.int64()))
        bcol = np.zeros(out.num_rows, np.int64)
        if out.num_rows:
            bcol[0] = bound
        return out.append_column("bound", pa.array(bcol))

    rows = _read_documents(sf_dir).map_batches(
        candidates, batch_format="pyarrow", batch_size=None).take_all()
    if not rows:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    T = sum(r["bound"] for r in rows)
    cand = sorted({r["word"] for r in rows})
    cand_set = pa.array(cand, pa.string())

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = _block_counts(batch)
        return g.filter(pc.is_in(g.column("word"), value_set=cand_set))

    exact: dict[str, int] = {}
    for r in _read_documents(sf_dir).map_batches(
            verify, batch_format="pyarrow", batch_size=None).take_all():
        exact[r["word"]] = exact.get(r["word"], 0) + int(r["n"])
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    if len(top) < k or (top and top[-1][1] <= T):
        # the proof failed (flat distribution or candidate budget too
        # small): fall back to the exchange-based exact plan
        from .text import vocab_top_words
        ds = vocab_top_words(sf_dir, k)
        tbl = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")])
        return tbl
    return pa.table({
        "word": pa.array([w for w, _ in top], pa.string()),
        "n": pa.array([c for _, c in top], pa.int64()),
    })
