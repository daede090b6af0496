"""Deterministic hashed character-n-gram embeddings.

Stands in the seat of the reference's 100-d word2vec mean-pooled phrase
vectors (``code/link_coref.py:285-298`` avg_sentence_vector / strdist):
a pure function of the surface string, so every worker computes identical
vectors with no model artifact to ship. Used for cosine scoring in entity
linking (SURVEY M17/J5) and for the embedding column of the synthetic
canonical-entity table (FIXTURES.md §4).
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 64


def _ngrams(s: str, n: int = 3):
    s = f"#{s}#"
    if len(s) < n:
        yield s
        return
    for i in range(len(s) - n + 1):
        yield s[i:i + n]


import functools


@functools.lru_cache(maxsize=65536)
def embed_surface(surface: str, dim: int = DIM) -> np.ndarray:
    """L2-normalized hashed char-trigram vector of a normalized surface.
    Memoized (surfaces repeat heavily in coref/imputation scoring; the
    blake2b-per-trigram build is ~80 µs) — the returned array is frozen
    read-only so cache hits can never be corrupted by a caller."""
    v = np.zeros(dim, dtype=np.float32)
    for g in _ngrams(surface):
        h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
        v[h % dim] += 1.0 if (h >> 15) & 1 else -1.0  # signed hashing
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    v.flags.writeable = False
    return v


def embed_surfaces(surfaces, dim: int = DIM) -> np.ndarray:
    """Vectorized helper: (len(surfaces), dim) float32 matrix."""
    out = np.zeros((len(surfaces), dim), dtype=np.float32)
    for i, s in enumerate(surfaces):
        out[i] = embed_surface(s, dim)
    return out
