"""Real subword tokenizer seat (r2 verdict task 6): deterministic BPE.

``pack_sequences`` (ops/mlprep.py) packs FNV word hashes — a stand-in
vocabulary with a fully independent DuckDB oracle. This module is the
REAL tokenizer seat a pretraining export needs:

- :func:`train_bpe` — classic byte-pair-merge training over the word
  frequencies of a corpus: start from the character alphabet, repeat
  ``n_merges`` times "merge the most frequent adjacent symbol pair"
  (count desc, pair lexicographic tie-break) — fully deterministic, so
  the vocabulary is reproducible data, like the lexicon tables.
- :class:`BpeTokenizer` — encode/decode with a per-instance word cache
  (a batch tokenizes each DISTINCT word once; the synthetic corpus'
  vocabulary is small, real corpora are Zipfian — the cache is the
  standard trick either way).
- :func:`load_bpe_state` — disk-cached trained vocab keyed by the
  corpus file bytes + params, the same ship-like-tagger-state pattern
  as ``stages/detect.load_tagger_state``: built once on the driver,
  ``ray.put`` once, read by every task.
- :func:`pack_sequences_bpe` — the bucketed shard-local packing of
  ``mlprep.pack_sequences`` with REAL token ids; the order-sensitive
  checksum is sum(splitmix64(id) * (pos_in_window+1)) mod 2^64.
- :func:`sequential_pack_oracle` — independent plain-Python (scalar
  loops, big-int arithmetic, no numpy/Arrow) reimplementation of the
  whole pipeline; the driver oracle materializes it to parquet (the
  ``_ensure_gold_kg`` pattern) since BPE application is iterative and
  not SQL-expressible.

BPE training itself stays driver-side: its input is the WORD-FREQUENCY
table, which is vocabulary-sized, not corpus-sized — at 100 TB the
word counts come from one ``vocab_top_words``-shaped exchange (or its
sketch twin) and the merge loop still runs over a bounded table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bucketing import hash_bucket, mix64

VOCAB_MERGES = 512
UNK_ID = 0
UNK = "<unk>"

SEQ_LEN = 512
N_PACK_BUCKETS = 64


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def word_frequencies(texts) -> dict[str, int]:
    freq: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def train_bpe(word_freq: dict[str, int],
              n_merges: int = VOCAB_MERGES) -> dict:
    """Deterministic BPE merge training over a word-frequency table.

    Returns ``{"merges": [(a, b), ...], "vocab": {token: id}}`` where
    ids are: 0 = <unk>, then the sorted character alphabet, then the
    merge products in merge order. Every choice is totally ordered
    (count desc, pair asc), so equal inputs give equal vocabularies on
    any machine."""
    words = {w: tuple(w) for w in sorted(word_freq)}
    alphabet = sorted({c for w in words.values() for c in w})
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            f = word_freq[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] \
                        and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    vocab = {UNK: UNK_ID}
    for c in alphabet:
        vocab[c] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return {"merges": merges, "vocab": vocab}


class BpeTokenizer:
    """Encode/decode against a trained state; per-instance word cache."""

    def __init__(self, state: dict):
        self.merges = state["merges"]
        self.rank = {p: i for i, p in enumerate(self.merges)}
        self.vocab = state["vocab"]
        self.id_to_tok = {i: t for t, i in self.vocab.items()}
        self._cache: dict[str, list[int]] = {}

    def encode_word(self, word: str) -> list[int]:
        got = self._cache.get(word)
        if got is not None:
            return got
        sym = list(word)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = self.rank.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        ids = [self.vocab.get(s, UNK_ID) for s in sym]
        self._cache[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in (text or "").split(" "):
            if w:
                out.extend(self.encode_word(w))
        return out

    def decode(self, ids) -> str:
        return "".join(self.id_to_tok.get(int(i), UNK) for i in ids)


def load_bpe_state(documents_path: str,
                   n_merges: int = VOCAB_MERGES) -> dict:
    """Disk-cached trained BPE state for one documents table, keyed by
    the file bytes + params (the load_tagger_state pattern: the ~1 s
    training cost is driver-serial, so a warm cache keeps it off the
    scaling-critical path). Atomic cache writes (tmp + rename)."""
    import hashlib
    import os
    import pickle
    import tempfile

    with open(documents_path, "rb") as f:
        raw = f.read()
    key = hashlib.blake2b(raw + f"bpe-v1-{n_merges}".encode(),
                          digest_size=16).hexdigest()
    cdir = os.path.join(tempfile.gettempdir(), "casie_state_cache")
    cpath = os.path.join(cdir, f"{key}.pkl")
    if os.path.exists(cpath):
        try:
            with open(cpath, "rb") as f:
                return pickle.load(f)
        except (pickle.UnpicklingError, EOFError, OSError):
            pass
    import pyarrow.parquet as pq
    texts = pq.read_table(documents_path,
                          columns=["text"]).column("text").to_pylist()
    state = train_bpe(word_frequencies(texts), n_merges)
    os.makedirs(cdir, exist_ok=True)
    tmp = cpath + f".{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, cpath)
    return state


# ---------------------------------------------------------------------------
# Distributed packing with real token ids
# ---------------------------------------------------------------------------


def pack_sequences_bpe(sf_dir: str, seq_len: int = SEQ_LEN,
                       n_merges: int = VOCAB_MERGES,
                       emit_tokens: bool = False):
    """``mlprep.pack_sequences`` with REAL BPE token ids: documents are
    hash(doc_id)-bucketed (one exchange, windows never span buckets),
    each bucket tokenizes its docs in doc_id order via the broadcast
    trained vocab and emits (bucket, window_idx, n_tokens, checksum)
    rows; checksum = sum(splitmix64(id) * (pos+1)) mod 2^64 is
    order-sensitive, so the layout is value-checked against the
    sequential oracle, not just counted. ``emit_tokens=True`` adds the
    ``tokens`` list column (the training payload)."""
    import os

    import ray
    import ray.data

    state_ref = ray.put(load_bpe_state(
        os.path.join(sf_dir, "documents.parquet"), n_merges))

    def tag(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(
                hash_bucket([ids], n_buckets=N_PACK_BUCKETS), pa.int32()),
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
        })

    def pack(group: pa.Table) -> pa.Table:
        tok = BpeTokenizer(ray.get(state_ref))
        g = group.sort_by("doc_id")
        ids: list[int] = []
        for t in g.column("text").to_pylist():
            ids.extend(tok.encode(t))
        h = mix64([np.asarray(ids, dtype=np.uint64)]) if ids else \
            np.zeros(0, np.uint64)
        total = len(h)
        wpos = np.arange(total, dtype=np.uint64) % np.uint64(seq_len)
        with np.errstate(over="ignore"):
            weighted = h * (wpos + np.uint64(1))
        starts = np.arange(0, total, seq_len)
        checksum = np.add.reduceat(weighted, starts) if total else \
            np.zeros(0, np.uint64)
        n_win = len(starts)
        counts = np.full(n_win, seq_len, np.int64)
        if n_win:
            counts[-1] = total - starts[-1]
        b = group.column("bucket")[0].as_py() if group.num_rows else 0
        out = {
            "bucket": pa.array(np.full(n_win, b, np.int32)),
            "window_idx": pa.array(np.arange(n_win, dtype=np.int64)),
            "n_tokens": pa.array(counts, pa.int64()),
            "checksum": pa.array(checksum, pa.uint64()),
        }
        if emit_tokens:
            out["tokens"] = pa.ListArray.from_arrays(
                pa.array(np.concatenate([starts, [total]]), pa.int32()),
                pa.array(np.asarray(ids, np.int64), pa.int64()))
        return pa.table(out)

    from .bucketing import bucket_groupby
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"]) \
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
    return bucket_groupby(ds, pack)


# ---------------------------------------------------------------------------
# Independent sequential oracle (plain Python, scalar arithmetic)
# ---------------------------------------------------------------------------

_M64 = 1 << 64
_PHI = 0x9E3779B97F4A7C15
_S1 = 0xBF58476D1CE4E5B9
_S2 = 0x94D049BB133111EB


def _splitmix64_scalar(x: int) -> int:
    h = ((x ^ 0) * _PHI + 1) % _M64
    h ^= h >> 30
    h = (h * _S1) % _M64
    h ^= h >> 27
    h = (h * _S2) % _M64
    return h ^ (h >> 31)


def sequential_pack_oracle(documents_path: str, seq_len: int = SEQ_LEN,
                           n_merges: int = VOCAB_MERGES,
                           n_buckets: int = N_PACK_BUCKETS) -> pa.Table:
    """Single-process reference pack: same trained vocab, but scalar
    splitmix64 (Python big ints), scalar bucketing, and a plain loop
    pack — no shared numpy kernels, so an engine bug in the vectorized
    path cannot self-confirm. Returns the (bucket, window_idx,
    n_tokens, checksum) table sorted by (bucket, window_idx)."""
    import pyarrow.parquet as pq

    tok = BpeTokenizer(load_bpe_state(documents_path, n_merges))
    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    docs = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    per_bucket: dict[int, list[int]] = {}
    for doc_id, text in docs:
        b = _splitmix64_scalar(int(doc_id)) % n_buckets
        per_bucket.setdefault(b, []).extend(tok.encode(text))
    rows = []
    for b in sorted(per_bucket):
        ids = per_bucket[b]
        for widx in range((len(ids) + seq_len - 1) // seq_len):
            chunk = ids[widx * seq_len:(widx + 1) * seq_len]
            csum = 0
            for pos, tid in enumerate(chunk):
                csum = (csum + _splitmix64_scalar(tid) * (pos + 1)) % _M64
            rows.append({"bucket": b, "window_idx": widx,
                         "n_tokens": len(chunk), "checksum": csum})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("bucket", pa.int32()), ("window_idx", pa.int64()),
        ("n_tokens", pa.int64()), ("checksum", pa.uint64()),
    ]))
