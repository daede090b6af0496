"""Property tests (hypothesis) for the vectorized kernels: every batch
kernel must agree with an obviously-correct scalar reference on
arbitrary inputs, and the SQL-shared tokenizer must agree with DuckDB's
regex engine. No Ray session needed — pure kernels only."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=80)
TEXTS = st.lists(ASCII_TEXT, max_size=8)


@settings(max_examples=60, deadline=None)
@given(TEXTS)
def test_shingle_hash_batch_matches_scalar(texts):
    from casie_ray.ops.dedup import shingle_hash_batch

    rows, hashes = shingle_hash_batch(texts)
    got: dict[int, set] = {}
    for r, h in zip(rows.tolist(), hashes.tolist()):
        got.setdefault(r, set()).add(h)
    for i, t in enumerate(texts):
        want = set(shingle_hash_batch([t])[1].tolist())
        assert got.get(i, set()) == want, (i, t)


@settings(max_examples=60, deadline=None)
@given(st.lists(ASCII_TEXT, max_size=6))
def test_fnv1a_hashes_match_scalar_reference(words):
    from casie_ray.ops.bucketing import fnv1a_hashes

    got = fnv1a_hashes(words)
    for w, g in zip(words, got.tolist()):
        h = 14695981039346656037
        for b in w.encode():
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        assert g == h, w


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_lang_id_batch_matches_python_reference(texts):
    import pyarrow as pa

    from casie_ray.ops.text import _LANG_PROFILES, _LANGS, lang_id_batch

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = lang_id_batch(batch)
    for i, t in enumerate(texts):
        s = (t or "").lower()
        bigrams = [s[k:k + 2] for k in range(len(s) - 1)]
        best_lang, best = _LANGS[0], -1
        for lg in _LANGS:
            p = set(_LANG_PROFILES[lg])
            sc = sum(1 for b in bigrams if b in p)
            if sc > best:
                best, best_lang = sc, lg
        assert out.column("pred_lang")[i].as_py() == best_lang, t
        assert out.column("score")[i].as_py() == max(best, 0), t


@settings(max_examples=40, deadline=None)
@given(TEXTS)
def test_simhash_batch_matches_scalar_reference(texts):
    from casie_ray.ops.bucketing import fnv1a_hashes
    from casie_ray.ops.dedup import simhash64_batch

    got = simhash64_batch(texts)
    for t, g in zip(texts, got.tolist()):
        words = sorted(set((t or "").split(" ")))
        hs = fnv1a_hashes(words).tolist()
        want = 0
        for i in range(64):
            ones = sum((h >> i) & 1 for h in hs)
            if 2 * ones > len(hs):
                want |= 1 << i
        assert g == want, t


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5), min_size=0,
                max_size=40))
def test_segment_pair_indices_match_bruteforce(keys):
    from casie_ray.ops.bucketing import segment_pair_indices

    arr = np.sort(np.asarray(keys, dtype=np.int64))
    ia, ib = segment_pair_indices([arr])
    got = sorted(zip(ia.tolist(), ib.tolist()))
    want = sorted((i, j) for i in range(len(arr))
                  for j in range(i + 1, len(arr)) if arr[i] == arr[j])
    assert got == want


@pytest.fixture(scope="module")
def ddb_con():
    import duckdb
    return duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(ASCII_TEXT)
def test_tokenizer_matches_duckdb_regex(text):
    """The SQL-shared token stream: Python re and DuckDB RE2 must agree
    on the TOKEN_RE pattern for any printable-ASCII input (the
    turn_token_features oracle depends on this)."""
    import duckdb

    from casie_ray.tokenize import TOKEN_RE

    con = duckdb.connect()
    pat = TOKEN_RE.pattern.replace("'", "''")
    dk = con.execute(
        "SELECT regexp_extract_all(?, '" + pat + "')", [text]).fetchone()[0]
    assert TOKEN_RE.findall(text) == dk, text


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["A", "N", "R"]),
    st.floats(min_value=0, max_value=60, allow_nan=False),
    st.floats(min_value=0, max_value=120_000, allow_nan=False)),
    min_size=1, max_size=40),
    st.integers(min_value=1, max_value=7))
def test_corr_registers_merge_invariant(rows, nsplit):
    """The correlation register partial/final pair must produce
    identical registers for ANY block split of the same rows — the
    mergeability property the shuffle-free scale design relies on."""
    import pyarrow as pa

    from casie_ray.ops.relational import _corr_final, _corr_partial

    def table(rs):
        return pa.table({
            "l_returnflag": pa.array([r[0] for r in rs], pa.string()),
            "l_quantity": pa.array([r[1] for r in rs], pa.float64()),
            "l_extendedprice": pa.array([r[2] for r in rs],
                                        pa.float64()),
        })

    def run(splits):
        parts = pa.concat_tables(
            [_corr_partial(table(s)) for s in splits if s])
        out = []
        for flag in sorted(set(parts.column("l_returnflag")
                               .to_pylist())):
            import pyarrow.compute as pc
            g = parts.filter(pc.equal(parts.column("l_returnflag"),
                                      flag))
            out.append(_corr_final(g))
        return pa.concat_tables(out).sort_by("l_returnflag") \
            .to_pydict()

    whole = run([rows])
    k = max(1, len(rows) // nsplit)
    chunked = run([rows[i:i + k] for i in range(0, len(rows), k)])
    assert whole == chunked


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(
    st.floats(min_value=-2, max_value=2, allow_nan=False,
              allow_subnormal=False),
    min_size=4, max_size=4), min_size=1, max_size=24),
    st.integers(min_value=1, max_value=5))
def test_pca_registers_merge_invariant(vecs, nsplit):
    """PCA Gram registers must be identical under any block split
    (uint64 wrap-sum merge is order- and grouping-free)."""
    import pyarrow as pa

    from casie_ray.ops.pca import pca_merge, pca_partial

    def table(vs):
        return pa.table({"embedding": pa.array(vs,
                                               pa.list_(pa.float32()))})

    whole = pca_merge(pca_partial(table(vecs))).to_pydict()
    k = max(1, len(vecs) // nsplit)
    parts = [pca_partial(table(vecs[i:i + k]))
             for i in range(0, len(vecs), k)]
    chunked = pca_merge(pa.concat_tables(parts)).to_pydict()
    assert whole == chunked


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=6))
def test_hll_partials_merge_invariant(ids, nsplit):
    """HLL register partials must max-merge to the same table under
    any block split — the mergeability the shuffle-free distinct
    count relies on."""
    import numpy as np
    import pyarrow as pa

    from casie_ray.ops.sketch import hll_partial

    def merge(tables):
        t = pa.concat_tables(tables)
        g = t.group_by(["register"]).aggregate([("max_rank", "max")])
        return dict(zip(g.column(0).to_pylist(),
                        g.column(1).to_pylist()))

    arr = np.array(ids, np.int64)
    whole = merge([hll_partial(arr)])
    k = max(1, len(arr) // nsplit)
    chunked = merge([hll_partial(arr[i:i + k])
                     for i in range(0, len(arr), k)])
    assert whole == chunked


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    st.integers(min_value=1, max_value=10**9),
    min_size=1, max_size=8),
    st.integers(min_value=1, max_value=10))
def test_mixture_thresholds_properties(counts, divisor):
    """For arbitrary source-count tables: every ppm is in [0, 1e6],
    expected kept mass never exceeds the integer target, and the
    keep-RATE ordering is inverse to source size (temperature
    flattening: bigger source -> lower or equal keep-ppm)."""
    from casie_ray.ops.curation import MIX_PPM, mixture_thresholds

    thr = mixture_thresholds(counts, target_divisor=divisor)
    total = sum(counts.values())
    target = total // divisor
    assert set(thr) == set(counts)
    assert all(0 <= p <= MIX_PPM for p in thr.values())
    kept = sum(thr[s] * n for s, n in counts.items())
    assert kept <= target * MIX_PPM + len(counts) * MIX_PPM  # int floor slack
    # keep-rate ordering follows the actual integer weights w/n
    # (floor-sqrt makes w/n itself non-monotone in n at perfect
    # squares, so compare the exact rationals by cross-multiplying)
    import math
    w = {s: int(math.floor(math.sqrt(float(n))))
         for s, n in counts.items()}
    for a in counts:
        for b in counts:
            if w[a] * counts[b] > w[b] * counts[a]:
                assert thr[a] >= thr[b], (a, b, counts, thr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="xyz", min_size=1, max_size=2),
                         min_size=0, max_size=7), max_size=6))
def test_trigram_partial_matches_bruteforce(docs_words):
    """The vectorized boundary-masked trigram kernel (the SAME function
    doc_ngrams' partial calls) agrees with a scalar counter on
    arbitrary word lists (incl. docs shorter than 3 words, empty docs,
    repeated trigrams)."""
    import collections

    import pyarrow as pa

    from casie_ray.ops.text import trigram_counts_batch

    texts = [" ".join(ws) for ws in docs_words]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    g = trigram_counts_batch(batch)
    got = collections.Counter(dict(zip(g.column("ngram").to_pylist(),
                                       g.column("n").to_pylist())))
    want = collections.Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 2):
            want[" ".join(ws[i:i + 3])] += 1
    assert got == want


UNI_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Lo", "Nd", "Zs", "Po")),
    max_size=40)


@settings(max_examples=50, deadline=None)
@given(st.lists(UNI_TEXT, max_size=6))
def test_hash_kernels_handle_unicode(texts):
    """The vectorized byte-level kernels must treat multi-byte UTF-8
    exactly like the scalar references do (the 100 TB corpus is not
    ASCII): fnv1a over encoded bytes, shingles and simhash built on
    top of it."""
    from casie_ray.ops.bucketing import fnv1a_hashes
    from casie_ray.ops.dedup import shingle_hash_batch, simhash64_batch

    got = fnv1a_hashes(texts)
    for w, g in zip(texts, got.tolist()):
        h = 14695981039346656037
        for b in w.encode():
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        assert g == h, repr(w)

    rows, hashes = shingle_hash_batch(texts)
    per_row: dict[int, set] = {}
    for r, h in zip(rows.tolist(), hashes.tolist()):
        per_row.setdefault(r, set()).add(h)
    for i, t in enumerate(texts):
        want = set(shingle_hash_batch([t])[1].tolist())
        assert per_row.get(i, set()) == want, repr(t)

    sims = simhash64_batch(texts)
    for t, g in zip(texts, sims.tolist()):
        words = sorted(set((t or "").split(" ")))
        hs = fnv1a_hashes(words).tolist()
        want = 0
        for i in range(64):
            ones = sum((h >> i) & 1 for h in hs)
            if 2 * ones > len(hs):
                want |= 1 << i
        assert g == want, repr(t)
