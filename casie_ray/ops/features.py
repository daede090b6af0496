"""Per-token linguistic feature columns (M6/M7 re-expression).

The reference folds CoreNLP dependency and chunk structure into
per-token features (combineDep / combineChnkLvl,
parseJsontoFeatures.py:108-162). This engine carries no parser (design
stance SURVEY §7.0), so the same *feature shapes* are derived
deterministically from the token stream itself:

- ``chunk_tag`` / ``chunk_id``: B-NP/I-NP over maximal runs of content
  tokens (the NP-chunk membership feature, M7) — a run boundary is any
  stopword/modal/generic or non-alphabetic token.
- ``gov_id``: the adjacency fold of M6 — each token's governor is the
  nearest preceding content token (0 = ROOT), the linear-order
  projection of the dependency fold.
- ``is_trigger`` / ``dep_to_trigger``: the deppathtoTrigger feature
  shape (parseJsontoFeatures.py:108-162) under the same projection —
  number of governor hops (<= DEP_MAX_DEPTH) from the token to the
  nearest trigger-surface ancestor; 0 = the token IS a trigger,
  -1 = no trigger within the bound. Upward-only along the governor
  chain (the reference walks real dependency arcs both ways — this is
  the documented approximation, consistent with the module's stance).

One stateless vectorized ``map_batches`` pass, no shuffle; every value
is reproduced exactly by the DuckDB oracle (window functions + bounded
governor-chain self-joins over the same regex token stream), so this
feature layer is value-checked, not just present. Downstream these
columns feed the feature-hungry tagger seat (stages/alttagger.py, the
T3 interface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import lexicons as lx
from ..tokenize import TOKEN_RE

FEATURE_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("tok_idx", pa.int64()),            # 1-based (SQL subscripts)
    ("surface", pa.string()),
    ("is_content", pa.bool_()),
    ("chunk_tag", pa.string()),         # B-NP | I-NP | O
    ("chunk_id", pa.int64()),           # 1-based per turn, 0 for O
    ("gov_id", pa.int64()),             # nearest preceding content tok, 0=ROOT
    ("is_trigger", pa.bool_()),
    ("dep_to_trigger", pa.int64()),     # governor hops to a trigger; -1 none
])

_NON_CONTENT = frozenset(lx.STOPWORDS) | frozenset(lx.MODAL_WORDS) \
    | frozenset(lx.GENERIC_WORDS)
DEP_MAX_DEPTH = 4
TRIGGER_TOKENS = frozenset(k for k in lx.TRIGGER_SURFACES
                           if " " not in k)


def token_features_batch(batch: pa.Table) -> pa.Table:
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()

    out_conv, out_turn, out_tok, out_surf = [], [], [], []
    content_flags: list[bool] = []
    trig_flags: list[bool] = []
    row_bounds = [0]
    for cid, ti, text in zip(conv_ids, turn_idxs, texts):
        toks = TOKEN_RE.findall(text or "")
        for k, s in enumerate(toks):
            out_conv.append(cid)
            out_turn.append(ti)
            out_tok.append(k + 1)
            out_surf.append(s)
            low = s.lower()
            content_flags.append(s[0].isalpha()
                                 and low not in _NON_CONTENT)
            trig_flags.append(low in TRIGGER_TOKENS)
        row_bounds.append(len(out_tok))

    n = len(out_tok)
    is_content = np.array(content_flags, dtype=bool) if n else \
        np.zeros(0, bool)
    tok_idx = np.array(out_tok, dtype=np.int64)
    # fully vectorized per-turn window features over the flat arrays:
    # every "restart at turn boundary" uses the monotone-base trick
    # (offset each turn by a strictly increasing base, accumulate
    # globally, subtract the base) — no per-turn Python loop
    bounds = np.asarray(row_bounds, dtype=np.int64)
    lens = np.diff(bounds)
    turn_of = np.repeat(np.arange(len(lens)), lens)
    first_of_turn = np.zeros(n, dtype=bool)
    first_of_turn[bounds[:-1][lens > 0]] = True
    prev_content = np.zeros(n, dtype=bool)
    prev_content[1:] = is_content[:-1]
    prev_content[first_of_turn] = False
    begins = is_content & ~prev_content
    # chunk id: cumulative count of begins within the turn
    cum = np.cumsum(begins.astype(np.int64))
    cum_before = np.concatenate([[0], cum])[bounds[:-1]]
    chunk_id = np.where(is_content, cum - cum_before[turn_of], 0)
    # gov id: last content tok_idx strictly before, within the turn
    big = (tok_idx.max() + 2) if n else 2
    base = turn_of * big
    val = np.where(is_content, base + tok_idx, 0)
    run = np.maximum.accumulate(np.concatenate([[0], val[:-1]])) if n \
        else np.zeros(0, np.int64)
    gov = np.where(run > base, run - base, 0)
    tags = np.full(n, "O", dtype=object)
    tags[is_content & ~begins] = "I-NP"
    tags[begins] = "B-NP"
    # dep_to_trigger: bounded walk up the governor chain, one vectorized
    # gather per depth level (never a per-token loop)
    is_trig = np.array(trig_flags, dtype=bool) if n else np.zeros(0, bool)
    turn_start = bounds[:-1]
    gptr = np.where(gov > 0, turn_start[turn_of] + gov - 1, -1) if n \
        else np.zeros(0, np.int64)
    depth = np.where(is_trig, 0, -1).astype(np.int64)
    ptr = gptr.copy()
    for d in range(1, DEP_MAX_DEPTH + 1):
        valid = ptr >= 0
        safe = np.where(valid, ptr, 0)
        hit = (depth == -1) & valid & is_trig[safe]
        depth[hit] = d
        ptr = np.where(valid, gptr[safe], -1)
    return pa.table({
        "conv_id": pa.array(out_conv, pa.string()),
        "turn_idx": pa.array(out_turn, pa.int32()),
        "tok_idx": pa.array(tok_idx, pa.int64()),
        "surface": pa.array(out_surf, pa.string()),
        "is_content": pa.array(is_content, pa.bool_()),
        "chunk_tag": pa.array(tags.tolist(), pa.string()),
        "chunk_id": pa.array(chunk_id, pa.int64()),
        "gov_id": pa.array(gov, pa.int64()),
        "is_trigger": pa.array(is_trig, pa.bool_()),
        "dep_to_trigger": pa.array(depth, pa.int64()),
    }).cast(FEATURE_SCHEMA)


def token_features(corpus_dir: str):
    """Transcripts -> per-token feature rows (shuffle-free stream)."""
    import ray.data
    import os
    return ray.data.read_parquet(
        os.path.join(corpus_dir, "transcripts"),
        columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(token_features_batch, batch_format="pyarrow")
