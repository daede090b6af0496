"""Learned (weak-supervision) tagger seat over the annotation corpus.

The reference's taggers are TRAINED on the annotation corpus — its
``nug_arg_detection.py`` / ``role_phrase.py`` take ``-trainfile`` /
``-testfile`` lists of annotation documents (reference
code/nug_arg_detection.py:212-214). The engine's deterministic rule
seats are tuned to the synthetic contract corpus, so their zero-shot
quality on the real out-of-domain text is documented but low
(BASELINE.md "Real-corpus ingest bridge"). This module is the honest
engine analogue of the reference's protocol with no neural weights:

- LEARN per-label surface lexicons (nugget surface -> event subtype,
  argument surface -> argument type) from a TRAIN split of the
  annotation JSONs,
- PREDICT on the held-out split with the same longest-match scan the
  synthetic seat uses,
- SCORE against the projected gold with the reference's own metrics
  (span-only raw-overlap matching, score.py:106-151; labeled dice
  matching, score.py:181-217).

Split protocol: deterministic FNV-1a hash on doc_id (the engine's
``split_assignment`` idiom, ops/mlprep.py) — train/test are disjoint
by construction and the lexicon is reduced from train-split rows only
(no-leakage is pinned by a test with a planted test-only trigger).

Ray-Data-first shape: learning is one ``map_batches`` pass over the
raw files (parse once, filter split, partial surface counts per
block) followed by a driver-side combine of the vocabulary-sized
partials — the same bounded-broadcast class as the BPE vocab and the
entity catalog. Prediction is one actor-pool ``map_batches`` over the
test files with the lexicon broadcast via ``ray.put`` and the matcher
index built once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ingest import MENTION_SCHEMA, _read_raw, _turn_spans, parse_annotation
from .ops.bucketing import fnv1a_hashes
from .tokenize import tokenize

TEST_PCT = 20  # FNV-1a(doc_id) % 100 < TEST_PCT -> held-out test doc


def doc_is_test(doc_ids, test_pct: int = TEST_PCT) -> np.ndarray:
    """Boolean test-split mask, re-derivable anywhere (incl. SQL — the
    identical formula split_assignment registers for transcripts)."""
    h = fnv1a_hashes(list(doc_ids)) % np.uint64(100)
    return h < np.uint64(test_pct)


_PARTIAL_SCHEMA = pa.schema([
    ("surface", pa.string()), ("label", pa.string()), ("n", pa.int64()),
])


def _span_source(which: str, events: list[dict], args: list[dict]):
    """(surface text, label) rows for one parsed doc: nugget text ->
    event subtype, argument text -> argument entity type, or argument
    text -> semantic role — the three label families the reference's
    tagger/role classifiers learn (its -options nugget/argument/role
    scorer modes)."""
    if which == "nugget":
        return ((ev["nugget_text"], ev["subtype"]) for ev in events)
    if which == "role":
        return ((a["text"], a["role"]) for a in args)
    return ((a["text"], a["arg_type"]) for a in args)


def canon_surface(text: str) -> str:
    """Canonical surface key: the token tuple joined by single spaces,
    lowercased. EVERY count table (gold labels, gold totals, matcher
    occurrences) is keyed by this, so whitespace/newline variants of
    the same phrase ('denial of\\nservice' vs 'denial of service')
    collapse to one key and the trigger-probability numerator and
    denominator always talk about the same surface."""
    return " ".join(t[0].lower() for t in tokenize(text or ""))


def _surface_label_totals(ann_dir: str, what: str,
                          test_pct: int = TEST_PCT):
    """(surface, label, n) totals over TRAIN-split gold spans — the
    single corpus pass the lexicon, its min_count filter, AND the
    trigger-probability numerator are all derived from. Partials are
    vocabulary-sized, so the driver-side combine is a bounded
    broadcast (BPE-vocab class), not a dataset materialization."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        paths = batch.column("path").to_pylist()
        raws = batch.column("bytes").to_pylist()
        is_test = doc_is_test(
            [_doc_of(p) for p in paths], test_pct)
        for path, raw, t in zip(paths, raws, is_test):
            if t:
                continue  # train-split only: held-out docs never counted
            _doc, events, args = parse_annotation(path, raw)
            for text, label in _span_source(what, events, args):
                key = (canon_surface(text), label or "")
                if key[0] and key[1]:
                    counts[key] = counts.get(key, 0) + 1
        if not counts:
            return _PARTIAL_SCHEMA.empty_table()
        ks = sorted(counts)
        return pa.table({
            "surface": pa.array([k[0] for k in ks], pa.string()),
            "label": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
        })

    parts = _read_raw(ann_dir).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return parts
    return parts.groupby(["surface", "label"], as_index=False)["n"].sum()


def learn_surface_lexicon(ann_dir: str, what: str = "nugget",
                          test_pct: int = TEST_PCT,
                          min_count: int = 1,
                          totals=None) -> dict[str, str]:
    """surface -> label, learned from TRAIN-split docs only.

    Each canonical surface (see ``canon_surface``) maps to its most
    frequent train-split label (count argmax, ties -> smallest label —
    fully deterministic). Surfaces whose TOTAL gold count across all
    labels is below ``min_count`` are dropped. Pass ``totals`` to
    reuse an existing ``_surface_label_totals`` frame (skips the
    corpus pass)."""
    tot = (_surface_label_totals(ann_dir, what, test_pct)
           if totals is None else totals)
    if tot.empty:
        return {}
    surf_n = tot.groupby("surface")["n"].transform("sum")
    tot = tot[surf_n >= min_count]
    # argmax count per surface, ties -> smallest label (sort then head)
    tot = tot.sort_values(["surface", "n", "label"],
                          ascending=[True, False, True])
    best = tot.groupby("surface", as_index=False).head(1)
    return dict(zip(best["surface"], best["label"]))


_OCC_SCHEMA = pa.schema([("surface", pa.string()), ("n", pa.int64())])


def surface_occurrence_counts(ann_dir: str, lexicon: dict[str, str],
                              test_pct: int = TEST_PCT) -> dict[str, int]:
    """How often each lexicon surface occurs in TRAIN-split turn text
    (gold or not), via the same longest-match scan prediction uses —
    the denominator of a distant-supervision trigger probability.
    One actor-pool pass with the matcher broadcast; partials are
    lexicon-sized, so the combine is a bounded broadcast."""
    import ray
    ref = ray.put(lexicon)

    class Counter:
        def __init__(self):
            self.matcher = build_surface_matcher(ray.get(ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts: dict[str, int] = {}
            paths = batch.column("path").to_pylist()
            raws = batch.column("bytes").to_pylist()
            is_test = doc_is_test([_doc_of(p) for p in paths], test_pct)
            for _path, raw, t in zip(paths, raws, is_test):
                if t:
                    continue
                doc, _e, _a = parse_annotation(_path, raw)
                for text, _off in _turn_spans(doc["content"]):
                    for _s, _e2, _label, key in scan_turn(
                            text, self.matcher):
                        counts[key] = counts.get(key, 0) + 1
            if not counts:
                return _OCC_SCHEMA.empty_table()
            ks = sorted(counts)
            return pa.table({
                "surface": pa.array(ks, pa.string()),
                "n": pa.array([counts[k] for k in ks], pa.int64()),
            })

    parts = _read_raw(ann_dir).map_batches(
        Counter, batch_format="pyarrow",
        concurrency=(1, _pool_width())).to_pandas()
    if parts.empty:
        return {}
    tot = parts.groupby("surface", as_index=False)["n"].sum()
    return dict(zip(tot["surface"], tot["n"]))


def filter_by_trigger_prob(ann_dir: str, lexicon: dict[str, str],
                           gold_counts: dict[str, int],
                           min_prob: float = 0.5,
                           test_pct: int = TEST_PCT) -> dict[str, str]:
    """Distant-supervision precision filter: keep surfaces whose
    train-split trigger probability gold_n / occurrence_n >= min_prob
    (occurrence_n counted by the SAME scan used at prediction time, so
    the probability estimates the matcher's own precision). Ambiguous
    everyday words ('attack' as a noun in prose) fall below the bar;
    reliable triggers ('ransomware infected') stay."""
    occ = surface_occurrence_counts(ann_dir, lexicon, test_pct)
    return {s: lab for s, lab in lexicon.items()
            if gold_counts.get(s, 0) >= min_prob * max(occ.get(s, 0), 1)}


def learn_filtered_lexicon(ann_dir: str, what: str = "nugget",
                           test_pct: int = TEST_PCT, min_count: int = 1,
                           min_prob: float = 0.3) -> dict[str, str]:
    """learn_surface_lexicon + trigger-probability filter in one call
    (the seat's default high-precision operating point). ONE gold
    corpus pass: lexicon, min_count filter and the probability
    numerator all derive from the same totals frame."""
    tot = _surface_label_totals(ann_dir, what, test_pct)
    lex = learn_surface_lexicon(ann_dir, what, test_pct, min_count,
                                totals=tot)
    gold = surface_gold_counts(ann_dir, what, test_pct, totals=tot)
    return filter_by_trigger_prob(ann_dir, lex, gold, min_prob, test_pct)


def surface_gold_counts(ann_dir: str, what: str = "nugget",
                        test_pct: int = TEST_PCT,
                        totals=None) -> dict[str, int]:
    """Train-split gold span count per surface (numerator of the
    trigger probability), label-summed from the same totals frame the
    lexicon is learned from (pass ``totals`` to skip the pass)."""
    tot = (_surface_label_totals(ann_dir, what, test_pct)
           if totals is None else totals)
    if tot.empty:
        return {}
    s = tot.groupby("surface")["n"].sum()
    return dict(zip(s.index, s))


def _doc_of(path: str) -> str:
    import os
    return os.path.splitext(os.path.basename(path))[0]


def _pool_width() -> int:
    """Actor-pool max width: available CPUs (the bucket_groupby
    sizing idiom), floor 2 so tiny sessions still overlap IO."""
    import ray
    return max(2, int(ray.cluster_resources().get("CPU", 4)))


def build_surface_matcher(lexicon: dict[str, str]) -> dict:
    """first_token_lower -> [(token_tuple, n_tokens, label)] via the
    shared phrase-index kernel (semantics.build_phrase_index — one
    source of truth with the entity-catalog matcher), ties broken by
    label then token tuple."""
    from .semantics import build_phrase_index
    return build_phrase_index(
        (surface, label, (label,)) for surface, label in lexicon.items())


def scan_turn(text: str,
              matcher: dict) -> list[tuple[int, int, str, str]]:
    """Longest-match left-to-right scan of one turn: [(start_char,
    end_char, label, canonical_surface)] with end exclusive — the same
    claim discipline as detect_turn's catalog channel. The 4th element
    is the matched lexicon key (token join), NOT the raw slice, so
    occurrence counts always land under the lexicon surface."""
    toks = tokenize(text)
    lowers = [t[0].lower() for t in toks]
    out: list[tuple[int, int, str, str]] = []
    i = 0
    while i < len(toks):
        hit = None
        for cand, n, label in matcher.get(lowers[i], ()):
            if i + n <= len(toks) and tuple(lowers[i:i + n]) == cand:
                hit = (toks[i][1], toks[i + n - 1][2], label,
                       " ".join(cand), n)
                break
        if hit is None:
            i += 1
        else:
            out.append(hit[:4])
            i += hit[4]
    return out


class LearnedSeatPredictor:
    """Actor-pool stage: matcher built ONCE per actor from the
    broadcast lexicon; each batch of raw annotation files becomes
    predicted mention rows for its split."""

    def __init__(self, lexicon_ref, split: str = "test",
                 test_pct: int = TEST_PCT):
        import ray
        lex = ray.get(lexicon_ref) if not isinstance(lexicon_ref, dict) \
            else lexicon_ref
        self.matcher = build_surface_matcher(lex)
        self.want_test = split == "test"
        self.test_pct = test_pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        paths = batch.column("path").to_pylist()
        raws = batch.column("bytes").to_pylist()
        is_test = doc_is_test([_doc_of(p) for p in paths], self.test_pct)
        for path, raw, t in zip(paths, raws, is_test):
            if bool(t) != self.want_test:
                continue
            doc, _events, _args = parse_annotation(path, raw)
            for ti, (text, _off) in enumerate(_turn_spans(doc["content"])):
                for s, e, label, _key in scan_turn(text, self.matcher):
                    rows.append({
                        "conv_id": doc["doc_id"], "turn_idx": ti,
                        "start": s, "end": e, "label": label,
                        "clipped": False,
                    })
        if not rows:
            return MENTION_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=MENTION_SCHEMA)


def predict_mentions(ann_dir: str, lexicon: dict[str, str],
                     split: str = "test", test_pct: int = TEST_PCT,
                     concurrency=None):
    """Dataset of predicted mentions (scorer format) over one split."""
    import ray
    ref = ray.put(lexicon)
    return _read_raw(ann_dir).map_batches(
        LearnedSeatPredictor, fn_constructor_args=(ref, split, test_pct),
        batch_format="pyarrow",
        concurrency=concurrency or (1, _pool_width()))


def _filter_split(mentions_ds, test_pct: int, want_test: bool):
    def fn(batch: pa.Table) -> pa.Table:
        mask = doc_is_test(batch.column("conv_id").to_pylist(), test_pct)
        if not want_test:
            mask = ~mask
        return batch.filter(pa.array(mask))
    return mentions_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Argument seat v2 (r5): the surface lexicon alone tops out at span F1
# ~0.41 on the held-out split — arguments are where unseen surfaces
# dominate. Four train-learned additions close most of the measured
# gap (held-out span F1 0.409 -> 0.488; see BASELINE.md):
#   1. pattern channels (CVE/Version/Money/month-date Time regexes) —
#      train-split distant-supervision precisions 0.93/0.55/0.60/0.47,
#      labels definitional per regex;
#   2. a nugget-turn gate: predictions only in turns where the learned
#      NUGGET lexicon fires (arguments attach to events; measured gate
#      precision x recall trade is the best single lever, +0.03);
#   3. learned in-arg token probabilities P(token inside a gold arg):
#      maximal runs of p >= RUN_THETA tokens add unseen-surface recall,
#      and adjacent p >= EXT_THETA (or capitalized) tokens extend
#      matched spans toward the gold NP boundary (dice credit);
#   4. a nugget-proximity filter (predictions > PROX_CHARS from every
#      detected nugget are dropped).
# Operating points chosen on a TRAIN-INTERNAL dev split (hash buckets
# 20-35) — the held-out 20% is touched only by the final evaluation.
# ---------------------------------------------------------------------------

ARG_CHANNEL_LABELS = {"ch_cve": "CVE", "ch_version": "Version",
                      "ch_money": "Money", "ch_time": "Time"}
ARG_MIN_PROB = 0.1        # lexicon trigger-prob bar (dev-chosen)
ARG_RUN_THETA = 0.5       # in-arg prob for run prediction
ARG_EXT_THETA = 0.25      # in-arg prob for boundary extension
ARG_PROX_CHARS = 250      # max char distance to the nearest nugget
ARG_PIN_MIN_OCC = 3       # min train occurrences for a token prob


def scan_arg_patterns(text: str) -> list[tuple[int, int, str]]:
    """Regex argument channels over one turn: CVE / Version / Money
    single tokens and month [day] [year] Time runs — the argument
    types that generalize to unseen documents by pattern, not surface.
    Returns [(start, end, channel)]."""
    from . import lexicons as lx
    toks = tokenize(text)
    lowers = [t[0].lower() for t in toks]
    months = frozenset(lx.MONTHS)
    out: list[tuple[int, int, str]] = []
    n = len(toks)
    i = 0
    while i < n:
        tok, s, e = toks[i]
        c0 = tok[0] if tok else ""
        if c0 == "C" and lx.CVE_RE.match(tok):
            out.append((s, e, "ch_cve"))
        elif (c0 == "v" or c0.isdigit()) and lx.VERSION_RE.match(tok):
            out.append((s, e, "ch_version"))
        elif c0 == "$" and lx.MONEY_RE.match(tok):
            out.append((s, e, "ch_money"))
        elif lowers[i] in months:
            j = i + 1
            ln = 1
            if j < n and lx.NUMERIC_RE.match(toks[j][0]) \
                    and len(toks[j][0]) <= 2:
                ln += 1
                j += 1
            if j < n and lx.YEAR_RE.match(toks[j][0]):
                ln = j - i + 1
            if ln > 1:
                out.append((s, toks[i + ln - 1][2], "ch_time"))
                i += ln
                continue
        i += 1
    return out


_PIN_SCHEMA = pa.schema([
    ("token", pa.string()), ("occ", pa.int64()), ("ins", pa.int64()),
])


def learn_inarg_probs(ann_dir: str, test_pct: int = TEST_PCT,
                      min_occ: int = ARG_PIN_MIN_OCC) -> dict[str, float]:
    """P(token is inside a gold argument span), from TRAIN-split docs:
    one map_batches pass emitting vocabulary-sized (token, occ, ins)
    partials, combined driver-side (bounded broadcast class)."""

    def partial(batch: pa.Table) -> pa.Table:
        occ: dict[str, int] = {}
        ins: dict[str, int] = {}
        paths = batch.column("path").to_pylist()
        raws = batch.column("bytes").to_pylist()
        is_test = doc_is_test([_doc_of(p) for p in paths], test_pct)
        for path, raw, t in zip(paths, raws, is_test):
            if t:
                continue
            from .ingest import _rebase_to_turns
            doc, _events, args = parse_annotation(path, raw)
            gold = _rebase_to_turns(
                doc, ((a["start"], a["end"], {}) for a in args))
            by_turn: dict[int, list] = {}
            for g in gold:
                by_turn.setdefault(g["turn_idx"], []).append(g)
            for ti, (text, _off) in enumerate(_turn_spans(doc["content"])):
                gs = by_turn.get(ti, ())
                for tok, s, e in tokenize(text):
                    low = tok.lower()
                    occ[low] = occ.get(low, 0) + 1
                    if any(min(e, g["end"]) - max(s, g["start"]) > 0
                           for g in gs):
                        ins[low] = ins.get(low, 0) + 1
        ks = sorted(occ)
        return pa.table({
            "token": pa.array(ks, pa.string()),
            "occ": pa.array([occ[k] for k in ks], pa.int64()),
            "ins": pa.array([ins.get(k, 0) for k in ks], pa.int64()),
        })

    parts = _read_raw(ann_dir).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    tot = parts.groupby("token", as_index=False)[["occ", "ins"]].sum()
    tot = tot[tot["occ"] >= min_occ]
    return dict(zip(tot["token"], tot["ins"] / tot["occ"]))


def learn_argument_seat(ann_dir: str, test_pct: int = TEST_PCT) -> dict:
    """All broadcastable state for the v2 argument seat: the argument
    surface lexicon (trigger-prob >= ARG_MIN_PROB), the nugget GATE
    lexicon (the nugget seat's default operating point), and the
    in-arg token probabilities. Everything train-split-only."""
    return {
        "arg_lexicon": learn_filtered_lexicon(
            ann_dir, "argument", test_pct, min_prob=ARG_MIN_PROB),
        "gate_lexicon": learn_filtered_lexicon(
            ann_dir, "nugget", test_pct, min_prob=0.3),
        "pin": learn_inarg_probs(ann_dir, test_pct),
    }


def predict_turn_arguments(text: str, matcher: dict, gate_matcher: dict,
                           pin: dict[str, float]) -> list[tuple]:
    """v2 argument predictions for one turn: [] unless the nugget gate
    fires; lexicon longest-match + pattern channels + in-arg runs,
    nugget-proximity filtered, boundaries extended over adjacent
    high-P(in-arg) / capitalized tokens. Returns [(start, end,
    label)]."""
    import bisect

    nugs = scan_turn(text, gate_matcher)
    if not nugs:
        return []
    nug_pos = [(s + e) // 2 for s, e, _l, _k in nugs]
    toks = tokenize(text)
    starts = [t[1] for t in toks]
    spans = [(s, e, label)
             for s, e, label, _k in scan_turn(text, matcher)]
    claimed = [(s, e) for s, e, _ in spans]
    for s, e, ch in scan_arg_patterns(text):
        if ch not in ARG_CHANNEL_LABELS:
            continue
        if any(min(e, ce) - max(s, cs) > 0 for cs, ce in claimed):
            continue
        spans.append((s, e, ARG_CHANNEL_LABELS[ch]))
    claimed = [(s, e) for s, e, _ in spans]
    marks = [(s, e, pin.get(t.lower(), 0.0) >= ARG_RUN_THETA)
             for t, s, e in toks]
    i = 0
    while i < len(marks):
        if marks[i][2]:
            j = i
            while j < len(marks) and marks[j][2]:
                j += 1
            s, e = marks[i][0], marks[j - 1][1]
            if not any(min(e, ce) - max(s, cs) > 0
                       for cs, ce in claimed):
                spans.append((s, e, "Data"))
            i = j
        else:
            i += 1

    def attach(tok: str) -> bool:
        return pin.get(tok.lower(), 0.0) >= ARG_EXT_THETA or \
            (tok[:1].isupper() and tok[:1].isalpha())

    out = []
    for s, e, label in spans:
        if min(abs((s + e) // 2 - p) for p in nug_pos) > ARG_PROX_CHARS:
            continue
        i = bisect.bisect_left(starts, s)
        while i > 0 and (s - toks[i - 1][2]) <= 1 and attach(toks[i - 1][0]):
            s = toks[i - 1][1]
            i -= 1
        j = i
        while j < len(toks) and toks[j][2] <= e:
            j += 1
        while j < len(toks) and (toks[j][1] - e) <= 1 and attach(toks[j][0]):
            e = toks[j][2]
            j += 1
        out.append((s, e, label))
    return out


class ArgumentSeatPredictor:
    """Actor-pool stage for the v2 argument seat: matchers + in-arg
    probabilities built once per actor from the broadcast seat state;
    each batch of raw annotation files becomes predicted argument
    mention rows for its split."""

    def __init__(self, seat_ref, split: str = "test",
                 test_pct: int = TEST_PCT):
        import ray
        seat = ray.get(seat_ref) if not isinstance(seat_ref, dict) \
            else seat_ref
        self.matcher = build_surface_matcher(seat["arg_lexicon"])
        self.gate = build_surface_matcher(seat["gate_lexicon"])
        self.pin = seat["pin"]
        self.want_test = split == "test"
        self.test_pct = test_pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        paths = batch.column("path").to_pylist()
        raws = batch.column("bytes").to_pylist()
        is_test = doc_is_test([_doc_of(p) for p in paths], self.test_pct)
        for path, raw, t in zip(paths, raws, is_test):
            if bool(t) != self.want_test:
                continue
            doc, _events, _args = parse_annotation(path, raw)
            for ti, (text, _off) in enumerate(_turn_spans(doc["content"])):
                for s, e, label in predict_turn_arguments(
                        text, self.matcher, self.gate, self.pin):
                    rows.append({
                        "conv_id": doc["doc_id"], "turn_idx": ti,
                        "start": s, "end": e, "label": label,
                        "clipped": False,
                    })
        if not rows:
            return MENTION_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=MENTION_SCHEMA)


def predict_arguments(ann_dir: str, seat: dict, split: str = "test",
                      test_pct: int = TEST_PCT, concurrency=None):
    """Dataset of v2 argument predictions (scorer format)."""
    import ray
    ref = ray.put(seat)
    return _read_raw(ann_dir).map_batches(
        ArgumentSeatPredictor, fn_constructor_args=(ref, split, test_pct),
        batch_format="pyarrow",
        concurrency=concurrency or (1, _pool_width()))


def evaluate_argument_seat(ann_dir: str,
                           test_pct: int = TEST_PCT) -> dict:
    """Held-out evaluation of the v2 argument seat (same 80/20
    protocol as evaluate_learned_seat). Measured on the real reference
    corpus: span F1 0.488 / labeled 0.422 (vs the surface-lexicon
    seat's 0.409 / 0.374 — BASELINE.md 'Learned argument seat v2')."""
    from .ingest import gold_argument_mentions
    from .scoring import mention_prf, span_prf

    seat = learn_argument_seat(ann_dir, test_pct)
    pred = predict_arguments(ann_dir, seat, "test", test_pct) \
        .to_pandas().to_dict("records")
    gold = _filter_split(gold_argument_mentions(ann_dir), test_pct,
                         True).to_pandas()
    cols = ["conv_id", "turn_idx", "start", "end", "label"]
    gold = gold[cols].to_dict("records") if not gold.empty else []
    return {
        "lexicon_size": len(seat["arg_lexicon"]),
        "gold_mentions": len(gold),
        "pred_mentions": len(pred),
        "span": span_prf(gold, pred),
        "labeled": mention_prf(gold, pred, match_label=True),
    }


def evaluate_learned_seat(ann_dir: str, test_pct: int = TEST_PCT,
                          min_count: int = 1,
                          min_prob: float = 0.3) -> dict:
    """Train-on-train / score-on-held-out evaluation of the learned
    seat, for nuggets AND arguments. Returns per-task span-only and
    labeled P/R/F1 plus split sizes — the engine twin of running the
    reference's taggers with its -trainfile/-testfile protocol.
    Measured on the real reference corpus (1000 docs, 20% held out):
    nugget span F1 0.587 / labeled 0.583, argument span F1 0.409 /
    labeled 0.374, role labeled F1 0.348, at the default operating
    point (vs 0.277 zero-shot for the synthetic-tuned rule seat —
    BASELINE.md 'Real-corpus ingest bridge')."""
    from .ingest import gold_argument_mentions, gold_nugget_mentions
    from .scoring import mention_prf, span_prf

    out: dict[str, dict] = {}
    for what, gold_fn in (("nugget", gold_nugget_mentions),
                          ("argument", gold_argument_mentions),
                          ("role", gold_argument_mentions)):
        lex = learn_filtered_lexicon(ann_dir, what, test_pct,
                                     min_count, min_prob)
        pred = predict_mentions(ann_dir, lex, "test", test_pct) \
            .to_pandas().to_dict("records")
        gold = _filter_split(gold_fn(ann_dir), test_pct, True) \
            .to_pandas()
        if what == "role" and not gold.empty:
            gold = gold.assign(label=gold["role"])  # -options role mode
        cols = ["conv_id", "turn_idx", "start", "end", "label"]
        gold = (gold[cols].to_dict("records")
                if not gold.empty else [])  # empty ds drops its schema
        out[what] = {
            "lexicon_size": len(lex),
            "gold_mentions": len(gold),
            "pred_mentions": len(pred),
            "span": span_prf(gold, pred),
            "labeled": mention_prf(gold, pred, match_label=True),
        }
    return out
