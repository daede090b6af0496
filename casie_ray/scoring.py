"""Evaluation kernels: dice-overlap mention matching and triple P/R.

Engine re-expression of the reference scorer (``code/score.py``):
``mention``-style greedy max-overlap matching with matched-prediction
deletion (score.py:154-250, del at :196/:217) for nugget/argument F1,
plus exact-set P/R over (subj, pred, obj) triples — the headline gate
(BASELINE.json: triple P/R >= 0.95 vs the reference extractor).
"""

from __future__ import annotations

from collections import defaultdict


def _dice(a_start, a_end, b_start, b_end) -> float:
    inter = max(0, min(a_end, b_end) - max(a_start, b_start))
    la, lb = a_end - a_start, b_end - b_start
    return 2.0 * inter / (la + lb) if (la + lb) else 0.0


def mention_prf(gold: list[dict], pred: list[dict],
                match_label: bool = True) -> dict:
    """Greedy max-dice bipartite matching per (conv_id, turn_idx) group
    with deletion of matched predictions (cf. score.py:181-217).

    Mentions: {conv_id, turn_idx, start, end, label}. A pair matches when
    dice > 0 and (labels equal, if match_label).
    """
    by_key_g = defaultdict(list)
    by_key_p = defaultdict(list)
    for m in gold:
        by_key_g[(m["conv_id"], m["turn_idx"])].append(m)
    for m in pred:
        by_key_p[(m["conv_id"], m["turn_idx"])].append(m)
    tp = 0.0
    for key, gs in by_key_g.items():
        ps = list(by_key_p.get(key, []))
        for g in sorted(gs, key=lambda m: (m["start"], m["end"])):
            best, best_d = None, 0.0
            for i, p in enumerate(ps):
                if match_label and p["label"] != g["label"]:
                    continue
                d = _dice(g["start"], g["end"], p["start"], p["end"])
                if d > best_d:
                    best, best_d = i, d
            if best is not None and best_d > 0.0:
                tp += best_d  # dice credit, as in the reference scorer
                del ps[best]  # matched-pred deletion (score.py:196)
    n_gold, n_pred = len(gold), len(pred)
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "n_gold": n_gold, "n_pred": n_pred, "tp": tp}


def span_prf(gold: list[dict], pred: list[dict]) -> dict:
    """Span-only scorer (the reference's ``-options span`` mode,
    score.py:106-151): label-AGNOSTIC greedy matching per
    (conv_id, turn_idx) group where each gold picks the prediction
    with the maximum RAW overlap (ties -> first/lowest index, like the
    reference's strict ``>`` scan), matched predictions are deleted,
    and the credit is the dice of the matched pair. Differs from
    ``mention_prf(match_label=False)`` in the selection criterion:
    raw-overlap argmax can pick a different (longer) prediction than
    dice argmax, exactly as the reference's token-intersect pick does.
    """
    by_key_g = defaultdict(list)
    by_key_p = defaultdict(list)
    for m in gold:
        by_key_g[(m["conv_id"], m["turn_idx"])].append(m)
    for m in pred:
        by_key_p[(m["conv_id"], m["turn_idx"])].append(m)
    tp = 0.0
    for key, gs in by_key_g.items():
        ps = list(by_key_p.get(key, []))
        for g in sorted(gs, key=lambda m: (m["start"], m["end"])):
            best, best_ov = None, 0
            for i, p in enumerate(ps):
                ov = max(0, min(g["end"], p["end"])
                         - max(g["start"], p["start"]))
                if ov > best_ov:
                    best, best_ov = i, ov
            if best is not None:
                p = ps.pop(best)          # matched-pred deletion
                tp += _dice(g["start"], g["end"], p["start"], p["end"])
    n_gold, n_pred = len(gold), len(pred)
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "n_gold": n_gold, "n_pred": n_pred, "tp": tp}


def confusion_matrix(gold: list[dict], pred: list[dict],
                     labels: list[str] | None = None) -> dict:
    """Label confusion matrix over mention sets (A6; the span-based
    re-expression of the reference's BIO-token confusion_label,
    score.py:253-341): greedy max-dice matching per (conv_id, turn_idx)
    WITHOUT requiring label equality, so cross-label confusions are
    counted; unmatched gold rows fall in the 'O' column, unmatched
    predictions in the 'O' row. Returns {gold_label: {pred_label: n}}
    including the 'O' row/column."""
    if labels is None:
        labels = sorted({m["label"] for m in gold}
                        | {m["label"] for m in pred})
    axes = list(labels) + ["O"]
    cfm = {g: {p: 0 for p in axes} for g in axes}
    by_key_g = defaultdict(list)
    by_key_p = defaultdict(list)
    for m in gold:
        by_key_g[(m["conv_id"], m["turn_idx"])].append(m)
    for m in pred:
        by_key_p[(m["conv_id"], m["turn_idx"])].append(m)
    matched_pred: set[int] = set()
    for key in sorted(by_key_g):
        ps = by_key_p.get(key, [])
        avail = list(range(len(ps)))
        for g in sorted(by_key_g[key], key=lambda m: (m["start"], m["end"])):
            best, best_d = None, 0.0
            for k, i in enumerate(avail):
                d = _dice(g["start"], g["end"],
                          ps[i]["start"], ps[i]["end"])
                if d > best_d:
                    best, best_d = k, d
            if best is not None and best_d > 0.0:
                i = avail.pop(best)       # matched-pred deletion
                matched_pred.add(id(ps[i]))
                cfm[g["label"]][ps[i]["label"]] += 1
            else:
                cfm[g["label"]]["O"] += 1
    for m in pred:
        if id(m) not in matched_pred:
            cfm["O"][m["label"]] += 1
    return cfm


def format_confusion(cfm: dict) -> str:
    """Tab-separated rendering with row totals (score.py:285-296)."""
    keys = list(cfm)
    lines = ["\t" + "\t".join(keys) + "\ttotal"]
    for g in keys:
        row = [str(cfm[g][p]) for p in keys]
        lines.append(g + "\t" + "\t".join(row) + "\t"
                     + str(sum(cfm[g].values())))
    return "\n".join(lines)


def triple_prf(gold_triples, pred_triples) -> dict:
    """Exact-set P/R/F1 over (subj, pred, obj) keys. Accepts iterables of
    dicts or (s, p, o) tuples, or pandas DataFrames with those columns."""
    def keys(x):
        if hasattr(x, "itertuples"):  # DataFrame
            return {(r.subj, r.pred, r.obj) for r in x.itertuples()}
        out = set()
        for t in x:
            if isinstance(t, dict):
                out.add((t["subj"], t["pred"], t["obj"]))
            else:
                out.add(tuple(t[:3]))
        return out
    g, p = keys(gold_triples), keys(pred_triples)
    inter = len(g & p)
    prec = inter / len(p) if p else 0.0
    rec = inter / len(g) if g else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "n_gold": len(g), "n_pred": len(p), "n_match": inter}
