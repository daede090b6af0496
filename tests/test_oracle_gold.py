"""Oracle-vs-planted-gold sanity (SURVEY §5.2 tier 2: nugget + argument
F1 per the CASIE mention scorer, score.py:154-250)."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq

from casie_ray.oracle import extract_events
from casie_ray.scoring import mention_prf


def _gold(smoke_corpus):
    return pa.concat_tables(
        [pq.read_table(f)
         for f in sorted(glob.glob(f"{smoke_corpus}/gold_events/*.parquet"))]
    ).to_pylist()


def test_oracle_matches_planted_gold(smoke_corpus):
    gold = _gold(smoke_corpus)
    gold_nuggets = [{"conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
                     "start": g["nugget"]["start"], "end": g["nugget"]["end"],
                     "label": g["subtype"]} for g in gold]
    gold_args = [{"conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
                  "start": a["start"], "end": a["end"], "label": a["type"]}
                 for g in gold for a in g["arguments"]]
    gold_roles = [{"conv_id": g["conv_id"], "turn_idx": g["turn_idx"],
                   "start": a["start"], "end": a["end"], "label": a["role"]}
                  for g in gold for a in g["arguments"]]

    pred_nuggets, pred_args, pred_roles = [], [], []
    realis_ok = realis_n = 0
    gold_realis = {g["event_id"]: g["realis"] for g in gold}
    for _conv, events in extract_events(smoke_corpus):
        for e in events:
            pred_nuggets.append(
                {"conv_id": e.conv_id, "turn_idx": e.turn_idx,
                 "start": e.nugget_start, "end": e.nugget_end,
                 "label": e.etype})
            if e.event_id in gold_realis:
                realis_n += 1
                realis_ok += int(gold_realis[e.event_id] == e.realis)
            for m in e.args:
                base = {"conv_id": e.conv_id, "turn_idx": e.turn_idx,
                        "start": m.start, "end": m.end}
                pred_args.append({**base, "label": m.argtype})
                pred_roles.append({**base, "label": m.role})

    nug = mention_prf(gold_nuggets, pred_nuggets)
    arg = mention_prf(gold_args, pred_args)
    rol = mention_prf(gold_roles, pred_roles)
    assert nug["f1"] >= 0.95, nug
    assert arg["f1"] >= 0.95, arg
    assert rol["f1"] >= 0.95, rol
    assert realis_n > 0 and realis_ok / realis_n >= 0.95


def test_oracle_triples_nonempty_and_deduped(oracle_triples):
    df = oracle_triples
    assert len(df) > 100
    keys = df[["subj", "pred", "obj"]].apply(tuple, axis=1)
    assert keys.is_unique
    assert (df["count"] >= 1).all()
    assert {"event-type", "has-realis", "targets"} <= set(df["pred"])
