"""User-facing scoring CLI over arbitrary prediction tables.

The engine twin of the reference's argparse scorer
(``/root/reference/code/score.py:573-577``: ``-predictedfile``,
``-options {nugget,argument,role}``, ``-metric {f1,confusion_*}``)
re-expressed over parquet tables instead of CoNLL text dumps:

    python -m casie_ray.score --gold gold.parquet --pred pred.parquet \
        --options mention --metric f1 [--no-label-match]
    python -m casie_ray.score --gold g.parquet --pred p.parquet \
        --options triple --metric f1
    python -m casie_ray.score ... --options mention --metric confusion

Mention tables need columns (conv_id, turn_idx, start, end, label);
triple tables need (subj, pred, obj). The kernels are the tested
library functions in :mod:`casie_ray.scoring` (greedy max-dice
matching with matched-prediction deletion, exact-set triple P/R).

Scale note: evaluation tables are gold-annotation-sized (thousands of
rows), so the CLI scores driver-side; at corpus scale the same kernels
ride a ``groupby(conv_id).map_groups`` — matching never crosses a
(conv_id, turn_idx) group, which is exactly the engine's standard
per-conversation partitioning.
"""

from __future__ import annotations

import argparse
import json
import sys


def _read_mentions(path: str) -> list[dict]:
    import pyarrow.parquet as pq
    cols = ["conv_id", "turn_idx", "start", "end", "label"]
    t = pq.read_table(path)
    missing = [c for c in cols if c not in t.column_names]
    if missing:
        raise SystemExit(f"{path}: missing mention columns {missing} "
                         f"(have {t.column_names})")
    return t.select(cols).to_pylist()


def _read_triples(path: str):
    import pyarrow.parquet as pq
    cols = ["subj", "pred", "obj"]
    t = pq.read_table(path)
    missing = [c for c in cols if c not in t.column_names]
    if missing:
        raise SystemExit(f"{path}: missing triple columns {missing} "
                         f"(have {t.column_names})")
    return t.select(cols).to_pylist()


def main(argv: list[str] | None = None) -> int:
    from .scoring import (
        confusion_matrix, format_confusion, mention_prf, span_prf,
        triple_prf,
    )

    ap = argparse.ArgumentParser(
        prog="python -m casie_ray.score",
        description="Score prediction tables against gold tables "
                    "(parquet in, JSON/ table out).")
    ap.add_argument("--gold", required=True, help="gold parquet table")
    ap.add_argument("--pred", required=True,
                    help="predicted parquet table")
    ap.add_argument("--options", choices=["mention", "span", "triple"],
                    default="mention",
                    help="mention = labeled span matching (nugget/"
                         "argument/role tables all use this shape); "
                         "span = label-agnostic raw-overlap matching "
                         "(the reference's -options span mode); "
                         "triple = exact-set (subj, pred, obj)")
    ap.add_argument("--metric", choices=["f1", "confusion"],
                    default="f1")
    ap.add_argument("--no-label-match", action="store_true",
                    help="f1 only: count cross-label span overlaps as "
                         "matches (the reference scorer's -O flag "
                         "analogue)")
    args = ap.parse_args(argv)

    if args.options == "triple":
        if args.metric != "f1":
            raise SystemExit("--options triple supports --metric f1 only")
        out = triple_prf(_read_triples(args.gold),
                         _read_triples(args.pred))
        print(json.dumps(out))
        return 0

    gold = _read_mentions(args.gold)
    pred = _read_mentions(args.pred)
    if args.options == "span":
        if args.metric != "f1":
            raise SystemExit("--options span supports --metric f1 only")
        print(json.dumps(span_prf(gold, pred)))
        return 0
    if args.metric == "f1":
        out = mention_prf(gold, pred,
                          match_label=not args.no_label_match)
        print(json.dumps(out))
    else:
        print(format_confusion(confusion_matrix(gold, pred)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
