"""User-facing query runner CLI.

The engine's operator surface is registered in ``__ray_entry__.queries()``
(see COVERAGE.md for the full inventory). This CLI makes every one of them
runnable from a shell — the ops-library twin of the reference's
script-per-task entry points, without writing Python:

    python -m casie_ray.cli list
    python -m casie_ray.cli run doc_bm25_topk --sf-dir /root/testdata/sf0.01
    python -m casie_ray.cli run kg_triangles --out /tmp/tri.parquet
    python -m casie_ray.cli ingest /path/to/annotation /tmp/corpus
    python -m casie_ray.cli gold /path/to/annotation --out gold.parquet
    python -m casie_ray.cli learn /path/to/annotation

``run`` executes the named pipeline over the given table directory and
either writes the result to parquet (--out) or prints row count + head.
``ingest`` bridges a reference-format annotation-JSON directory to the
engine corpus layout (then ``python -m casie_ray.pipelines.kg`` runs
over it); ``gold`` projects the annotation nuggets to the scorer's
mention table (``python -m casie_ray.score --gold ...``); ``learn``
trains the weak-supervision lexicon seat on an 80/20 doc-id split and
prints held-out span/labeled P/R/F1 (the reference's -trainfile /
-testfile protocol, casie_ray/learned.py).
Owns the Ray session (guarded init, shutdown on exit) — library code
never does (driver contract).
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _queries():
    # __ray_entry__ lives at the repo root, importable from cwd or the
    # package parent (same resolution the driver uses)
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __ray_entry__ as entry
    return entry.queries()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="casie_ray.cli",
        description="Run any registered engine pipeline over a table dir")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered query names")
    rp = sub.add_parser("run", help="run one query")
    rp.add_argument("name")
    rp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    rp.add_argument("--out", default=None,
                    help="write result parquet here instead of printing")
    rp.add_argument("--num-cpus", type=int, default=None)
    rp.add_argument("--stats", action="store_true",
                    help="print Ray Data execution stats after the run")
    ip = sub.add_parser(
        "ingest", help="annotation-JSON dir -> engine corpus layout")
    ip.add_argument("ann_dir")
    ip.add_argument("corpus_dir")
    gp = sub.add_parser(
        "gold", help="annotation-JSON dir -> scorer mention table")
    gp.add_argument("ann_dir")
    gp.add_argument("--out", required=True)
    gp.add_argument("--what", choices=["nugget", "argument"],
                    default="nugget")
    lp = sub.add_parser(
        "learn", help="train + evaluate the learned lexicon seat")
    lp.add_argument("ann_dir")
    lp.add_argument("--min-prob", type=float, default=0.3,
                    help="trigger-probability precision filter")
    lp.add_argument("--min-count", type=int, default=1)
    lp.add_argument("--args-v2", action="store_true",
                    help="evaluate the v2 argument seat (pattern "
                         "channels + nugget gate + in-arg probs)")
    lp.add_argument("--args-v3", action="store_true",
                    help="evaluate the v3 reranked argument seat "
                         "(v2 + learned per-span logistic filter, "
                         "nested dev protocol)")
    args = ap.parse_args(argv)

    if args.cmd in ("ingest", "gold", "learn"):
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", include_dashboard=False)
        try:
            if args.cmd == "ingest":
                from .ingest import annotations_to_corpus
                print(annotations_to_corpus(args.ann_dir,
                                            args.corpus_dir))
            elif args.cmd == "learn":
                import json as _json

                if args.args_v3:
                    from .learned import evaluate_argument_seat_v3
                    res = evaluate_argument_seat_v3(args.ann_dir)
                elif args.args_v2:
                    from .learned import evaluate_argument_seat
                    res = evaluate_argument_seat(args.ann_dir)
                else:
                    from .learned import evaluate_learned_seat
                    res = evaluate_learned_seat(
                        args.ann_dir, min_count=args.min_count,
                        min_prob=args.min_prob)
                print(_json.dumps(res, indent=1))
            else:
                import pyarrow as pa

                from .ingest import (gold_argument_mentions,
                                     gold_nugget_mentions)
                fn = (gold_nugget_mentions if args.what == "nugget"
                      else gold_argument_mentions)
                t = pa.concat_tables(
                    fn(args.ann_dir)
                    .iter_batches(batch_format="pyarrow"))
                import pyarrow.parquet as pq
                pq.write_table(t, args.out)
                print(f"gold {args.what}: {t.num_rows} mentions -> "
                      f"{args.out}")
            return 0
        finally:
            if owns:
                ray.shutdown()

    qs = _queries()
    if args.cmd == "list":
        for name in sorted(qs):
            print(name)
        return 0

    if args.name not in qs:
        print(f"unknown query {args.name!r}; try: python -m casie_ray.cli "
              "list", file=sys.stderr)
        return 2

    import ray
    owns = not ray.is_initialized()
    if owns:
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, **kw)
    try:
        result = qs[args.name](args.sf_dir)
        if hasattr(result, "to_pandas"):
            df = result.to_pandas()
        else:
            df = result
        if args.stats and hasattr(result, "stats"):
            # per-stage wall/CPU/rows after consumption — the tuning
            # loop: read this, adjust batch/concurrency, re-run
            print(result.stats(), file=sys.stderr)
        if args.out:
            import pyarrow as pa
            import pyarrow.parquet as pq
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           args.out)
            print(f"{args.name}: {len(df)} rows -> {args.out}")
        else:
            print(f"{args.name}: {len(df)} rows")
            print(df.head(10).to_string())
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
