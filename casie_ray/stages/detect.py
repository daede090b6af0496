"""Detection stage: the engine seat of CASIE's nugget/argument taggers
(T1/T2, nug_arg_detection.py:111-208) — a stateful actor-pool
``map_batches`` class. The catalog (broadcast via ``ray.put``, the small
side of the linker J5/T7) and the compiled lexicon tables are built ONCE
per actor in ``__init__``; ``__call__`` processes one Arrow batch of
transcript turns and appends the detection columns (schema.DETECTION_*).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import (
    CAND_T, DETECTION_FIELDS, MENTION_T, TRIGGER_T, detection_to_row,
)
from ..semantics import build_catalog_matcher, build_fuzzy_index, detect_turn


class DetectTagger:
    """map_batches(DetectTagger, fn_constructor_args=(entities_ref,),
    batch_format="pyarrow", concurrency=..)."""

    def __init__(self, entities_ref):
        import ray
        entities = ray.get(entities_ref) if not isinstance(entities_ref, (list, tuple)) \
            else entities_ref
        self.catalog = build_catalog_matcher(entities)
        # blocked fuzzy-link candidate index (J5): built once per actor
        self.fuzzy = build_fuzzy_index(entities)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        starts, flags, trigs, ments, cands = [], [], [], [], []
        for text in texts:
            row = detection_to_row(detect_turn(text or "", self.catalog,
                                               self.fuzzy))
            starts.append(row["token_starts"])
            flags.append(row["token_flags"])
            trigs.append(row["triggers"])
            ments.append(row["mentions"])
            cands.append(row["cand_tokens"])
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "text": batch.column("text"),
            "ts": batch.column("ts"),
            "token_starts": pa.array(starts, type=pa.list_(pa.int32())),
            "token_flags": pa.array(flags, type=pa.list_(pa.uint8())),
            "triggers": pa.array(trigs, type=pa.list_(TRIGGER_T)),
            "mentions": pa.array(ments, type=pa.list_(MENTION_T)),
            "cand_tokens": pa.array(cands, type=pa.list_(CAND_T)),
        }
        return pa.table({name: cols[name] for name, _ in DETECTION_FIELDS})


class ShardExtractor(DetectTagger):
    """Zero-shuffle extraction for conv-partitioned input (the corpus
    layout guarantee: conversations never span shards — see
    state/manifest.py): detection + doc logic + role/realis + coref run
    per conversation inside one whole-shard table, emitting event rows
    directly. The groupby(conv_id) shuffle path (extract_events_group)
    remains the fallback for inputs with arbitrary row layout."""

    def extract_turns(self, batch: pa.Table) -> pa.Table:
        """All conversations in `batch` must be complete."""
        from ..schema import EVENT_SCHEMA
        from ..semantics import detect_turn as _detect
        from ..stages.doclogic import events_from_detections

        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        tss = batch.column("ts").to_pylist()
        by_conv: dict[str, list[int]] = {}
        for k, cid in enumerate(conv_ids):
            by_conv.setdefault(cid, []).append(k)
        out_rows: list[dict] = []
        for cid in sorted(by_conv):
            idxs = sorted(by_conv[cid], key=lambda k: turn_idxs[k])
            detections = {
                turn_idxs[k]: _detect(texts[k] or "", self.catalog,
                                      self.fuzzy)
                for k in idxs
            }
            ts_of = {turn_idxs[k]: tss[k] for k in idxs}
            out_rows.extend(events_from_detections(cid, detections, ts_of))
        return pa.Table.from_pylist(out_rows, schema=EVENT_SCHEMA) \
            if out_rows else EVENT_SCHEMA.empty_table()

    __call__ = extract_turns


class ShardFileExtractor(ShardExtractor):
    """File-granular zero-shuffle extraction: the actor pool consumes a
    Dataset of shard PATHS and reads each shard itself (column-pruned),
    so conversation/shard alignment is exact by construction — Ray block
    planning can otherwise split or merge file blocks. This is the
    engine's hot path; use as
    ``from_items(files).map_batches(ShardFileExtractor, batch_size=1,
    concurrency=(a, b))``."""

    COLUMNS = ["conv_id", "turn_idx", "text", "ts"]

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        import pyarrow.parquet as pq
        from ..schema import EVENT_SCHEMA

        out = [EVENT_SCHEMA.empty_table()]
        for path in batch.column("item").to_pylist():
            tbl = pq.read_table(path, columns=self.COLUMNS)
            out.append(self.extract_turns(tbl))
        return pa.concat_tables(out)
