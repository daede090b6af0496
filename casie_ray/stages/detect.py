"""Detection stage: the engine seat of CASIE's nugget/argument taggers
(T1/T2, nug_arg_detection.py:111-208) — a stateful actor-pool
``map_batches`` class. The catalog (broadcast via ``ray.put``, the small
side of the linker J5/T7) and the compiled lexicon tables are built ONCE
per actor in ``__init__``; ``__call__`` processes one Arrow batch of
transcript turns and appends the detection columns (schema.DETECTION_*).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import DETECTION_FIELDS, MENTION_T, TRIGGER_T, detection_to_row
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
        starts, flags, trigs, ments = [], [], [], []
        for text in texts:
            row = detection_to_row(detect_turn(text or "", self.catalog,
                                               self.fuzzy))
            starts.append(row["token_starts"])
            flags.append(row["token_flags"])
            trigs.append(row["triggers"])
            ments.append(row["mentions"])
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "text": batch.column("text"),
            "ts": batch.column("ts"),
            "token_starts": pa.array(starts, type=pa.list_(pa.int32())),
            "token_flags": pa.array(flags, type=pa.list_(pa.uint8())),
            "triggers": pa.array(trigs, type=pa.list_(TRIGGER_T)),
            "mentions": pa.array(ments, type=pa.list_(MENTION_T)),
        }
        return pa.table({name: cols[name] for name, _ in DETECTION_FIELDS})
