"""Training-preparation operators.

- A1 class-frequency weights (ref role_phrase.py:270-281): label counts
  over the extracted event stream -> inverse-frequency class weights,
  with the reference's 0.001 floor for labels absent from the corpus.
- O5 deterministic train/test split (ref nug_arg_detection.py:230-278):
  the reference splits by externally-provided file lists; the engine's
  re-expression is a content-derived hash split on the grouping key
  (conv_id), which gives the same property the file lists provide —
  every turn of a conversation lands on one side, reproducibly —
  without shipping a list. FNV-1a mod 100 so the DuckDB oracle can
  reproduce the assignment bit-for-bit.

Both are single-pass streaming aggregates: per-batch combiners, one
tiny exchange (label cardinality / conv cardinality), no driver loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bucketing import bucket_groupby, fnv1a_hashes, hash_bucket

TEST_PCT = 20


def class_weights(events_ds, label_vocab: tuple[str, ...]):
    """(label, n, weight) for every label in ``label_vocab``: weight =
    1/n, or the reference's 0.001 floor when the label never occurs.
    ``events_ds`` must have an ``etype`` column."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["etype"]).group_by(["etype"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["label", "n"])

    counts = events_ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["label"]).aggregate([("n", "sum")])
        have = dict(zip(g.column("label").to_pylist(),
                        g.column("n_sum").to_pylist()))
        labels = sorted(label_vocab)
        ns = [int(have.get(lb, 0)) for lb in labels]
        return pa.table({
            "label": pa.array(labels, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "weight": pa.array(
                [1.0 / n if n else 0.001 for n in ns], pa.float64()),
        })

    # label cardinality is tiny (the event-type vocabulary): one block
    return counts.repartition(1).map_batches(final, batch_format="pyarrow",
                                             batch_size=None)


def split_assignment(transcripts_ds, test_pct: int = TEST_PCT):
    """(conv_id, split) — one row per conversation, split='test' iff
    FNV-1a(conv_id) % 100 < test_pct. Per-batch distinct + bucketed
    global distinct, then a vectorized hash; deterministic and
    re-derivable anywhere (including SQL)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = pc.unique(batch.column("conv_id").combine_chunks())
        h = fnv1a_hashes(u.to_pylist())
        return pa.table({
            "conv_id": u,
            "bucket": pa.array(hash_bucket([h]), pa.int32()),
        })

    def bucket_distinct(group: pa.Table) -> pa.Table:
        g = group.select(["conv_id"]).group_by(["conv_id"]).aggregate([])
        convs = g.column("conv_id").to_pylist()
        h = fnv1a_hashes(convs) % np.uint64(100)
        split = np.where(h < test_pct, "test", "train")
        return pa.table({
            "conv_id": pa.array(convs, pa.string()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    ds = transcripts_ds.map_batches(partial, batch_format="pyarrow")
    return bucket_groupby(ds, bucket_distinct)
