"""Fault-tolerance contracts for the streaming executor paths.

At 100 TB on a real cluster, worker processes die mid-run (preemption,
OOM kills, node loss). The engine leans on Ray Data's default task/actor
retry for exactness-under-failure, and on fail-loud semantics for user
errors — these tests pin both behaviours so an upgrade or a config
change that silently weakens them is caught:

* a worker process dying mid-stream inside an actor-pool stage is
  retried and the pipeline's output is byte-identical to a clean run
  (Ray restarts the actor and re-runs the lost task);
* a user exception inside a batch UDF fails the run loudly — Ray Data's
  default ``max_errored_blocks = 0`` means no block is ever silently
  dropped (a "skip bad blocks" mode would be silent data loss at scale).

The KG pipeline's own crash-safety (idempotent per-group writes,
manifest resume) is covered in test_engine.py; these tests pin the
layer underneath it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


class _CrashOnce:
    """Actor-pool stage whose FIRST attempt anywhere in the pool kills
    its worker process the way the OOM killer would (``os._exit``, no
    Python-level exception). Coordination is an O_EXCL sentinel file,
    so exactly one attempt dies regardless of pool size."""

    def __init__(self, sentinel: str):
        self.sentinel = sentinel

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            fd = os.open(self.sentinel,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        doubled = pc.multiply(batch.column("x"), pa.scalar(2, pa.int64()))
        return batch.append_column("y", doubled)


def _run(ray, sentinel: str | None) -> pa.Table:
    tbl = pa.table({"x": np.arange(1000, dtype=np.int64)})
    ds = ray.data.from_arrow(tbl).repartition(8)
    if sentinel is None:
        out = ds.map_batches(
            lambda b: b.append_column(
                "y", pc.multiply(b.column("x"), pa.scalar(2, pa.int64()))),
            batch_format="pyarrow")
    else:
        out = ds.map_batches(_CrashOnce, fn_constructor_args=(sentinel,),
                             batch_format="pyarrow", concurrency=2)
    return pa.concat_tables(
        ray.get(out.materialize().to_arrow_refs())).sort_by("x")


def test_worker_death_mid_stream_is_retried_exactly(ray_session, tmp_path):
    """One worker process dies hard mid-stream; the stage output must
    still be byte-identical to a clean run."""
    sentinel = str(tmp_path / "crash_once")
    clean = _run(ray_session, None)
    faulted = _run(ray_session, sentinel)
    assert os.path.exists(sentinel), "fault was never injected"
    assert faulted.num_rows == 1000
    assert faulted.equals(clean.select(faulted.column_names)) or \
        faulted.select(sorted(faulted.column_names)).equals(
            clean.select(sorted(clean.column_names)))


def test_user_exception_fails_loud_not_silent(ray_session):
    """A user error in a batch UDF must abort the run (default
    max_errored_blocks = 0), never drop the offending block."""
    def bad(batch: pa.Table) -> pa.Table:
        raise ValueError("planted user error")

    ds = ray_session.data.range(100).map_batches(bad,
                                                 batch_format="pyarrow")
    with pytest.raises(Exception) as ei:
        ds.materialize()
    assert "planted user error" in str(ei.value)


def _crash_once_sum_kernel(sentinel: str):
    """Per-bucket kernel whose FIRST attempt anywhere kills its worker
    process hard (the OOM-killer shape) — exercises retry on the
    bucketed sort-exchange path every ops.bucketing.bucket_groupby
    operator rides, which is a different recovery surface than the
    actor-pool stage above (task-pool task on an AllToAll output)."""
    def kern(group: pa.Table) -> pa.Table:
        try:
            fd = os.open(sentinel,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        g = group.group_by(["k"]).aggregate([("v", "sum")])
        g = g.rename_columns(["k", "v"])
        return g.sort_by("k")
    return kern


def test_worker_death_in_shuffle_exchange_is_retried_exactly(
        ray_session, tmp_path):
    """One worker dies hard INSIDE the per-bucket kernel downstream of
    the sort exchange; Ray must replay the lost task (recovering its
    shuffle inputs as needed) and the keyed aggregate must stay
    byte-identical to a clean run."""
    from casie_ray.ops.bucketing import bucket_groupby, hash_bucket

    keys = np.arange(2000, dtype=np.int64) % 97
    vals = np.arange(2000, dtype=np.int64)
    tbl = pa.table({
        "k": keys, "v": vals,
        "bucket": pa.array(hash_bucket([keys.astype(np.uint64)]),
                           pa.int32()),
    })

    def run(sentinel):
        ds = ray_session.data.from_arrow(tbl).repartition(8)
        fn = _crash_once_sum_kernel(sentinel) if sentinel else \
            _crash_once_sum_kernel(os.devnull)   # devnull exists: no crash
        out = bucket_groupby(ds, fn)
        return pa.concat_tables(
            ray_session.get(out.materialize().to_arrow_refs())) \
            .sort_by([("k", "ascending")])

    clean = run(None)
    sentinel = str(tmp_path / "crash_once_shuffle")
    faulted = run(sentinel)
    assert os.path.exists(sentinel), "fault was never injected"
    assert faulted.num_rows == 97
    assert faulted.equals(clean)
