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
