"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    """Deterministic sf0.001 synthetic corpus, generated once per session."""
    from casie_ray import synth
    out = str(tmp_path_factory.mktemp("corpus") / "sf0.001")
    # small shards so the resumable-group tests get >=3 input files
    synth.generate(0.001, out, seed=42, shard_rows=1200)
    return out


@pytest.fixture(scope="session")
def oracle_triples(smoke_corpus):
    from casie_ray.oracle import extract_triples
    return extract_triples(smoke_corpus)
