"""Multimodal plumbing tests: opaque-binary payload schema, actor-pool
decode stage, deterministic fake decode, strict NotImplementedError seam."""

from __future__ import annotations

import pyarrow as pa
import pytest

from casie_ray.stages.multimodal import (
    FEATURE_SCHEMA, MEDIA_SCHEMA, MediaDecoder, media_features,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch():
    return pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "audio"], pa.string()),
        "payload": pa.array([b"\x89PNG fake", b""], pa.binary()),
        "source": pa.array(["s", "s"], pa.string()),
    }).cast(MEDIA_SCHEMA)


def test_decoder_deterministic():
    out1 = MediaDecoder()(_batch())
    out2 = MediaDecoder()(_batch())
    assert out1.schema.equals(FEATURE_SCHEMA)
    assert out1.equals(out2)
    assert out1.column("n_bytes").to_pylist() == [9, 0]


def test_decoder_strict_raises():
    with pytest.raises(NotImplementedError):
        MediaDecoder(strict=True)(_batch())


def test_media_pipeline_end_to_end(ray_session):
    ds = media_features(SF_DIR)
    tbl = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert tbl.schema.equals(FEATURE_SCHEMA)
    assert tbl.num_rows == 500  # one row per sf0.001 document
    assert set(tbl.column("media_type").to_pylist()) == {
        "image", "audio", "video"}
    embs = tbl.column("embedding").to_pylist()
    assert all(len(e) == 16 for e in embs)
