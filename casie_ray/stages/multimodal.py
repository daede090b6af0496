"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus typed metadata;
decode / feature-extraction runs as an actor-pool ``map_batches`` stage
with SMALL batches (payloads are large — batch_size x concurrency must
fit the worker heap; the object store spills the rest).

The actual codecs (PIL / ffmpeg / torchaudio) are NOT in this
environment, so the decode kernel is stubbed: ``strict=True`` raises
NotImplementedError at the exact seam a real decoder would occupy;
the default is a deterministic fake decode (pure function of the
payload bytes) so the Ray-side plumbing — schema, actor signature,
batch sizing, output layout — is real and testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),          # image | audio | video
    ("payload", pa.binary()),             # opaque encoded bytes
    ("source", pa.string()),
])

FEATURE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),
    ("n_bytes", pa.int64()),
    ("checksum", pa.int64()),
    ("width", pa.int32()),                # fake-decoded dimensions
    ("height", pa.int32()),
    ("mean_luma", pa.float32()),
    ("embedding", pa.list_(pa.float32())),
])

# recommended map_batches sizing for large binary payloads
MEDIA_BATCH_SIZE = 16
EMBED_DIM = 16


class MediaDecoder:
    """Actor-pool decode/feature stage:
    map_batches(MediaDecoder, concurrency=(a, b),
                batch_size=MEDIA_BATCH_SIZE, batch_format="pyarrow").

    A real build loads the codec/model once here in ``__init__``
    (exactly the T1-style stateful-stage seat, SURVEY §2.3)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        self.codec = None  # real build: load PIL / ffmpeg / model here

    def _decode(self, payload: bytes) -> tuple[int, int, float]:
        if self.strict:
            raise NotImplementedError(
                "media codecs unavailable in this environment; "
                "plug a real decoder here")
        # deterministic fake decode: dims and luma from the digest
        d = hashlib.blake2b(payload or b"", digest_size=16).digest()
        width = 64 + d[0] * 8
        height = 64 + d[1] * 8
        mean_luma = d[2] / 255.0
        return width, height, mean_luma

    def _embed(self, payload: bytes) -> np.ndarray:
        d = hashlib.blake2b(payload or b"", digest_size=2 * EMBED_DIM,
                            person=b"mmemb").digest()
        v = np.frombuffer(d, dtype=np.uint8)[:EMBED_DIM].astype(np.float32)
        v = v - v.mean()
        n = float(np.linalg.norm(v))
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = []
        for mid, mtype, p in zip(ids, types, payloads):
            p = p or b""
            w, h, luma = self._decode(p)
            rows.append({
                "media_id": mid, "media_type": mtype,
                "n_bytes": len(p),
                # 60-bit sha256 prefix: DuckDB reproduces this exactly
                # (CAST('0x'||substring(sha256(payload),1,15) AS BIGINT)),
                # making the metadata half of this stage oracle-checkable
                "checksum": int(hashlib.sha256(p).hexdigest()[:15], 16),
                "width": w, "height": h, "mean_luma": luma,
                "embedding": self._embed(p).tolist(),
            })
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


def documents_as_media(sf_dir: str):
    """Wrap the documents table as a media table (text bytes standing in
    for encoded payloads) — the fixture for the decode plumbing."""
    import ray.data

    def wrap(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("doc_id").cast(pa.int64()),
            "media_type": pa.array(
                [("image", "audio", "video")[i % 3]
                 for i in batch.column("doc_id").to_pylist()], pa.string()),
            "payload": pa.array([(t or "").encode() for t in texts],
                                pa.binary()),
            "source": batch.column("source") if "source" in
            batch.column_names else pa.array(["doc"] * n, pa.string()),
        }).cast(MEDIA_SCHEMA)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    return ds.map_batches(wrap, batch_format="pyarrow")


def media_features(sf_dir: str, concurrency=2):
    """documents -> media payloads -> actor-pool decode/features."""
    ds = documents_as_media(sf_dir)
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE,
                          concurrency=concurrency)


def media_dedup(sf_dir: str):
    """Exact payload dedup over the media table: one row per distinct
    payload checksum (min media_id + copy count). The multimodal twin of
    ops.dedup.exact_dedup: per-batch combiner over the 60-bit sha256
    prefix, bucketed exchange, vectorized per-bucket reduce — payload
    BYTES never cross the exchange, only (checksum, id, count) rows."""
    import numpy as np

    from ..ops.bucketing import bucket_groupby, hash_bucket

    def partial(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        sums = np.fromiter(
            (int(hashlib.sha256(p or b"").hexdigest()[:15], 16)
             for p in payloads), dtype=np.int64, count=len(payloads))
        t = pa.table({
            "checksum": pa.array(sums, pa.int64()),
            "media_id": batch.column("media_id"),
            "n_copies": pa.array(np.ones(len(sums), np.int64)),
        })
        g = t.group_by(["checksum"]).aggregate(
            [("media_id", "min"), ("n_copies", "sum")])
        g = g.rename_columns(["checksum", "media_id", "n_copies"])
        return g.append_column(
            "bucket", pa.array(hash_bucket([g.column("checksum")]),
                               pa.int32()))

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by(["checksum"]).aggregate(
            [("media_id", "min"), ("n_copies", "sum")])
        return g.rename_columns(["checksum", "media_id", "n_copies"])

    ds = documents_as_media(sf_dir).map_batches(partial,
                                                batch_format="pyarrow")
    return bucket_groupby(ds, final)
