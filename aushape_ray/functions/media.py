"""Multimodal (image/audio/video) plumbing with a stubbed decoder.

Real Ray-side mechanics — opaque `binary` payload column with typed
metadata, actor-pool decode stage, small batch sizes for large payloads —
with the codec itself stubbed (no imaging/audio libs in this container):
`FakeDecoder` derives deterministic width/height/duration from the payload
bytes; a real deployment swaps `_decode` only (same schema in/out).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),      # image | audio | video
    pa.field("payload", pa.binary()),   # opaque encoded bytes
    pa.field("n_bytes", pa.int64()),
])


def synthesize_media(batch: pa.Table) -> pa.Table:
    """documents rows -> deterministic fake media payloads (utf-8 bytes of
    the text, tagged round-robin by doc_id)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds = ["image", "audio", "video"]
    payloads = [(t or "").encode("utf-8") for t in texts]
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array([kinds[d % 3] for d in doc_ids], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


class FakeDecoder:
    """Actor-pool decode/feature stage.  __init__ = the 'model load' (here:
    a salt); __call__ = per-batch decode.  STUB: real codecs would replace
    `_decode`; raise NotImplementedError for kinds a deployment disables."""

    def __init__(self, allowed_kinds: tuple[str, ...] = ("image", "audio", "video")) -> None:
        self.allowed = set(allowed_kinds)
        self.salt = b"aushape-media-v1"

    def _decode(self, kind: str, payload: bytes) -> dict:
        if kind not in self.allowed:
            raise NotImplementedError(f"decoder for {kind} not enabled")
        d = hashlib.sha256(self.salt + payload).digest()
        if kind == "image":
            return {"width": 64 + d[0] % 192, "height": 64 + d[1] % 192, "frames": 1}
        if kind == "audio":
            return {"width": 0, "height": 0, "frames": 8000 + int.from_bytes(d[2:4], "little") % 8000}
        return {"width": 320, "height": 240, "frames": 24 + d[4] % 240}

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(k, p) for k, p in zip(kinds, payloads)]
        out = pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            "width": pa.array([f["width"] for f in feats], pa.int32()),
            "height": pa.array([f["height"] for f in feats], pa.int32()),
            "frames": pa.array([f["frames"] for f in feats], pa.int32()),
        })
        return out


def media_features(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> synth media -> decoded features.  Small batch_size:
    payload bytes dominate memory, so batches stay shallow."""
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=256)
    return media.map_batches(FakeDecoder, batch_format="pyarrow",
                             batch_size=256, concurrency=(1, 4))
