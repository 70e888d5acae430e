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


try:  # optional extra: real image codec when Pillow is installed
    from PIL import Image as _PILImage  # noqa: F401
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class PilDecoder(FakeDecoder):
    """Real image decode via Pillow when available — the deployment swap
    the FakeDecoder docstring promises, same schema in/out.  Non-image
    kinds (and every kind when Pillow is absent) fall through to the
    deterministic fake, so the stage stays total.  Select with
    make_decoder()."""

    def _decode(self, kind: str, payload: bytes) -> dict:
        if kind != "image" or not HAVE_PIL:
            return super()._decode(kind, payload)
        if kind not in self.allowed:
            raise NotImplementedError(f"decoder for {kind} not enabled")
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return {"width": im.width, "height": im.height,
                    "frames": int(getattr(im, "n_frames", 1))}


def make_decoder(*, prefer_real: bool = True, **kwargs) -> FakeDecoder:
    """Decoder factory: PilDecoder when Pillow is importable and real
    decode is wanted, FakeDecoder otherwise.  Callers that feed synthetic
    (non-codec) payloads — media_features over the synth corpus — must
    pass prefer_real=False."""
    cls = PilDecoder if (prefer_real and HAVE_PIL) else FakeDecoder
    return cls(**kwargs)


class Resizer:
    """Actor-pool resize stage (images): clamps the decoded dimensions to
    fit a target box preserving aspect ratio and emits a deterministic
    fake thumbnail payload (sha256-derived, fixed 32 bytes).  STUB: a
    real deployment swaps `_resize` for PIL/opencv — the schema, actor
    signature, and shallow-batch mechanics are the real contract."""

    def __init__(self, max_side: int = 128) -> None:
        self.max_side = max_side

    def _resize(self, w: int, h: int, payload: bytes) -> tuple[int, int, bytes]:
        scale = min(1.0, self.max_side / max(w, h, 1))
        thumb = hashlib.sha256(b"thumb" + payload).digest()
        # dimensionless kinds (audio: 0x0) pass through untouched
        ow = max(1, int(w * scale)) if w else 0
        oh = max(1, int(h * scale)) if h else 0
        return ow, oh, thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_pylist()
        h = batch.column("height").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = [self._resize(a, b, p) for a, b, p in zip(w, h, payloads)]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "out_width": pa.array([o[0] for o in out], pa.int32()),
            "out_height": pa.array([o[1] for o in out], pa.int32()),
            "thumbnail": pa.array([o[2] for o in out], pa.binary()),
        })


class FrameSampler:
    """Actor-pool frame-sampling stage (video/audio): one input row fans
    out to <= max_frames rows, one per sampled frame at a fixed stride —
    the row-expansion plumbing a real video pipeline needs (small input
    batches: output rows multiply by the sample count).  STUB frame
    bytes (sha256 of payload+index); a real deployment decodes here."""

    def __init__(self, stride: int = 10, max_frames: int = 8) -> None:
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch.column("media_id").to_pylist(), batch.column("kind").to_pylist()
        frames = batch.column("frames").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_idx, o_bytes = [], [], []
        for mid, kind, n, p in zip(ids, kinds, frames, payloads):
            if kind != "video":
                continue
            for fi in range(0, n, self.stride)[: self.max_frames] if isinstance(n, int) else []:
                o_id.append(mid)
                o_idx.append(fi)
                o_bytes.append(hashlib.sha256(p + fi.to_bytes(4, "little")).digest())
        return pa.table({
            "media_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "frame": pa.array(o_bytes, pa.binary()),
        })


def media_features(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> synth media -> decoded features.  Small batch_size:
    payload bytes dominate memory, so batches stay shallow."""
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=256)
    return media.map_batches(FakeDecoder, batch_format="pyarrow",
                             batch_size=256, concurrency=(1, 4))


def media_frames(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> media -> decode (keeping payload) -> frame-sample:
    the full multimodal stage chain; output is one row per sampled
    frame of each video payload."""
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=256)

    def decode_keep_payload(batch: pa.Table) -> pa.Table:
        dec = FakeDecoder()(batch)
        return dec.append_column("payload", batch.column("payload"))

    decoded = media.map_batches(decode_keep_payload, batch_format="pyarrow",
                                batch_size=256)
    return decoded.map_batches(FrameSampler, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 4))
