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


# --- format sniffing (magic bytes) -----------------------------------------
# The decode stage routes by what the payload actually IS, not by what the
# metadata claims: real formats reach a real decoder (PIL rasters when
# Pillow is importable, the zero-dependency PPM/WAV/Y4M codecs below
# always), and only non-codec (synthetic) payloads take the deterministic
# fake path — so the fake can never silently mask a real format.

_PIL_RASTERS = ("jpeg", "png", "gif", "bmp", "webp")


def _ppm_header_ok(payload: bytes) -> bool:
    """True iff the payload carries a structurally complete P6 header
    (decode_ppm's grammar) AND the raster bytes are actually present —
    text that merely starts 'P6 ' never qualifies."""
    try:
        pos, tokens = 2, []
        n = len(payload)
        while len(tokens) < 3:
            while pos < n and payload[pos:pos + 1].isspace():
                pos += 1
            if payload[pos:pos + 1] == b"#":
                while pos < n and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < n and not payload[pos:pos + 1].isspace():
                pos += 1
            if not payload[start:pos].isdigit():
                return False
            tokens.append(int(payload[start:pos]))
        w, h, maxval = tokens
        return maxval == 255 and n >= pos + 1 + w * h * 3
    except (ValueError, IndexError):
        return False


def sniff_format(payload: bytes) -> "str | None":
    """Magic-byte format sniff; None = no known codec signature.

    Printable signatures are structurally validated (media payloads in a
    mixed corpus can be arbitrary text bytes, and 'BM...' / 'P6 ...' /
    'GIF87a...' all occur in natural language): BMP must carry a known
    DIB header size, PPM a complete digit header plus raster, GIF a valid
    block introducer after the screen descriptor, WAV the canonical
    'fmt ' chunk, Y4M an actual FRAME marker.  JPEG/PNG magics contain
    bytes that are invalid UTF-8 lead sequences, so they cannot
    false-positive on text-derived payloads."""
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) > 13:
        # Logical screen descriptor: packed byte at 10 carries the global
        # color table flag (bit 7) and size (bits 0-2); the GCT (when
        # present, which is the common case for real encoders incl. PIL)
        # sits BETWEEN the descriptor and the first block introducer, so
        # the introducer lives at 13 + 3*2^(N+1), not at 13.
        packed = payload[10]
        gct = 3 * (2 << (packed & 0x07)) if packed & 0x80 else 0
        pos = 13 + gct
        if len(payload) > pos and payload[pos:pos + 1] in (b"\x2c", b"\x21",
                                                           b"\x3b"):
            return "gif"
    if (payload[:2] == b"BM" and len(payload) >= 26
            and int.from_bytes(payload[14:18], "little")
            in (12, 40, 52, 56, 64, 108, 124)):
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # Spec-legal WAVE files may carry other chunks (bext in Broadcast
        # Wave, LIST/INFO) before 'fmt ' — scan the first few chunk
        # headers like decode_wav's walker instead of assuming offset 12.
        pos = 12
        for _ in range(8):
            if pos + 8 > len(payload):
                break
            cid = payload[pos:pos + 4]
            if cid == b"fmt ":
                return "wav"
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    if (payload[:2] == b"P6" and payload[2:3] in (b" ", b"\t", b"\n", b"\r")
            and _ppm_header_ok(payload)):
        return "ppm"
    if payload.startswith(b"YUV4MPEG2 ") and b"FRAME" in payload[:512]:
        return "y4m"
    return None


class FakeDecoder:
    """Actor-pool decode/feature stage.  __init__ = the 'model load' (here:
    a salt); __call__ = per-batch decode.  STUB: real codecs would replace
    `_decode`; raise NotImplementedError for kinds a deployment disables."""

    def __init__(self, allowed_kinds: tuple[str, ...] = ("image", "audio", "video")) -> None:
        self.allowed = set(allowed_kinds)
        self.salt = b"aushape-media-v1"

    def _fake_features(self, kind: str, payload: bytes) -> dict:
        """Deterministic fake features for signature-less (synthetic)
        payloads — shared by FakeDecoder and PilDecoder's fallthrough."""
        d = hashlib.sha256(self.salt + payload).digest()
        if kind == "image":
            return {"width": 64 + d[0] % 192, "height": 64 + d[1] % 192, "frames": 1}
        if kind == "audio":
            return {"width": 0, "height": 0, "frames": 8000 + int.from_bytes(d[2:4], "little") % 8000}
        return {"width": 320, "height": 240, "frames": 24 + d[4] % 240}

    def _decode(self, kind: str, payload: bytes) -> dict:
        if kind not in self.allowed:
            raise NotImplementedError(f"decoder for {kind} not enabled")
        fmt = sniff_format(payload)
        if fmt is not None:
            raise ValueError(
                f"payload carries a real {fmt} signature — the fake "
                f"decoder must not mask it; use make_decoder()")
        return self._fake_features(kind, payload)

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
    """Sniffing real-format decoder — the deployment swap the FakeDecoder
    docstring promises, same schema in/out.  Routing is by magic bytes:
    PIL raster formats (jpeg/png/gif/bmp/webp) decode via Pillow when
    importable (and raise NotImplementedError when not — never a silent
    fake), PPM/WAV/Y4M decode via the zero-dependency codecs below in
    every container, and payloads with no codec signature (the synthetic
    corpus) fall through to the deterministic fake so the stage stays
    total.  Select with make_decoder()."""

    def _decode(self, kind: str, payload: bytes) -> dict:
        if kind not in self.allowed:
            raise NotImplementedError(f"decoder for {kind} not enabled")
        fmt = sniff_format(payload)
        if fmt is None:
            return self._fake_features(kind, payload)
        try:
            if fmt in _PIL_RASTERS:
                if not HAVE_PIL:
                    raise NotImplementedError(
                        f"payload is {fmt} but Pillow is not installed")
                import io

                with _PILImage.open(io.BytesIO(payload)) as im:
                    return {"width": im.width, "height": im.height,
                            "frames": int(getattr(im, "n_frames", 1))}
            if fmt == "ppm":
                arr = decode_ppm(payload)
                return {"width": int(arr.shape[1]),
                        "height": int(arr.shape[0]), "frames": 1}
            if fmt == "wav":
                samples, _rate = decode_wav(payload)
                return {"width": 0, "height": 0, "frames": int(len(samples))}
            # y4m
            frames, _fps = decode_y4m(payload)
            return {"width": int(frames.shape[2]),
                    "height": int(frames.shape[1]),
                    "frames": int(frames.shape[0])}
        except NotImplementedError:
            raise  # declared no-Pillow refusal — never silently faked
        except Exception:
            # the signature matched but the body doesn't parse: the
            # payload is NOT actually that format (hardened sniffing makes
            # this rare); take the deterministic fake path instead of
            # killing the task — error isolation, same rule as parse
            return self._fake_features(kind, payload)


def make_decoder(*, prefer_real: bool = True, **kwargs) -> FakeDecoder:
    """Decoder factory.  prefer_real (default): the sniffing PilDecoder —
    real formats decode for real (PPM/WAV/Y4M always, PIL rasters when
    Pillow is importable), unrecognized payloads take the deterministic
    fake path.  prefer_real=False: the pure FakeDecoder, which REFUSES
    payloads carrying a real codec signature."""
    cls = PilDecoder if prefer_real else FakeDecoder
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
    return media.map_batches(PilDecoder, batch_format="pyarrow",
                             batch_size=256, concurrency=(1, 4))


def media_frames(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> media -> decode (keeping payload) -> frame-sample:
    the full multimodal stage chain; output is one row per sampled
    frame of each video payload."""
    media = docs.map_batches(synthesize_media, batch_format="pyarrow",
                             batch_size=256)

    def decode_keep_payload(batch: pa.Table) -> pa.Table:
        dec = PilDecoder()(batch)
        return dec.append_column("payload", batch.column("payload"))

    decoded = media.map_batches(decode_keep_payload, batch_format="pyarrow",
                                batch_size=256)
    return decoded.map_batches(FrameSampler, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# Real image codec, zero dependencies: binary PPM (P6).  This upgrades the
# image leg of the multimodal chain from a declared stub to a REAL decode /
# feature / resize path — netpbm is a genuine interchange format, and its
# raster is just header + raw bytes, so numpy alone decodes it.


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm wants uint8 (h, w, 3)")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3).  Tolerant header parse
    (any whitespace between tokens, # comments skipped)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def synthesize_ppm(batch: pa.Table) -> pa.Table:
    """documents rows -> REAL P6-encoded deterministic test images
    (doc_id-seeded gradient+stripe pattern).  Same media schema as
    synthesize_media, kind fixed to image."""
    doc_ids = batch.column("doc_id").to_pylist()
    out = []
    for d in doc_ids:
        w, h = 32 + d % 32, 24 + d % 24
        y, x = np.mgrid[0:h, 0:w]
        r = (x * 3 + y * 7 + d) % 256
        g = (x * 5 + y * 2 + d * 11) % 256
        b = (x + y * 13 + d * 29) % 256
        out.append(encode_ppm(np.stack([r, g, b],
                                       axis=2).astype(np.uint8)))
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array(["image"] * len(doc_ids), pa.string()),
        "payload": pa.array(out, pa.binary()),
        "n_bytes": pa.array([len(p) for p in out], pa.int64()),
    })


class PpmDecoder:
    """Actor-pool REAL decode + feature + resize stage for P6 payloads:
    numpy header parse + frombuffer (zero-copy over the payload), exact
    integer pixel statistics (sum*1000 // count — no float boundary),
    and a strided-subsample thumbnail re-encoded as P6, md5-digested so
    every thumbnail byte is pinned without leaving the pipeline.
    Per-payload loop is inherent (images are variable-shape); the work
    is numpy per image."""

    def __init__(self, max_side: int = 16) -> None:
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "width": [], "height": [],
                "bright_milli": [], "contrast_e3": [],
                "thumb_w": [], "thumb_h": [], "thumb_md5": []}
        for mid, p in zip(ids, payloads):
            arr = decode_ppm(p)
            h, w = arr.shape[:2]
            npix = arr.size
            s = int(arr.sum(dtype=np.int64))
            sq = int((arr.astype(np.int64) ** 2).sum())
            # exact integer stats: mean*1000 and variance*1e3 floored
            bright = s * 1000 // npix
            contrast = (sq * npix - s * s) * 1000 // (npix * npix)
            sy = max(1, -(-h // self.max_side))
            sx = max(1, -(-w // self.max_side))
            thumb = arr[::sy, ::sx]
            rows["media_id"].append(mid)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["bright_milli"].append(bright)
            rows["contrast_e3"].append(contrast)
            rows["thumb_w"].append(thumb.shape[1])
            rows["thumb_h"].append(thumb.shape[0])
            rows["thumb_md5"].append(hashlib.md5(
                encode_ppm(np.ascontiguousarray(thumb))).hexdigest())
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "bright_milli": pa.array(rows["bright_milli"], pa.int64()),
            "contrast_e3": pa.array(rows["contrast_e3"], pa.int64()),
            "thumb_w": pa.array(rows["thumb_w"], pa.int32()),
            "thumb_h": pa.array(rows["thumb_h"], pa.int32()),
            "thumb_md5": pa.array(rows["thumb_md5"], pa.string()),
        })


def media_image_stats(docs: "ray.data.Dataset",
                      max_side: int = 16) -> "ray.data.Dataset":
    """documents -> real P6 images -> real decode/feature/resize.
    Actor pool with shallow batches (payload bytes dominate memory)."""
    media = docs.map_batches(synthesize_ppm, batch_format="pyarrow",
                             batch_size=256)
    return media.map_batches(PpmDecoder, batch_format="pyarrow",
                             batch_size=256, concurrency=(1, 4),
                             fn_constructor_kwargs={"max_side": max_side})


# ---------------------------------------------------------------------------
# Real audio codec, zero dependencies: RIFF/WAV PCM16 mono.  Same upgrade as
# the PPM path: WAV is header + raw little-endian samples, so struct+numpy
# decode it without an audio library.


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) -> RIFF/WAV PCM16 mono."""
    import struct

    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav wants int16 (n,)")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAV PCM16 mono -> (int16 samples, sample_rate).  Walks the
    chunk list (tolerates extra chunks before data)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    rate, bits, channels = None, None, None
    while pos + 8 <= n:
        cid, size = payload[pos:pos + 4], struct.unpack(
            "<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(body, np.int16), rate
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def synthesize_wav(batch: pa.Table) -> pa.Table:
    """documents rows -> REAL WAV payloads: doc_id-seeded sine + square
    mixture, int16 PCM, variable length."""
    doc_ids = batch.column("doc_id").to_pylist()
    out = []
    for d in doc_ids:
        n = 800 + (d % 40) * 25
        t = np.arange(n, dtype=np.float64)
        f1, f2 = 1 + d % 17, 3 + d % 29
        x = (8000 * np.sin(2 * np.pi * f1 * t / n)
             + 4000 * np.sign(np.sin(2 * np.pi * f2 * t / n)))
        out.append(encode_wav(x.astype(np.int16)))
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array(["audio"] * len(doc_ids), pa.string()),
        "payload": pa.array(out, pa.binary()),
        "n_bytes": pa.array([len(p) for p in out], pa.int64()),
    })


class WavDecoder:
    """Actor-pool REAL audio decode + signal stats: exact integer
    features — duration in microseconds, sum of |x| (mean abs
    amplitude * n), energy sum x^2, peak, and zero-crossing count —
    no float anywhere, so results are placement-independent."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "n_samples": [], "rate": [],
                "dur_us": [], "sum_abs": [], "energy": [],
                "peak": [], "zero_cross": []}
        for mid, p in zip(ids, payloads):
            x, rate = decode_wav(p)
            xi = x.astype(np.int64)
            rows["media_id"].append(mid)
            rows["n_samples"].append(len(x))
            rows["rate"].append(rate)
            rows["dur_us"].append(len(x) * 1_000_000 // rate)
            rows["sum_abs"].append(int(np.abs(xi).sum()))
            rows["energy"].append(int((xi * xi).sum()))
            rows["peak"].append(int(np.abs(xi).max()) if len(x) else 0)
            s = np.sign(xi[xi != 0])
            rows["zero_cross"].append(
                int((s[1:] != s[:-1]).sum()) if len(s) > 1 else 0)
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "n_samples": pa.array(rows["n_samples"], pa.int64()),
            "rate": pa.array(rows["rate"], pa.int32()),
            "dur_us": pa.array(rows["dur_us"], pa.int64()),
            "sum_abs": pa.array(rows["sum_abs"], pa.int64()),
            "energy": pa.array(rows["energy"], pa.int64()),
            "peak": pa.array(rows["peak"], pa.int32()),
            "zero_cross": pa.array(rows["zero_cross"], pa.int64()),
        })


def media_audio_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> real WAV payloads -> real decode/signal stats."""
    media = docs.map_batches(synthesize_wav, batch_format="pyarrow",
                             batch_size=256)
    return media.map_batches(WavDecoder, batch_format="pyarrow",
                             batch_size=256, concurrency=(1, 4))


# ---------------------------------------------------------------------------
# Real video codec, zero dependencies: YUV4MPEG2 (.y4m) with C420 chroma.
# The third leg of the multimodal family: a genuine interchange format
# (mplayer/ffmpeg both speak it) whose stream is an ASCII header plus
# "FRAME\n" + raw YUV planes — numpy decodes it without a video library.


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8 (n, h, w) luma frames -> .y4m bytes (C420, flat chroma)."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("encode_y4m wants uint8 (n, h, w)")
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    hdr = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = [hdr]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(chroma)  # U
        out.append(chroma)  # V
    return b"".join(out)


def decode_y4m(payload: bytes) -> "tuple[np.ndarray, int]":
    """.y4m (C420) -> (uint8 (n, h, w) luma frames, fps).  Chroma planes
    are skipped; FRAME parameter suffixes are tolerated."""
    nl = payload.index(b"\n")
    head = payload[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for tok in head[1:]:
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"F"):
            fps = int(tok[1:].split(b":")[0])
        elif tok.startswith(b"C") and tok not in (b"C420", b"C420jpeg",
                                                  b"C420mpeg2"):
            raise ValueError("only C420 supported")
    if not w or not h:
        raise ValueError("missing W/H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    pos, frames = nl + 1, []
    n = len(payload)
    while pos < n:
        fe = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        pos = fe + 1
        frames.append(np.frombuffer(payload, np.uint8, count=ysz,
                                    offset=pos).reshape(h, w))
        pos += ysz + 2 * csz
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), \
        fps or 25


def synthesize_y4m(batch: pa.Table) -> pa.Table:
    """documents rows -> REAL .y4m payloads: doc_id-seeded moving
    gradient, 4-16 frames of 16x12 luma."""
    doc_ids = batch.column("doc_id").to_pylist()
    out = []
    for d in doc_ids:
        nf = 4 + d % 13
        y, x = np.mgrid[0:12, 0:16]
        frames = np.stack([(x * 5 + y * 9 + d + 17 * t) % 256
                           for t in range(nf)]).astype(np.uint8)
        out.append(encode_y4m(frames))
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array(["video"] * len(doc_ids), pa.string()),
        "payload": pa.array(out, pa.binary()),
        "n_bytes": pa.array([len(p) for p in out], pa.int64()),
    })


class Y4mFrameSampler:
    """Actor-pool REAL video decode + frame sampling: one input row fans
    out to <= max_frames rows at a fixed stride — FrameSampler's
    row-expansion plumbing with genuine decoded frames.  Per-frame
    outputs are exact integers: luma sum and the md5 of the frame bytes
    (pins every sampled pixel without shipping rasters anywhere)."""

    def __init__(self, stride: int = 3, max_frames: int = 4) -> None:
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o = {"media_id": [], "frame_idx": [], "n_frames": [],
             "luma_sum": [], "frame_md5": []}
        for mid, p in zip(ids, payloads):
            frames, _ = decode_y4m(p)
            picks = list(range(0, len(frames),
                               self.stride))[: self.max_frames]
            for fi in picks:
                f = frames[fi]
                o["media_id"].append(mid)
                o["frame_idx"].append(fi)
                o["n_frames"].append(len(frames))
                o["luma_sum"].append(int(f.sum(dtype=np.int64)))
                o["frame_md5"].append(
                    hashlib.md5(f.tobytes()).hexdigest())
        return pa.table({
            "media_id": pa.array(o["media_id"], pa.int64()),
            "frame_idx": pa.array(o["frame_idx"], pa.int32()),
            "n_frames": pa.array(o["n_frames"], pa.int32()),
            "luma_sum": pa.array(o["luma_sum"], pa.int64()),
            "frame_md5": pa.array(o["frame_md5"], pa.string()),
        })


def media_video_frames(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """documents -> real .y4m payloads -> real frame sampling."""
    media = docs.map_batches(synthesize_y4m, batch_format="pyarrow",
                             batch_size=128)
    return media.map_batches(Y4mFrameSampler, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 4))
