"""Round-5 fixes: IVF recall via margin-ordered multi-probe + exact
re-rank (verdict r4 #1), media sniff hardening (ADVICE r4), and
kcenter_select edge cases (ADVICE r4)."""
import struct

import numpy as np
import pyarrow as pa
import pytest

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- IVF recall

def test_ivf_hyperplane_recall_meets_bar(ray_session):
    """Margin-ordered multi-probe LSH + exact_rerank must hold recall@10
    >= 0.9 at sf0.01 (verdict r4 item 1; was 50% with Hamming-1 probes)."""
    from aushape_ray.pipelines.queries import q_ann_ivf_recall

    row = q_ann_ivf_recall(SF001).to_pylist()[0]
    assert row["recall_pct"] >= 90, row
    assert 0 < row["probed_pct"] < 100, row


def test_ivf_kmeans_recall_meets_bar(ray_session):
    """Learned-quantizer IVF (nprobe=6) + exact_rerank must hold recall@10
    >= 0.9 at sf0.01 (verdict r4 item 1; was 72% with nprobe=2)."""
    from aushape_ray.pipelines.queries import q_ann_ivf_kmeans_recall

    row = q_ann_ivf_kmeans_recall(SF001).to_pylist()[0]
    assert row["recall_pct"] >= 90, row
    # the learned quantizer must reach the bar probing strictly fewer
    # buckets than the hyperplane baseline needs
    assert row["probed_pct"] < 50, row


# --------------------------------------------------------------- media sniff

def _gif(with_gct: bool) -> bytes:
    packed = (0x80 | 0x01) if with_gct else 0x00
    hdr = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([packed, 0, 0])
    gct = bytes(12) if with_gct else b""   # N=1 -> 3 * 2^(1+1) = 12 bytes
    return hdr + gct + b"\x2c" + bytes(10)


def test_gif_sniff_with_global_color_table():
    """A structurally valid GIF whose GCT flag is set (the common case for
    real encoders incl. PIL) must sniff as gif: the block introducer lives
    AFTER the color table, not at byte 13 (ADVICE r4 medium)."""
    from aushape_ray.functions.media import sniff_format

    assert sniff_format(_gif(with_gct=True)) == "gif"
    assert sniff_format(_gif(with_gct=False)) == "gif"


def test_gif_sniff_still_rejects_text():
    from aushape_ray.functions.media import sniff_format

    assert sniff_format(b"GIF87a is an image format from 1987, not text") \
        is None
    assert sniff_format(b"GIF89a") is None  # truncated


@pytest.mark.skipif(
    not __import__("aushape_ray.functions.media", fromlist=["HAVE_PIL"]
                   ).HAVE_PIL, reason="Pillow not installed")
def test_gif_sniff_matches_pil_output():
    """A PIL-saved GIF (which always writes a GCT) must sniff as gif."""
    import io

    from PIL import Image

    from aushape_ray.functions.media import sniff_format

    buf = io.BytesIO()
    Image.new("P", (4, 4)).save(buf, format="GIF")
    assert sniff_format(buf.getvalue()) == "gif"


def test_wav_sniff_tolerates_leading_chunks():
    """Spec-legal RIFF/WAVE with a LIST (or bext) chunk before 'fmt ' must
    still sniff as wav and decode (ADVICE r4 low)."""
    from aushape_ray.functions.media import (decode_wav, encode_wav,
                                             sniff_format)

    wav = encode_wav(np.zeros(16, np.int16))
    assert sniff_format(wav) == "wav"
    bwf = wav[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[12:]
    assert sniff_format(bwf) == "wav"
    samples, rate = decode_wav(bwf)
    assert len(samples) == 16 and rate == 16000
    # RIFF/WAVE with no fmt chunk in the first few headers: not wav
    assert sniff_format(b"RIFF" + struct.pack("<I", 4) + b"WAVE") is None


# ------------------------------------------------------------- kcenter edges

def test_kcenter_empty_dataset_returns_empty(ray_session):
    import ray

    from aushape_ray.functions.ann import kcenter_select

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    assert kcenter_select(ds, k=4) == []


def test_kcenter_k_exceeding_distinct_points_stops_early(ray_session):
    """k > #distinct points must not re-pick already-selected ids
    (ADVICE r4 low): with 3 distinct vectors and k=8, exactly 3 picks."""
    import ray

    from aushape_ray.functions.ann import kcenter_select

    vecs = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]] * 2  # 6 rows, 3 distinct
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(6)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))
    picks = kcenter_select(ds, k=8)
    got = [p["vec_id"] for p in picks]
    assert len(got) == len(set(got)) == 3, picks
