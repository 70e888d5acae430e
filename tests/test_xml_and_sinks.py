"""XML rendering (M8 escaping) and the discrete JSON-lines sink (S4)."""

import glob
import json
import xml.etree.ElementTree as ET

import pytest

from aushape_ray.oracle import assemble_events
from aushape_ray.xmlout import escape_xml, render_event_xml


def test_escape_xml_predefined_and_controls():
    assert escape_xml('a<b>&"c\'') == "a&lt;b&gt;&amp;&quot;c&apos;"
    assert escape_xml("x\x01y") == "x&#x01;y"
    assert escape_xml("tab\there\nnl") == "tab&#x09;here&#x0A;nl"  # single-line docs


def _has_ctrl(e):
    return any(ord(c) < 0x20 and c not in "\t\n\r"
               for t in e["text"] for c in t)


def test_every_oracle_doc_renders_wellformed(oracle_events):
    for e in oracle_events:
        xml = render_event_xml(json.loads(e["doc"]))
        if _has_ctrl(e):
            # control chars are emitted as &#xNN; (reference behaviour,
            # lib/gbuf.c:282-342) — not parseable as XML 1.0, by design
            assert "&#x" in xml
            continue
        root = ET.fromstring(xml)
        assert root.tag == "event"
        assert root.attrib["serial"] == e["conv_id"]
        lines = [el.text or "" for el in root.findall("./text/line")]
        assert lines == e["text"]
        if e["error"] is not None:
            assert root.find("error").text == e["error"]
        else:
            assert root.find("data") is not None


def test_field_i_r_attributes(tiny_transcripts, oracle_events):
    # find an event with an enriched uid field: r= kept, i= interpreted
    for e in oracle_events:
        doc = json.loads(e["doc"])
        data = doc.get("data") or {}
        for kind, rec in data.items():
            if isinstance(rec, dict) and "uid" in rec:
                xml = render_event_xml(doc)
                root = ET.fromstring(xml)
                f = root.find(f"./data/{kind}/field[@name='uid']")
                assert f.attrib["i"].startswith("user_")
                assert f.attrib["r"] == f.attrib["i"][5:]
                return
    pytest.skip("no uid event in corpus")


def test_jsonl_sink_counts_and_content(ray_session, tiny_transcripts,
                                       oracle_events, tmp_path):
    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import (
        build_events,
        write_jsonl_routed,
    )

    events = build_events(ray.data.from_arrow(tiny_transcripts),
                          PipelineConfig(num_parts=8))
    counts = write_jsonl_routed(events, str(tmp_path))
    from aushape_ray.oracle import sink_counts as osc

    assert counts == osc(oracle_events)
    # one JSON document per line, parseable, serial present
    n = 0
    for f in glob.glob(f"{tmp_path}/*/part-*.jsonl"):
        with open(f) as fh:
            for line in fh:
                d = json.loads(line)
                assert "serial" in d and "time" in d
                n += 1
    assert n == sum(counts.values())


def test_xml_sink(ray_session, tiny_transcripts, tmp_path):
    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import (
        build_events,
        write_jsonl_routed,
    )

    events = build_events(ray.data.from_arrow(tiny_transcripts),
                          PipelineConfig(num_parts=8))
    counts = write_jsonl_routed(events, str(tmp_path), xml=True)
    n = 0
    for f in glob.glob(f"{tmp_path}/*/part-*.xml"):
        with open(f) as fh:
            for line in fh:
                if "&#x" not in line:
                    ET.fromstring(line)
                n += 1
    assert n == sum(counts.values())


def test_media_decoder_disabled_kind_raises():
    """Multimodal stub: a kind the deployment disables surfaces
    NotImplementedError from the decode stage (per-actor contract)."""
    import pyarrow as pa

    from aushape_ray.functions.media import FakeDecoder, synthesize_media

    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array(["a", "b", "c"], pa.string())})
    media = synthesize_media(docs)
    dec = FakeDecoder(allowed_kinds=("image",))
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="audio|video"):
        dec(media)
    ok = FakeDecoder()(media)
    assert ok.column("width").to_pylist()[0] >= 64


def test_media_resize_and_frame_sampling(ray_session):
    """Resize clamps to the target box preserving aspect; frame sampler
    fans out one row per sampled frame of video payloads only, at the
    stride, capped; all outputs deterministic."""
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.media import (
        FakeDecoder,
        FrameSampler,
        Resizer,
        media_frames,
        synthesize_media,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([f"payload {i} " * 10 for i in range(6)], pa.string()),
    })
    media = synthesize_media(docs)
    decoded = FakeDecoder()(media)
    resized = Resizer(max_side=100)(decoded.append_column(
        "payload", media.column("payload")))
    for w, h, ow, oh in zip(decoded.column("width").to_pylist(),
                            decoded.column("height").to_pylist(),
                            resized.column("out_width").to_pylist(),
                            resized.column("out_height").to_pylist()):
        assert max(ow, oh) <= 100
        if max(w, h) <= 100:
            assert (ow, oh) == (w, h)  # no upscale
        else:  # aspect preserved within rounding
            assert abs(ow / oh - w / h) < 0.1
    assert all(len(t) == 32 for t in resized.column("thumbnail").to_pylist())

    sampler = FrameSampler(stride=10, max_frames=8)
    frames = sampler(decoded.append_column("payload", media.column("payload")))
    vids = {m: f for m, f, k in zip(decoded.column("media_id").to_pylist(),
                                    decoded.column("frames").to_pylist(),
                                    decoded.column("kind").to_pylist())
            if k == "video"}
    expect = sum(min(8, (f + 9) // 10) for f in vids.values())
    assert frames.num_rows == expect
    assert set(frames.column("media_id").to_pylist()) == set(vids)
    assert all(i % 10 == 0 for i in frames.column("frame_idx").to_pylist())

    # end-to-end chain over a Dataset
    out = media_frames(ray.data.from_arrow(docs))
    assert out.count() == expect

# ---------------- structural XSD-port validation (round 3) ----------------

from aushape_ray.xsd import XmlValidationError, validate_event_xml


def test_every_oracle_doc_validates_structurally(oracle_events):
    """Every corpus event document must pass the aushape.xsd content-model
    port (aushape_ray/xsd.py) — the XML analogue of test_schema.py's JSON
    envelope validation."""
    checked = 0
    for e in oracle_events:
        xml = render_event_xml(json.loads(e["doc"]))
        if _has_ctrl(e):
            continue  # numeric ctrl refs are not XML-1.0-parseable
        validate_event_xml(xml)
        checked += 1
    assert checked > 50


class TestXsdViolations:
    GOOD = ('<event serial="c1" time="2026-01-01T00:00:00.000">'
            '<text><line>x</line></text>'
            '<data><syscall><field name="uid" i="user_0" r="0"/></syscall>'
            '<execve><a>ls</a></execve>'
            '<path><item><field name="name" i="/etc"/></item></path></data>'
            '<norm subject="u" action="ran" result="success"/>'
            '<trimmed><t>norm</t></trimmed></event>')

    def test_good_document_passes(self):
        validate_event_xml(self.GOOD)

    @pytest.mark.parametrize("bad,frag", [
        ("missing time", '<event serial="c1"><data/></event>'),
        ("bad time", '<event serial="c1" time="not-a-time"><data/></event>'),
        ("error and data", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000"><error>e</error><data/></event>'),
        ("out of order", '<event serial="c1" time="2026-01-01T00:00:00.000">'
         '<norm subject="s" action="a" result="r"/><data/></event>'),
        ("field missing i", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000"><data><syscall>'
         '<field name="uid"/></syscall></data></event>'),
        ("path without item", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000"><data><path>'
         '<field name="name" i="x"/></path></data></event>'),
        ("execve non-a child", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000"><data><execve>'
         '<field name="a0" i="x"/></execve></data></event>'),
        ("norm missing result", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000">'
         '<norm subject="s" action="a"/></event>'),
        ("unknown child", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000"><bogus/></event>'),
        ("unexpected attr", '<event serial="c1" '
         'time="2026-01-01T00:00:00.000" zap="1"><data/></event>'),
    ])
    def test_violations_raise(self, bad, frag):
        with pytest.raises(XmlValidationError):
            validate_event_xml(frag)


# ---------------- optional real image decode (round 3) --------------------

def test_make_decoder_contract():
    from aushape_ray.functions import media

    # default: the sniffing decoder in EVERY container (zero-dep codecs
    # work without Pillow; PIL rasters raise explicitly when absent)
    dec = media.make_decoder()
    assert type(dec) is media.PilDecoder
    # fake path stays total for synthetic (non-codec) payloads
    out = media.make_decoder(prefer_real=False)._decode("image", b"not-a-png")
    assert set(out) == {"width", "height", "frames"}
    # ...and both decoders agree on them (fake fallback is bit-identical)
    assert dec._decode("image", b"not-a-png") == out
    # the fake REFUSES real-format payloads instead of masking them
    import pytest as _pytest

    from aushape_ray.functions.media import encode_ppm

    import numpy as _np

    ppm = encode_ppm(_np.zeros((3, 5, 3), _np.uint8))
    with _pytest.raises(ValueError, match="real ppm"):
        media.make_decoder(prefer_real=False)._decode("image", ppm)


def test_sniffing_decoder_reads_real_zero_dep_formats():
    """PPM/WAV/Y4M payloads decode for REAL through the default decoder in
    every container (no Pillow needed); dimensions are ground truth."""
    import numpy as _np

    from aushape_ray.functions.media import (PilDecoder, encode_ppm,
                                             encode_wav, encode_y4m)

    dec = PilDecoder()
    ppm = encode_ppm(_np.zeros((7, 11, 3), _np.uint8))
    assert dec._decode("image", ppm) == {"width": 11, "height": 7,
                                         "frames": 1}
    wav = encode_wav(_np.zeros(1234, _np.int16), rate=8000)
    assert dec._decode("audio", wav)["frames"] == 1234
    y4m = encode_y4m(_np.zeros((5, 4, 6), _np.uint8), fps=10)
    assert dec._decode("video", y4m) == {"width": 6, "height": 4,
                                         "frames": 5}
    # PIL raster without Pillow: explicit error, never a silent fake
    from aushape_ray.functions import media as _media

    if not _media.HAVE_PIL:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="jpeg"):
            dec._decode("image", b"\xff\xd8\xff\xe0" + b"x" * 32)


@pytest.mark.skipif(
    not __import__("aushape_ray.functions.media", fromlist=["HAVE_PIL"]).HAVE_PIL,
    reason="Pillow not installed in this container")
def test_pil_decoder_reads_real_png_and_jpeg():
    """Runs in containers that have Pillow: generated PNG + JPEG fixtures
    decode with ground-truth dimensions through the DEFAULT decoder."""
    import io

    from PIL import Image

    from aushape_ray.functions.media import make_decoder, sniff_format

    dec = make_decoder()
    for fmt, dims in (("PNG", (31, 17)), ("JPEG", (23, 9))):
        buf = io.BytesIO()
        Image.new("RGB", dims).save(buf, format=fmt)
        payload = buf.getvalue()
        assert sniff_format(payload) == fmt.lower()
        out = dec._decode("image", payload)
        assert (out["width"], out["height"], out["frames"]) == (*dims, 1)
