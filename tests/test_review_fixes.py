"""Regression tests for the round-1 code-review findings."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from aushape_ray.config import PipelineConfig
from aushape_ray.oracle import assemble_events, parse_text
from aushape_ray.pipelines.events_pipeline import build_events, write_routed
from aushape_ray.stages.parse import parse_batch


def _tb(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array(["" for _ in rows], pa.string()),
        "ts": pa.array(list(range(1, len(rows) + 1)), pa.timestamp("us")),
    })


def test_malformed_numerics_latch_not_crash(ray_session):
    """int() failures in collectors latch as error events (finding 1)."""
    tb = _tb([
        ("m1", 0, "tool", 'node=h type=PATH item=abc name="/x"'),
        ("m2", 0, "tool", "node=h type=EXECVE argc=xyz a0=ls"),
        ("m3", 0, "tool", "node=h type=EXECVE argc=2 a1_len=zz a1[0]=6162"),
        ("ok", 0, "user", "node=h type=MSG fine len=4"),
    ])
    oracle = {e["conv_id"]: e for e in assemble_events(tb)}
    assert "invalid integer for item" in oracle["m1"]["error"]
    assert "invalid integer for argc" in oracle["m2"]["error"]
    assert "invalid integer for a1_len" in oracle["m3"]["error"]
    assert oracle["ok"]["error"] is None
    rows = build_events(ray.data.from_arrow(tb), PipelineConfig(num_parts=4)).take_all()
    got = {r["conv_id"]: r for r in rows}
    for cid in ("m1", "m2", "m3", "ok"):
        assert got[cid]["error"] == oracle[cid]["error"], cid


def test_unbalanced_quote_does_not_leak_across_rows():
    """Joined-batch scan equals per-row parse even with unbalanced quotes
    (finding 2)."""
    rows = ['node=h type=MSG msg="abc',
            'node=h type=LOGIN uid=7 exit=0 tail="z"']
    batch = pa.table({"text": pa.array(rows, pa.string())})
    out = parse_batch(batch)
    for i, t in enumerate(rows):
        node, kind, fields = parse_text(t)
        assert out.column("kind").to_pylist()[i] == kind, t
        assert out.column("tok_keys").to_pylist()[i] == [f[0] for f in fields], t
    # the LOGIN row keeps its own tokens
    assert "uid" in out.column("tok_keys").to_pylist()[1]


def test_trim_keeps_full_text_column(ray_session):
    """Doc trimming must not mutate the event row's text array (finding 3)."""
    rows = [("t1", i, "user", f"node=h type=MSG line-{i:03d} " + "x" * 120)
            for i in range(50)]
    tb = _tb(rows)
    cfg = PipelineConfig(num_parts=2, max_event_size=1024)
    got = build_events(ray.data.from_arrow(tb), cfg).take_all()
    assert len(got) == 1
    r = got[0]
    assert r["n_turns"] == 50
    assert len(r["text"]) == 50  # full per-turn text survives trimming
    doc = json.loads(r["doc"])
    assert len(doc.get("text", [])) < 50  # the doc itself was trimmed
    assert "trimmed" in doc and r["doc_bytes"] <= 1024
    # oracle agrees
    e = assemble_events(tb, max_event_size=1024)[0]
    assert e["doc"] == r["doc"] and len(e["text"]) == 50


def test_execve_length_is_bytes():
    """Slice length accounting counts bytes, matching the SQL oracle's
    octet_length(unhex(...)) (finding 4)."""
    from aushape_ray.collectors import CollectError, ExecveCollector
    from aushape_ray.grammar import interpret_field

    val = "émigré"  # 6 chars, 8 utf-8 bytes
    h = val.encode("utf-8").hex()
    c = ExecveCollector()
    c.add([("argc", "2", "2"), ("a0", "x", "x"),
           ("a1_len", "8", "8"), ("a1[0]", h, interpret_field("a1[0]", h))])
    assert c.end() == ["x", val]  # byte length 8 accepted
    c2 = ExecveCollector()
    c2.add([("argc", "2", "2"), ("a1_len", "6", "6"),
            ("a1[0]", h, interpret_field("a1[0]", h))])
    with pytest.raises(CollectError, match="length mismatch"):
        c2.end()  # char length 6 declared -> byte mismatch


def test_write_routed_rerun_same_outdir(ray_session, tmp_path):
    """Re-running into the same out_dir must not double counts (finding 5)."""
    tb = _tb([("c1", 0, "user", "node=h type=MSG hi len=2"),
              ("c2", 0, "user", "node=h type=MSG yo len=2")])
    cfg = PipelineConfig(num_parts=2)
    out = str(tmp_path / "routed")
    c1 = write_routed(build_events(ray.data.from_arrow(tb), cfg), out, cfg)
    c2 = write_routed(build_events(ray.data.from_arrow(tb), cfg), out, cfg)
    assert c1 == c2 == {"dialog_events": 2}


def test_xml_weird_kind_wellformed():
    """Unvalidated record kinds cannot inject element names (finding 6)."""
    import xml.etree.ElementTree as ET

    from aushape_ray.xmlout import render_event_xml

    doc = {"serial": "c1", "time": "t", "text": ["x"],
           "data": {"a<b": {"k": ["v"]}, "msg": [{"m": ["1"]}]}}
    xml = render_event_xml(doc)
    root = ET.fromstring(xml)
    rec = root.find("./data/record")
    assert rec is not None and rec.attrib["kind"] == "a<b"
    assert root.find("./data/msg") is not None


def test_jsonl_sink_outdir_with_tmp_substring(ray_session, tmp_path):
    """Sink path containing '.tmp'/'.part' substrings works (finding 7)."""
    from aushape_ray.pipelines.events_pipeline import write_jsonl_routed

    tb = _tb([("c1", 0, "user", "node=h type=MSG hi len=2")])
    out = str(tmp_path / "run.tmp" / "part.out")
    counts = write_jsonl_routed(
        build_events(ray.data.from_arrow(tb), PipelineConfig(num_parts=2)), out)
    assert counts == {"dialog_events": 1}


def test_contiguity_guard_rejects_overlapping_shards(tmp_path):
    """The shuffle-free paths refuse shards whose conv ranges overlap
    (finding 8)."""
    from aushape_ray.pipelines.events_pipeline import check_shard_contiguity

    a = _tb([("c1", 0, "user", "t"), ("c3", 0, "user", "t")])
    b = _tb([("c2", 0, "user", "t"), ("c4", 0, "user", "t")])
    fa, fb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, fa)
    pq.write_table(b, fb)
    with pytest.raises(ValueError, match="not conversation-contiguous"):
        check_shard_contiguity([fa, fb])
    # disjoint ranges pass
    c = _tb([("c5", 0, "user", "t")])
    fc = str(tmp_path / "c.parquet")
    pq.write_table(c, fc)
    ok_a = _tb([("c1", 0, "user", "t"), ("c2", 0, "user", "t")])
    pq.write_table(ok_a, fa)
    check_shard_contiguity([fa, fc])


def test_execve_multibyte_slice_split():
    """Slices that split a multibyte UTF-8 char reassemble correctly:
    raw bytes concatenate before the single decode (2nd review, finding 1)."""
    from aushape_ray.collectors import ExecveCollector
    from aushape_ray.grammar import interpret_field

    c = ExecveCollector()
    c.add([("argc", "2", "2"), ("a0", "x", "x"), ("a1_len", "2", "2")])
    # é = c3 a9 split across two byte-slices
    c.add([("a1[0]", "c3", interpret_field("a1[0]", "c3"))])
    c.add([("a1[1]", "a9", interpret_field("a1[1]", "a9"))])
    assert c.end() == ["x", "é"]


def test_jsonl_rerun_replaces_generation(ray_session, tmp_path):
    """jsonl sink rerun into the same out_dir replaces, not appends
    (2nd review, finding 4)."""
    import glob

    from aushape_ray.pipelines.events_pipeline import write_jsonl_routed

    tb = _tb([("c1", 0, "user", "node=h type=MSG hi len=2")])
    out = str(tmp_path / "sinks")
    for _ in range(2):
        counts = write_jsonl_routed(
            build_events(ray.data.from_arrow(tb), PipelineConfig(num_parts=2)),
            out)
    files = glob.glob(f"{out}/*/part-*.jsonl")
    n_lines = sum(1 for f in files for _ in open(f))
    assert counts == {"dialog_events": 1} and n_lines == 1
