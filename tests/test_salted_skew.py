"""Salted-key skew handling: hot conversations split into contiguous turn
ranges, partially assembled, merged — results identical to the unsalted
path and the oracle."""

import pyarrow as pa
import pytest

import ray.data

from aushape_ray.config import PipelineConfig
from aushape_ray.oracle import assemble_events
from aushape_ray.pipelines.events_pipeline import build_events


def _mk(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array(list(range(1, len(rows) + 1)), pa.timestamp("us")),
    })


def test_salted_corpus_matches_oracle(ray_session, tiny_transcripts, oracle_events):
    """The fixture corpus's hot conversations (80-160 turns) get salted at
    threshold 40; every doc must still match the oracle byte-for-byte."""
    cfg = PipelineConfig(num_parts=16, salt_threshold=40, n_salts=4)
    rows = build_events(ray.data.from_arrow(tiny_transcripts), cfg).take_all()
    exp = {e["conv_id"]: e for e in oracle_events}
    assert len(rows) == len(exp)
    n_hot = sum(1 for e in oracle_events if e["n_turns"] > 40)
    assert n_hot >= 1, "corpus must contain hot conversations"
    for r in rows:
        e = exp[r["conv_id"]]
        assert r["doc"] == e["doc"], r["conv_id"]
        assert r["sink"] == e["sink"]
        assert r["n_turns"] == e["n_turns"]


def test_salted_collectors_across_boundaries(ray_session):
    """A conversation whose EXECVE slices, PATH items and repeated records
    cross salt boundaries must reassemble exactly."""
    rows = [("c1", 0, "user", "node=h1 type=MSG start argc-soon", "")]
    # execve: argc + sliced arg spanning many turns
    rows.append(("c1", 1, "tool", 'node=h1 type=EXECVE argc=3 a0="run"', "shell"))
    val = "abcdefghij"
    h = val.encode().hex()
    rows.append(("c1", 2, "tool", f"node=h1 type=EXECVE a1_len={len(val)} a1[0]={h[:8]}", "shell"))
    for t in range(3, 20):
        rows.append(("c1", t, "assistant", f"node=h1 type=MSG filler {t} len=1", ""))
    rows.append(("c1", 20, "tool", f"node=h1 type=EXECVE a1[1]={h[8:]}", "shell"))
    rows.append(("c1", 21, "tool", 'node=h1 type=EXECVE a2="end"', "shell"))
    # path items out of order across boundaries
    rows.append(("c1", 22, "tool", 'node=h1 type=PATH item=1 name="/b" mode=0644', "reader"))
    for t in range(23, 38):
        rows.append(("c1", t, "tool", f"node=h1 type=AVC deny={t} perm=read", "shell"))
    rows.append(("c1", 38, "tool", 'node=h1 type=PATH item=0 name="/a" mode=0644', "reader"))
    rows.append(("c1", 39, "system", "node=h1 type=EOE", ""))
    tb = _mk(rows)

    oracle = assemble_events(tb)
    assert len(oracle) == 1 and oracle[0]["error"] is None
    import json

    data = json.loads(oracle[0]["doc"])["data"]
    assert data["execve"] == ["run", "abcdefghij", "end"]
    assert [p["name"][0] for p in data["path"]] == ["/a", "/b"]
    assert len(data["avc"]) == 15

    cfg = PipelineConfig(num_parts=8, salt_threshold=5, n_salts=8)
    got = build_events(ray.data.from_arrow(tb), cfg).take_all()
    assert len(got) == 1
    assert got[0]["doc"] == oracle[0]["doc"]
    assert got[0]["n_turns"] == 40


def test_salted_error_conv(ray_session):
    """An error in one salt range latches for the whole conversation."""
    rows = []
    for t in range(30):
        rows.append(("e1", t, "user", f"node=h1 type=MSG m {t}", ""))
    rows.append(("e1", 30, "system", "node=h1 type=LOGIN uid=1 exit=0", ""))
    rows.append(("e1", 31, "system", "node=h1 type=LOGIN uid=2 exit=0", ""))
    tb = _mk(rows)
    oracle = assemble_events(tb)
    assert oracle[0]["error"] == "repeated record kind LOGIN"
    cfg = PipelineConfig(num_parts=8, salt_threshold=6, n_salts=6)
    got = build_events(ray.data.from_arrow(tb), cfg).take_all()
    assert len(got) == 1
    assert got[0]["error"] == oracle[0]["error"]
    assert got[0]["sink"] == "error_events"
    assert list(got[0]["text"]) == oracle[0]["text"]
