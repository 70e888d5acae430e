"""Raw audit.log text source: line parsing, framing edge cases, and an
end-to-end round trip through the distributed pipeline vs the
single-process oracle."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aushape_ray.sources.rawlog import (
    format_audit_lines,
    parse_audit_lines,
    read_audit_log,
    write_audit_log,
)


class TestLineParsing:
    def test_standard_line(self):
        t = parse_audit_lines(
            ['node=h1 type=SYSCALL msg=audit(1690000000.123:42): '
             'syscall=59 uid=0'])
        assert t.num_rows == 1
        r = t.to_pylist()[0]
        assert r["conv_id"] == "42"
        assert r["turn_idx"] == 0
        assert r["text"] == "node=h1 type=SYSCALL syscall=59 uid=0"
        assert r["role"] == "tool"
        assert r["ts"].timestamp() == 1690000000.123

    def test_no_node_and_short_ms(self):
        t = parse_audit_lines(['type=LOGIN msg=audit(5.7:x9): uid=1'])
        r = t.to_pylist()[0]
        assert r["conv_id"] == "x9"
        assert r["text"] == "type=LOGIN uid=1"
        assert r["role"] == "system"
        # ".7" means 700 ms, not 7 ms (left-aligned fraction)
        assert r["ts"].timestamp() == 5.7

    def test_chatter_skipped_and_serial_sequencing(self):
        t = parse_audit_lines([
            "auditd started",  # daemon chatter: no audit stamp
            "type=A msg=audit(1.000:7): k=1",
            "type=B msg=audit(1.000:8): k=2",
            "type=C msg=audit(1.001:7): k=3",  # serial 7 continues
        ])
        rows = t.to_pylist()
        assert [(r["conv_id"], r["turn_idx"]) for r in rows] == [
            ("7", 0), ("8", 0), ("7", 1)]

    def test_empty_payload(self):
        t = parse_audit_lines(["type=EOE msg=audit(2.000:5):"])
        assert t.to_pylist()[0]["text"] == "type=EOE"

    def test_format_parse_inverse(self):
        tbl = pa.table({
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": pa.array(["system", "tool", "system"], pa.string()),
            "text": pa.array(["node=n type=LOGIN uid=5",
                              "node=n type=EXECVE argc=1 a0=\"ls\"",
                              "type=MSG p=1"], pa.string()),
            "tool": pa.array(["", "shell", ""], pa.string()),
            "ts": pa.array([1_000_000, 2_000_000, 3_500_000],
                           pa.timestamp("us")),
        })
        back = parse_audit_lines(format_audit_lines(tbl))
        assert back.column("conv_id").to_pylist() == ["c1", "c1", "c2"]
        assert back.column("turn_idx").to_pylist() == [0, 1, 0]
        assert back.column("text").to_pylist() == tbl.column(
            "text").to_pylist()
        assert back.column("ts").to_pylist() == tbl.column(
            "ts").to_pylist()


def test_rawlog_roundtrip_pipeline_vs_oracle(ray_session, tmp_path):
    """sf0.001 transcripts -> raw audit.log chunks -> read_audit_log ->
    distributed shuffle pipeline == single-process oracle over the very
    same parsed table (routed counts and event count)."""
    from aushape_ray.config import PipelineConfig
    from aushape_ray.fixtures import transcripts_path
    from aushape_ray.oracle import assemble_events, sink_counts as osc
    from aushape_ray.pipelines.events_pipeline import (build_events,
                                                       sink_counts)

    src = pq.read_table(transcripts_path("/root/testdata/sf0.001"))
    src = src.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    # split into two chunk files at a conversation boundary
    conv = src.column("conv_id").to_pylist()
    half_conv = conv[len(conv) // 2]
    cut = next(i for i, c in enumerate(conv) if c >= half_conv
               and (i == 0 or conv[i - 1] < half_conv))
    f1, f2 = str(tmp_path / "audit.log.1"), str(tmp_path / "audit.log.2")
    # the corpus contains control-char texts -> sanitize (lossy but
    # consistent: the oracle runs on the same read-back table)
    n1 = write_audit_log(src.slice(0, cut), f1, sanitize=True)
    n2 = write_audit_log(src.slice(cut), f2, sanitize=True)
    assert n1 and n2

    # reader output table for the oracle side (same data both sides)
    parsed = pa.Table.from_pylist(read_audit_log([f1, f2]).take_all())

    cfg = PipelineConfig(num_parts=8)
    events = build_events(read_audit_log([f1, f2]), cfg)
    got = {r["sink"]: r["count()"]
           for r in sink_counts(events).take_all()}
    oracle_events = assemble_events(parsed)
    want = osc(oracle_events)
    assert got == want
    # every conversation yields at most one event; the corpus has one
    # all-EOE conversation that assembles to None on both sides
    assert sum(got.values()) == len(oracle_events)
    assert len(set(conv)) - 1 <= len(oracle_events) <= len(set(conv))


def test_writer_rejects_embedded_newlines():
    tbl = pa.table({
        "conv_id": pa.array(["c1"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["system"], pa.string()),
        "text": pa.array(["type=MSG a=1\nb=2"], pa.string()),
        "tool": pa.array([""], pa.string()),
        "ts": pa.array([1], pa.timestamp("us")),
    })
    with pytest.raises(ValueError, match="newline"):
        format_audit_lines(tbl)


from hypothesis import given, settings
from hypothesis import strategies as st

_payload_char = st.characters(
    blacklist_characters="\n\r", blacklist_categories=("Cs",))


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1, max_size=8),                       # serial
        st.text(alphabet=_payload_char, max_size=40),          # payload
        st.integers(min_value=0, max_value=2**40),             # ts ms
    ), max_size=20))
def test_rawlog_roundtrip_property(rows):
    """format -> parse is the identity on (conv_id, text, ts-at-ms) for
    any newline-free payload and serial token."""
    tbl_rows = []
    per_serial: dict = {}
    for serial, payload, ts_ms in rows:
        k = per_serial.get(serial, 0)
        per_serial[serial] = k + 1
        text = ("type=KIND " + payload).strip()
        tbl_rows.append({
            "conv_id": serial, "turn_idx": k, "role": "system",
            "text": text, "tool": "", "ts": ts_ms * 1000})
    if not tbl_rows:
        return
    tbl = pa.table({
        "conv_id": pa.array([r["conv_id"] for r in tbl_rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in tbl_rows], pa.int32()),
        "role": pa.array([r["role"] for r in tbl_rows], pa.string()),
        "text": pa.array([r["text"] for r in tbl_rows], pa.string()),
        "tool": pa.array([r["tool"] for r in tbl_rows], pa.string()),
        "ts": pa.array([r["ts"] for r in tbl_rows], pa.timestamp("us")),
    })
    back = parse_audit_lines(format_audit_lines(tbl))
    assert back.column("conv_id").to_pylist() == tbl.column(
        "conv_id").to_pylist()
    # the writer normalizes the space run at the stamp boundary, so the
    # round trip is canonical up to whitespace-run collapse
    got_texts = back.column("text").to_pylist()
    want_texts = [" ".join((t or "").split()) for t in
                  tbl.column("text").to_pylist()]
    assert [" ".join(t.split()) for t in got_texts] == want_texts
    assert back.column("ts").cast(pa.int64()).to_pylist() == tbl.column(
        "ts").cast(pa.int64()).to_pylist()


def test_rawlog_resume_skips_completed_shards(ray_session, tmp_path):
    """run_resumable over raw log rotations: first run processes all
    files, second run skips everything; totals stable."""
    from aushape_ray.config import PipelineConfig
    from aushape_ray.fixtures import transcripts_path
    from aushape_ray.state.manifest import run_resumable

    src = pq.read_table(transcripts_path("/root/testdata/sf0.001"))
    src = src.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = src.column("conv_id").to_pylist()
    half_conv = conv[len(conv) // 2]
    cut = next(i for i, c in enumerate(conv) if c >= half_conv
               and (i == 0 or conv[i - 1] < half_conv))
    in_dir = tmp_path / "logs"
    in_dir.mkdir()
    write_audit_log(src.slice(0, cut), str(in_dir / "audit.log.1"),
                    sanitize=True)
    write_audit_log(src.slice(cut), str(in_dir / "audit.log.2"),
                    sanitize=True)
    out = tmp_path / "out"
    cfg = PipelineConfig(num_parts=4)
    r1 = run_resumable(str(in_dir), str(out), cfg, input_format="rawlog")
    assert r1["processed"] == 2 and r1["skipped"] == 0
    r2 = run_resumable(str(in_dir), str(out), cfg, input_format="rawlog")
    assert r2["processed"] == 0 and r2["skipped"] == 2
    assert r1["sink_counts"] == r2["sink_counts"]
    assert sum(r1["sink_counts"].values()) > 90


def test_rawlog_resume_rejects_split_conversation(ray_session, tmp_path):
    """A serial spanning two rotation files must be rejected (per-file
    assembly would emit two half events)."""
    from aushape_ray.config import PipelineConfig
    from aushape_ray.state.manifest import run_resumable

    (tmp_path / "a.log").write_text(
        "type=A msg=audit(1.000:s1): k=1\n"
        "type=A msg=audit(1.000:s2): k=1\n")
    (tmp_path / "b.log").write_text(
        "type=B msg=audit(1.001:s2): k=2\n")
    with pytest.raises(ValueError, match="contiguous"):
        run_resumable(str(tmp_path), str(tmp_path / "out"),
                      PipelineConfig(), input_format="rawlog")


def test_jsonl_source_matches_parquet_pipeline(ray_session, tmp_path):
    """JSONL transcripts through build_events == the same rows read from
    parquet (routed counts)."""
    import json

    from aushape_ray.config import PipelineConfig
    from aushape_ray.fixtures import transcripts_path
    from aushape_ray.oracle import assemble_events, sink_counts as osc
    from aushape_ray.pipelines.events_pipeline import (build_events,
                                                       sink_counts)
    from aushape_ray.sources.jsonl import read_transcripts_jsonl

    src = pq.read_table(transcripts_path("/root/testdata/sf0.001"))
    d = tmp_path / "jl"
    d.mkdir()
    rows = src.to_pylist()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(d / f"part-{i}.jsonl", "w") as f:
            for r in chunk:
                r = dict(r)
                r["ts"] = r["ts"].isoformat()
                f.write(json.dumps(r) + "\n")

    cfg = PipelineConfig(num_parts=8)
    events = build_events(read_transcripts_jsonl(str(d)), cfg)
    got = {r["sink"]: r["count()"] for r in sink_counts(events).take_all()}
    want = osc(assemble_events(src))
    assert got == want


def test_cli_rawlog_to_syslog_discrete(ray_session, tmp_path):
    """The audispd-plugin configuration (SURVEY §3.2), end to end on the
    reference's native input: raw audit.log in, one RFC3164-framed
    syslog message per event out (events_per_doc=0 discrete mode)."""
    import glob
    import re

    from aushape_ray.__main__ import main
    from aushape_ray.fixtures import transcripts_path

    src = pq.read_table(transcripts_path("/root/testdata/sf0.001"))
    src = src.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    in_dir = tmp_path / "logs"
    in_dir.mkdir()
    write_audit_log(src, str(in_dir / "audit.log"), sanitize=True)
    out = tmp_path / "out"
    rc = main([str(in_dir), str(out), "--input-format", "rawlog",
               "--format", "syslog", "--events-per-doc", "0",
               "--num-parts", "4"])
    assert rc == 0
    lines = []
    for f in glob.glob(str(out / "**" / "*"), recursive=True):
        import os
        if os.path.isfile(f):
            with open(f) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    # one framed message per assembled event (99: one all-EOE conv
    # yields no event), each with a <PRI> prefix and a JSON body
    assert len(lines) == 99
    pri = re.compile(r"^<\d{1,3}>")
    import json as _json
    for ln in lines:
        assert pri.match(ln), ln[:40]
        doc = _json.loads(ln[pri.match(ln).end():])
        assert "serial" in doc


def test_rawlog_gzip_matches_plain(ray_session, tmp_path):
    """A gzipped rotation (.gz) reads identically to the plain file —
    mixed plain+gz inputs produce the same transcript table."""
    import numpy as np

    src = pq.read_table(
        __import__("aushape_ray.fixtures", fromlist=["transcripts_path"])
        .transcripts_path("/root/testdata/sf0.001"))
    src = src.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    half = src.num_rows // 2
    p1 = str(tmp_path / "audit.log.1")
    p2 = str(tmp_path / "audit.log.2")
    g2 = str(tmp_path / "audit.log.2.gz")
    write_audit_log(src.slice(0, half), p1, sanitize=True)
    write_audit_log(src.slice(half), p2, sanitize=True)
    write_audit_log(src.slice(half), g2, sanitize=True)

    plain = pa.Table.from_pylist(sorted(
        read_audit_log([p1, p2]).take_all(),
        key=lambda r: (r["conv_id"], r["turn_idx"], r["text"])))
    mixed = pa.Table.from_pylist(sorted(
        read_audit_log([p1, g2]).take_all(),
        key=lambda r: (r["conv_id"], r["turn_idx"], r["text"])))
    assert plain.equals(mixed)
    assert plain.num_rows > 0


def test_csv_source_matches_parquet_pipeline(ray_session, tmp_path):
    """CSV transcripts (round-tripped through the inverse writer, split
    across two files) through build_events == the parquet pipeline's
    routed counts — including embedded-newline/quote/unicode texts."""
    from aushape_ray.config import PipelineConfig
    from aushape_ray.fixtures import transcripts_path
    from aushape_ray.oracle import assemble_events, sink_counts as osc
    from aushape_ray.pipelines.events_pipeline import (build_events,
                                                       sink_counts)
    from aushape_ray.sources.csvsrc import (read_transcripts_csv,
                                            write_transcripts_csv)

    src = pq.read_table(transcripts_path("/root/testdata/sf0.001"))
    d = tmp_path / "csv"
    d.mkdir()
    half = src.num_rows // 2
    write_transcripts_csv(src.slice(0, half), str(d / "part-0.csv"))
    write_transcripts_csv(src.slice(half), str(d / "part-1.csv"))

    cfg = PipelineConfig(num_parts=8)
    events = build_events(read_transcripts_csv(str(d)), cfg)
    got = {r["sink"]: r["count()"] for r in sink_counts(events).take_all()}
    want = osc(assemble_events(src))
    assert got == want
