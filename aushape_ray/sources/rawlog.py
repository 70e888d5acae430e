"""Raw audit.log text source — the reference's native input format.

aushape consumes auditd log lines (`node=H type=KIND
msg=audit(SECS.MS:SERIAL): k=v ...`) sequentially via auparse
(/root/reference/src/aushape.c:165-197, lib/conv.c:72-81, record
grouping by the audit(…) serial).  This source reads the same framing
into the transcript shape the rest of the engine consumes
(conv_id/turn_idx/role/text/tool/ts), so a user can point the pipeline
at real audit.log rotations instead of Parquet transcripts.

Scale shape: ONE task per log file (a rotation chunk) — the contiguity
unit auditd itself guarantees (records of one event are consecutive in
the stream), exactly like events_from_shards.  turn_idx is the line
order within each serial, ts comes from the audit(…) stamp, and the
node=/type= prefix is preserved verbatim for parse_batch.

`write_audit_log` is the inverse (transcript rows -> raw lines), used by
the round-trip test; serials are written as-is, so non-numeric conv_ids
survive (a relaxation of auditd's numeric serials).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data

# node=… is optional in auditd; the msg=audit stamp carries (ts, serial)
_LINE_RE = re.compile(
    r"^(?P<pre>(?:node=\S+ )?type=\S+) "
    r"msg=audit\((?P<sec>\d+)\.(?P<ms>\d{1,3}):(?P<serial>\S+?)\):? ?"
    r"(?P<payload>.*)$")

# kinds whose records come from tool/process activity — drives the
# any_tool sink routing the same way fixture roles do
TOOL_KINDS = frozenset({"EXECVE", "PATH", "CWD", "SYSCALL", "PROCTITLE"})

_KIND_RE = re.compile(r"type=(\S+)")


def parse_audit_lines(lines: "list[str]") -> pa.Table:
    """One log chunk's lines -> transcript-shaped Arrow table.  Lines
    that do not carry an audit stamp are skipped (auditd writes daemon
    chatter like DAEMON_START without the standard framing)."""
    conv: list[str] = []
    text: list[str] = []
    role: list[str] = []
    tool: list[str] = []
    ts: list[int] = []
    idx: list[int] = []
    seq: dict[str, int] = {}
    for line in lines:
        m = _LINE_RE.match(line.rstrip("\n"))
        if not m:
            continue
        serial = m.group("serial")
        k = seq.get(serial, 0)
        seq[serial] = k + 1
        km = _KIND_RE.search(m.group("pre"))
        kind = km.group(1) if km else "UNKNOWN"
        payload = m.group("payload")
        conv.append(serial)
        idx.append(k)
        text.append(m.group("pre") + (" " + payload if payload else ""))
        role.append("tool" if kind in TOOL_KINDS else "system")
        tool.append("audit" if kind in TOOL_KINDS else "")
        ts.append(int(m.group("sec")) * 1_000_000
                  + int(m.group("ms").ljust(3, "0")) * 1_000)
    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(np.array(idx, np.int32), pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
    })


def read_audit_log(files: "list[str]") -> "ray.data.Dataset":
    """Raw audit.log files -> transcript Dataset, one task per file
    (rotation chunk = the contiguity/resume unit)."""
    if not files:
        raise ValueError("read_audit_log: no input files")

    def load(batch) -> pa.Table:
        out = []
        for path in batch["path"]:
            with open(path, "r", encoding="utf-8", errors="replace") as f:
                out.append(parse_audit_lines(f.readlines()))
        return pa.concat_tables(out)

    return ray.data.from_items(
        [{"path": f} for f in files]).map_batches(
        load, batch_size=1, batch_format="numpy")


def format_audit_lines(tbl: pa.Table, sanitize: bool = False) -> "list[str]":
    """Transcript rows -> raw audit.log lines (inverse of
    parse_audit_lines; rows must already be in (conv_id, turn_idx)
    order within the table, as one contiguity chunk).

    Raw newlines inside a record would corrupt the line framing on
    read-back — auditd itself never emits them (the kernel hex-encodes
    such payloads).  Default: raise.  sanitize=True replaces them with
    spaces (the lossy thing log shippers do), explicitly opted into."""
    lines = []
    for cid, text, ts in zip(tbl.column("conv_id").to_pylist(),
                             tbl.column("text").to_pylist(),
                             tbl.column("ts").cast(pa.int64()).to_pylist()):
        if text and ("\n" in text or "\r" in text):
            if not sanitize:
                raise ValueError(
                    "write_audit_log: text contains a newline; pass "
                    "sanitize=True (lossy) or hex-encode upstream")
            text = text.replace("\r", " ").replace("\n", " ")
        t = text or "type=UNKNOWN"
        m = _KIND_RE.search(t)
        if m:
            cut = m.end()
            pre, payload = t[:cut], t[cut:].lstrip(" ")
        else:
            pre, payload = "type=UNKNOWN", t
        sec, us = divmod(int(ts), 1_000_000)
        stamp = f"msg=audit({sec}.{us // 1000:03d}:{cid}):"
        lines.append(" ".join(x for x in (pre, stamp, payload) if x))
    return lines


def write_audit_log(tbl: pa.Table, path: str, sanitize: bool = False) -> int:
    """Serialize one transcript chunk to a raw audit.log file; returns
    the line count (test/round-trip helper)."""
    lines = format_audit_lines(tbl, sanitize=sanitize)
    with open(path, "w", encoding="utf-8") as f:
        for ln in lines:
            f.write(ln + "\n")
    return len(lines)
