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

# kinds whose records come from tool/process activity — drives the
# any_tool sink routing the same way fixture roles do
TOOL_KINDS = frozenset({"EXECVE", "PATH", "CWD", "SYSCALL", "PROCTITLE"})

_KIND_RE = re.compile(r"type=(\S+)")


# auditd line framing as an RE2 pattern for the vectorized extract
# (node= is optional; the msg=audit stamp carries ts + serial)
_ARROW_LINE_RE = (r"^(?P<pre>(?:node=\S+ )?type=(?P<kind>\S+)) "
                  r"msg=audit\((?P<sec>\d+)\.(?P<ms>\d{1,3}):"
                  r"(?P<serial>\S+?)\):? ?(?P<payload>.*)$")


def parse_audit_lines(lines: "list[str]") -> pa.Table:
    """One log chunk's lines -> transcript-shaped Arrow table.  Lines
    that do not carry an audit stamp are skipped (auditd writes daemon
    chatter like DAEMON_START without the standard framing).

    Vectorized: ONE pc.extract_regex pass over the line array (RE2),
    null-filter for chatter, numeric casts + a factorize/stable-sort
    cumcount for the per-serial turn_idx — ~6x the per-line Python
    regex loop at 1M lines (scalar parity held by the framing tests and
    the hypothesis round-trip property)."""
    import pyarrow.compute as pc

    arr = pa.array([ln.rstrip("\n") for ln in lines], pa.string())
    if len(arr) == 0:
        return _EMPTY_TRANSCRIPTS
    ext = pc.extract_regex(arr, _ARROW_LINE_RE)
    keep = pc.is_valid(ext)
    ext = ext.filter(keep)
    n = len(ext)
    if n == 0:
        return _EMPTY_TRANSCRIPTS
    serial = pc.struct_field(ext, "serial")
    kind = pc.struct_field(ext, "kind")
    pre = pc.struct_field(ext, "pre")
    payload = pc.struct_field(ext, "payload")
    # text = pre [+ " " + payload]
    joined = pc.binary_join_element_wise(pre, payload, " ")
    text = pc.if_else(pc.equal(payload, ""), pre, joined)
    # ts: SECS * 1e6 + left-aligned ms fraction ("7" == 700ms) * 1e3
    sec = pc.cast(pc.struct_field(ext, "sec"), pa.int64()).to_numpy(
        zero_copy_only=False)
    ms_str = pc.struct_field(ext, "ms")
    ms = pc.cast(ms_str, pa.int64()).to_numpy(zero_copy_only=False)
    ms_len = pc.utf8_length(ms_str).to_numpy(zero_copy_only=False)
    ms = ms * np.power(10, 3 - ms_len)
    ts = sec * 1_000_000 + ms * 1_000
    # per-serial cumcount in line order: factorize + stable sort
    import pandas as pd

    codes, _ = pd.factorize(serial.to_numpy(zero_copy_only=False))
    order = np.argsort(codes, kind="stable")
    counts = np.bincount(codes)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos_sorted = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    idx = np.empty(n, dtype=np.int64)
    idx[order] = pos_sorted
    is_tool = pc.is_in(kind, value_set=pa.array(sorted(TOOL_KINDS)))
    return pa.table({
        "conv_id": serial,
        "turn_idx": pa.array(idx.astype(np.int32), pa.int32()),
        "role": pc.if_else(is_tool, pa.scalar("tool"), pa.scalar("system")),
        "text": text,
        "tool": pc.if_else(is_tool, pa.scalar("audit"), pa.scalar("")),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


_EMPTY_TRANSCRIPTS = pa.table({
    "conv_id": pa.array([], pa.string()),
    "turn_idx": pa.array([], pa.int32()),
    "role": pa.array([], pa.string()),
    "text": pa.array([], pa.string()),
    "tool": pa.array([], pa.string()),
    "ts": pa.array([], pa.timestamp("us")),
})


def _open_log(path: str):
    """Plain or gzip-compressed log, by suffix (rotated auditd logs are
    commonly gzipped: audit.log.1.gz).  gzip members are NOT splittable,
    which is fine here — the read unit is already one whole rotation
    file per task; at cluster scale rotation sizing bounds task skew."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt", encoding="utf-8", errors="replace")
    return open(path, "r", encoding="utf-8", errors="replace")


def read_audit_log(files: "list[str]") -> "ray.data.Dataset":
    """Raw audit.log files (plain or .gz) -> transcript Dataset, one
    task per file (rotation chunk = the contiguity/resume unit)."""
    if not files:
        raise ValueError("read_audit_log: no input files")

    def load(batch) -> pa.Table:
        out = []
        for path in batch["path"]:
            with _open_log(path) as f:
                out.append(parse_audit_lines(f.readlines()))
        return pa.concat_tables(out)

    # num_cpus=1.01 deliberately breaks operator fusion with downstream
    # map stages: fused, the batch_size=1 load chain feeds the sort
    # exchange ~6x slower (23.7s vs 4.2s for the full event build at 1M
    # lines) — the per-path task granularity must end at the load
    return ray.data.from_items(
        [{"path": f} for f in files]).map_batches(
        load, batch_size=1, batch_format="numpy", num_cpus=1.01)


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
    """Serialize one transcript chunk to a raw audit.log file (gzipped
    when path ends in .gz); returns the line count (test/round-trip
    helper)."""
    lines = format_audit_lines(tbl, sanitize=sanitize)
    if path.endswith(".gz"):
        import gzip

        f = gzip.open(path, "wt", encoding="utf-8")
    else:
        f = open(path, "w", encoding="utf-8")
    with f:
        for ln in lines:
            f.write(ln + "\n")
    return len(lines)
