"""Single-process reference implementation (the pytest oracle).

Replays the reference pipeline's semantics — parse k=v fields, interpret,
coalesce per conversation, trim, route — in one plain Python loop with no
Ray, mirroring the one-event-in-flight execution of
/root/reference/lib/conv.c:72-173.  The distributed pipeline
(aushape_ray.pipelines.events_pipeline) must match this exactly:
per-sink counts, routed-row equality, per-turn text equality under stable
turn ordering (the north rule).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from .collectors import EventAssembler, route_sink, trim_doc
from .grammar import PSEUDO_FIELDS, TOKEN_RE, interpret_field, strip_quotes
from .jsonenc import encode_doc


_DAY_PREFIX_CACHE: dict[int, str] = {}


def format_time_us(us: int) -> str:
    """epoch-us -> ISO-8601 with milliseconds, UTC-naive (lib/conv_buf.c:399-404).

    The date prefix is strftime'd once per distinct day and cached (one
    assemble partition spans few days; strftime per event was ~5% of the
    stage) — the time-of-day part is plain integer arithmetic.  divmod
    floors, so negative (pre-1970) timestamps land on the correct day with
    a non-negative remainder, exactly like the timedelta construction."""
    day, rem = divmod(int(us), 86_400_000_000)
    prefix = _DAY_PREFIX_CACHE.get(day)
    if prefix is None:
        import datetime

        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(days=day)
        prefix = dt.strftime("%Y-%m-%dT")
        if len(_DAY_PREFIX_CACHE) > 8192:  # bound worker memory
            _DAY_PREFIX_CACHE.clear()
        _DAY_PREFIX_CACHE[day] = prefix
    sec, usec = divmod(rem, 1_000_000)
    h, sec = divmod(sec, 3600)
    m, sec = divmod(sec, 60)
    return f"{prefix}{h:02d}:{m:02d}:{sec:02d}.{usec // 1000:03d}"


def parse_text(text: str):
    """One turn's text -> (node, kind, [(key, raw, interpreted), ...])."""
    node = None
    kind = "UNKNOWN"
    fields = []
    for m in TOKEN_RE.finditer(text):
        key, val = m.group(1), m.group(2)
        if key == PSEUDO_FIELDS[0]:  # node
            if node is None:
                node = val
            continue
        if key == PSEUDO_FIELDS[1]:  # type
            kind = val
            continue
        raw = strip_quotes(val)
        fields.append((key, raw, interpret_field(key, raw)))
    return node, kind, fields


def assemble_events(table: pa.Table, with_text: bool = True,
                    with_norm: bool = False,
                    max_event_size: int | None = None) -> list[dict]:
    """Assemble event rows from a transcript table (any row order)."""
    cols = {c: table.column(c).to_pylist() for c in
            ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    cols["text"] = [t if t is not None else "" for t in cols["text"]]
    ts_us = table.column("ts").cast(pa.int64()).to_pylist()
    by_conv: dict[str, list[int]] = defaultdict(list)
    for i, cid in enumerate(cols["conv_id"]):
        by_conv[cid].append(i)

    out = []
    # None (null conv_id) is a legal key — one conversation, sorted first
    for cid in sorted(by_conv, key=lambda c: (c is not None, c or "")):
        idxs = sorted(by_conv[cid], key=lambda i: cols["turn_idx"][i])
        asm = EventAssembler(with_text=with_text, with_norm=with_norm)
        any_tool = False
        for i in idxs:
            node, kind, fields = parse_text(cols["text"][i])
            asm.add_turn(kind, node, cols["text"][i], fields)
            if cols["role"][i] == "tool":
                any_tool = True
        ts_first = ts_us[idxs[0]]
        doc = asm.end(cid, format_time_us(ts_first))
        if doc is None:
            continue
        doc = trim_doc(doc, max_event_size)
        sink = route_sink(asm.error, any_tool)
        doc_str = encode_doc(doc)
        out.append({
            "conv_id": cid,
            "ts_first": ts_first,
            "node": asm.node,
            "n_turns": len(idxs),
            "n_records": asm.n_records,
            "sink": sink,
            "error": asm.error,
            "text": asm.texts if with_text else [],
            "trimmed": doc.get("trimmed", []),
            "doc": doc_str,
            "doc_bytes": len(doc_str.encode("utf-8")),
        })
    return out


def sink_counts(events: list[dict]) -> dict[str, int]:
    counts: dict[str, int] = defaultdict(int)
    for e in events:
        counts[e["sink"]] += 1
    return dict(counts)
