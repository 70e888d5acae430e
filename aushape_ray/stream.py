"""Library embedding API — the conv.h surface (§3.3).

Mirrors the reference's strict call-order contract
(/root/reference/include/aushape/conv.h:61-162, notes.txt:209-217):

    conv = StreamConverter(cfg)        # aushape_conv_create
    conv.begin()                       # aushape_conv_begin
    events += conv.input(rows)         # aushape_conv_input (feed, any split)
    events += conv.flush()             # aushape_conv_flush (finalize pending)
    conv.end()                         # aushape_conv_end
    conv.state, conv.rc                # latched state / error contract

Single-process, one conversation in flight (the reference's execution
model): rows must arrive grouped by conversation and ordered by turn_idx
within it — exactly the stream contiguity auparse assumes.  An event is
emitted when the next conversation's first row arrives or on flush().
Per-conversation errors latch into the event's `error` (never raised);
call-order violations raise (the reference's AUSHAPE_RC_INVALID_STATE).
"""

from __future__ import annotations


from .collectors import EventAssembler, route_sink, trim_doc
from .config import PipelineConfig
from .jsonenc import encode_doc
from .oracle import format_time_us, parse_text


class StateError(RuntimeError):
    """Call-order violation (AUSHAPE_RC_INVALID_STATE analogue)."""


class StreamConverter:
    CREATED, BEGUN, ENDED = "created", "begun", "ended"

    def __init__(self, cfg: PipelineConfig = PipelineConfig(),
                 events_per_doc: "int | str | None" = None) -> None:
        """events_per_doc (A1 semantics, lib/conv.c:84-172):
        None  document batching DISABLED (default — nothing is buffered,
              a long-running embedding loop holds only the current
              conversation);
        > 0   count-bounded documents (close when the count is hit);
        < 0   BYTE-bounded (close when accumulated doc bytes reach -value);
        0     bare mode: every event is its own document;
        "all" one document for the whole stream (SSIZE_MAX analogue,
              closed at end()).
        Completed documents must be consumed via drain_documents().
        """
        self.cfg = cfg
        self.events_per_doc = events_per_doc
        self.state = self.CREATED
        self.rc = None
        self._cur_conv: str | None = None
        self._asm: EventAssembler | None = None
        self._any_tool = False
        self._ts_first: int | None = None
        self._n_turns = 0
        self.events_out = 0
        self._doc_events: list[dict] = []
        self._doc_bytes = 0
        self._docs: list[dict] = []

    def begin(self) -> None:
        if self.state != self.CREATED:
            raise StateError(f"begin() in state {self.state}")
        self.state = self.BEGUN

    def input(self, rows) -> list[dict]:
        """Feed rows (dicts with conv_id, turn_idx, role, text, tool, ts —
        ts as epoch-us int or timestamp); returns completed events."""
        if self.state != self.BEGUN:
            raise StateError(f"input() in state {self.state}")
        out: list[dict] = []
        for row in rows:
            cid = row["conv_id"]
            if cid != self._cur_conv:
                ev = self._close()
                if ev is not None:
                    out.append(ev)
                self._open(cid)
            node, kind, fields = parse_text(row.get("text") or "")
            self._asm.add_turn(kind, node, row.get("text") or "", fields)
            if row.get("role") == "tool":
                self._any_tool = True
            if self._ts_first is None:
                ts = row.get("ts")
                self._ts_first = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") else int(ts)
            self._n_turns += 1
        return out

    def flush(self) -> list[dict]:
        """Finalize the pending conversation (aushape_conv_flush)."""
        if self.state != self.BEGUN:
            raise StateError(f"flush() in state {self.state}")
        ev = self._close()
        return [ev] if ev is not None else []

    def end(self) -> None:
        if self.state != self.BEGUN:
            raise StateError(f"end() in state {self.state}")
        if self._cur_conv is not None:
            raise StateError("end() with pending conversation; flush() first")
        if self._doc_events:  # final epilogue (lib/conv.c:264-301)
            self._close_doc()
        self.state = self.ENDED

    def drain_documents(self) -> list[dict]:
        """Completed documents since the last drain (A3 discrete-sink
        buffering: a document is only visible once whole)."""
        out, self._docs = self._docs, []
        return out

    def _add_to_doc(self, ev: dict) -> None:
        epd = self.events_per_doc
        if epd is None:
            return  # batching disabled: never buffer
        if epd == 0:  # bare mode: one event per document
            self._docs.append({"events": [ev], "n_events": 1,
                               "n_bytes": ev["doc_bytes"]})
            return
        self._doc_events.append(ev)
        self._doc_bytes += ev["doc_bytes"]
        if epd == "all":
            return  # single all-stream document, closed at end()
        if (epd > 0 and len(self._doc_events) >= epd) or \
           (epd < 0 and self._doc_bytes >= -epd):
            self._close_doc()

    def _close_doc(self) -> None:
        self._docs.append({
            "events": self._doc_events,
            "n_events": len(self._doc_events),
            "n_bytes": self._doc_bytes,
        })
        self._doc_events = []
        self._doc_bytes = 0

    # -- internals ---------------------------------------------------------

    def _open(self, cid: str) -> None:
        self._cur_conv = cid
        self._asm = EventAssembler(with_text=self.cfg.with_text,
                                   with_norm=self.cfg.with_norm)
        self._any_tool = False
        self._ts_first = None
        self._n_turns = 0

    def _close(self) -> dict | None:
        if self._cur_conv is None:
            return None
        asm, cid = self._asm, self._cur_conv
        doc = asm.end(cid, format_time_us(self._ts_first or 0))
        self._cur_conv = None
        if doc is None:
            return None
        doc = trim_doc(doc, self.cfg.max_event_size)
        self.events_out += 1
        ev = self._event_row(asm, cid, doc)
        self._add_to_doc(ev)
        return ev

    def _event_row(self, asm: EventAssembler, cid: str, doc: dict) -> dict:
        doc_str = encode_doc(doc)
        return {
            "conv_id": cid,
            "ts_first": self._ts_first,
            "node": asm.node,
            "n_turns": self._n_turns,
            "n_records": asm.n_records,
            "sink": route_sink(asm.error, self._any_tool),
            "error": asm.error,
            "text": asm.texts if self.cfg.with_text else [],
            "trimmed": doc.get("trimmed", []),
            "doc": doc_str,
            "doc_bytes": len(doc_str.encode("utf-8")),
        }
