"""Library embedding API (conv.h analogue): call-order contract and
equivalence with the batch oracle."""

import pytest

from aushape_ray.config import PipelineConfig
from aushape_ray.oracle import assemble_events
from aushape_ray.stream import StateError, StreamConverter


def rows_of(table):
    ts = table.column("ts").cast("int64").to_pylist()
    cols = {c: table.column(c).to_pylist() for c in
            ("conv_id", "turn_idx", "role", "text", "tool")}
    return [dict(conv_id=cols["conv_id"][i], turn_idx=cols["turn_idx"][i],
                 role=cols["role"][i], text=cols["text"][i],
                 tool=cols["tool"][i], ts=ts[i])
            for i in range(table.num_rows)]


def test_stream_matches_oracle(tiny_transcripts, oracle_events):
    conv = StreamConverter(PipelineConfig())
    conv.begin()
    rows = rows_of(tiny_transcripts)
    # feed in arbitrary chunk splits (the 4 KiB chunk analogue)
    events = []
    for i in range(0, len(rows), 7):
        events += conv.input(rows[i:i + 7])
    events += conv.flush()
    conv.end()
    exp = {e["conv_id"]: e for e in oracle_events}
    assert len(events) == len(exp)
    for ev in events:
        e = exp[ev["conv_id"]]
        assert ev["doc"] == e["doc"], ev["conv_id"]
        assert ev["sink"] == e["sink"]
    assert conv.events_out == len(exp)


def test_call_order_contract():
    c = StreamConverter()
    with pytest.raises(StateError):
        c.input([])
    with pytest.raises(StateError):
        c.flush()
    c.begin()
    with pytest.raises(StateError):
        c.begin()
    c.input([{"conv_id": "x", "turn_idx": 0, "role": "user",
              "text": "type=MSG hi", "tool": "", "ts": 1}])
    with pytest.raises(StateError):
        c.end()  # pending conversation: flush first
    assert len(c.flush()) == 1
    c.end()
    with pytest.raises(StateError):
        c.input([])


def test_flush_is_idempotent_and_empty_conv_dropped():
    c = StreamConverter()
    c.begin()
    assert c.flush() == []
    c.input([{"conv_id": "e", "turn_idx": 0, "role": "system",
              "text": "type=EOE", "tool": "", "ts": 1}])
    assert c.flush() == []  # EOE-only conversation -> no event
    c.end()


class TestDocumentBatching:
    """A1 semantics: count-bounded, byte-bounded, bare, all-in-one."""

    def _feed(self, epd):
        from aushape_ray.fixtures import generate_transcripts

        tb = generate_transcripts(60)
        c = StreamConverter(PipelineConfig(), events_per_doc=epd)
        c.begin()
        c.input(rows_of(tb))
        c.flush()
        c.end()
        return c, c.drain_documents()

    def test_count_bounded(self):
        c, docs = self._feed(5)
        assert sum(d["n_events"] for d in docs) == c.events_out
        assert all(d["n_events"] == 5 for d in docs[:-1])
        assert docs[-1]["n_events"] <= 5

    def test_byte_bounded(self):
        c, docs = self._feed(-4096)
        assert sum(d["n_events"] for d in docs) == c.events_out
        # every doc except the last crossed the byte bound when closed
        for d in docs[:-1]:
            assert d["n_bytes"] >= 4096
            # and was below it before its last event was added
            assert d["n_bytes"] - d["events"][-1]["doc_bytes"] < 4096

    def test_bare_mode(self):
        c, docs = self._feed(0)
        assert len(docs) == c.events_out
        assert all(d["n_events"] == 1 for d in docs)

    def test_all_in_one(self):
        c, docs = self._feed("all")
        assert len(docs) == 1
        assert docs[0]["n_events"] == c.events_out

    def test_disabled_by_default_no_buffering(self):
        c, docs = self._feed(None)
        assert docs == []
        assert c._docs == [] and c._doc_events == []  # nothing retained
