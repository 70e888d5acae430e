"""Collector state machines — the reference's contract table
(include/aushape/coll.h:20-43) and per-collector semantics."""

import pytest

from aushape_ray.collectors import (
    CollectError,
    EventAssembler,
    ExecveCollector,
    PathCollector,
    RepCollector,
    route_sink,
    trim_doc,
    doc_size,
)


def F(k, v, i=None):
    return (k, v, v if i is None else i)


class TestExecve:
    def test_whole_args(self):
        c = ExecveCollector()
        c.add([F("argc", "3"), F("a0", "ls")])
        c.add([F("a1", "-l"), F("a2", "/tmp")])
        assert c.end() == ["ls", "-l", "/tmp"]

    def test_sliced_arg_reassembly(self):
        c = ExecveCollector()
        c.add([F("argc", "2"), F("a0", "echo")])
        c.add([F("a1_len", "10"), F("a1[0]", "6162636465", "abcde")])
        c.add([F("a1[1]", "6667686970", "fghip")])
        assert c.end() == ["echo", "abcdefghip"]

    def test_skipped_args_filled_empty(self):
        c = ExecveCollector()
        c.add([F("argc", "4"), F("a0", "x"), F("a3", "y")])
        assert c.end() == ["x", "", "", "y"]

    def test_len_mismatch(self):
        c = ExecveCollector()
        c.add([F("argc", "2"), F("a0", "x"), F("a1_len", "9"), F("a1[0]", "6162", "ab")])
        with pytest.raises(CollectError, match="length mismatch"):
            c.end()

    def test_index_out_of_range(self):
        c = ExecveCollector()
        c.add([F("argc", "2")])
        with pytest.raises(CollectError, match="out of range"):
            c.add([F("a5", "boom")])

    def test_duplicate_argc(self):
        c = ExecveCollector()
        c.add([F("argc", "2")])
        with pytest.raises(CollectError, match="duplicate argc"):
            c.add([F("argc", "3")])

    def test_missing_argc(self):
        c = ExecveCollector()
        c.add([F("a0", "x")])
        with pytest.raises(CollectError, match="missing argc"):
            c.end()

    def test_slices_without_len(self):
        c = ExecveCollector()
        c.add([F("argc", "2"), F("a1[0]", "61", "a")])
        with pytest.raises(CollectError, match="without length"):
            c.end()


class TestPath:
    def test_out_of_order_items_sorted(self):
        c = PathCollector()
        c.add([F("item", "2"), F("name", "/c")])
        c.add([F("item", "0"), F("name", "/a")])
        c.add([F("item", "1"), F("name", "/b")])
        names = [r["name"][0] for r in c.end()]
        assert names == ["/a", "/b", "/c"]

    def test_gap_detected(self):
        c = PathCollector()
        c.add([F("item", "0")])
        c.add([F("item", "2")])
        with pytest.raises(CollectError, match="gap"):
            c.end()

    def test_duplicate_item(self):
        c = PathCollector()
        c.add([F("item", "1")])
        with pytest.raises(CollectError, match="duplicate"):
            c.add([F("item", "1")])

    def test_item_ceiling(self):
        c = PathCollector()
        with pytest.raises(CollectError, match="exceeds"):
            c.add([F("item", "300")])


def test_rep_collects_in_order():
    c = RepCollector()
    c.add([F("deny", "1")])
    c.add([F("deny", "2")])
    assert [r["deny"][0] for r in c.end()] == ["1", "2"]


def test_field_rendering_raw_omitted_when_equal():
    c = RepCollector()
    c.add([F("uid", "1000", "user_1000"), F("success", "yes")])
    rec = c.end()[0]
    assert rec["uid"] == ["user_1000", "1000"]
    assert rec["success"] == ["yes"]


class TestAssembler:
    def test_repeated_unique_kind_latches_error(self):
        a = EventAssembler()
        a.add_turn("LOGIN", "h", "t1", [F("uid", "1")])
        a.add_turn("LOGIN", "h", "t2", [F("uid", "2")])
        a.add_turn("MSG", "h", "t3", [])
        doc = a.end("c1", "2026-01-01T00:00:00.000")
        assert doc["error"] == "repeated record kind LOGIN"
        assert "data" not in doc
        # latched error still keeps all raw text (lib/conv_buf.c:549-568)
        assert doc["text"] == ["t1", "t2", "t3"]

    def test_drop_empty_event(self):
        a = EventAssembler()
        a.add_turn("EOE", "h", "marker", [])
        assert a.end("c1", "x") is None

    def test_eoe_contributes_text_only(self):
        a = EventAssembler()
        a.add_turn("MSG", "h", "hello", [])
        a.add_turn("EOE", "h", "marker", [])
        doc = a.end("c1", "x")
        assert doc["text"] == ["hello", "marker"]
        assert list(doc["data"].keys()) == ["msg"]
        assert a.n_records == 1

    def test_data_key_order_is_first_seen(self):
        a = EventAssembler()
        a.add_turn("SUMMARY", "h", "t", [F("items", "1")])
        a.add_turn("MSG", "h", "t", [])
        a.add_turn("AVC", "h", "t", [F("deny", "9")])
        doc = a.end("c1", "x")
        assert list(doc["data"].keys()) == ["summary", "msg", "avc"]


def test_route_sink():
    assert route_sink("boom", True) == "error_events"
    assert route_sink(None, True) == "tool_events"
    assert route_sink(None, False) == "dialog_events"


class TestTrim:
    def base_doc(self):
        return {
            "serial": "c1", "time": "t", "node": "h",
            "text": ["line-%03d" % i + "x" * 50 for i in range(40)],
            "data": {"avc": [{"deny": [str(i)]} for i in range(30)],
                     "login": {"uid": ["user_1", "1"]}},
            "norm": {"subject": "u", "action": "a", "result": "success"},
        }

    def test_no_trim_when_fits(self):
        doc = self.base_doc()
        assert trim_doc(doc, 1 << 20) is doc

    def test_trim_norm_first(self):
        doc = self.base_doc()
        cap = doc_size(doc) - 1
        out = trim_doc(doc, cap)
        assert "norm" not in out
        assert out["trimmed"][0] == "norm"

    def test_trim_is_monotone_and_respects_cap(self):
        doc = self.base_doc()
        for cap in (4096, 2048, 1500, 1024):
            out = trim_doc(self.base_doc(), cap)
            assert doc_size(out) <= max(1024, cap), cap
            # envelope (priority-0 markup) always intact
            assert out["serial"] == "c1" and out["time"] == "t"

    def test_trim_drops_text_tail_then_rep_items(self):
        doc = self.base_doc()
        out = trim_doc(doc, 2048)
        assert out["trimmed"][0] == "norm"
        if len(out.get("text", [])) < 40:
            assert "text" in out["trimmed"]
        orig = self.base_doc()
        assert out.get("text", []) == orig["text"][: len(out.get("text", []))]


class TestDumpTrimTree:
    def test_dump_shape_and_prios(self):
        import json

        from aushape_ray.collectors import doc_size, dump_trim_tree

        doc = {"serial": "c1", "time": "T", "node": "h",
               "text": ["line one", "line two"],
               "data": {"syscall": {"exit": ["0"]},
                        "path": [{"name": ["/a"]}, {"name": ["/b"]}]},
               "norm": {"subject": "u", "action": "a", "result": "success"}}
        out = dump_trim_tree(doc)
        assert "\n" in out  # reference prints fully unfolded
        tree = json.loads(out)
        assert tree["type"] == "tree"
        kinds = [n["kind"] for n in tree["nodes"]]
        assert kinds.count("item") == 2      # path items
        assert kinds.count("text") == 2
        assert kinds.count("norm") == 1
        assert kinds.count("record") == 1    # syscall single record
        assert kinds.count("envelope") == 1
        # prios ordered; drop order = highest prio first (norm last prio)
        prios = tree["prios"]
        assert [p["prio"] for p in prios] == sorted(p["prio"] for p in prios)
        norm_idx = kinds.index("norm")
        assert norm_idx in prios[-1]["nodes"]
        # every node appears in exactly one priority level
        all_idx = sorted(i for p in prios for i in p["nodes"])
        assert all_idx == list(range(len(tree["nodes"])))
        # lengths are positive and bounded by the full doc size
        assert all(0 < n["len"] <= doc_size(doc) for n in tree["nodes"])
