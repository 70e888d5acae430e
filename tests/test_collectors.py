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


class TestAddTurnFastParity:
    """add_turn_fast (the distributed hot path: parallel key/raw/interp
    lists, `interp is vs` fast render) must be observationally identical to
    add_turn (the oracle path) — same docs, same error latching, same order."""

    CASES = [
        # (kind, [(key, raw, interp)...]) sequences per conversation
        [("SYSCALL", [("syscall", "59", "execve"), ("exit", "0", "0")]),
         ("MSG", [("op", "login", "login")]),
         ("MSG", [("op", "logout", "logout")])],
        # interp override + duplicate keys in one record (last wins)
        [("SYSCALL", [("uid", "0", "root"), ("uid", "1000", "alice")]),
         ("AVC", [("seresult", "denied", "denied"), ("pid", "7", "7")])],
        # EXECVE argv + PATH slots + EOE drop
        [("EXECVE", [("argc", "2", "2"), ("a0", "ls", "ls"), ("a1", "-l", "-l")]),
         ("PATH", [("item", "0", "0"), ("name", "/bin/ls", "/bin/ls")]),
         ("EOE", [])],
        # repeated uniq kind latches an error, later records text-only
        [("SYSCALL", [("exit", "0", "0")]),
         ("SYSCALL", [("exit", "1", "1")]),
         ("MSG", [("op", "x", "x")])],
        # execve argc missing -> end-time error
        [("EXECVE", [("a0", "sh", "sh")])],
        # unicode + empty values
        [("SYSCALL", [("comm", "café", "café"), ("key", "", "")])],
    ]

    def _run(self, turns, fast, with_norm):
        from aushape_ray.collectors import EventAssembler

        asm = EventAssembler(with_text=True, with_norm=with_norm)
        for k, fields in turns:
            if fast:
                ks = [f[0] for f in fields]
                vs = [f[1] for f in fields]
                interp = [f[2] for f in fields]
                if interp == vs:
                    interp = vs  # exercise the `interp is vs` fast render
                asm.add_turn_fast(k, "node1", f"text {k}", ks, vs, interp)
            else:
                asm.add_turn(k, "node1", f"text {k}", list(fields))
        doc = asm.end("conv", "2026-01-01T00:00:00.000")
        return doc, asm.error, asm.n_records

    def test_parity_all_cases(self):
        for with_norm in (False, True):
            for turns in self.CASES:
                slow = self._run(turns, fast=False, with_norm=with_norm)
                fast = self._run(turns, fast=True, with_norm=with_norm)
                assert fast == slow, (turns, with_norm, fast, slow)

    def test_interp_override_renders_pair(self):
        from aushape_ray.collectors import EventAssembler

        asm = EventAssembler()
        asm.add_turn_fast("SYSCALL", None, "t",
                          ["uid", "exit"], ["0", "0"], ["root", "0"])
        doc = asm.end("c", "T")
        assert doc["data"]["syscall"]["uid"] == ["root", "0"]
        assert doc["data"]["syscall"]["exit"] == ["0"]


def test_format_time_us_matches_datetime_reference():
    """The day-prefix cache + integer arithmetic must equal the original
    timedelta+strftime construction everywhere, including pre-1970 and
    exact day/second boundaries."""
    import datetime
    import random

    from aushape_ray.oracle import format_time_us

    def ref(us: int) -> str:
        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=int(us))
        return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}"

    rng = random.Random(42)
    fixed = [0, 1, -1, 999, 1000, 86_400_000_000, 86_400_000_000 - 1,
             -86_400_000_000, 1_700_000_000_000_000, -123_456_789]
    samples = fixed + [rng.randint(-2**44, 2**51) for _ in range(500)]
    for us in samples:
        assert format_time_us(us) == ref(us), us


def test_assemble_partition_null_conv_id_groups_as_one():
    """Null conv_ids are one conversation (oracle dict-key semantics),
    not one-per-row, and never crash the task (error isolation)."""
    import pyarrow as pa

    from aushape_ray.stages.assemble import AssemblePartition
    from aushape_ray.stages.enrich import enrich_batch
    from aushape_ray.stages.parse import parse_batch

    t = pa.table({
        "conv_id": pa.array([None, None, "c1", "c1", None], pa.string()),
        "turn_idx": pa.array([0, 1, 0, 1, 2], pa.int32()),
        "role": ["user"] * 5,
        "text": ['type=SYSCALL exit=0', 'type=MSG op=x',
                 'type=SYSCALL exit=1', 'type=MSG op=y', 'type=AVC pid=7'],
        "tool": pa.array([None] * 5, pa.string()),
        "is_tool": [False] * 5,
        "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
    })
    out = AssemblePartition()(enrich_batch(parse_batch(t)))
    convs = out.column("conv_id").to_pylist()
    assert sorted(convs, key=lambda c: (c is not None, c)) == [None, "c1"]
    by = {c: n for c, n in zip(convs, out.column("n_turns").to_pylist())}
    assert by[None] == 3 and by["c1"] == 2
