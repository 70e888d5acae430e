"""--fold / --indent rendering (S5/gbuf parity) and syslog config tables."""

import json

import pytest

from aushape_ray.foldout import (
    COMPACT,
    FOLD_NONE,
    FoldFormat,
    parse_fold,
    render_doc_json,
    render_doc_xml,
    render_json,
)
from aushape_ray.syslogconf import facility_from_str, pri_value, priority_from_str
from aushape_ray.xmlout import event_node, render_event_xml

DOC = {"serial": 1, "time": "T", "data": {"syscall": {"exit": ["0"]}}}


class TestFoldJson:
    def test_compact_is_byte_identical_to_json_dumps(self):
        objs = [DOC, {}, [], {"a": [1, {"b": []}], "u": "ünïcødé\n"},
                [[1, 2], {"k": None, "t": True}]]
        for o in objs:
            assert render_json(o, COMPACT) == json.dumps(
                o, ensure_ascii=False, separators=(",", ":"))

    def test_readme_shape_fold4(self):
        # README.md:22-46 shape: members unfolded through level 4, the
        # [interpreted, raw] value arrays (level 5) folded inline
        got = render_doc_json([DOC], FoldFormat(fold_level=4, nest_indent=4))
        assert got == (
            '[\n'
            '    {\n'
            '        "serial":1,\n'
            '        "time":"T",\n'
            '        "data":{\n'
            '            "syscall":{\n'
            '                "exit":["0"]\n'
            '            }\n'
            '        }\n'
            '    }\n'
            ']')

    def test_fold_none_unfolds_fully(self):
        got = render_json(DOC, FoldFormat(fold_level=FOLD_NONE, nest_indent=2))
        assert '"exit":[\n' in got.replace(" ", "").replace("\n\n", "\n") or \
               "[\n" in got  # the value array is on multiple lines too
        assert json.loads(got) == DOC

    def test_roundtrip_any_fold(self):
        for fl in (0, 1, 2, 3, 4, FOLD_NONE):
            got = render_json(DOC, FoldFormat(fold_level=fl, nest_indent=3))
            assert json.loads(got) == DOC

    def test_parse_fold_spellings(self):
        assert parse_fold("all") == 0
        assert parse_fold("0") == 0
        assert parse_fold("4") == 4
        assert parse_fold("none") == FOLD_NONE
        with pytest.raises(ValueError):
            parse_fold("-1")


XDOC = {"serial": 1, "time": "T", "node": "h", "text": ["l1"],
        "data": {"syscall": {"exit": ["0"]}}}


class TestFoldXml:
    def test_compact_unchanged(self):
        # byte-identical to the round-1 single-line renderer
        assert render_event_xml(XDOC) == (
            '<event serial="1" time="T" node="h">'
            '<text><line>l1</line></text>'
            '<data><syscall><field name="exit" i="0"/></syscall></data>'
            '</event>')

    def test_readme_shape_fold4(self):
        got = render_doc_xml([event_node(XDOC)],
                             FoldFormat(fold_level=4, nest_indent=4))
        assert got == (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<log>\n'
            '    <event serial="1" time="T" node="h">\n'
            '        <text>\n'
            '            <line>l1</line>\n'
            '        </text>\n'
            '        <data>\n'
            '            <syscall>\n'
            '                <field name="exit" i="0"/>\n'
            '            </syscall>\n'
            '        </data>\n'
            '    </event>\n'
            '</log>')


class TestSyslogConf:
    def test_reference_defaults(self):
        # conf.c defaults: facility authpriv (80), priority info (6)
        assert pri_value("authpriv", "info") == 86

    def test_case_insensitive_and_aliases(self):
        assert facility_from_str("AUTHPRIV") == 80
        assert facility_from_str("security") == facility_from_str("auth") == 32
        assert priority_from_str("ERROR") == priority_from_str("err") == 3
        assert priority_from_str("panic") == priority_from_str("emerg") == 0
        assert priority_from_str("warn") == 4

    def test_unknown_is_minus_one(self):
        assert facility_from_str("nope") == -1
        assert priority_from_str("nope") == -1
        with pytest.raises(ValueError):
            pri_value("nope", "info")
        with pytest.raises(ValueError):
            pri_value("auth", "nope")

    def test_local_facilities(self):
        assert facility_from_str("local0") == 128
        assert facility_from_str("local7") == 184


def test_folded_and_syslog_sinks(ray_session, tmp_path):
    """Drive the discrete writer in folded and syslog modes end to end."""
    import glob

    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import events_for, write_jsonl_routed

    ev = events_for("/root/testdata/sf0.001", PipelineConfig(num_parts=4))
    # folded json documents
    counts = write_jsonl_routed(ev, str(tmp_path / "fold"),
                                fmt=FoldFormat(fold_level=4, nest_indent=4))
    assert sum(counts.values()) == 99
    f = glob.glob(str(tmp_path / "fold" / "*" / "part-*.json"))[0]
    body = open(f).read()
    assert body.startswith("[\n    {")
    parsed = json.loads(body)
    assert all("serial" in e and "time" in e for e in parsed)
    # syslog framing: every line starts with <86>
    counts = write_jsonl_routed(ev, str(tmp_path / "sys"), fmt=COMPACT,
                                pri=pri_value("authpriv", "info"))
    assert sum(counts.values()) == 99
    f = glob.glob(str(tmp_path / "sys" / "*" / "part-*.jsonl"))[0]
    lines = open(f).read().splitlines()
    assert lines and all(ln.startswith("<86>{") for ln in lines)


from hypothesis import given, settings
from hypothesis import strategies as st

json_scalars = st.one_of(st.none(), st.booleans(),
                         st.integers(-2**31, 2**31),
                         st.text(max_size=20))
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4)),
    max_leaves=20)


@settings(max_examples=60, deadline=None)
@given(obj=json_values, fold=st.integers(0, 6), indent=st.integers(0, 6))
def test_fold_render_roundtrips_and_compact_matches_dumps(obj, fold, indent):
    """Any fold/indent rendering must parse back to the identical value,
    and fold=0 must be byte-identical to compact json.dumps."""
    out = render_json(obj, FoldFormat(fold_level=fold, nest_indent=indent))
    assert json.loads(out) == obj
    assert render_json(obj, COMPACT) == json.dumps(
        obj, ensure_ascii=False, separators=(",", ":"))
