"""Every emitted document validates against the normative schema
(SURVEY.md §5.3; reference contract lib/aushape.schema.json)."""

import json

from aushape_ray.schema import validate_doc


def test_all_oracle_docs_validate(oracle_events):
    for e in oracle_events:
        errs = validate_doc(json.loads(e["doc"]))
        assert errs == [], (e["conv_id"], errs)


def test_norm_and_trim_docs_validate(tiny_transcripts):
    from aushape_ray.oracle import assemble_events

    for e in assemble_events(tiny_transcripts, with_norm=True,
                             max_event_size=2048):
        errs = validate_doc(json.loads(e["doc"]))
        assert errs == [], (e["conv_id"], errs)


def test_validator_catches_violations():
    assert validate_doc({}) != []
    assert any("serial" in e for e in validate_doc({"time": "t"}))
    bad_field = {"serial": "s", "time": "t",
                 "data": {"login": {"uid": ["a", "a"]}}}
    assert any("raw element" in e for e in validate_doc(bad_field))
    bad_kind = {"serial": "s", "time": "t", "data": {"LOGIN": {}}}
    assert any("lowercase" in e for e in validate_doc(bad_kind))
    err_and_data = {"serial": "s", "time": "t", "error": "x", "data": {}}
    assert any("voided" in e for e in validate_doc(err_and_data))
