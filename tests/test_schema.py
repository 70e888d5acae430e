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


# ---------------- search-index mapping coverage (round 3) -----------------

def test_mapping_covers_every_emitted_document_path(oracle_events):
    """Every dotted path in every corpus event document must resolve to
    an explicit property or a dynamic template of the generated index
    mapping (the analogue of the reference lib/aushape.mapping.json)."""
    import json

    from aushape_ray.mapping import uncovered_paths

    bad = {}
    for e in oracle_events:
        for p in uncovered_paths(json.loads(e["doc"])):
            bad.setdefault(p, 0)
            bad[p] += 1
    assert not bad, bad


def test_mapping_shape_and_templates():
    from aushape_ray.mapping import build_mapping, covered_by

    m = build_mapping()
    assert m["date_detection"] is False
    assert m["properties"]["serial"]["type"] == "keyword"
    # repeated record kinds are nested, like the reference mapping
    for k in ("path", "avc", "obj_pid", "netfilter_cfg", "msg"):
        assert m["properties"]["data"]["properties"][k]["type"] == "nested"
    # dynamic templates catch the open-ended per-kind field names
    assert covered_by(m, "data.login.uid")
    assert covered_by(m, "data.path.item.name")
    assert covered_by(m, "norm.subject")
    assert not covered_by(m, "bogus.top.level")
