"""Search-index mapping for the event envelope — the analogue of the
reference's Elasticsearch mapping (/root/reference/lib/aushape.mapping.json).

The reference ships a static ES mapping for its JSON documents (typed
serial/time/node envelope fields, nested repeated records, dynamic
templates for the open-ended per-kind field names).  This module
GENERATES the equivalent mapping from our own grammar tables — so it can
never drift from what the pipeline actually emits — and exposes a
coverage check used by tests: every path present in an emitted document
must resolve to a mapping rule (explicit property or dynamic template).

Differences from the reference, by design: our serial is the conv_id
string (keyword, not long); modern ES types (keyword/text/date) replace
the legacy string/not_analyzed forms.
"""

from __future__ import annotations

import fnmatch
import json

from .grammar import EXECVE_KIND, PATH_KIND, REP_KINDS

_REPEATED = sorted({k.lower() for k in (PATH_KIND,) + REP_KINDS})


def build_mapping() -> dict:
    """Event-envelope index mapping, derived from the grammar tables."""
    data_props = {k: {"type": "nested"} for k in _REPEATED}
    data_props[EXECVE_KIND.lower()] = {"type": "text"}
    return {
        "date_detection": False,
        "properties": {
            "serial": {"type": "keyword"},
            "time": {"type": "date",
                     "format": "yyyy-MM-dd'T'HH:mm:ss.SSS"},
            "node": {"type": "text",
                     "fields": {"raw": {"type": "keyword"}}},
            "error": {"type": "text"},
            "trimmed": {"type": "keyword"},
            "text": {"type": "text"},
            "data": {"type": "object", "properties": data_props},
            "norm": {"type": "object", "properties": {
                "subject_attrs": {"type": "nested"},
                "object_attrs": {"type": "nested"},
            }},
        },
        "dynamic_templates": [
            {"generic_nested_fields": {
                "path_match": "data.*.*.*",
                "mapping": {"type": "text"}}},
            {"generic_fields": {
                "path_match": "data.*.*",
                "mapping": {"type": "text"}}},
            {"generic_records": {
                "path_match": "data.*",
                "mapping": {"type": "object"}}},
            {"norm_attrs_fields": {
                "path_match": "norm.*_attrs.*",
                "mapping": {"type": "text"}}},
            {"norm_generic_fields": {
                "path_match": "norm.*",
                "mapping": {"type": "text"}}},
        ],
    }


def _doc_paths(doc: dict) -> "set[str]":
    """Dotted paths of every leaf-bearing node in one event document.
    Field values (the 1-2 element arrays) are leaves; record arrays
    contribute their element paths."""
    paths: set[str] = set()

    def walk(prefix: str, v) -> None:
        if isinstance(v, dict):
            for k, sub in v.items():
                p = f"{prefix}.{k}" if prefix else k
                paths.add(p)
                walk(p, sub)
        elif isinstance(v, list):
            for item in v:
                if isinstance(item, (dict, list)):
                    walk(prefix, item)
            # string arrays (field values, argv, text lines) are leaves

    walk("", doc)
    return paths


def covered_by(mapping: dict, path: str) -> bool:
    """True when `path` resolves to an explicit property or a dynamic
    template of `mapping` (ES resolution order: properties first)."""
    parts = path.split(".")
    props = mapping.get("properties", {})
    node = None
    for i, part in enumerate(parts):
        if part not in props:
            node = None
            break
        node = props[part]
        props = node.get("properties", {})
    else:
        return True
    for tpl in mapping.get("dynamic_templates", []):
        rule = next(iter(tpl.values()))
        if fnmatch.fnmatch(path, rule["path_match"]):
            return True
    return False


def uncovered_paths(doc: dict) -> "list[str]":
    m = build_mapping()
    return sorted(p for p in _doc_paths(doc) if not covered_by(m, p))


def mapping_json() -> str:
    return json.dumps(build_mapping(), indent=2, sort_keys=True)
