"""Normative event-document schema + validator (SURVEY.md §5.3).

Port of the reference's JSON Schema contract
(/root/reference/lib/aushape.schema.json): required serial+time envelope
(:498-501), field values as 1-2 element string arrays [interpreted, raw?]
(:5-13), and the three record shapes (:259-268) — single (object of
fields), repeated (array of field objects), execve (flat argv string
array).  Self-contained validator (no jsonschema dependency); returns a
list of violations, empty = valid.
"""

from __future__ import annotations

from .grammar import EXECVE_KIND, PATH_KIND, REP_KINDS

_REPEATED = {k.lower() for k in REP_KINDS} | {PATH_KIND.lower()}
_EXECVE = EXECVE_KIND.lower()


def _check_field_value(path: str, v, errors: list[str]) -> None:
    if not isinstance(v, list) or not (1 <= len(v) <= 2):
        errors.append(f"{path}: field value must be a 1-2 element array")
        return
    if not all(isinstance(x, str) for x in v):
        errors.append(f"{path}: field value elements must be strings")
        return
    if len(v) == 2 and v[0] == v[1]:
        errors.append(f"{path}: raw element must be omitted when equal to interpreted")


def _check_record_obj(path: str, rec, errors: list[str]) -> None:
    if not isinstance(rec, dict):
        errors.append(f"{path}: single record must be an object of fields")
        return
    for k, v in rec.items():
        _check_field_value(f"{path}.{k}", v, errors)


def validate_doc(doc: dict) -> list[str]:
    errors: list[str] = []
    if not isinstance(doc, dict):
        return ["document must be an object"]
    # envelope: serial + time required
    if not isinstance(doc.get("serial"), str) or not doc.get("serial"):
        errors.append("serial: required non-empty string")
    if not isinstance(doc.get("time"), str) or not doc.get("time"):
        errors.append("time: required non-empty string")
    if "node" in doc and not isinstance(doc["node"], str):
        errors.append("node: must be a string")
    if "text" in doc:
        if not isinstance(doc["text"], list) or not all(
                isinstance(t, str) for t in doc["text"]):
            errors.append("text: must be an array of strings")
    if "trimmed" in doc:
        if not isinstance(doc["trimmed"], list) or not all(
                isinstance(t, str) for t in doc["trimmed"]):
            errors.append("trimmed: must be an array of strings")
    has_error = "error" in doc
    has_data = "data" in doc
    if has_error:
        if not isinstance(doc["error"], str):
            errors.append("error: must be a string")
        if has_data:
            errors.append("data: must be voided when error is present")
    elif not has_data:
        errors.append("data: required when no error")
    if has_data and isinstance(doc.get("data"), dict):
        for kind, rec in doc["data"].items():
            p = f"data.{kind}"
            if kind != kind.lower():
                errors.append(f"{p}: record kind must be lowercase")
            if kind == _EXECVE:
                if not isinstance(rec, list) or not all(
                        isinstance(a, str) for a in rec):
                    errors.append(f"{p}: execve record must be an argv string array")
            elif kind in _REPEATED:
                if not isinstance(rec, list):
                    errors.append(f"{p}: repeated record must be an array")
                else:
                    for i, it in enumerate(rec):
                        _check_record_obj(f"{p}[{i}]", it, errors)
            else:
                _check_record_obj(p, rec, errors)
    if "norm" in doc:
        n = doc["norm"]
        if not isinstance(n, dict):
            errors.append("norm: must be an object")
        else:
            for req in ("subject", "action", "result"):
                if not isinstance(n.get(req), str):
                    errors.append(f"norm.{req}: required string")
            if n.get("result") not in (None, "success", "fail"):
                errors.append("norm.result: must be success|fail")
    return errors
