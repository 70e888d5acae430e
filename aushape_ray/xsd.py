"""Structural XML validation — a Python port of the reference XSD.

The reference ships lib/aushape.xsd: a schema for its XML event form
(<event serial= time= node=> with <text>/<data>/<norm> children, fields
as elements with i=/r= attributes, single_record vs repeated_record
content models, serial a positive integer, time an xsd:dateTime).  No
XSD engine is available in this container, so this module encodes the
same content model directly over xml.etree.ElementTree and validates
OUR isomorphic document shape (xmlout.py):

    event(@serial req int>=0, @time req ISO-8601 ms, @node opt)
      -> text?   : <line>str</line>*
      -> (error | data)?          (error replaces data on latched error)
         data    : record elements; per grammar.py the content model is
                   execve   -> <a>str</a>*           (argv array)
                   PATH/rep -> <item>field*</item>*  (repeated_record)
                   other    -> field*                (single_record)
         field   : <field name= i= [r=]/>, no text, no children
      -> norm?   : empty, @subject @action @result req, @object opt
      -> trimmed?: <t>str</t>*

`validate_event_xml(s)` raises XmlValidationError with a path-qualified
message on the first violation; returns None on success (mirrors how
test_schema.py validates the JSON envelope against schema.py).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from .grammar import EXECVE_KIND, PATH_KIND, REP_KINDS

_TIME_RE = re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}\Z")
# the reference XSD restricts serial to a positive integer (audit event
# serials); our envelope's serial is the conv_id string — require it
# non-empty and XML-attribute-clean instead
_SERIAL_RE = re.compile(r"\S+\Z")
# element names a record kind may use directly (xmlout._NAME_RE); other
# kinds render as <record kind="...">
_KIND_ELEMENT_RE = re.compile(r"[a-z_][a-z0-9_.-]*\Z")

_REPEATED_ELEMENTS = {k.lower() for k in (PATH_KIND,) + REP_KINDS}
_EXECVE_ELEMENT = EXECVE_KIND.lower()


class XmlValidationError(ValueError):
    pass


def _fail(path: str, msg: str) -> None:
    raise XmlValidationError(f"{path}: {msg}")


def _require_attrs(el: ET.Element, path: str, required: tuple,
                   optional: tuple = ()) -> None:
    for a in required:
        if a not in el.attrib:
            _fail(path, f"missing required attribute {a!r}")
    extra = set(el.attrib) - set(required) - set(optional)
    if extra:
        _fail(path, f"unexpected attribute(s) {sorted(extra)}")


def _require_leaf(el: ET.Element, path: str) -> None:
    if len(el):
        _fail(path, "must not have child elements")


def _validate_field(el: ET.Element, path: str) -> None:
    if el.tag != "field":
        _fail(path, f"expected <field>, got <{el.tag}>")
    _require_attrs(el, path, ("name", "i"), ("r",))
    _require_leaf(el, path)
    if el.text and el.text.strip():
        _fail(path, "field element must be empty")


def _validate_record(el: ET.Element, path: str) -> None:
    tag = el.tag
    if tag == "record":
        _require_attrs(el, path, ("kind",))
        kind = el.attrib["kind"].lower()
        if _KIND_ELEMENT_RE.match(el.attrib["kind"]):
            _fail(path, "safe kind must render as a named element, "
                        "not <record kind=>")
    else:
        _require_attrs(el, path, ())
        if not _KIND_ELEMENT_RE.match(tag):
            _fail(path, f"record element name {tag!r} outside the safe set")
        kind = tag
    if kind == _EXECVE_ELEMENT:
        for i, a in enumerate(el):
            ap = f"{path}/a[{i}]"
            if a.tag != "a":
                _fail(ap, f"execve children must be <a>, got <{a.tag}>")
            _require_attrs(a, ap, ())
            _require_leaf(a, ap)
    elif kind in _REPEATED_ELEMENTS:
        for i, it in enumerate(el):
            ip = f"{path}/item[{i}]"
            if it.tag != "item":
                _fail(ip, f"repeated record children must be <item>, "
                          f"got <{it.tag}>")
            _require_attrs(it, ip, ())
            for j, f in enumerate(it):
                _validate_field(f, f"{ip}/field[{j}]")
    else:
        for j, f in enumerate(el):
            _validate_field(f, f"{path}/field[{j}]")


def validate_event_element(ev: ET.Element, path: str = "event") -> None:
    if ev.tag != "event":
        _fail(path, f"root must be <event>, got <{ev.tag}>")
    _require_attrs(ev, path, ("serial", "time"), ("node",))
    if not _SERIAL_RE.match(ev.attrib["serial"]):
        _fail(path, f"serial {ev.attrib['serial']!r} must be non-empty")
    if not _TIME_RE.match(ev.attrib["time"]):
        _fail(path, f"time {ev.attrib['time']!r} is not "
                    "YYYY-MM-DDTHH:MM:SS.mmm")
    # ordered content model: text? (error|data)? norm? trimmed?
    order = {"text": 0, "error": 1, "data": 1, "norm": 2, "trimmed": 3}
    last = -1
    seen: set = set()
    for child in ev:
        tag = child.tag
        if tag not in order:
            _fail(f"{path}/{tag}", "unexpected event child")
        rank = order[tag]
        if rank < last:
            _fail(f"{path}/{tag}", "event children out of order")
        if rank == last and rank == 1:
            _fail(f"{path}/{tag}", "error and data are mutually exclusive "
                                   "and single-occurrence")
        if tag in seen:
            _fail(f"{path}/{tag}", "duplicate event child")
        seen.add(tag)
        last = rank
        cp = f"{path}/{tag}"
        if tag == "text":
            _require_attrs(child, cp, ())
            for i, ln in enumerate(child):
                lp = f"{cp}/line[{i}]"
                if ln.tag != "line":
                    _fail(lp, f"text children must be <line>, got <{ln.tag}>")
                _require_attrs(ln, lp, ())
                _require_leaf(ln, lp)
        elif tag == "error":
            _require_attrs(child, cp, ())
            _require_leaf(child, cp)
        elif tag == "data":
            _require_attrs(child, cp, ())
            for i, rec in enumerate(child):
                _validate_record(rec, f"{cp}/{rec.tag}[{i}]")
        elif tag == "norm":
            _require_attrs(child, cp, ("subject", "action", "result"),
                           ("object",))
            _require_leaf(child, cp)
        elif tag == "trimmed":
            _require_attrs(child, cp, ())
            for i, t in enumerate(child):
                tp = f"{cp}/t[{i}]"
                if t.tag != "t":
                    _fail(tp, f"trimmed children must be <t>, got <{t.tag}>")
                _require_attrs(t, tp, ())
                _require_leaf(t, tp)


def validate_event_xml(s: str) -> None:
    """Parse one serialized event document and validate it structurally.
    Raises XmlValidationError (or ET.ParseError on malformed XML)."""
    validate_event_element(ET.fromstring(s))
