"""XML document rendering (M3/M8 analogue).

The reference emits JSON or an isomorphic XML form: fields become
elements with `i=` (interpreted) / `r=` (raw) attributes — r omitted when
equal (/root/reference/lib/field.c:45-80) — and escaping follows
lib/gbuf.c:282-342: the five predefined entities plus numeric character
references for control characters.

Document shape (isomorphic to the JSON envelope):

    <event serial=.. time=.. node=..>
      <text><line>..</line>..</text>
      <data>
        <login><field name="uid" i="user_0" r="0"/>..</login>
        <execve><a>ls</a><a>-l</a></execve>
        <path><item><field .../></item>..</path>
        <avc><item><field .../></item>..</avc>
      </data>
      <error>..</error>            (replaces <data> on latched error)
      <norm subject=.. action=.. result=.. object=../>
      <trimmed><t>norm</t>..</trimmed>
    </event>
"""

from __future__ import annotations

import pyarrow as pa

_ENT = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&apos;"}


def escape_xml(s: str) -> str:
    """Five predefined entities + numeric refs for ALL control chars.
    \t/\n/\r are escaped numerically too (legal XML 1.0) so a rendered
    document is always a single line — required by line-framed sinks."""
    out = []
    for ch in s:
        if ch in _ENT:
            out.append(_ENT[ch])
        elif ord(ch) < 0x20:
            out.append(f"&#x{ord(ch):02X};")
        else:
            out.append(ch)
    return "".join(out)


def _field_xml(name: str, value: list) -> str:
    i = escape_xml(value[0])
    if len(value) > 1:
        return f'<field name="{escape_xml(name)}" i="{i}" r="{escape_xml(value[1])}"/>'
    return f'<field name="{escape_xml(name)}" i="{i}"/>'


import re as _re

_NAME_RE = _re.compile(r"[a-z_][a-z0-9_.-]*\Z")


def _open_close(kind: str) -> tuple[str, str]:
    """Element tags for a record kind.  The kind comes from the
    unvalidated `type=` token, so anything outside the safe name set is
    wrapped as <record kind="...">."""
    if _NAME_RE.match(kind):
        return f"<{kind}>", f"</{kind}>"
    return f'<record kind="{escape_xml(kind)}">', "</record>"


def _record_node(kind: str, rec):
    """XML node tree for one record (foldout.render_xml_node renders it
    compact or folded; compact output is byte-identical to round 1)."""
    opn, cls = _open_close(kind)
    if isinstance(rec, dict):  # single record: object of fields
        return (opn, cls, [_field_xml(k, v) for k, v in rec.items()])
    if kind == "execve":  # argv array
        return (opn, cls, [f"<a>{escape_xml(a)}</a>" for a in rec])
    # repeated / path records: array of field objects
    items = [("<item>", "</item>",
              [_field_xml(k, v) for k, v in it.items()]) for it in rec]
    return (opn, cls, items)


def event_node(doc: dict):
    """Node tree for one event document (levels: event children one in
    from the event element — matches the reference README shapes)."""
    attrs = [f'serial="{escape_xml(str(doc["serial"]))}"',
             f'time="{escape_xml(doc["time"])}"']
    if doc.get("node"):
        attrs.append(f'node="{escape_xml(doc["node"])}"')
    children = []
    if "text" in doc:
        children.append(("<text>", "</text>",
                         [f"<line>{escape_xml(t)}</line>" for t in doc["text"]]))
    if doc.get("error") is not None and "error" in doc:
        children.append(f"<error>{escape_xml(doc['error'])}</error>")
    elif "data" in doc and doc["data"] is not None:
        children.append(("<data>", "</data>",
                         [_record_node(k, v) for k, v in doc["data"].items()]))
    if "norm" in doc:
        n = doc["norm"]
        na = [f'subject="{escape_xml(n["subject"])}"',
              f'action="{escape_xml(n["action"])}"',
              f'result="{escape_xml(n["result"])}"']
        if "object" in n:
            na.append(f'object="{escape_xml(n["object"])}"')
        children.append(f"<norm {' '.join(na)}/>")
    if doc.get("trimmed"):
        children.append(("<trimmed>", "</trimmed>",
                         [f"<t>{escape_xml(t)}</t>" for t in doc["trimmed"]]))
    return (f"<event {' '.join(attrs)}>", "</event>", children)


def render_event_xml(doc: dict, fmt=None) -> str:
    from .foldout import COMPACT, render_xml_node

    return render_xml_node(event_node(doc), fmt or COMPACT, level=0)


def add_xml_column(batch: pa.Table) -> pa.Table:
    """map_batches stage: event rows -> + doc_xml column (from doc JSON)."""
    import json

    xml = [render_event_xml(json.loads(d)) for d in batch.column("doc").to_pylist()]
    return batch.append_column("doc_xml", pa.array(xml, pa.string()))
