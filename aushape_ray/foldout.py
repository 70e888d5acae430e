"""Folded / indented document rendering (--fold / --indent, S5 analogue).

Mirrors the reference's gbuf whitespace machinery
(/root/reference/lib/gbuf.c:243-280, defaults lib/conf.c:179-201):

- ``space_opening(level)``: emitted before a child at nesting `level`;
  newline (except at level 0) + ``init_indent + nest_indent * level``
  spaces, but ONLY when ``level <= fold_level``.
- ``space_closing(level)``: emitted before a container's closing
  delimiter at `level`; newline + indent when ``level + 1 <= fold_level``.

So ``fold_level=0`` folds everything into one line (compact output,
byte-identical to the round-1 ``json.dumps(separators=(',', ':'))``
form), ``fold_level=N`` unfolds the first N nesting levels, and
``fold="none"`` unfolds fully.  The CLI accepts the reference's spellings
(``0``/``all``, ``N``, ``none`` — lib/conf.c:303-311).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

FOLD_NONE = 1 << 30  # "none": unfold fully (SIZE_MAX analogue)


@dataclass(frozen=True)
class FoldFormat:
    fold_level: int = 4      # reference default (lib/conf.c:183)
    nest_indent: int = 4
    init_indent: int = 0

    def opening(self, level: int) -> str:
        if level <= self.fold_level:
            pad = " " * (self.init_indent + self.nest_indent * level)
            return ("\n" + pad) if level > 0 else pad
        return ""

    def closing(self, level: int) -> str:
        if level + 1 <= self.fold_level:
            return "\n" + " " * (self.init_indent + self.nest_indent * level)
        return ""


COMPACT = FoldFormat(fold_level=0, nest_indent=0, init_indent=0)


def parse_fold(s: str) -> int:
    """--fold spellings: 0/'all' fold everything, N, 'none' unfold fully."""
    if s == "all":
        return 0
    if s == "none":
        return FOLD_NONE
    v = int(s)
    if v < 0:
        raise ValueError(f"--fold must be >= 0, 'all' or 'none', got {s!r}")
    return v


# ---------------- JSON ----------------------------------------------------

def render_json(obj, fmt: FoldFormat = COMPACT, level: int = 0) -> str:
    """Render a JSON value with the fold/indent rules.  At fold_level=0
    the output is byte-identical to
    ``json.dumps(obj, ensure_ascii=False, separators=(',', ':'))``."""
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        parts = ["{"]
        first = True
        for k, v in obj.items():
            parts.append(("" if first else ",") + fmt.opening(level + 1))
            parts.append(json.dumps(k, ensure_ascii=False))
            parts.append(":")
            parts.append(render_json(v, fmt, level + 1))
            first = False
        parts.append(fmt.closing(level))
        parts.append("}")
        return "".join(parts)
    if isinstance(obj, list):
        if not obj:
            return "[]"
        parts = ["["]
        first = True
        for v in obj:
            parts.append(("" if first else ",") + fmt.opening(level + 1))
            parts.append(render_json(v, fmt, level + 1))
            first = False
        parts.append(fmt.closing(level))
        parts.append("]")
        return "".join(parts)
    return json.dumps(obj, ensure_ascii=False)


def render_doc_json(events: list[dict], fmt: FoldFormat = COMPACT) -> str:
    """A DOCUMENT is an array of event objects (README.md:22-46 shape):
    the array is level 0, events level 1, event members level 2 — so the
    reference default fold=4 puts record fields on their own lines and
    folds the [interpreted, raw] value arrays inline."""
    return render_json(events, fmt, level=0)


# ---------------- XML -----------------------------------------------------
# node = inline string (leaf) | (open_tag, close_tag, [children])

XmlNode = "str | tuple[str, str, list]"


def render_xml_node(node, fmt: FoldFormat = COMPACT, level: int = 0) -> str:
    if isinstance(node, str):
        return node
    opn, cls, children = node
    if not children:
        return opn + cls
    parts = [opn]
    for ch in children:
        parts.append(fmt.opening(level + 1))
        parts.append(render_xml_node(ch, fmt, level + 1))
    parts.append(fmt.closing(level))
    parts.append(cls)
    return "".join(parts)


def render_doc_xml(event_nodes: list, fmt: FoldFormat = COMPACT) -> str:
    """XML document: prologue + <log> wrapper (README.md:51-74 shape);
    <log> is level 0, events level 1."""
    body = render_xml_node(("<log>", "</log>", list(event_nodes)), fmt, 0)
    return '<?xml version="1.0" encoding="UTF-8"?>\n' + body
