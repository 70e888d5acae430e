"""Generic vectorized grok: user-supplied named-capture patterns applied
as one RE2 pass per batch (pyarrow.compute.extract_regex) — the
"write a pattern, get typed columns" surface classic log pipelines
(Logstash grok, vector.dev) put in front of unknown formats.  The
fixed-grammar parser (stages/parse.py) is the fast path for the known
auditd format; grok_extract is the general one.

A small pattern library covers the usual primitives; %{NAME:field}
references expand recursively before compilation, so patterns compose
exactly like Logstash's (`%{INT:uid}` -> `(?P<uid>[0-9]+)`).

Everything is Arrow-native: extraction is one C++ RE2 call, matched
rows keep their struct fields as columns, unmatched rows are either
dropped (how="drop"), kept with nulls (how="null"), or routed to a
`_grokfail` boolean column (how="tag") — the error-isolation posture of
the main pipeline (a bad line must never kill a task).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# Logstash-compatible core primitives (RE2 syntax — no backtracking)
PATTERNS: "dict[str, str]" = {
    "INT": r"[+-]?[0-9]+",
    "POSINT": r"[0-9]+",
    "WORD": r"[A-Za-z0-9_]+",
    "NOTSPACE": r"[^ ]+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "HEX": r"[0-9a-fA-F]+",
    "QUOTEDSTRING": r'"[^"]*"',
    "IP": r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}",
}

_REF = re.compile(r"%\{([A-Z0-9_]+):([A-Za-z_][A-Za-z0-9_]*)\}")


def compile_grok(pattern: str) -> str:
    """Expand %{NAME:field} references into RE2 named captures."""

    def sub(m: "re.Match") -> str:
        name, field = m.group(1), m.group(2)
        if name not in PATTERNS:
            raise KeyError(f"unknown grok primitive %{{{name}}}")
        return f"(?P<{field}>{PATTERNS[name]})"

    out = _REF.sub(sub, pattern)
    if out == pattern and "(?P<" not in pattern:
        raise ValueError("pattern has no captures — nothing to extract")
    return out


def grok_route(ds: "ray.data.Dataset", patterns: "dict[str, str]",
               column: str = "text",
               out_col: str = "grok_route") -> "ray.data.Dataset":
    """First-match pattern dispatch (the Logstash pipeline shape: try
    each pattern in order, route the line by which matched).  Adds
    `out_col` = the first matching pattern's NAME, "" when none match.
    One vectorized RE2 match pass per pattern (match_substring_regex),
    first-match resolved with a single np.select — no per-row work.
    Patterns may use %{NAME:field} refs; captures are ignored here
    (use grok_extract on a routed subset to materialize fields)."""
    if not patterns:
        raise ValueError("grok_route: patterns dict is empty — "
                         "nothing to dispatch on")
    if "" in patterns:
        raise ValueError("grok_route: '' is not a valid route name "
                         "(it is the no-match sentinel)")
    compiled = [(name, _REF.sub(
        lambda m: PATTERNS[m.group(1)], p)) for name, p in patterns.items()]

    def apply(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        import numpy as np

        masks = [pc.match_substring_regex(col, rx)
                 .to_numpy(zero_copy_only=False)
                 for _name, rx in compiled]
        names = [name for name, _rx in compiled]
        route = np.select(masks, names, default="")
        return b.append_column(out_col, pa.array(route, pa.string()))

    apply.__name__ = f"grok_route[{len(compiled)}]"
    return ds.map_batches(apply, batch_format="pyarrow")


def grok_extract(ds: "ray.data.Dataset", pattern: str,
                 column: str = "text", how: str = "drop",
                 types: "dict[str, pa.DataType] | None" = None
                 ) -> "ray.data.Dataset":
    """Apply a grok pattern to `column`; matched named groups become
    columns (cast per `types`, default string).  how: "drop" unmatched
    rows, "null" keep with null fields, "tag" keep + `_grokfail` bool."""
    if how not in ("drop", "null", "tag"):
        raise ValueError(how)
    rx = compile_grok(pattern)
    types = types or {}

    def apply(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        st = pc.extract_regex(col, rx)
        ok = pc.is_valid(st)
        if how == "drop":
            # filter BEFORE casting: unmatched rows carry "" field
            # values that would fail an integer cast
            out = b.filter(ok)
            st = st.filter(ok)
            for field in [f.name for f in st.type]:
                vals = pc.struct_field(st, field)
                if field in types:
                    vals = vals.cast(types[field])
                out = out.append_column(field, vals)
            return out
        out = b
        for field in [f.name for f in st.type]:
            vals = pc.struct_field(st, field)
            vals = pc.if_else(ok, vals, pa.nulls(len(ok), pa.string()))
            if field in types:
                vals = vals.cast(types[field])
            out = out.append_column(field, vals)
        if how == "tag":
            out = out.append_column("_grokfail", pc.invert(ok))
        return out

    apply.__name__ = f"grok[{pattern[:40]}]"
    return ds.map_batches(apply, batch_format="pyarrow")
