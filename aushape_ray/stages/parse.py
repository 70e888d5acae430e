"""Vectorized k=v field extraction (M1 analogue, SURVEY.md §2.2).

Zero-Python-per-match: ONE Rust-regex (`polars` `str.extract_all`) scan
pulls every token per row (row bucketing falls out of the Arrow list
offsets), then Arrow kernels split key/val on the first `=`, route the
`node`/`type` pseudo-fields into the envelope, and strip value quotes —
no loop over rows or matches anywhere.  TOKEN_RE2 (grammar.py) is the
lookbehind-free port of TOKEN_RE, proven character-equivalent by the
adversarial/hypothesis parity tests against `parse_batch_reference`
(the previous finditer implementation, kept below as the test oracle).
Measured 5x the finditer path on the sf0.1 corpus (~500k rows/s/core).

Stateless: use as `ds.map_batches(parse_batch, batch_format="pyarrow",
zero_copy_batch=True)`.

Reference behaviour mirrored: line -> (node, type, fields) tokenization done
by auparse (fed at /root/reference/lib/conv.c:316-318); the `node`/`type`
pseudo-fields go to the envelope, not the record body
(/root/reference/lib/record.c:45-46).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..grammar import PSEUDO_FIELDS, PY_WHITESPACE, TOKEN_RE, TOKEN_RE2, strip_quotes

# Ray owns the parallelism (one parse task per CPU); polars' rayon pool must
# not oversubscribe the worker.  Effective because every worker imports this
# module before its first polars import (harmless if polars is already in).
if "polars" not in sys.modules:
    os.environ.setdefault("POLARS_MAX_THREADS", "1")

PARSED_FIELDS = [
    pa.field("node", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("tok_keys", pa.list_(pa.string())),
    pa.field("tok_vals", pa.list_(pa.string())),
]


def parse_batch(batch: pa.Table) -> pa.Table:
    import polars as pl

    text_col = batch.column("text")
    if text_col.null_count:
        # error isolation: a null text is an empty record, never a task crash
        text_col = text_col.fill_null("")
        batch = batch.set_column(
            batch.column_names.index("text"), "text", text_col
        )
    n = batch.num_rows
    arr = text_col.combine_chunks() if isinstance(
        text_col, pa.ChunkedArray) else text_col

    # one compiled-DFA scan; list<match> per row (no-match rows = empty list
    # because the input has no nulls after the fill above)
    la = pl.from_arrow(arr).str.extract_all(TOKEN_RE2).to_arrow()
    flat = la.values  # all matches, row-major
    off = np.asarray(la.offsets)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))

    # match = [one ws sep?] key '=' val; keys never contain '=' so the first
    # '=' is the separator, and key chars are never whitespace so ltrim
    # removes exactly the consumed separator char
    kv = pc.split_pattern(flat, "=", max_splits=1)
    keys = pc.cast(pc.utf8_ltrim(pc.list_element(kv, 0), PY_WHITESPACE),
                   pa.string())
    vals = pc.cast(pc.list_element(kv, 1), pa.string())

    is_node = pc.equal(keys, PSEUDO_FIELDS[0]).to_numpy(zero_copy_only=False)
    is_type = pc.equal(keys, PSEUDO_FIELDS[1]).to_numpy(zero_copy_only=False)

    # node -> envelope (FIRST occurrence per row wins); type -> record kind
    # (LAST wins).  Fancy-index assignment keeps the last store per slot, so
    # reversed order encodes first-wins.
    idx = np.flatnonzero(is_node)
    node_ind = np.full(n, -1, np.int64)
    node_ind[row_of[idx][::-1]] = idx[::-1]
    idx = np.flatnonzero(is_type)
    kind_ind = np.full(n, -1, np.int64)
    kind_ind[row_of[idx]] = idx

    nodes_arr = vals.take(pa.array(node_ind, pa.int64(), mask=node_ind < 0))
    kinds_arr = pc.fill_null(
        vals.take(pa.array(kind_ind, pa.int64(), mask=kind_ind < 0)),
        "UNKNOWN")

    keep = np.flatnonzero(~(is_node | is_type))
    take = pa.array(keep, pa.int64())
    tok_keys_flat = keys.take(take)
    v = vals.take(take)
    # strip_quotes, vectorized: quoted-alternative matches are exactly the
    # values that start AND end with '"' at len>=2 (a bare \S+ value cannot
    # end with '"' if it starts with one — that closing quote would have
    # made the quoted alternative win)
    quoted = pc.and_(
        pc.and_(pc.starts_with(v, '"'), pc.ends_with(v, '"')),
        pc.greater_equal(pc.utf8_length(v), 2))
    tok_vals_flat = pc.if_else(quoted, pc.utf8_slice_codeunits(v, 1, -1), v)

    counts = (np.bincount(row_of[keep], minlength=n)
              if keep.size else np.zeros(n, np.int64))
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(counts))).astype(np.int32), pa.int32())
    tok_keys = pa.ListArray.from_arrays(offsets, tok_keys_flat)
    tok_vals = pa.ListArray.from_arrays(offsets, tok_vals_flat)

    out = batch
    for name, col in (
        ("node", nodes_arr),
        ("kind", kinds_arr),
        ("tok_keys", tok_keys),
        ("tok_vals", tok_vals),
    ):
        out = out.append_column(name, col)
    return out


def parse_batch_reference(batch: pa.Table) -> pa.Table:
    """The previous per-match finditer implementation (TOKEN_RE + a
    searchsorted-style row walk over the joined text).  Kept as the parity
    oracle for the vectorized path: tests assert parse_batch ==
    parse_batch_reference on adversarial and hypothesis-generated inputs.
    Not used on any data path."""
    text_col = batch.column("text")
    if text_col.null_count:
        text_col = text_col.fill_null("")
        batch = batch.set_column(
            batch.column_names.index("text"), "text", text_col
        )
    texts = text_col.to_pylist()
    n = len(texts)
    lens = np.fromiter((len(t) + 1 for t in texts), dtype=np.int64, count=n)
    starts = np.concatenate(([0], np.cumsum(lens)))
    joined = "\n".join(texts)

    nodes: list = [None] * n
    kinds: list = [None] * n
    keys: list[str] = []
    vals: list[str] = []
    counts = np.zeros(n + 1, dtype=np.int64)

    starts_list = starts.tolist()
    row = 0
    row_end = starts_list[1] - 1 if n else 0
    for m in TOKEN_RE.finditer(joined):
        pos = m.start()
        while pos > row_end:
            row += 1
            row_end = starts_list[row + 1] - 1
        key, val = m.group(1, 2)
        if key == PSEUDO_FIELDS[0]:
            if nodes[row] is None:
                nodes[row] = val
            continue
        if key == PSEUDO_FIELDS[1]:
            kinds[row] = val
            continue
        keys.append(key)
        vals.append(strip_quotes(val))
        counts[row + 1] += 1

    offsets = pa.array(np.cumsum(counts), pa.int32())
    tok_keys = pa.ListArray.from_arrays(offsets, pa.array(keys, pa.string()))
    tok_vals = pa.ListArray.from_arrays(offsets, pa.array(vals, pa.string()))
    kinds_arr = pa.array(
        [k if k is not None else "UNKNOWN" for k in kinds], pa.string())

    out = batch
    for name, arr in (
        ("node", pa.array(nodes, pa.string())),
        ("kind", kinds_arr),
        ("tok_keys", tok_keys),
        ("tok_vals", tok_vals),
    ):
        out = out.append_column(name, arr)
    return out
