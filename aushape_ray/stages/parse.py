"""Vectorized k=v field extraction (M1 analogue, SURVEY.md §2.2).

One C-level regex scan per batch: all `text` values are joined with a
newline separator and TOKEN_RE runs once over the joined string; matches
are bucketed back to rows with a numpy searchsorted over row offsets.
(A newline separator is safe because neither token form — bare `\\S+` or
quoted `"[^"]*"` as generated — spans a newline in this grammar.)

Stateless: use as `ds.map_batches(parse_batch, batch_format="pyarrow",
zero_copy_batch=True)`.

Reference behaviour mirrored: line -> (node, type, fields) tokenization done
by auparse (fed at /root/reference/lib/conv.c:316-318); the `node`/`type`
pseudo-fields go to the envelope, not the record body
(/root/reference/lib/record.c:45-46).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..grammar import PSEUDO_FIELDS, TOKEN_RE, strip_quotes

PARSED_FIELDS = [
    pa.field("node", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("tok_keys", pa.list_(pa.string())),
    pa.field("tok_vals", pa.list_(pa.string())),
]


def parse_batch(batch: pa.Table) -> pa.Table:
    text_col = batch.column("text")
    if text_col.null_count:
        # error isolation: a null text is an empty record, never a task crash
        text_col = text_col.fill_null("")
        batch = batch.set_column(
            batch.column_names.index("text"), "text", text_col
        )
    texts = text_col.to_pylist()
    n = len(texts)
    # row start offsets in the joined string (separator = 1 char)
    lens = np.fromiter((len(t) + 1 for t in texts), dtype=np.int64, count=n)
    starts = np.concatenate(([0], np.cumsum(lens)))
    joined = "\n".join(texts)

    nodes: list = [None] * n
    kinds: list = [None] * n
    keys: list[str] = []
    vals: list[str] = []
    counts = np.zeros(n + 1, dtype=np.int64)

    starts_list = starts.tolist()  # plain-int compares in the hot loop
    row = 0
    row_end = starts_list[1] - 1 if n else 0
    for m in TOKEN_RE.finditer(joined):
        pos = m.start()
        while pos > row_end:  # advance to the owning row (matches are
            row += 1          # ordered, so the walk is amortized O(rows))
            row_end = starts_list[row + 1] - 1
        key, val = m.group(1, 2)
        if key == PSEUDO_FIELDS[0]:  # node -> envelope
            if nodes[row] is None:
                nodes[row] = val
            continue
        if key == PSEUDO_FIELDS[1]:  # type -> record kind
            kinds[row] = val
            continue
        keys.append(key)
        vals.append(strip_quotes(val))
        counts[row + 1] += 1

    offsets = pa.array(np.cumsum(counts), pa.int32())
    tok_keys = pa.ListArray.from_arrays(offsets, pa.array(keys, pa.string()))
    tok_vals = pa.ListArray.from_arrays(offsets, pa.array(vals, pa.string()))
    kinds_arr = pa.array([k if k is not None else "UNKNOWN" for k in kinds], pa.string())

    out = batch
    for name, arr in (
        ("node", pa.array(nodes, pa.string())),
        ("kind", kinds_arr),
        ("tok_keys", tok_keys),
        ("tok_vals", tok_vals),
    ):
        out = out.append_column(name, arr)
    return out
