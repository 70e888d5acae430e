"""CSV transcript source.

Fourth input surface beside Parquet shards, raw auditd text and JSONL:
comma-separated with a header row carrying the transcript columns
(conv_id, turn_idx, role, text, tool, ts — ts as an ISO-8601 string).
Reading is Ray's native Arrow CSV reader (C++, streaming, one task per
file); this module normalizes the parsed schema the same way the JSONL
source does (ts -> timestamp[us], turn_idx -> int32, null role/tool ->
"") so the result feeds build_events / the oracle exactly like
read_transcripts.  Text fields may contain embedded newlines/quotes —
Arrow's CSV parser handles RFC-4180 quoting; newlines_in_values is
enabled for the multi-line unicode cases the fixture exercises.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

from .jsonl import _normalize


def read_transcripts_csv(path: str) -> "ray.data.Dataset":
    """CSV transcript files (a file or directory) -> the canonical
    transcript Dataset shape."""
    # text/conv_id must never be type-inferred into something else, and
    # ts arrives as a string for the same cast path as the JSONL source
    convert = pacsv.ConvertOptions(column_types={
        "conv_id": pa.string(), "turn_idx": pa.int64(),
        "role": pa.string(), "text": pa.string(),
        "tool": pa.string(), "ts": pa.string(),
    })
    parse = pacsv.ParseOptions(newlines_in_values=True)
    return ray.data.read_csv(
        path, convert_options=convert, parse_options=parse).map_batches(
        _normalize, batch_format="pyarrow")


def write_transcripts_csv(tbl: pa.Table, path: str) -> int:
    """Inverse writer (tests / round-trips): one CSV file with header,
    ts serialized ISO-8601 with microseconds."""
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name == "ts":
            col = col.cast(pa.timestamp("us")).cast(pa.string())
        cols[name] = col
    out = pa.table(cols)
    pacsv.write_csv(out, path)
    return out.num_rows
