"""JSON-lines transcript source.

The third input surface beside Parquet shards and raw auditd text: one
JSON object per line with the transcript columns (conv_id, turn_idx,
role, text, tool, ts — ts as an ISO-8601 string).  Reading is Ray's
native Arrow JSON reader (C++, streaming, one task per file); this
module only normalizes the schema (ts string -> timestamp[us],
turn_idx -> int32, missing tool/role -> "") so the result feeds
build_events / the oracle exactly like read_transcripts.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..pipelines.events_pipeline import TRANSCRIPT_COLUMNS


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in TRANSCRIPT_COLUMNS:
        if name in batch.column_names:
            col = batch.column(name)
        elif name in ("role", "tool"):
            col = pa.nulls(batch.num_rows, pa.string())
        else:
            raise ValueError(f"jsonl transcripts missing column {name!r}")
        if name == "ts":
            # ISO-8601 strings cast natively (Arrow strptime lacks %f)
            col = col.cast(pa.timestamp("us"))
        elif name == "turn_idx":
            col = col.cast(pa.int32())
        elif name in ("role", "tool") and col.null_count:
            col = col.fill_null("")
        cols[name] = col
    return pa.table(cols)


def read_transcripts_jsonl(path: str) -> "ray.data.Dataset":
    """JSONL transcript files (a file or directory) -> the canonical
    transcript Dataset shape."""
    return ray.data.read_json(path).map_batches(
        _normalize, batch_format="pyarrow")
