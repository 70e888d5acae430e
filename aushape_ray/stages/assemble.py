"""Distributed event assembly (C1-C7 analogue, SURVEY.md §2.3).

The ONE shuffle of the pipeline: rows are tagged with a stable hash
partition of `conv_id` (`add_part`), then `groupby("part").map_groups`
delivers each partition's rows to `AssemblePartition` which sorts by
(conv_id, turn_idx) — the stable-ordering invariant — and folds each
conversation through the collector state machines
(aushape_ray.collectors, mirroring /root/reference/lib/conv_buf.c:355-709).

Partition count P amortizes per-group Python overhead (many conversations
per call) and bounds skew: a hot conversation is confined to one partition
while the other P-1 proceed.  At cluster scale P should be ~2-4x total
cores; crc32 is a portable, process-stable hash (no PYTHONHASHSEED issues).
Per-conversation errors NEVER fail the task — they latch into the `error`
column (error isolation, lib/conv_buf.c:627-648).
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

from ..collectors import EventAssembler, doc_size, route_sink, trim_doc
from ..oracle import format_time_us

EVENT_SCHEMA = pa.schema([
    pa.field("conv_id", pa.string()),
    pa.field("ts_first", pa.timestamp("us")),
    pa.field("node", pa.string()),
    pa.field("n_turns", pa.int32()),
    pa.field("n_records", pa.int32()),
    pa.field("sink", pa.string()),
    pa.field("error", pa.string()),
    pa.field("text", pa.list_(pa.string())),
    pa.field("trimmed", pa.list_(pa.string())),
    pa.field("doc", pa.string()),
    pa.field("doc_bytes", pa.int64()),
])


def stable_hash(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    """Tag rows with the conversation's hash partition (vectorized via
    per-batch dictionary encoding: one crc32 per unique conv_id)."""
    conv = batch.column("conv_id").combine_chunks()
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.chunk(0) if conv.num_chunks else pa.array([], pa.string())
    dict_arr = conv.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    part_of = np.array([stable_hash(u) % num_parts for u in uniq], dtype=np.int32)
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    return batch.append_column("part", pa.array(part_of[codes], pa.int32()))


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


class AssemblePartition:
    """Callable for map_groups: one hash partition in, event rows out."""

    def __init__(self, with_text: bool = True, with_norm: bool = False,
                 max_event_size: int | None = None) -> None:
        self.with_text = with_text
        self.with_norm = with_norm
        self.max_event_size = max_event_size
        self.__name__ = "assemble_partition"  # map_groups wraps fn by name

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return EVENT_SCHEMA.empty_table()
        order = pa.compute.sort_indices(
            group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        g = group.take(order)
        conv = _as_array(g.column("conv_id")).to_pylist()
        texts = _as_array(g.column("text")).to_pylist()
        is_tool = _as_array(g.column("is_tool")).to_pylist()
        kinds = _as_array(g.column("kind")).to_pylist()
        nodes = _as_array(g.column("node")).to_pylist()
        ts_us = _as_array(g.column("ts").cast(pa.int64())).to_pylist()
        tkeys = _as_array(g.column("tok_keys")).to_pylist()
        tvals = _as_array(g.column("tok_vals")).to_pylist()
        sp_idx = _as_array(g.column("sp_idx")).to_pylist()
        sp_val = _as_array(g.column("sp_val")).to_pylist()

        rows = {name: [] for name in EVENT_SCHEMA.names}
        n = len(conv)
        i = 0
        while i < n:
            j = i
            cid = conv[i]
            asm = EventAssembler(with_text=self.with_text, with_norm=self.with_norm)
            any_tool = False
            while j < n and conv[j] == cid:
                ks, vs = tkeys[j], tvals[j]
                if sp_idx[j]:
                    interp = list(vs)
                    for p, v in zip(sp_idx[j], sp_val[j]):
                        interp[p] = v
                else:
                    interp = vs
                fields = list(zip(ks, vs, interp))
                asm.add_turn(kinds[j], nodes[j], texts[j], fields)
                if is_tool[j]:
                    any_tool = True
                j += 1
            doc = asm.end(cid, format_time_us(ts_us[i]))
            if doc is not None:
                doc = trim_doc(doc, self.max_event_size)
                rows["conv_id"].append(cid)
                rows["ts_first"].append(ts_us[i])
                rows["node"].append(asm.node)
                rows["n_turns"].append(j - i)
                rows["n_records"].append(asm.n_records)
                rows["sink"].append(route_sink(asm.error, any_tool))
                rows["error"].append(asm.error)
                rows["text"].append(asm.texts if self.with_text else [])
                rows["trimmed"].append(doc.get("trimmed", []))
                rows["doc"].append(
                    json.dumps(doc, ensure_ascii=False, separators=(",", ":"))
                )
                rows["doc_bytes"].append(doc_size(doc))
            i = j

        arrays = [
            pa.array(rows[f.name], f.type) for f in EVENT_SCHEMA
        ]
        return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)
