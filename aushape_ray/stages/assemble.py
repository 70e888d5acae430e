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

import zlib

import numpy as np
import pyarrow as pa

from ..collectors import EventAssembler, route_sink, trim_doc
from ..oracle import format_time_us

SALT_COLUMN = "salt"  # int32; -1 = unsalted row

# shared compact encoder (orjson fast path, stdlib fallback — byte-
# identical contract, see jsonenc.py)
from ..jsonenc import encode_doc_bytes

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

# extended schema used when salted-key skew handling is on: partial rows
# carry pickled assembler state instead of a finished doc
PARTIAL_SCHEMA = EVENT_SCHEMA.append(pa.field("partial", pa.binary())) \
                             .append(pa.field(SALT_COLUMN, pa.int32()))


def stable_hash(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def add_part(batch: pa.Table, num_parts: int,
             hot: dict[str, int] | None = None) -> pa.Table:
    """Tag rows with the conversation's hash partition (vectorized via
    per-batch dictionary encoding: one crc32 per unique conv_id).

    `hot` (salted-key skew handling, SURVEY.md §4) maps a hot conv_id to
    its salt chunk size: its rows get salt = turn_idx // chunk and
    partition hash(conv_id + ':' + salt), spreading the conversation over
    several partitions as contiguous turn ranges; everyone else gets
    salt = -1 and the plain conv hash.
    """
    conv = batch.column("conv_id").combine_chunks()
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.chunk(0) if conv.num_chunks else pa.array([], pa.string())
    dict_arr = conv.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    # sentinel slot for null conv_ids: they are ONE conversation with
    # cid=None (oracle dict-key semantics) and all hash to partition 0
    part_of = np.array([stable_hash(u) % num_parts for u in uniq] + [0],
                       dtype=np.int32)
    idx = dict_arr.indices
    if idx.null_count:
        idx = pa.compute.fill_null(idx, len(uniq))
    codes = np.asarray(idx)
    parts = part_of[codes]
    salts = np.full(len(codes), -1, dtype=np.int32)
    if hot:
        hot_codes = [c for c, u in enumerate(uniq) if u in hot]
        if hot_codes:
            turn = np.asarray(batch.column("turn_idx"), dtype=np.int64)
            for c in hot_codes:
                cid = uniq[c]
                chunk = max(1, hot[cid])
                mask = codes == c
                s = (turn[mask] // chunk).astype(np.int32)
                salts[mask] = s
                parts[mask] = np.array(
                    [stable_hash(f"{cid}:{v}") % num_parts for v in s],
                    dtype=np.int32)
    out = batch.append_column("part", pa.array(parts, pa.int32()))
    return out.append_column("salt", pa.array(salts, pa.int32()))


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def _flat_list(col) -> "tuple[list, list]":
    """(flat python values, offsets as a python int list) of a null-free
    list column — row i's items are flat[off[i]:off[i+1]]."""
    arr = _as_array(col)
    off = np.asarray(arr.offsets)
    return arr.flatten().to_pylist(), (off - off[0]).tolist()


def _flat_list_lowcard(col) -> "tuple[list, list]":
    """_flat_list for a LOW-CARDINALITY flat column (token keys: a small
    field-name vocabulary).  Dictionary-encodes in C and fans the dictionary
    out with one numpy object take, so every occurrence of a key is the
    SAME Python str object — no per-token allocation, and dict inserts
    downstream reuse the str's cached hash."""
    arr = _as_array(col)
    off = np.asarray(arr.offsets)
    dk = arr.flatten().dictionary_encode()
    vocab_list = dk.dictionary.to_pylist()
    idx = dk.indices
    if idx.null_count:  # null values keep their None identity
        idx = pa.compute.fill_null(idx, len(vocab_list))
        vocab_list = vocab_list + [None]
    vocab = np.asarray(vocab_list, dtype=object)
    codes = np.asarray(idx)
    flat = vocab[codes].tolist() if len(codes) else []
    return flat, (off - off[0]).tolist()


def finish_event(rows: dict, asm: EventAssembler, cid: str, ts_first: int,
                 n_turns: int, any_tool: bool,
                 max_event_size: int | None, with_text: bool) -> None:
    doc = asm.end(cid, format_time_us(ts_first))
    if doc is None:
        return
    doc = trim_doc(doc, max_event_size)
    rows["conv_id"].append(cid)
    rows["ts_first"].append(ts_first)
    rows["node"].append(asm.node)
    rows["n_turns"].append(n_turns)
    rows["n_records"].append(asm.n_records)
    rows["sink"].append(route_sink(asm.error, any_tool))
    rows["error"].append(asm.error)
    rows["text"].append(asm.texts if with_text else [])
    rows["trimmed"].append(doc.get("trimmed", []))
    doc_bytes = encode_doc_bytes(doc)
    rows["doc"].append(doc_bytes.decode("utf-8"))
    # byte length of the serialized doc (== doc_size(doc), without a
    # second serialization pass)
    rows["doc_bytes"].append(len(doc_bytes))


class AssemblePartition:
    """Callable for map_groups: one hash partition in, event rows out.

    With emit_partials=True (salted-key skew handling) the output uses
    PARTIAL_SCHEMA: rows of a salted conversation (salt >= 0) are folded
    into a pickled partial-assembler row per (conv_id, salt) sub-range,
    to be merged by merge_partials_fn in a second, tiny groupby.
    """

    def __init__(self, with_text: bool = True, with_norm: bool = False,
                 max_event_size: int | None = None,
                 emit_partials: bool = False,
                 parse_in_stage: bool = False) -> None:
        self.with_text = with_text
        self.with_norm = with_norm
        self.max_event_size = max_event_size
        self.emit_partials = emit_partials
        # late-parse mode: the exchange shipped only the raw projection
        # (conv_id, turn_idx, ts, text, is_tool, part[, salt]); tokenize +
        # enrich here, after the shuffle
        self.parse_in_stage = parse_in_stage
        self.__name__ = "assemble_partition"  # map_groups wraps fn by name

    def _schema(self) -> pa.Schema:
        return PARTIAL_SCHEMA if self.emit_partials else EVENT_SCHEMA

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self._schema().empty_table()
        if self.parse_in_stage:
            from .enrich import enrich_batch
            from .parse import parse_batch

            group = enrich_batch(parse_batch(group))
        order = pa.compute.sort_indices(
            group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        g = group.take(order)
        # conv identity via dictionary codes: run-boundary detection happens
        # on int codes in numpy (one vector op), never on per-turn Python
        # string compares; only one string per distinct conversation crosses
        # into Python
        conv_dict = _as_array(g.column("conv_id")).dictionary_encode()
        conv_idx = conv_dict.indices
        conv_uniq = conv_dict.dictionary.to_pylist()
        if conv_idx.null_count:
            # null conv_ids are ONE conversation with cid=None (the
            # oracle's dict-key grouping, oracle.py assemble_events) —
            # give them a fresh code; a plain numpy view of null indices
            # would otherwise NaN-split every null row into its own run
            conv_idx = pa.compute.fill_null(conv_idx, len(conv_uniq))
            conv_uniq = conv_uniq + [None]
        conv_codes = np.asarray(conv_idx)
        texts = _as_array(g.column("text")).to_pylist()
        is_tool_np = np.asarray(
            _as_array(pa.compute.fill_null(g.column("is_tool"), False)),
            dtype=bool)
        kinds = _as_array(g.column("kind")).to_pylist()
        nodes = _as_array(g.column("node")).to_pylist()
        ts_us = _as_array(g.column("ts").cast(pa.int64())).to_pylist()
        # list<string> columns cross into Python FLAT + offsets, never via
        # the nested to_pylist (measured 6x slower: 11.2s vs 1.9s for the
        # 1M-row tok_keys at sf0.1 — per-list object overhead dominated
        # the whole assemble stage); per-turn slices are plain list slices
        # keys AND values go through the dictionary fanout: audit-style
        # fields repeat heavily (12-17x measured vs to_pylist), and the
        # worst case (all-distinct) just degrades to to_pylist + one C hash
        # scan
        tkeys_f, tk_off = _flat_list_lowcard(g.column("tok_keys"))
        tvals_f, tv_off = _flat_list_lowcard(g.column("tok_vals"))
        spi_f, si_off = _flat_list(g.column("sp_idx"))
        spv_f, sv_off = _flat_list_lowcard(g.column("sp_val"))
        n = g.num_rows
        salts_np = (np.asarray(_as_array(g.column("salt")), dtype=np.int64)
                    if "salt" in g.column_names
                    else np.full(n, -1, np.int64))

        rows = {name: [] for name in self._schema().names}
        # (conv, salt) run boundaries, one vector op (input is sorted by
        # conv_id so equal codes are contiguous)
        if n:
            change = ((conv_codes[1:] != conv_codes[:-1])
                      | (salts_np[1:] != salts_np[:-1]))
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            ends = np.concatenate((starts[1:], [n]))
            run_any_tool = np.logical_or.reduceat(is_tool_np, starts)
        else:
            starts = ends = run_any_tool = np.empty(0, np.int64)
        for r in range(len(starts)):
            i = int(starts[r])
            j = int(ends[r])
            cid = conv_uniq[conv_codes[i]]
            salt = int(salts_np[i])
            asm = EventAssembler(with_text=self.with_text, with_norm=self.with_norm)
            any_tool = bool(run_any_tool[r])
            add_turn_fast = asm.add_turn_fast
            for t in range(i, j):
                a, b = tk_off[t], tk_off[t + 1]
                ks = tkeys_f[a:b]
                vs = tvals_f[tv_off[t]:tv_off[t + 1]]
                c, d = si_off[t], si_off[t + 1]
                if c != d:
                    interp = list(vs)
                    for p, v in zip(spi_f[c:d],
                                    spv_f[sv_off[t]:sv_off[t + 1]]):
                        interp[p] = v
                else:
                    interp = vs
                add_turn_fast(kinds[t], nodes[t], texts[t], ks, vs, interp)
            if salt >= 0 and self.emit_partials:
                import pickle

                state = pickle.dumps({
                    "asm": asm, "any_tool": any_tool,
                    "ts_first": ts_us[i], "n_turns": j - i,
                })
                rows["conv_id"].append(cid)
                rows["ts_first"].append(ts_us[i])
                rows["node"].append(asm.node)
                rows["n_turns"].append(j - i)
                rows["n_records"].append(asm.n_records)
                rows["sink"].append("")
                rows["error"].append(None)
                rows["text"].append([])
                rows["trimmed"].append([])
                rows["doc"].append("")
                rows["doc_bytes"].append(0)
                rows["partial"].append(state)
                rows["salt"].append(salt)
            else:
                finish_event(rows, asm, cid, ts_us[i], j - i, any_tool,
                             self.max_event_size, self.with_text)
                if self.emit_partials:
                    while len(rows["partial"]) < len(rows["conv_id"]):
                        rows["partial"].append(None)
                        rows["salt"].append(-1)

        schema = self._schema()
        arrays = [pa.array(rows[f.name], f.type) for f in schema]
        return pa.Table.from_arrays(arrays, schema=schema)


def _merge_partial_group(g: pa.Table, with_text: bool, with_norm: bool,
                         max_event_size: int | None) -> pa.Table:
    """Merge one conversation's salt-ordered partial rows into its event."""
    import pickle

    cid = _as_array(g.column("conv_id")).to_pylist()[0]
    states = [pickle.loads(b) for b in _as_array(g.column("partial")).to_pylist()]
    base = states[0]
    asm: EventAssembler = base["asm"]
    any_tool = base["any_tool"]
    n_turns = base["n_turns"]
    for s in states[1:]:
        asm.merge(s["asm"])
        any_tool = any_tool or s["any_tool"]
        n_turns += s["n_turns"]
    rows = {name: [] for name in EVENT_SCHEMA.names}
    finish_event(rows, asm, cid, base["ts_first"], n_turns, any_tool,
                 max_event_size, with_text)
    arrays = [pa.array(rows[f.name], f.type) for f in EVENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)


def make_merge_partials(with_text: bool = True, with_norm: bool = False,
                        max_event_size: int | None = None):
    """Per-conversation merge of salted partial assemblies (tiny groupby:
    one group per hot conversation, a handful of rows each)."""

    def merge_partials(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group, sort_keys=[("salt", "ascending")])
        return _merge_partial_group(group.take(order), with_text, with_norm,
                                    max_event_size)

    merge_partials.__name__ = "merge_partials"
    return merge_partials


def add_merge_part(batch: pa.Table, num_parts: int) -> pa.Table:
    """Tag PARTIAL_SCHEMA rows with the conversation's merge partition
    (plain conv hash, no salting — all of a hot conversation's partial
    rows must land together)."""
    conv = _as_array(batch.column("conv_id"))
    dict_arr = conv.dictionary_encode()
    uniq = dict_arr.dictionary.to_pylist()
    part_of = np.array([stable_hash(u) % num_parts for u in uniq] + [0],
                       dtype=np.int32)  # sentinel slot for null conv_ids
    idx = dict_arr.indices
    if idx.null_count:
        idx = pa.compute.fill_null(idx, len(uniq))
    parts = part_of[np.asarray(idx)]
    return batch.append_column("mpart", pa.array(parts, pa.int32()))


def make_merge_or_pass(with_text: bool = True, with_norm: bool = False,
                       max_event_size: int | None = None):
    """Salted-path finisher WITHOUT materialization: one streaming
    groupby over the PARTIAL_SCHEMA assemble output, keyed by the
    conversation's MERGE PARTITION (add_merge_part) — never per
    conversation, which would pay per-group overhead for every finished
    event (measured 5x the whole pipeline at 90k events).  Within a
    partition, finished events pass through untouched; each hot
    conversation's n_salts partial rows merge in salt order.  Replaces
    the former materialize-then-filter-twice plan (verdict r4 item 2):
    the event stream is exchanged once more (events are far smaller than
    the input turns) but is never pinned — backpressure and spilling
    stay in force.  write_routed's salted side-channel avoids even this
    exchange for finished events by writing them to sinks in-stream."""

    def merge_or_pass(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part_col = group.column("partial")
        passthrough = group.filter(pc.is_null(part_col)) \
                           .select(EVENT_SCHEMA.names)
        if passthrough.num_rows == group.num_rows:
            return passthrough
        partials = group.filter(pc.is_valid(part_col))
        order = pa.compute.sort_indices(
            partials, sort_keys=[("conv_id", "ascending"),
                                 ("salt", "ascending")])
        p = partials.take(order)
        # conversation run boundaries over the sorted partial rows
        codes = np.asarray(pa.compute.fill_null(
            _as_array(p.column("conv_id")).dictionary_encode().indices, -1))
        change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [p.num_rows]))
        merged = [_merge_partial_group(p.slice(int(i), int(j - i)),
                                       with_text, with_norm, max_event_size)
                  for i, j in zip(starts, ends)]
        return pa.concat_tables([passthrough] + merged)

    merge_or_pass.__name__ = "merge_or_pass"
    return merge_or_pass
