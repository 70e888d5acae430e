"""Dictionary-lookup field enrichment (M2 analogue, SURVEY.md §2.2).

Taxonomy dictionaries are built ONCE per worker (the broadcast-small-side
pattern — the reference's auparse interpretation dictionaries, consumed at
/root/reference/lib/field.c:104-130, become in-worker lookup tables; no
shuffle).  Interpretation classes are decided per *unique key*
(dictionary-encoded), so the dominant identity class (raw == interpreted)
costs nothing and only the small uid / syscall / hex subsets run Python
decoding.

Two output modes:
- full (default): adds `tok_interp` (list<string>, aligned with tok_vals)
  plus role_kind / tool_family taxonomy columns — for standalone enrich
  queries.
- sparse (the pipeline hot path): adds only `sp_idx` / `sp_val`
  (positions+values where interpreted != raw) and an `is_tool` flag, and
  DROPS columns the downstream assemble never reads (role, tool).  This
  cuts the bytes crossing the one shuffle by ~40%.

Used as stateless tasks via `enrich_batch` / `enrich_batch_full` (worker
processes are reused, so per-process state is built once — same
amortization as an actor pool without its threaded in-flight batch
interleaving), or as an actor pool via the class (the multi-node shape
when dictionaries come from ray.put).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..grammar import (
    GID_KEYS,
    HEX_KEYS,
    ROLE_TAXONOMY,
    SLICE_RE,
    SYSCALL_NAMES,
    TOOL_TAXONOMY,
    UID_KEYS,
    interpret_field,
)

SALT_COLUMN = "salt"

_IDENTITY, _SPECIAL = 0, 1

SPARSE_COLUMNS = ["conv_id", "turn_idx", "ts", "text", "node", "kind",
                  "tok_keys", "tok_vals", "sp_idx", "sp_val", "is_tool"]


class Enricher:
    def __init__(self, sparse: bool = False) -> None:
        self.sparse = sparse
        self.syscalls = dict(SYSCALL_NAMES)
        self.roles = {k: v[0] for k, v in ROLE_TAXONOMY.items()}
        self.tools = {k: v[0] for k, v in TOOL_TAXONOMY.items()}
        self.special = set(UID_KEYS) | set(GID_KEYS) | set(HEX_KEYS) | {"syscall", "exit"}
        self._key_class: dict[str, int] = {}

    def _class_of(self, key: str) -> int:
        c = self._key_class.get(key)
        if c is None:
            c = _SPECIAL if (key in self.special or SLICE_RE.match(key)) else _IDENTITY
            self._key_class[key] = c
        return c

    def __call__(self, batch: pa.Table) -> pa.Table:
        tok_keys = _as_array(batch.column("tok_keys"))
        tok_vals = _as_array(batch.column("tok_vals"))
        flat_keys = tok_keys.flatten()
        flat_vals = tok_vals.flatten()
        offsets = tok_keys.offsets

        # decide the interpretation class once per unique key
        dict_keys = flat_keys.dictionary_encode()
        uniq = dict_keys.dictionary.to_pylist()
        classes = np.array([self._class_of(k) for k in uniq], dtype=np.int8)
        codes = dict_keys.indices.to_numpy(zero_copy_only=False)
        special_idx = (np.nonzero(classes[codes] == _SPECIAL)[0]
                       if classes.any() else np.empty(0, np.int64))

        if self.sparse:
            return self._sparse(batch, tok_keys, tok_vals, offsets,
                                flat_keys, flat_vals, special_idx)

        vals_py = flat_vals.to_pylist()
        if len(special_idx):
            keys_py = flat_keys.to_pylist()
            interp = list(vals_py)
            for i in special_idx:
                interp[i] = interpret_field(keys_py[i], vals_py[i])
        else:
            interp = vals_py
        tok_interp = pa.ListArray.from_arrays(offsets, pa.array(interp, pa.string()))
        roles = batch.column("role").to_pylist()
        tools = batch.column("tool").to_pylist()
        out = batch.append_column("tok_interp", tok_interp)
        out = out.append_column("role_kind", pa.array(
            [self.roles.get(r, "unknown") for r in roles], pa.string()))
        out = out.append_column("tool_family", pa.array(
            [self.tools.get(t) if t else None for t in tools], pa.string()))
        return out

    def _sparse(self, batch: pa.Table, tok_keys, tok_vals, offsets,
                flat_keys, flat_vals, special_idx) -> pa.Table:
        n = batch.num_rows
        off = np.asarray(offsets)
        off = off - off[0] if len(off) else off  # sliced-array offset base
        if len(special_idx):
            k_sub = flat_keys.take(pa.array(special_idx)).to_pylist()
            v_sub = flat_vals.take(pa.array(special_idx)).to_pylist()
            sp_vals = []
            keep = []
            for j, (k, v) in enumerate(zip(k_sub, v_sub)):
                iv = interpret_field(k, v)
                if iv != v:  # only ship actual differences
                    keep.append(j)
                    sp_vals.append(iv)
            special_idx = special_idx[keep]
            row_of = np.searchsorted(off, special_idx, side="right") - 1
            pos = (special_idx - off[row_of]).astype(np.int32)
            counts = np.bincount(row_of, minlength=n)
        else:
            sp_vals = []
            pos = np.empty(0, np.int32)
            counts = np.zeros(n, np.int64)
        sp_off = pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32())
        sp_idx = pa.ListArray.from_arrays(sp_off, pa.array(pos, pa.int32()))
        sp_val = pa.ListArray.from_arrays(sp_off, pa.array(sp_vals, pa.string()))
        is_tool = (batch.column("is_tool") if "is_tool" in batch.column_names
                   else pc.equal(batch.column("role"), "tool"))
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "ts": batch.column("ts"),
            "text": batch.column("text"),
            "node": batch.column("node"),
            "kind": batch.column("kind"),
            "tok_keys": tok_keys,
            "tok_vals": tok_vals,
            "sp_idx": sp_idx,
            "sp_val": sp_val,
            "is_tool": is_tool,
        }
        # pass through partitioning columns when parsing runs post-shuffle
        for extra in ("part", SALT_COLUMN):
            if extra in batch.column_names:
                cols[extra] = batch.column(extra)
        return pa.table(cols)


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


# Process-level singletons: Ray reuses worker processes across tasks.
_PROC: dict[bool, Enricher] = {}


def enrich_batch(batch: pa.Table) -> pa.Table:
    """Sparse-mode stateless-task enrich (the pipeline hot path)."""
    e = _PROC.get(True)
    if e is None:
        e = _PROC[True] = Enricher(sparse=True)
    return e(batch)


def enrich_batch_full(batch: pa.Table) -> pa.Table:
    e = _PROC.get(False)
    if e is None:
        e = _PROC[False] = Enricher(sparse=False)
    return e(batch)
