"""Dictionary-lookup field enrichment (M2 analogue, SURVEY.md §2.2).

Actor-pool stage: `ds.map_batches(Enricher, batch_format="pyarrow",
concurrency=N)`.  Taxonomy dictionaries are built ONCE per actor in
__init__ (the broadcast-small-side pattern — the reference's auparse
interpretation dictionaries, consumed at /root/reference/lib/field.c:104-130,
become in-worker lookup tables; no shuffle).

Per batch the token lists are flattened once; interpretation classes are
decided per *unique key* (dictionary-encoded), so the dominant identity
class (raw == interpreted) costs nothing and only the small uid / syscall /
hex subsets run Python-level decoding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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

ENRICHED_FIELDS = [
    pa.field("tok_interp", pa.list_(pa.string())),
    pa.field("role_kind", pa.string()),
    pa.field("tool_family", pa.string()),
]

_IDENTITY, _SPECIAL = 0, 1


class Enricher:
    def __init__(self) -> None:
        # per-actor dictionaries (loaded once; analogous to taxonomy tables
        # shipped via ray.put in a multi-node deployment)
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
        tok_keys = batch.column("tok_keys").combine_chunks()
        tok_vals = batch.column("tok_vals").combine_chunks()
        flat_keys = tok_keys.flatten()
        flat_vals = tok_vals.flatten()

        # decide the interpretation class once per unique key
        dict_keys = flat_keys.dictionary_encode()
        uniq = dict_keys.dictionary.to_pylist()
        classes = np.array([self._class_of(k) for k in uniq], dtype=np.int8)
        codes = dict_keys.indices.to_numpy(zero_copy_only=False)

        vals_py = flat_vals.to_pylist()
        if classes.any():
            special_idx = np.nonzero(classes[codes] == _SPECIAL)[0]
            keys_py = flat_keys.to_pylist()
            interp = list(vals_py)
            for i in special_idx:
                interp[i] = interpret_field(keys_py[i], vals_py[i])
        else:
            interp = vals_py

        offsets = tok_keys.offsets
        tok_interp = pa.ListArray.from_arrays(offsets, pa.array(interp, pa.string()))

        roles = batch.column("role").to_pylist()
        tools = batch.column("tool").to_pylist()
        role_kind = pa.array([self.roles.get(r, "unknown") for r in roles], pa.string())
        tool_family = pa.array(
            [self.tools.get(t) if t else None for t in tools], pa.string()
        )
        out = batch.append_column("tok_interp", tok_interp)
        out = out.append_column("role_kind", role_kind)
        out = out.append_column("tool_family", tool_family)
        return out
