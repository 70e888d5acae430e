"""Sequence packing: greedy next-fit of documents into fixed-token-budget
training contexts.

The canonical last-mile op of an LLM data pipeline: after curation, docs
are concatenated into fixed-length contexts (e.g. 2048/4096 tokens) so no
padding is wasted.  At corpus scale packing is done PER SHARD, never
globally — global packing would serialize the whole corpus through one
consumer, and training only needs each context to be dense, not for pack
ids to be globally contiguous.  The distributed shape here mirrors that:
docs hash-partition to P shards, each shard packs independently in
deterministic (doc_id) order, pack ids are (shard, local_idx) pairs.

Scale: the per-shard state is one int64 cumsum over that shard's token
counts — 16 bytes/doc, so a 10^10-doc corpus at P=65536 shards holds
~2.4 MB per shard task.  The pack-assignment loop runs one searchsorted
per PACK (not per doc): O(n_packs * log n_docs) interpreter work.
"""

from __future__ import annotations

import numpy as np

__all__ = ["next_fit_pack", "pack_summary"]


def next_fit_pack(tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Greedy next-fit pack assignment over docs in the given order.

    Returns an int64 pack index per doc.  A pack is closed as soon as the
    next doc would push it past `capacity`; a doc that alone exceeds
    `capacity` gets a pack of its own (the oversize pack — real pipelines
    then chunk it downstream; we keep it intact so token counts are
    conserved and the parity oracle stays exact).
    """
    t = np.asarray(tokens, dtype=np.int64)
    n = len(t)
    out = np.empty(n, np.int64)
    if n == 0:
        return out
    csum = np.cumsum(t)
    start = 0
    pack = 0
    while start < n:
        base = csum[start - 1] if start else 0
        # largest prefix whose running total stays within capacity
        end = int(np.searchsorted(csum, base + capacity, side="right"))
        if end == start:  # single doc larger than capacity
            end = start + 1
        out[start:end] = pack
        pack += 1
        start = end
    return out


def pack_summary(doc_ids: np.ndarray, tokens: np.ndarray,
                 capacity: int) -> dict:
    """Pack one shard (already ordered) and aggregate per-pack stats.

    Returns columns: pack_id, n_docs, n_tokens, first_doc_id.
    """
    t = np.asarray(tokens, dtype=np.int64)
    ids = np.asarray(doc_ids, dtype=np.int64)
    packs = next_fit_pack(t, capacity)
    if len(t) == 0:
        empty = np.empty(0, np.int64)
        return {"pack_id": empty, "n_docs": empty,
                "n_tokens": empty, "first_doc_id": empty}
    # packs is sorted (0,0,...,1,1,...): segment boundaries via diff
    bounds = np.flatnonzero(np.diff(packs)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(t)]))
    csum = np.concatenate(([0], np.cumsum(t)))
    return {
        "pack_id": packs[starts],
        "n_docs": (ends - starts).astype(np.int64),
        "n_tokens": csum[ends] - csum[starts],
        "first_doc_id": ids[starts],
    }
