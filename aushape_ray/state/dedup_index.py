"""Online (streaming-ingestion) dedup via a sharded shared index — the
one pipeline shape where raw Ray actors are the right tool (ray_guide:
drop to actors only for state the Dataset API can't express; a dedup
index shared ACROSS batches is exactly that).

The batch path (functions/dedup.exact_dedup_*) answers "dedup this
corpus" with a groupby — correct when the whole corpus is present.  An
INGESTION pipeline instead sees batches arrive over time and must answer
"have I ever seen this content before?" immediately, against everything
ingested so far.  That needs a mutable index that outlives any one task.

Design:
- the index is SHARDED over n_shards actors by content-hash range, so no
  single actor is a bottleneck or a memory hot-spot (each holds ~1/N of
  the key space; shards scale horizontally exactly like a distributed
  KV);
- tasks talk to shards in BATCHES (one RPC per (batch, shard) carrying a
  numpy array, never per row);
- each shard keeps an exact uint64-hash set.  At 128-bit-collision
  paranoia or RAM pressure a shard can swap in Bloom-with-exact-overflow
  without changing the protocol (the 64-bit exact set already holds a
  billion keys in ~30 GB across 256 shards — fine for the design point).

First-wins semantics: which duplicate of a group is marked "first" is
arrival-order dependent (inherent to ANY online dedup, distributed or
not); the COUNTS (n_first == n_distinct, n_dup) are order-independent
and are what the oracle checks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote(num_cpus=0.25)
class DedupShard:
    """One hash-range shard of the online index."""

    def __init__(self) -> None:
        self.seen: set = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """For each hash (in order): True if never seen before this call
        processed it (first occurrence), else False.  Duplicates INSIDE
        the array also mark False after their first occurrence."""
        seen = self.seen
        out = np.empty(len(hashes), bool)
        for i, h in enumerate(hashes.tolist()):
            if h in seen:
                out[i] = False
            else:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self.seen)


class OnlineDeduper:
    """map_batches callable marking each row's content as first-seen or
    duplicate against the shared sharded index.  Pass the SAME instance
    (or the same actor handles) across datasets/waves to dedup a stream
    incrementally."""

    def __init__(self, n_shards: int = 8,
                 shards: "list | None" = None) -> None:
        self.n_shards = n_shards
        self.shards = (shards if shards is not None
                       else [DedupShard.remote() for _ in range(n_shards)])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.dedup import flat_utf8
        from ..functions.sketches import _splitmix64

        # vectorized 64-bit content hash: FNV over the flat utf-8 bytes
        # per doc via the shared kernel's offsets (cheap, no md5 loop)
        data, off, n = flat_utf8(batch.column("text"))
        h = np.zeros(n, np.uint64)
        FNV_OFF, FNV_PRIME = np.uint64(0xCBF29CE484222325), np.uint64(0x100000001B3)
        # per-doc FNV-1a, column-wise over byte positions (docs in this
        # batch processed together; pass i touches docs longer than i)
        lens = np.diff(off)
        order = np.argsort(-lens, kind="stable")
        hh = np.full(n, FNV_OFF, np.uint64)
        starts = off[:-1][order]
        l_sorted = lens[order]
        data64 = data.astype(np.uint64)
        max_len = int(l_sorted[0]) if n else 0
        longer = n - np.cumsum(np.bincount(
            np.minimum(l_sorted, max_len), minlength=max_len + 1))
        for i in range(max_len):
            k = int(longer[i])
            if k == 0:
                break
            hh[:k] = (hh[:k] ^ data64[starts[:k] + i]) * FNV_PRIME
        h[order] = _splitmix64(hh)

        shard_of = (h % np.uint64(self.n_shards)).astype(np.int64)
        futures, spans = [], []
        for s in np.unique(shard_of):
            idx = np.flatnonzero(shard_of == s)
            futures.append(self.shards[int(s)].check_and_add.remote(h[idx]))
            spans.append(idx)
        first = np.empty(n, bool)
        for idx, res in zip(spans, ray.get(futures)):
            first[idx] = res
        return batch.append_column("is_first", pa.array(first))

    def index_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def online_dedup_stats(ds: "ray.data.Dataset",
                       n_shards: int = 8) -> pa.Table:
    """One-row summary of an ingestion pass: n_docs, n_first (==
    n_distinct regardless of arrival order), n_dup."""
    from ray.data.aggregate import Sum

    deduper = OnlineDeduper(n_shards)
    marked = ds.map_batches(
        deduper, batch_format="pyarrow",
        # the index must be SHARED: one deduper instance, stateless-task
        # semantics (the actors carry the state, not the map workers)
        concurrency=None)
    agg = marked.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "first": pa.array(
                [int(np.asarray(t.column("is_first")).sum())], pa.int64()),
        }), batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("first", alias_name="first"))
    n, first = int(agg["n"]), int(agg["first"])
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_first": pa.array([first], pa.int64()),
        "n_dup": pa.array([n - first], pa.int64()),
    })
