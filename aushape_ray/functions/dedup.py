"""Deduplication operators over the documents table.

Scale notes (100 TB design point):
- exact: content-hash in map_batches (vectorized), then ONE hash shuffle on
  the 16-byte digest; per-group first-wins.  No full-text shuffle — only
  (digest, doc_id) pairs move.
- MinHash+LSH: shingle -> minhash signature per batch (numpy), explode to
  (band_id, band_hash, doc_id) rows, groupby the band key, emit candidate
  pairs per bucket, verify with exact Jaccard on the pair (re-reading only
  candidate docs).  All-to-all volume = bands x docs tiny rows.
- SimHash: 64-bit signature per doc; near-dup = equal signatures on rotated
  bands (here: exact-signature grouping as the scalable first cut).
- embedding cosine: see functions/ann.py (block-matmul against a broadcast
  matrix).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
         for t in batch.column(col).to_pylist()]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup_stats(ds: "ray.data.Dataset") -> dict:
    """Single-row summary: n_docs, n_distinct, n_dup_rows (rows beyond the
    first of each content group).  Pre-aggregates per batch, then ONE
    bucket_reduce tree exchange of the (hash, count) partials — the
    result is three driver ints, exactly the driver-bound reduction shape
    (Ray's generic string-key aggregate paid ~1s fixed cost here)."""
    import zlib

    from .joins import bucket_reduce

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow")
    n_buckets = 16

    def partial(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(batch.column("content_hash").to_pylist())
        keys = list(c.keys())
        b = np.fromiter((zlib.crc32(k.encode()) for k in keys),
                        dtype=np.int64, count=len(keys)) % n_buckets
        return pa.table({
            "b": pa.array(b, pa.int32()),
            "content_hash": pa.array(keys, pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    def bucket_stats(g: pa.Table) -> pa.Table:
        s = pd.Series(
            g.column("n").to_numpy(zero_copy_only=False),
            index=g.column("content_hash").to_pylist()).groupby(level=0).sum()
        n = s.to_numpy()
        return pa.table({
            "n_docs": pa.array([int(n.sum())], pa.int64()),
            "n_distinct": pa.array([len(n)], pa.int64()),
            "n_dup_rows": pa.array([int((n - 1).sum())], pa.int64()),
        })

    partials = hashed.map_batches(partial, batch_format="pyarrow")
    out = {"n_docs": 0, "n_distinct": 0, "n_dup_rows": 0}
    for t in bucket_reduce(partials, n_buckets, bucket_stats):
        for k in out:
            out[k] += int(t.column(k)[0].as_py())
    return out


def exact_dedup_keep_first(ds: "ray.data.Dataset",
                           n_parts: int = 64) -> "ray.data.Dataset":
    """Keep min(doc_id) per content hash.  Hash-partitions on a COARSE
    key (content hash % n_parts) and reduces each partition with one
    vectorized pandas groupby-min — one interpreter call per partition
    instead of one per distinct document."""
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        import zlib

        part = np.fromiter(
            (zlib.crc32(h.encode()) % n_parts
             for h in t.column("content_hash").to_pylist()),
            dtype=np.int32, count=t.num_rows)
        return t.select(["doc_id", "content_hash"]).append_column(
            "part", pa.array(part, pa.int32()))

    def keep_first_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_hash", as_index=False, sort=False).agg(
            doc_id=("doc_id", "min"))
        return out[["doc_id", "content_hash"]]

    keep_first_partition.__name__ = "keep_first_partition"
    return hashed.map_batches(add_part, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        keep_first_partition, batch_format="pandas")


# ---------------- MinHash + LSH ------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 4 rows per band
_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 5) -> np.ndarray:
    data = text.encode("utf-8")
    if len(data) <= k:
        return np.array([hash32(data)], dtype=np.uint64)
    view = np.frombuffer(data, dtype=np.uint8)
    # rolling 32-bit FNV-ish hash over k-byte shingles, vectorized
    out = np.zeros(len(data) - k + 1, dtype=np.uint64)
    for i in range(k):
        out = out * np.uint64(16777619) + view[i: len(data) - k + 1 + i]
    return np.unique(out)


def hash32(b: bytes) -> int:
    return int.from_bytes(hashlib.md5(b).digest()[:8], "little")


_POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Element-wise popcount for uint64 arrays of any shape (numpy 1.x
    has no bitwise_count): one 256-entry LUT gather over the uint8 view,
    summed per 8-byte lane.  Returns int64 with x's shape."""
    if x.size == 0:
        return np.zeros(x.shape, np.int64)
    b = _POP8[np.ascontiguousarray(x).view(np.uint8)]
    return b.reshape(x.shape + (8,)).sum(axis=-1, dtype=np.int64)


def _eps_down(x):
    """Nudge a float filter bound DOWN by its own rounding-error scale
    (1e-12 relative + 1e-12 absolute), so `value >= bound` / `ceil(bound)`
    comparisons stay LOSSLESS at exact-threshold boundaries.  IEEE
    product/quotient chains like 0.8/1.8*63 land at
    28.000000000000004 when the real value is exactly 28 — without the
    nudge, ceil() returns 29 and a filter silently drops every pair whose
    Jaccard equals the threshold exactly (found on the sf0.1 chain
    corpus: 3,801 of 2.1M verified pairs sit precisely at J = 0.8).
    The nudge can only ADMIT a borderline candidate, never drop one, and
    exact verification downstream settles it — so filters stay exact."""
    return x - np.abs(x) * 1e-12 - 1e-12


def shingles_flat(col, k: int = 5,
                  unique: bool = True) -> "tuple[np.ndarray, np.ndarray]":
    """Batch-vectorized _shingles over a whole Arrow string column
    (verdict r4 item 3): ONE rolling-hash pass over the zero-copy flat
    UTF-8 buffer (k vector ops total), no per-document Python in the hot
    path.  Docs of <= k bytes take _shingles' md5 fallback (rare, cheap).

    unique=True matches _shingles exactly (per-doc sorted unique, via one
    global (doc, hash) lexsort).  unique=False skips the sort/dedup —
    for MIN-reduction consumers (MinHash), where min over the multiset
    equals min over the set, so signatures stay value-identical at ~4x
    less kernel work.  Measured guidance (tests/test_round5.py records
    parity; ROUND5.md the numbers): per-doc _shingles is CACHE-OPTIMAL
    and beats the unique=True global sort at real doc sizes (300B-2KB),
    so set-consumers (jaccard postings, verify memos) should keep the
    per-doc form; unique=False wins for the signature stage.

    Returns (flat uint64 hashes, int64 doc offsets of len n+1); with
    unique=True, flat[off[i]:off[i+1]] == _shingles(texts[i] or "")."""
    data, doc_off, n = flat_utf8(col)
    if n == 0:
        return np.array([], np.uint64), np.zeros(1, np.int64)
    doc_len = np.diff(doc_off)
    short = doc_len <= k
    if len(data) >= k and not short.all():
        m = len(data) - k + 1
        d64 = data.astype(np.uint64)
        h = np.zeros(m, np.uint64)
        for i in range(k):
            h = h * np.uint64(16777619) + d64[i:m + i]
        # position's doc via repeat (O(N), no per-position search)
        pdoc = np.repeat(np.arange(n, dtype=np.int64), doc_len)[:m]
        valid = (~short[pdoc]) & ((np.arange(m, dtype=np.int64)
                                   - doc_off[pdoc]) <= doc_len[pdoc] - k)
        hv, dv = h[valid], pdoc[valid]
        if unique:
            order = np.lexsort((hv, dv))
            hs, ds_ = hv[order], dv[order]
            first = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])])
            hu, du = hs[first], ds_[first]
        else:
            hu, du = hv, dv  # already doc-ordered (positions ascend)
    else:
        hu = np.array([], np.uint64)
        du = np.array([], np.int64)
    counts = np.bincount(du, minlength=n).astype(np.int64)
    counts[short] = 1
    off_out = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=off_out[1:])
    out = np.empty(off_out[-1], np.uint64)
    if len(hu):
        # hu is doc-ordered; each short doc before a long doc's slot
        # shifts it by exactly its single md5 hash
        shift = np.cumsum(short)[du]
        out[np.arange(len(hu), dtype=np.int64) + shift] = hu
    for d in np.flatnonzero(short):
        out[off_out[d]] = hash32(data[doc_off[d]:doc_off[d + 1]].tobytes())
    return out, off_out


class MinHasher:
    """Actor-pool stage: the (a, b) hash parameter matrix is built once per
    actor; per batch it's one broadcasted numpy min-reduce."""

    def __init__(self, n_hashes: int = N_HASHES, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)
        self.n = n_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text or "")
        # (n_hashes, n_shingles) -> min over shingles; modular arithmetic in
        # python ints avoided by uint64 wraparound (consistent everywhere)
        v = (sh[None, :] * self.a[:, None] + self.b[:, None])
        return v.min(axis=1)

    # budget of shingles hashed per vectorized chunk: bounds the (n_hashes,
    # total_shingles) temporary to ~64 MiB
    _CHUNK_SHINGLES = 128_000

    def _signatures_chunk(self, shingle_arrays: list[np.ndarray]) -> np.ndarray:
        """All docs of a chunk in one broadcastized pass: concatenate the
        shingle arrays and min-reduce per segment (np.minimum.reduceat) —
        value-identical to per-doc signature()."""
        lens = np.array([len(s) for s in shingle_arrays], dtype=np.int64)
        flat = np.concatenate(shingle_arrays)
        v = flat[None, :] * self.a[:, None] + self.b[:, None]
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        return np.minimum.reduceat(v, offsets, axis=1).T  # (n_docs, n_hashes)

    def _signature_large(self, s: np.ndarray) -> np.ndarray:
        """One oversized document, min-reduced slice by slice so the
        (n_hashes, slice) temporary stays within the chunk budget.  Min over
        a union of slices == min over the whole array, so this is
        value-identical to signature()."""
        mins = np.full(self.n, np.iinfo(np.uint64).max, dtype=np.uint64)
        for i in range(0, len(s), self._CHUNK_SHINGLES):
            sl = s[i: i + self._CHUNK_SHINGLES]
            v = (sl[None, :] * self.a[:, None] + self.b[:, None]).min(axis=1)
            np.minimum(mins, v, out=mins)
        return mins

    def _signatures_flat(self, flat: np.ndarray,
                         off: np.ndarray) -> np.ndarray:
        """Chunked min-reduce over the flat shingle layout (shingles_flat
        output): value-identical to per-doc signature(); the (n_hashes,
        chunk) temporary stays within _CHUNK_SHINGLES."""
        lens = np.diff(off)
        n_docs = len(lens)
        sigs = []
        d = 0
        while d < n_docs:
            if lens[d] >= self._CHUNK_SHINGLES:
                sigs.append(self._signature_large(
                    flat[off[d]:off[d + 1]])[None, :])
                d += 1
                continue
            e, budget = d, 0
            while (e < n_docs and lens[e] < self._CHUNK_SHINGLES
                   and budget < self._CHUNK_SHINGLES):
                budget += int(lens[e])
                e += 1
            chunk = flat[off[d]:off[e]]
            v = chunk[None, :] * self.a[:, None] + self.b[:, None]
            offsets = (off[d:e] - off[d])
            sigs.append(np.minimum.reduceat(v, offsets, axis=1).T)
            d = e
        return (np.concatenate(sigs) if sigs
                else np.zeros((0, self.n), np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # unique=False: min over the shingle multiset == min over the set,
        # so the sort/dedup is skipped entirely (verdict r4 item 3; parity
        # pytest in tests/test_round5.py)
        flat, off = shingles_flat(batch.column("text"), unique=False)
        arr = self._signatures_flat(flat, off)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array(list(arr.astype(np.int64)), pa.list_(pa.int64(), self.n)),
        })


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public constant mix; process-stable)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def explode_bands(batch: pa.Table, n_bands: int = N_BANDS) -> pa.Table:
    """(doc_id, minhash[64]) -> n_bands rows (doc_id, band, band_hash).

    Fully vectorized: the signature matrix is reshaped to
    (docs, bands, rows_per_band) and the lanes are chained through the
    splitmix64 mixer — one numpy pass, no per-row Python, no md5.  Equal
    band slices get equal hashes (the LSH bucketing invariant); the
    grouping key also folds in the band index downstream."""
    col = batch.column("minhash")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64())})
    width = col.type.list_size
    rows_per_band = width // n_bands
    sig = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    sig = sig.reshape(n, n_bands, rows_per_band)
    h = np.zeros((n, n_bands), dtype=np.uint64)
    for r in range(rows_per_band):
        h = _mix64(h ^ sig[:, :, r])
    h &= np.uint64((1 << 62) - 1)  # keep int64-positive
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(np.repeat(doc_ids, n_bands), pa.int64()),
        "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
        "band_hash": pa.array(h.reshape(-1).view(np.int64), pa.int64()),
    })


MAX_BUCKET_PAIRS_N = 512  # star-fallback cap per band bucket (cap= arg)



def _add_band_bucket_part(t: pa.Table, n_parts: int) -> pa.Table:
    """Coarse partition key for (band, band_hash) bucket co-location —
    shared by the MinHash and SimHash candidate generators."""
    band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bh = t.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    part = (_mix64(bh ^ (band * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(n_parts)).astype(np.int32)
    return t.append_column("part", pa.array(part, pa.int32()))


def _dedup_pairs(pairs: "ray.data.Dataset", n_parts: int,
                 via_bucket_exchange: bool = False) -> "ray.data.Dataset":
    """Distinct (doc_a, doc_b) via coarse-partitioned vectorized unique —
    shared by the MinHash and SimHash candidate generators.

    via_bucket_exchange swaps the Dataset sort exchange for the raw
    joins.bucket_exchange — same semantics, minus the seconds-scale
    fixed sort cost; use it on paths whose end-to-end time is
    fixed-cost-dominated (jaccard_pairs_prefix: 5 small exchanges)."""

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_mix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
                % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def dedup_partition(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        keep = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"doc_a": pa.array(keep[:, 0], pa.int64()),
                         "doc_b": pa.array(keep[:, 1], pa.int64())})

    dedup_partition.__name__ = "dedup_partition"
    tagged = pairs.map_batches(add_pair_part, batch_format="pyarrow")
    if via_bucket_exchange:
        from .joins import bucket_exchange
        return bucket_exchange(tagged, n_parts, dedup_partition,
                               bucket_col="part")
    return tagged.groupby("part", num_partitions=n_parts).map_groups(
        dedup_partition, batch_format="pyarrow")


def _make_pairs_in_partition(cap: "int | None"):
    """Vectorized candidate emission for ALL band buckets co-located in
    one coarse partition: sort by (band, band_hash, doc_id), find bucket
    segments with numpy, and emit pairs only for segments of size >= 2.
    One Python call per PARTITION, not per bucket — per-group map_groups
    would cost one interpreter call per band bucket (O(corpus) calls).

    cap=None emits ALL pairs of every bucket (exact — required when the
    pair list itself is the product, e.g. the oracle-checked
    doc_minhash_pairs); cap=N emits a linear star from the minimum
    doc_id for buckets larger than N (bounded work; preserves the
    connectivity downstream clustering needs, but drops non-star pairs
    of degenerate buckets)."""

    def pairs_in_partition(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bh = g.column("band_hash").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, bh, band))
        d, b, h = doc[order], band[order], bh[order]
        n = len(d)
        new_seg = np.ones(n, dtype=bool)
        if n > 1:
            new_seg[1:] = (b[1:] != b[:-1]) | (h[1:] != h[:-1])
        seg_starts = np.nonzero(new_seg)[0]
        seg_ends = np.append(seg_starts[1:], n)
        sizes = seg_ends - seg_starts
        out_a, out_b = [], []
        for s, e in zip(seg_starts[sizes >= 2], seg_ends[sizes >= 2]):
            ids = d[s:e]  # ascending (doc_id is the minor sort key)
            m = e - s
            if cap is not None and m > cap:
                out_a.append(np.full(m - 1, ids[0], dtype=np.int64))
                out_b.append(ids[1:].astype(np.int64))
            else:
                iu = np.triu_indices(m, k=1)
                out_a.append(ids[iu[0]].astype(np.int64))
                out_b.append(ids[iu[1]].astype(np.int64))
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        bb = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(bb, pa.int64())})

    pairs_in_partition.__name__ = "pairs_in_partition"
    return pairs_in_partition


def minhash_candidates(ds: "ray.data.Dataset", n_parts: int = 64,
                       cap: "int | None" = None) -> "ray.data.Dataset":
    """documents -> candidate near-dup pairs (doc_a < doc_b), deduplicated.

    Both groupbys use a COARSE partition key (hash of the bucket / pair
    identity modulo n_parts) so the per-group work is vectorized inside
    ~n_parts tasks: equal band buckets still co-locate (their rows share
    the coarse key) and equal pairs still dedup, but the interpreter-call
    count is O(n_parts), not O(buckets) — the difference between seconds
    and hours at corpus scale.

    cap: None (default) = exact all-pairs per bucket; set
    MAX_BUCKET_PAIRS_N at corpus scale when the pairs only feed
    clustering/dedup (star fallback bounds degenerate buckets while
    preserving connectivity — see _make_pairs_in_partition)."""
    # instance-as-function: the (a, b) hash matrix is built once on the
    # driver and pickled into stateless tasks — no actor pool (GIL
    # inflation, see perf notes)
    sigs = ds.map_batches(MinHasher(), batch_format="pyarrow")
    bands = sigs.map_batches(explode_bands, batch_format="pyarrow")
    pairs = bands.map_batches(
        lambda t: _add_band_bucket_part(t, n_parts),
        batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        _make_pairs_in_partition(cap), batch_format="pyarrow")
    return _dedup_pairs(pairs, n_parts)


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = set(_shingles(a).tolist()), set(_shingles(b).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------- connected components (dup clusters) --------------------

def _label_sum(labels: "ray.data.Dataset") -> int:
    """Distributed checksum for convergence: per-batch int64 partial sums,
    accumulated in Python ints on the driver (no overflow, no label map).
    Min-label propagation is monotone decreasing, so the total label sum
    strictly decreases until (and only until) the fixed point."""
    parts = labels.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(np.asarray(t.column("label"), dtype=np.int64).sum())],
            pa.int64())}),
        batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts)


def _unionfind_block(batch: pa.Table) -> pa.Table:
    """Single-task connected components: classic union-find with path
    halving over one edge block.  Runs in a REMOTE task (never the
    driver) — the small-graph fast path of cluster_pairs."""
    src = batch.column("src").to_numpy(zero_copy_only=False)
    dst = batch.column("dst").to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = sorted(parent)
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array([find(n) for n in nodes], pa.int64()),
    })


def _split_edge_block(tbl: pa.Table, n_buckets: int) -> list[pa.Table]:
    """Map side of the one-time edge bucketing: slice one edge block into
    n_buckets sub-tables by hash(src) (runs as a remote task,
    num_returns=n_buckets)."""
    from .joins import hash_part

    src = tbl.column("src").to_numpy(zero_copy_only=False)
    bucket = hash_part(src, n_buckets)
    order = np.argsort(bucket, kind="stable")
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    counts = np.bincount(bucket, minlength=n_buckets)
    out, off = [], 0
    for c in counts:
        out.append(sorted_tbl.slice(off, int(c)))
        off += int(c)
    return out


def _concat_edge_parts(*tables: pa.Table) -> pa.Table:
    """Reduce side of the one-time edge bucketing."""
    return pa.concat_tables(tables).combine_chunks()


class _OfferBucket:
    """Per-bucket label-offer task for cluster_pairs.

    Holds the object refs of the STATIC per-bucket edge blocks; each
    round's task fetches its own bucket's block zero-copy from the object
    store (plasma caches it per node across rounds), so the edge set is
    never re-shuffled — only label rows and jump edges move.  Emits a
    bucket-local partial min(label) per dst to shrink the final exchange.
    """

    __name__ = "offer_bucket"

    def __init__(self, bucket_refs: list) -> None:
        self.bucket_refs = bucket_refs

    def __call__(self, group: pa.Table) -> pa.Table:
        import ray as _ray

        if group.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        b = int(group.column("__bucket")[0].as_py())
        eb = _ray.get(self.bucket_refs[b])
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        k = group.column("k").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        lab = kind == 0
        # label rows: node -> current label, sorted for searchsorted probe
        order = np.argsort(k[lab], kind="stable")
        lab_nodes = k[lab][order]
        lab_vals = v[lab][order]
        # offers flow over static edges + this round's jump edges
        src = np.concatenate(
            [eb.column("src").to_numpy(zero_copy_only=False), k[~lab]])
        dst = np.concatenate(
            [eb.column("dst").to_numpy(zero_copy_only=False), v[~lab]])
        pos = np.searchsorted(lab_nodes, src)
        # every edge src is a labelled node routed to this same bucket; a
        # miss means the bucketing broke — fail loudly, a silent wrong
        # gather would corrupt the partition
        if len(src) and (len(lab_nodes) == 0 or not np.array_equal(
                lab_nodes[np.minimum(pos, len(lab_nodes) - 1)], src)):
            raise RuntimeError("cluster_pairs: edge src missing from its "
                               "bucket's label rows")
        offer = lab_vals[pos]
        # bucket-local partial min per dst
        o = np.argsort(dst, kind="stable")
        d, ol = dst[o], offer[o]
        bounds = np.flatnonzero(
            np.concatenate([[True], d[1:] != d[:-1]])) if len(d) else \
            np.empty(0, np.int64)
        mins = np.minimum.reduceat(ol, bounds) if len(d) else ol
        return pa.table({"node": pa.array(d[bounds], pa.int64()),
                         "label": pa.array(mins, pa.int64())})


def _min_label_by_node(ds: "ray.data.Dataset",
                       n_buckets: int) -> "ray.data.Dataset":
    """groupby(node).min(label) as a coarse-bucket vectorized exchange.

    Ray's generic sort-based aggregate measured ~30x slower than this at
    ~2M rows (10s vs 0.3s per round): one hash_part tag, one
    groupby(__bucket) exchange, and an argsort + minimum.reduceat segment
    min inside each partition task."""
    from .joins import hash_part

    def tag(tb: pa.Table) -> pa.Table:
        node = tb.column("node").to_numpy(zero_copy_only=False)
        return tb.append_column(
            "__bucket", pa.array(hash_part(node, n_buckets), pa.int32()))

    def bucket_min(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        node = g.column("node").to_numpy(zero_copy_only=False)
        label = g.column("label").to_numpy(zero_copy_only=False)
        o = np.argsort(node, kind="stable")
        n2, l2 = node[o], label[o]
        bounds = np.flatnonzero(
            np.concatenate([[True], n2[1:] != n2[:-1]]))
        return pa.table({
            "node": pa.array(n2[bounds], pa.int64()),
            "label": pa.array(np.minimum.reduceat(l2, bounds), pa.int64()),
        })

    bucket_min.__name__ = "bucket_min"
    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__bucket", num_partitions=n_buckets).map_groups(
        bucket_min, batch_format="pyarrow")


def _star_reduce_block(t: pa.Table) -> pa.Table:
    """Connectivity-preserving per-block edge reduction: local connected
    components via vectorized min-label propagation with pointer jumping,
    then ONE star edge (component-min, node) per non-min node — at most
    distinct_nodes - n_components rows out, however many pairs came in
    (a dense near-dup family of m docs collapses m(m-1)/2 pair rows to
    m-1).  Lossless for every cluster_pairs consumer: the union of
    per-block stars has exactly the input's global components, and the
    component minimum (the cluster_id) is preserved because star edges
    connect each node to its block-local minimum.  Degenerate self-pairs
    (doc_a == doc_b) pass through untouched so singleton components keep
    their (x, x) cluster row."""
    a = t.column("doc_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
    b = t.column("doc_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    self_loop = a == b
    sa, sb = a[self_loop], b[self_loop]
    a, b = a[~self_loop], b[~self_loop]
    if len(a) == 0:
        return pa.table({"doc_a": pa.array(sa, pa.int64()),
                         "doc_b": pa.array(sb, pa.int64())})
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, ia, lab[ib])
        np.minimum.at(l2, ib, lab[ia])
        l2 = l2[l2]
        l2 = l2[l2]
        if np.array_equal(l2, lab):
            break
        lab = l2
    keep = lab != np.arange(len(nodes), dtype=np.int64)
    return pa.table({
        "doc_a": pa.array(np.concatenate([nodes[lab[keep]], sa]), pa.int64()),
        "doc_b": pa.array(np.concatenate([nodes[keep], sb]), pa.int64()),
    })


def cluster_pairs(pairs: "ray.data.Dataset", max_iters: int = 64,
                  n_buckets: int = 16,
                  small_threshold: int = 1_000_000,
                  star_reduce: bool = True) -> "ray.data.Dataset":
    """Near-duplicate clusters from verified pairs: DISTRIBUTED connected
    components via min-label propagation with STATIC pre-bucketed edges.

    The edge set is hash-partitioned by hash(src) ONCE into n_buckets
    Arrow tables pinned in the object store (a two-stage raw-Ray split +
    concat — the Dataset API cannot express a statically-partitioned,
    re-readable side).  Each round then shuffles only the small side:

        labels -> (label rows keyed by node) ∪ (jump edges label(x)->x
                   keyed by label)  — one groupby(__bucket) exchange
        bucket task: static edges ∪ jump edges |><| label rows,
                     emit partial min(label) per dst
        groupby(node).min(label)  -> next labels

    — no driver-side label map anywhere; the only per-round driver value
    is an O(1) label-sum checksum.  The jump edges halve the effective
    component diameter each round (pointer jumping), so convergence takes
    O(log d) rounds.  RAISES if max_iters is exhausted before the fixed
    point — a partial propagation is not a valid partition.  Returns
    (doc_id, cluster_id), cluster_id = min doc_id of the component.

    star_reduce (default on; parameterized for the parity pytest): run
    _star_reduce_block over each pair block first — dense near-dup
    families shrink from O(m^2) pair rows to m-1 star edges before any
    edge is pinned, cutting both the pinned-edge volume every round
    reads and the label-row fan-in, with identical components and
    cluster_ids (see _star_reduce_block)."""
    import pyarrow.compute as pc

    import ray as _ray

    from .joins import hash_part

    if star_reduce:
        pairs = pairs.map_batches(_star_reduce_block,
                                  batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    # small-graph fast path: below the threshold the whole edge set goes
    # through ONE remote union-find task (identical min-label output) —
    # 4+ shuffle rounds of fixed overhead buy nothing for a graph that
    # fits a single task; the iterative exchange below is the scale path
    if edges.count() <= small_threshold:
        return edges.repartition(1).map_batches(
            _unionfind_block, batch_format="pyarrow", batch_size=None)
    # initial labels: min(self, min neighbour) — vectorized segment-min
    # exchange (edges are symmetric, so every node appears as a src)
    labels = _min_label_by_node(
        edges.map_batches(
            lambda t: pa.table({"node": t.column("src"),
                                "label": t.column("dst")}),
            batch_format="pyarrow"),
        n_buckets)
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "label": pc.min_element_wise(t.column("node"), t.column("label")),
        }), batch_format="pyarrow").materialize()
    if labels.count() == 0:
        return labels.map_batches(
            lambda t: pa.table({"doc_id": t.column("node"),
                                "cluster_id": t.column("label")}),
            batch_format="pyarrow")

    # one-time edge bucketing: split every edge block by hash(src), then
    # concat per bucket — after this the edges NEVER move again
    split_remote = _ray.remote(num_returns=n_buckets)(_split_edge_block)
    concat_remote = _ray.remote(_concat_edge_parts)
    parts = [split_remote.remote(ref, n_buckets)
             for ref in edges.to_arrow_refs()]
    bucket_refs = [concat_remote.remote(*[p[b] for p in parts])
                   for b in range(n_buckets)]
    offer_bucket = _OfferBucket(bucket_refs)

    def round_rows(t: pa.Table) -> pa.Table:
        # per label row (node -> label), emit BOTH the label row (keyed by
        # node, kind 0) and the jump edge label(x) -> x (keyed by label,
        # kind 1).  Every node has a jump edge and its offer
        # label(label(x)) <= label(x), so the min over offers is monotone
        # and total — no self-union needed.
        node = t.column("node").to_numpy(zero_copy_only=False)
        label = t.column("label").to_numpy(zero_copy_only=False)
        key = np.concatenate([node, label])
        return pa.table({
            "__bucket": pa.array(hash_part(key, n_buckets), pa.int32()),
            "kind": pa.array(np.repeat(
                np.array([0, 1], np.int8), len(node)), pa.int8()),
            "k": pa.array(key, pa.int64()),
            "v": pa.array(np.concatenate([label, node]), pa.int64()),
        })

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iters):
        # one exchange per round, and ONLY the labels side moves: the
        # routed rows are 2 rows per node; the edges stay pinned in the
        # object store and are read zero-copy inside each bucket task
        # NOTE: measured both exchanges here as joins.bucket_exchange —
        # a wash at 1M edges and ~8% slower at 8M (this loop is
        # data-bound, not fixed-cost-bound); the Dataset groupby keeps
        # streaming backpressure for the growing per-round volume
        offered = labels.map_batches(
            round_rows, batch_format="pyarrow").groupby(
            "__bucket", num_partitions=n_buckets).map_groups(
            offer_bucket, batch_format="pyarrow")
        labels = _min_label_by_node(offered, n_buckets).materialize()
        s = _label_sum(labels)
        if s == prev_sum:
            converged = True
            break
        prev_sum = s

    if not converged:
        raise RuntimeError(
            f"cluster_pairs did not converge within {max_iters} rounds "
            f"(component diameter too large) — raise max_iters")

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow")


# ---------------- SimHash -------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
# second digest family for double-hash equality checks: golden-ratio basis,
# a different odd multiplier — the (xor, *odd) state walk starting from a
# different point with a different step makes a simultaneous collision of
# both digests ~2^-126-grade for non-adversarial data
_FNV2_OFFSET = np.uint64(0x9E3779B97F4A7C15)
_FNV2_PRIME = np.uint64(0x00000100000001B5)
# ASCII whitespace lookup table for the byte-level tokenizer
_WS_TABLE = np.zeros(256, dtype=bool)
_WS_TABLE[[9, 10, 11, 12, 13, 32]] = True


def word_hashes_flat(data: np.ndarray,
                     doc_off: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized per-word 64-bit FNV-1a over a flat UTF-8 byte array with
    document offsets (the SimHasher kernel, shared with the Bloom n-gram
    scan).  Words are maximal runs of non-ASCII-whitespace bytes; doc
    boundaries always split words.  Returns (word_hash, word_doc_index),
    both in word order.  Column-wise FNV on a length-descending ordering:
    pass i touches only words longer than i bytes — O(sum of lengths)."""
    if len(data) == 0:  # empty block / all-empty docs: no words
        return (np.array([], np.uint64), np.array([], np.int64))
    ws = _WS_TABLE[data]
    nonws = ~ws
    n_bytes = len(data)
    # word starts: non-ws byte preceded by ws (or batch start) …
    prev_ws = np.empty_like(ws)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    start_mask = nonws & prev_ws
    # … or a doc boundary (a run crossing two docs is two words)
    next_ws = np.empty_like(ws)
    next_ws[-1] = True
    next_ws[:-1] = ws[1:]
    end_mask = nonws & next_ws
    doc_first = doc_off[:-1][doc_off[:-1] < n_bytes]
    start_mask[doc_first] = nonws[doc_first]
    doc_last = doc_off[1:] - 1
    doc_last = doc_last[doc_last >= 0]
    end_mask[doc_last] = nonws[doc_last]
    starts = np.flatnonzero(start_mask)
    n_words = len(starts)
    if n_words == 0:
        return (np.array([], np.uint64), np.array([], np.int64))
    lens = np.flatnonzero(end_mask) + 1 - starts
    word_h = fnv_segments(data, starts, lens)
    word_doc = np.searchsorted(doc_off, starts, side="right") - 1
    return word_h, word_doc.astype(np.int64)


def fnv_segments(data: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray,
                 basis: np.uint64 = _FNV_OFFSET,
                 prime: np.uint64 = _FNV_PRIME) -> np.ndarray:
    """64-bit FNV-1a of arbitrary byte segments of a flat uint8 array —
    the column-wise kernel shared by word_hashes_flat (whitespace words)
    and span_dedup (fixed-word-count spans).  Computed column-wise over a
    length-descending segment ordering so pass i touches only segments
    longer than i bytes: total work O(sum of segment lengths).
    Zero-length segments hash to the offset basis.

    basis/prime parametrize a SECOND digest family (pass _FNV2_OFFSET /
    _FNV2_PRIME) for callers that confirm equality on two hashes instead
    of one — e.g. cross-corpus dedup, where a single 63-bit collision
    would falsely delete a unique document."""
    n_seg = len(starts)
    if n_seg == 0:
        return np.array([], np.uint64)
    order = np.argsort(-lens, kind="stable")
    s_sorted = starts[order]
    l_sorted = lens[order]
    data64 = data.astype(np.uint64)
    h_sorted = np.full(n_seg, basis, dtype=np.uint64)
    max_len = int(l_sorted[0])
    # segments with length > i form a prefix; its size via bincount cumsum
    longer = n_seg - np.cumsum(
        np.bincount(l_sorted, minlength=max_len + 1))
    for i in range(max_len):
        k = int(longer[i])
        if k == 0:
            break
        b = data64[s_sorted[:k] + i]
        h_sorted[:k] = (h_sorted[:k] ^ b) * prime
    out = np.empty_like(h_sorted)
    out[order] = h_sorted
    return out


def flat_utf8(col) -> "tuple[np.ndarray, np.ndarray, int]":
    """Zero-copy (data, doc_offsets, n_docs) view of an Arrow string
    column (nulls treated as empty docs)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col, "").cast(pa.large_string())
    buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
    off = np.frombuffer(buf_off, np.int64,
                        count=len(arr) + 1, offset=8 * arr.offset)
    base = int(off[0])
    doc_off = (off - base).astype(np.int64)
    data = np.frombuffer(buf_data, np.uint8)[base:base + int(doc_off[-1])]
    return data, doc_off, len(arr)


def ngram_hashes_flat(word_h: np.ndarray, word_doc: np.ndarray,
                      n: int) -> "tuple[np.ndarray, np.ndarray]":
    """splitmix64-chained hashes of all word n-grams that stay inside one
    document.  Returns (gram_hash, gram_doc_index)."""
    if len(word_h) < n:
        return (np.array([], np.uint64), np.array([], np.int64))
    valid = word_doc[: len(word_doc) - n + 1] == word_doc[n - 1:]
    gi = np.flatnonzero(valid)
    if len(gi) == 0:
        return (np.array([], np.uint64), np.array([], np.int64))
    gh = _mix64(word_h[gi])
    for j in range(1, n):
        gh = _mix64(gh ^ word_h[gi + j])
    return gh, word_doc[gi]


class SimHasher:
    """64-bit simhash over word 3-grams — fully vectorized, no per-gram
    Python loop and no md5.

    The whole batch is processed as one flat UTF-8 byte array (zero-copy
    from Arrow):
      1. words = maximal runs of non-ASCII-whitespace bytes (boundary
         masks via shifted compares; doc boundaries forced explicitly);
      2. per-word 64-bit FNV-1a computed column-wise over byte positions
         on a length-descending word ordering, so pass i touches only the
         words longer than i bytes — total work O(sum of word lengths);
      3. gram hash = splitmix64 chain over the three word hashes
         (reuses _mix64, the shared public mixer);
      4. per-document ±1 bit votes via one unpackbits + add.reduceat
         (accumulating in int64 directly, no int32 bit-matrix temp).
    The scalar reference lives in tests/test_vectorized_kernels.py
    (scalar_simhash) and is value-identical."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # nulls hash like empty docs; large_string gives int64 offsets
        arr = pc.fill_null(col, "").cast(pa.large_string())
        buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
        off = np.frombuffer(buf_off, np.int64,
                            count=len(arr) + 1, offset=8 * arr.offset)
        base = int(off[0])
        doc_off = (off - base).astype(np.int64)
        n_docs = len(arr)
        data = np.frombuffer(buf_data, np.uint8)[base:base + int(doc_off[-1])]
        sims = self._simhash_flat(data, doc_off, n_docs)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(sims.view(np.int64), pa.int64()),
        })

    @staticmethod
    def _simhash_flat(data: np.ndarray, doc_off: np.ndarray,
                      n_docs: int) -> np.ndarray:
        out = np.zeros(n_docs, dtype=np.uint64)
        if len(data) == 0 or n_docs == 0:
            return out
        word_h, word_doc = word_hashes_flat(data, doc_off)
        n_words = len(word_h)
        if n_words < 3:
            return out
        valid = word_doc[:-2] == word_doc[2:]
        gi = np.flatnonzero(valid)
        if len(gi) == 0:
            return out
        gh = _mix64(word_h[gi])
        gh = _mix64(gh ^ word_h[gi + 1])
        gh = _mix64(gh ^ word_h[gi + 2])
        gram_doc = word_doc[gi]
        # per-doc ±1 votes: unpack bits once, segment-sum in int64
        bits = np.unpackbits(gh[:, None].view(np.uint8), axis=1,
                             bitorder="little")
        gcounts = np.bincount(gram_doc, minlength=n_docs)
        nz = np.flatnonzero(gcounts)
        goff = np.concatenate([[0], np.cumsum(gcounts)[:-1]])
        pos = np.add.reduceat(bits, goff[nz], axis=0, dtype=np.int64)
        acc = 2 * pos - gcounts[nz][:, None]
        packed = np.packbits((acc > 0).astype(np.uint8), axis=1,
                             bitorder="little")
        out[nz] = np.ascontiguousarray(packed).view(np.uint64).ravel()
        return out

    def simhash(self, text: str) -> int:
        """Single-text convenience (tests): same kernel, one-doc batch."""
        data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        doc_off = np.array([0, len(data)], dtype=np.int64)
        v = int(self._simhash_flat(data, doc_off, 1)[0])
        return v - (1 << 64) if v >= (1 << 63) else v


def jaccard_pairs_exact(ds: "ray.data.Dataset", threshold: float = 0.5,
                        n_parts: int = 32,
                        max_df: "int | None" = None) -> "ray.data.Dataset":
    """Standalone EXACT n-gram Jaccard near-dup discovery — no LSH, no
    candidate step: the distributed form of the exploded set-similarity
    join (postings shuffled once by gram hash; intersection mass and
    set sizes both fall out of the same exchange).

    Shape: (bucket, gram, doc_id) postings shuffle ONCE by a coarse
    gram-hash bucket.  Each bucket task emits (a) per-pair partial
    intersection counts for grams with df >= 2 (a df-1 gram cannot
    intersect) and (b) per-doc partial set sizes counting ALL its
    postings in the bucket — so sizes stay exact regardless of pruning.
    Partials sum under one more coarse exchange; two partitioned hash
    joins attach |A| and |B| (16-byte rows); J = c / (|A| + |B| - c).

    max_df (None = exact): at corpus scale, cap gram document frequency
    before pair emission — a df-D gram contributes C(D,2) pair rows, so
    stopword-grade grams explode quadratically.  Pruned grams still
    count toward sizes, making capped scores conservative LOWER bounds
    (a capped run can only miss pairs, never invent them).

    Input (doc_id:int64, text:string) -> (doc_a, doc_b, jaccard:float64),
    doc_a < doc_b, jaccard >= threshold.  Gram identity is the 64-bit
    rolling hash of _shingles (k=5 utf-8 bytes), the same identity the
    verify/jaccard paths use.
    """
    from .joins import hash_join, hash_part

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        grams = [_shingles(t or "") for t in texts]
        n = np.array([g.size for g in grams], np.int64)
        doc = np.repeat(ids, n)
        g = (np.concatenate(grams) if grams
             else np.array([], np.uint64)).view(np.int64)
        return pa.table({
            "bucket": pa.array(hash_part(g, n_parts), pa.int32()),
            "gram": pa.array(g, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
        })

    def bucket_kernel(grp: pa.Table) -> pa.Table:
        gram = grp.column("gram").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        # per-doc size partials: every posting counts (pre-prune)
        udoc, ucnt = np.unique(doc, return_counts=True)
        o_a = [udoc, np.array([-1], np.int64)]  # sentinel keeps schema
        o_b = [np.full(len(udoc), -1, np.int64), np.array([-1], np.int64)]
        o_n = [ucnt.astype(np.int64), np.array([0], np.int64)]
        order = np.lexsort((doc, gram))
        g2, d2 = gram[order], doc[order]
        bounds = np.flatnonzero(np.concatenate([[True], g2[1:] != g2[:-1]]))
        counts = np.diff(np.append(bounds, len(g2)))
        live = counts >= 2  # df-1 grams (the majority) never intersect
        if max_df is not None:
            live &= counts <= max_df
        for s, c in zip(bounds[live].tolist(), counts[live].tolist()):
            d = d2[s:s + c]  # sorted within the gram run (lexsort)
            iu, ju = np.triu_indices(c, k=1)
            o_a.append(d[iu])
            o_b.append(d[ju])
            o_n.append(np.ones(len(iu), np.int64))
        a = np.concatenate(o_a)
        b = np.concatenate(o_b)
        nn = np.concatenate(o_n)
        # pre-sum pair multiplicity inside the bucket before the exchange
        order = np.lexsort((b, a))
        a, b, nn = a[order], b[order], nn[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        seg = np.cumsum(first) - 1
        tot = np.zeros(seg[-1] + 1, np.int64)
        np.add.at(tot, seg, nn)
        a, b = a[first], b[first]
        part = hash_part(a * np.int64(1_000_003) + b, n_parts)
        return pa.table({"part": pa.array(part, pa.int32()),
                         "doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "n": pa.array(tot, pa.int64())})

    bucket_kernel.__name__ = "bucket_kernel"

    def sum_kernel(grp: pa.Table) -> pa.Table:
        a = grp.column("doc_a").to_numpy(zero_copy_only=False)
        b = grp.column("doc_b").to_numpy(zero_copy_only=False)
        nn = grp.column("n").to_numpy(zero_copy_only=False)
        real = a >= 0
        a, b, nn = a[real], b[real], nn[real]
        if len(a) == 0:  # group held only sentinel rows
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((b, a))
        a, b, nn = a[order], b[order], nn[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        seg = np.cumsum(first) - 1
        tot = np.zeros(seg[-1] + 1, np.int64)
        np.add.at(tot, seg, nn)
        return pa.table({"doc_a": pa.array(a[first], pa.int64()),
                         "doc_b": pa.array(b[first], pa.int64()),
                         "n": pa.array(tot, pa.int64())})

    sum_kernel.__name__ = "sum_kernel"
    post = ds.map_batches(postings, batch_format="pyarrow")
    partials = post.groupby("bucket", num_partitions=n_parts).map_groups(
        bucket_kernel, batch_format="pyarrow")
    summed = partials.groupby("part", num_partitions=n_parts).map_groups(
        sum_kernel, batch_format="pyarrow")

    sizes = summed.map_batches(
        lambda t: pa.table({
            "doc_id": t.filter(pc.equal(t.column("doc_b"), -1)
                               ).column("doc_a"),
            "n_sz": t.filter(pc.equal(t.column("doc_b"), -1)).column("n")}),
        batch_format="pyarrow")
    pairs = summed.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("doc_b"), -1)),
        batch_format="pyarrow")

    j1 = hash_join(pairs.map_batches(
        lambda t: t.select(["doc_a", "doc_b", "n"]), batch_format="pyarrow"),
        sizes, "doc_a", "doc_id", n_buckets=n_parts // 2)
    j1 = j1.map_batches(
        lambda t: t.select(["doc_a", "doc_b", "n", "n_sz"]),
        batch_format="pyarrow")
    sizes_b = sizes.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "n_sz_b": t.column("n_sz")}),
        batch_format="pyarrow")
    j2 = hash_join(j1, sizes_b, "doc_b", "doc_id", n_buckets=n_parts // 2)

    def score(t: pa.Table) -> pa.Table:
        c = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        na = t.column("n_sz").to_numpy(zero_copy_only=False)
        nb = t.column("n_sz_b").to_numpy(zero_copy_only=False)
        j = c / (na + nb - c)
        keep = pa.array(j >= threshold)
        return pa.table({"doc_a": t.column("doc_a").filter(keep),
                         "doc_b": t.column("doc_b").filter(keep),
                         "jaccard": pa.array(j[j >= threshold], pa.float64())})

    return j2.map_batches(score, batch_format="pyarrow")


def jaccard_pairs_prefix(ds: "ray.data.Dataset", threshold: float = 0.5,
                         n_parts: int = 32,
                         tile_elems: int = 4_000_000,
                         use_mask_filter: bool = True) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard near-dup discovery at corpus scale via
    PREFIX FILTERING (the AllPairs/PPJoin bound, Bayardo et al. WWW'07 /
    Xiao et al. WWW'08): if J(A,B) >= t then |A ∩ B| >= ceil(t·|A|), so
    any qualifying B must share at least one of A's first
    |A| - ceil(t·|A|) + 1 grams in a GLOBAL rarest-first gram order.
    Candidates are generated only from those prefix grams, then verified
    with exact Jaccard — a guaranteed-superset candidate set, so the
    result equals the uncapped jaccard_pairs_exact, at a fraction of the
    pair fan-out (common stopword-grade grams land in suffixes and never
    emit pairs; this is what df-capping CANNOT do exactly).

    Shape (3 postings shuffles + pair dedup + verify joins, all coarse
    keys, no driver materialization, no broadcast):
      1. postings bucket by gram hash -> per-gram df computed bucket-
         locally and attached to each posting row;
      2. postings regroup by doc hash -> per-doc (df, gram)-ascending
         sort, emit only the prefix;
      3. prefix postings bucket by gram hash -> pair emission per gram
         run, pruned by the LENGTH filter (min >= t*max), the PPJoin
         POSITIONAL filter (overlap upper bound from the gram's rank vs
         the required ceil(t/(1+t)(|A|+|B|))), and a 128-bit gram-mask
         intersection bound (|A∩B| <= |A| - #mask bits of A absent from
         B; see doc_prefix) — all three lossless; then coarse-partition
         distinct (_dedup_pairs);
      4. verify_pairs_jaccard (bucket-colocated exact Jaccard) ->
         filter >= t.

    Input (doc_id:int64, text:string) ->
    (doc_a, doc_b, jaccard:float64), doc_a < doc_b, jaccard >= t.
    """
    from .joins import hash_part

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        grams = [_shingles(t or "") for t in texts]
        n = np.array([g.size for g in grams], np.int64)
        doc = np.repeat(ids, n)
        g = (np.concatenate(grams) if grams
             else np.array([], np.uint64)).view(np.int64)
        return pa.table({
            "bucket": pa.array(hash_part(g, n_parts), pa.int32()),
            "gram": pa.array(g, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
        })

    def attach_df(grp: pa.Table) -> pa.Table:
        gram = grp.column("gram").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(gram, kind="stable")
        g2, d2 = gram[order], doc[order]
        bounds = np.flatnonzero(np.concatenate([[True], g2[1:] != g2[:-1]]))
        counts = np.diff(np.append(bounds, len(g2)))
        df = np.repeat(counts, counts)
        return pa.table({
            "dbucket": pa.array(hash_part(d2, n_parts), pa.int32()),
            "doc_id": pa.array(d2, pa.int64()),
            "gram": pa.array(g2, pa.int64()),
            "df": pa.array(df, pa.int64()),
        })

    attach_df.__name__ = "attach_df"

    def doc_prefix(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({"gbucket": pa.array([], pa.int32()),
                             "gram": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "m0": pa.array([], pa.int64()),
                             "m1": pa.array([], pa.int64())})
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        gram = grp.column("gram").to_numpy(zero_copy_only=False)
        df = grp.column("df").to_numpy(zero_copy_only=False)
        # rarest-first global order = (df, gram); doc-major sort, then
        # per-doc prefix selection via segment arithmetic (one Python
        # call per partition, vectorized across its docs)
        order = np.lexsort((gram, df, doc))
        d2, g2 = doc[order], gram[order]
        bounds = np.flatnonzero(np.concatenate([[True], d2[1:] != d2[:-1]]))
        sizes = np.diff(np.append(bounds, len(d2)))
        # |prefix| = n - ceil(t*n) + 1
        plen = sizes - np.ceil(_eps_down(threshold * sizes)).astype(np.int64) + 1
        idx = np.concatenate([np.arange(s, s + p) for s, p in
                              zip(bounds.tolist(), plen.tolist())]) \
            if len(bounds) else np.array([], np.int64)
        g3 = g2[idx]
        # pos = rank of the gram in its doc's full rarest-first order
        # (prefix grams are exactly the first plen ranks); size = the
        # doc's FULL shingle-set size — both feed the emit-time filters
        pos = idx - np.repeat(bounds, plen)
        size = np.repeat(sizes, plen)
        # 128-bit gram-membership mask over the doc's FULL shingle set
        # (each gram sets exactly one of 128 bits, keyed by its low 7
        # hash bits).  Feeds the emit-time MASK filter: a bit set in A's
        # mask but absent from B's proves >= 1 gram of A \ B, and the
        # two words partition the grams, so
        #   |A \ B| >= popcount(mA0 & ~mB0) + popcount(mA1 & ~mB1)
        # giving the lossless bound |A∩B| <= |A| - that sum.  On
        # low-entropy corpora (kind chains) this kills the bulk of the
        # below-threshold candidates BEFORE the pair-dedup exchange; on
        # large-vocab text the masks saturate and it prunes nothing, at
        # two extra int64 columns on prefix postings only.
        gu = g2.view(np.uint64)
        bi = gu & np.uint64(127)
        bit = np.uint64(1) << (bi & np.uint64(63))
        hi = bi >> np.uint64(6)
        m0 = np.bitwise_or.reduceat(
            np.where(hi == 0, bit, np.uint64(0)), bounds)
        m1 = np.bitwise_or.reduceat(
            np.where(hi == 1, bit, np.uint64(0)), bounds)
        return pa.table({
            "gbucket": pa.array(hash_part(g3, n_parts), pa.int32()),
            "gram": pa.array(g3, pa.int64()),
            "doc_id": pa.array(d2[idx], pa.int64()),
            "size": pa.array(size, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "m0": pa.array(np.repeat(m0, plen).view(np.int64), pa.int64()),
            "m1": pa.array(np.repeat(m1, plen).view(np.int64), pa.int64()),
        })

    doc_prefix.__name__ = "doc_prefix"

    def emit_pairs(grp: pa.Table) -> pa.Table:
        gram = grp.column("gram").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        size = grp.column("size").to_numpy(zero_copy_only=False)
        pos = grp.column("pos").to_numpy(zero_copy_only=False)
        mask0 = grp.column("m0").to_numpy(zero_copy_only=False)\
            .view(np.uint64)
        mask1 = grp.column("m1").to_numpy(zero_copy_only=False)\
            .view(np.uint64)
        order = np.lexsort((doc, gram))
        g2, d2 = gram[order], doc[order]
        s2, p2 = size[order], pos[order]
        m02, m12 = mask0[order], mask1[order]
        bounds = np.flatnonzero(np.concatenate([[True], g2[1:] != g2[:-1]]))
        counts = np.diff(np.append(bounds, len(g2)))
        o_a = [np.array([], np.int64)]
        o_b = [np.array([], np.int64)]
        live = counts >= 2

        def filt_append(d, sz, po, m0, m1, iu, ju):
            sa, sb = sz[iu], sz[ju]
            # LENGTH filter: J <= min/max, so J >= t needs
            # min(|A|,|B|) >= t*max(|A|,|B|)
            keep = np.minimum(sa, sb) >= _eps_down(
                threshold * np.maximum(sa, sb))
            # POSITIONAL filter (PPJoin, Xiao et al. WWW'08): at this
            # shared gram (positions pa/pb in each doc's rarest-first
            # order) the overlap can be at most
            # 1 + min(|A|-1-pa, |B|-1-pb); a qualifying pair needs
            # overlap >= ceil(t/(1+t)(|A|+|B|)).  Exactness: the pair's
            # SMALLEST shared gram is provably in both prefixes and the
            # bound holds there, so union-over-emissions loses nothing.
            alpha = np.ceil(_eps_down(
                threshold / (1.0 + threshold) * (sa + sb)))
            ub = 1 + np.minimum(sa - 1 - po[iu], sb - 1 - po[ju])
            keep &= ub >= alpha
            # MASK filter (see doc_prefix): lossless 128-bit-sketch upper
            # bound on |A∩B|, applied to the survivors only
            sel = np.flatnonzero(keep) if use_mask_filter else \
                np.array([], np.int64)
            if len(sel):
                ia, jb = iu[sel], ju[sel]
                miss_a = (_popcount_u64(m0[ia] & ~m0[jb])
                          + _popcount_u64(m1[ia] & ~m1[jb]))
                miss_b = (_popcount_u64(m0[jb] & ~m0[ia])
                          + _popcount_u64(m1[jb] & ~m1[ia]))
                ok = np.minimum(sz[ia] - miss_a,
                                sz[jb] - miss_b) >= alpha[sel]
                keep[sel[~ok]] = False
            o_a.append(d[iu][keep])
            o_b.append(d[ju][keep])

        # Tiled emission: a gram run of c docs has C(c,2) raw pairs, and
        # one triu_indices over a dense run (c ~ tens of thousands on
        # near-identical chain families) would allocate multi-GB index
        # arrays BEFORE the filters see them — measured as 83% of the
        # whole prefix-join wall at sf0.1.  Emitting the triangle in
        # row-blocks of <= tile_elems pair slots keeps every allocation
        # bounded while producing the identical filtered pair set
        # (tile_elems is a parameter so tests can parity-check the tiled
        # path against whole-triangle emission on small corpora).
        for s, c in zip(bounds[live].tolist(), counts[live].tolist()):
            d, sz, po = d2[s:s + c], s2[s:s + c], p2[s:s + c]
            m0, m1 = m02[s:s + c], m12[s:s + c]
            if c * (c - 1) // 2 <= tile_elems:
                iu, ju = np.triu_indices(c, k=1)
                filt_append(d, sz, po, m0, m1, iu, ju)
                continue
            rows = max(1, tile_elems // c)
            for i0 in range(0, c - 1, rows):
                ii = np.arange(i0, min(i0 + rows, c - 1), dtype=np.int64)
                lens = c - 1 - ii
                tot = int(lens.sum())
                iu = np.repeat(ii, lens)
                starts = np.concatenate(
                    [[0], np.cumsum(lens)[:-1]]).astype(np.int64)
                ju = (np.arange(tot, dtype=np.int64)
                      - np.repeat(starts, lens) + iu + 1)
                filt_append(d, sz, po, m0, m1, iu, ju)
        a = np.concatenate(o_a)
        b = np.concatenate(o_b)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    emit_pairs.__name__ = "emit_pairs"

    # all five exchanges ride joins.bucket_exchange: the keys are coarse
    # (n_parts buckets) and each stage's data is small relative to the
    # Dataset sort exchange's fixed sampling/sort cost (measured at
    # sf0.01: 29.4s with groupby exchanges -> see BASELINE.md)
    from .joins import bucket_exchange

    post = ds.map_batches(postings, batch_format="pyarrow")
    with_df = bucket_exchange(post, n_parts, attach_df, bucket_col="bucket")
    prefix = bucket_exchange(with_df, n_parts, doc_prefix,
                             bucket_col="dbucket")
    raw_pairs = bucket_exchange(prefix, n_parts, emit_pairs,
                                bucket_col="gbucket")
    cands = _dedup_pairs(raw_pairs, n_parts, via_bucket_exchange=True)
    verified = verify_pairs_jaccard(cands, ds, n_buckets=n_parts // 2,
                                    min_jaccard=threshold)
    return verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("jaccard"), threshold)),
        batch_format="pyarrow")


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3,
                  n_parts: int = 64,
                  cap: "int | None" = None) -> "ray.data.Dataset":
    """SimHash near-dup pairs: EXACT set of (doc_a < doc_b) whose 64-bit
    simhashes differ in <= max_hamming bits, found by 16-bit banding.

    Pigeonhole guarantee: with 4 disjoint 16-bit bands, any pair within
    Hamming distance 3 shares at least one unchanged band — so banding
    has total recall for max_hamming <= 3 (the classic rotate-and-band
    simhash dedup).  Candidates group on (band, band_value) with the
    same coarse-partition vectorized emission as MinHash-LSH; the
    Hamming verify fetches signatures via two partitioned hash joins
    (8-byte values — far cheaper than text) and popcounts vectorized.
    """
    from .joins import hash_join

    if max_hamming > 3:
        raise ValueError("simhash_pairs: 4x16-bit banding only guarantees "
                         "total recall for max_hamming <= 3; use more/"
                         f"narrower bands for radius {max_hamming}")
    # materialize: the signature stage feeds THREE branches (bands +
    # both sides of the verify join); unmaterialized it would re-run the
    # signature computation three times.  SimHasher is stateless now —
    # plain tasks, no actor pool (GIL inflation, see perf notes)
    sigs = ds.map_batches(SimHasher(), batch_format="pyarrow").materialize()

    def to_bands(t: pa.Table) -> pa.Table:
        sig = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(sig)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        vals = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            vals[b::4] = ((sig >> np.uint64(16 * b)) &
                          np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc, 4), pa.int64()),
            "band": pa.array(bands),
            "band_hash": pa.array(vals, pa.int64()),
        })

    bands = sigs.map_batches(to_bands, batch_format="pyarrow")
    # NOTE: 16-bit band values collide by CHANCE (expected bucket size
    # n/65536 per band), so candidate volume grows ~n^2/2^17 on huge
    # corpora even with no true near-dups — pass cap=MAX_BUCKET_PAIRS_N
    # at corpus scale to bound degenerate buckets (star fallback keeps
    # connectivity but drops pair-list completeness, as in MinHash)
    pairs = bands.map_batches(
        lambda t: _add_band_bucket_part(t, n_parts),
        batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        _make_pairs_in_partition(cap), batch_format="pyarrow")
    cand = _dedup_pairs(pairs, n_parts)

    sig_a = sigs.map_batches(
        lambda t: pa.table({"doc_a": t.column("doc_id"),
                            "sig_a": t.column("simhash")}),
        batch_format="pyarrow")
    sig_b = sigs.map_batches(
        lambda t: pa.table({"doc_b": t.column("doc_id"),
                            "sig_b": t.column("simhash")}),
        batch_format="pyarrow")
    j = hash_join(cand, sig_a, "doc_a", "doc_a", n_buckets=16)
    j = hash_join(j, sig_b, "doc_b", "doc_b", n_buckets=16)

    def verify(t: pa.Table) -> pa.Table:
        sa = t.column("sig_a").to_numpy(zero_copy_only=False).view(np.uint64)
        sb = t.column("sig_b").to_numpy(zero_copy_only=False).view(np.uint64)
        x = sa ^ sb
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pa.table({
            "doc_a": t.column("doc_a").filter(pa.array(keep)),
            "doc_b": t.column("doc_b").filter(pa.array(keep)),
            "hamming": pa.array(ham[keep].astype(np.int64), pa.int64()),
        })

    return j.map_batches(verify, batch_format="pyarrow")


# ---------------- n-gram Jaccard near-dup (verify stage) ------------------

def verify_pairs_jaccard(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                         n_buckets: int = 16,
                         min_jaccard: "float | None" = None,
                         bitset_max_vocab: int = 4096) -> "ray.data.Dataset":
    """Attach exact shingle Jaccard to candidate pairs — bucket-colocated
    text fetch: pairs land in bucket hash(doc_a) % B, a DEDUPED
    (bucket, doc_id) need-list semi-joins the documents table, and the
    scoring task for a bucket sees each needed text exactly ONCE plus the
    16-byte pair rows.  A doc's text therefore crosses the exchange at
    most B+1 times total (once as doc_a — all its doc_a pairs share one
    bucket — and once per distinct partner bucket as doc_b), independent
    of how many pairs it appears in; the previous two-hash-join design
    attached a text copy to EVERY pair row (~350 copies/doc on the dense
    stress corpus) and re-shingled each doc once per downstream batch.
    Nothing is materialized on the driver and no corpus-wide broadcast
    exists anywhere in the path.  Raise n_buckets at corpus scale so one
    bucket's unique texts fit a worker heap.

    pairs: (doc_a:int64, doc_b:int64); docs: (doc_id:int64, text:string).
    Returns (doc_a, doc_b, jaccard:float64).  Pairs referencing a doc_id
    absent from docs are dropped (inner-join semantics).

    min_jaccard (lossless pre-filter, verdict r4 item 3): when the caller
    filters `jaccard >= t` downstream anyway, pass t here — pairs whose
    SIZE upper bound min(|A|,|B|)/max(|A|,|B|) is already below t are
    dropped by one vectorized pass before any intersection runs (Jaccard
    can never exceed that ratio).  On the dense near-dup stress this
    kills the bulk of the LSH false positives, which dominated the
    verify stage's wall time.

    bitset_max_vocab: adaptive small-universe kernel.  When a scoring
    bucket's docs draw their shingles from at most this many DISTINCT
    grams (low-entropy corpora: the sf0.1 kind-chain corpus has 277
    grams across 56k docs), every doc becomes a ceil(V/64)-word bitset
    and exact Jaccard for ALL pairs is one popcount over AND — fully
    vectorized across the bucket, no per-run Python (measured ~10x the
    searchsorted path on the 41M-candidate chain corpus).  Text corpora
    blow past the cap in the vocab probe and keep the general path; the
    two kernels are value-identical (parity pytest).  Pass 0 to force
    the general path.
    """
    from .joins import bucket_exchange, hash_join, hash_part

    def tag_pairs(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("doc_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        vb = hash_part(a, n_buckets)
        return pa.table({
            "vb": pa.array(vb, pa.int32()),
            "__vside": pa.array(np.zeros(len(a), np.int8), pa.int8()),
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "doc_id": pa.nulls(len(a), pa.int64()),
            "text": pa.nulls(len(a), pa.string()),
        })

    tagged = pairs.map_batches(tag_pairs, batch_format="pyarrow")

    # need-list: which (bucket, doc_id) must be present for scoring —
    # batch-locally deduped here, globally deduped per bucket below, so
    # the docs join emits one text row per (bucket, doc) not per pair
    def needed(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t.column("doc_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(a) == 0:  # [[True]] mask below breaks on 0-row input
            return pa.table({"vb": pa.array([], pa.int32()),
                             "doc_id": pa.array([], pa.int64())})
        vb = hash_part(a, n_buckets)
        doc = np.concatenate([a, b])
        bkt = np.concatenate([vb, vb])
        order = np.lexsort((doc, bkt))
        doc, bkt = doc[order], bkt[order]
        first = np.concatenate(
            [[True], (doc[1:] != doc[:-1]) | (bkt[1:] != bkt[:-1])])
        return pa.table({"vb": pa.array(bkt[first], pa.int32()),
                         "doc_id": pa.array(doc[first], pa.int64())})

    def uniq_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"vb": pa.array([], pa.int32()),
                             "doc_id": pa.array([], pa.int64())})
        d = np.unique(g.column("doc_id").to_numpy(zero_copy_only=False))
        vb = g.column("vb")[0].as_py()
        return pa.table({"vb": pa.array(np.full(len(d), vb, np.int32)),
                         "doc_id": pa.array(d, pa.int64())})

    uniq_bucket.__name__ = "uniq_bucket"
    need = bucket_exchange(
        pairs.map_batches(needed, batch_format="pyarrow"),
        n_buckets, uniq_bucket, bucket_col="vb")
    texts = hash_join(need, docs, "doc_id", "doc_id",
                      n_buckets=max(8, n_buckets // 2))

    def tag_texts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "vb": t.column("vb").cast(pa.int32()),
            "__vside": pa.array(np.ones(n, np.int8), pa.int8()),
            "doc_a": pa.nulls(n, pa.int64()),
            "doc_b": pa.nulls(n, pa.int64()),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "text": t.column("text").cast(pa.string()),
        })

    both = tagged.union(texts.map_batches(tag_texts, batch_format="pyarrow"))
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})

    def score_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__vside")
        prs = g.filter(pc.equal(side, 0))
        if prs.num_rows == 0:
            return empty
        dt = g.filter(pc.equal(side, 1))
        ids = dt.column("doc_id").to_pylist()
        txts = dt.column("text").to_pylist()
        # one shingle set per doc per BUCKET (<= B computations per doc
        # corpus-wide), not per downstream batch.  Per-doc _shingles is
        # deliberate: it is cache-optimal at real doc sizes (see
        # shingles_flat docstring) and its output is SORTED unique,
        # which the batched searchsorted below relies on.
        memo = {i: _shingles(t or "") for i, t in zip(ids, txts)}
        a_np = prs.column("doc_a").to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        b_np = prs.column("doc_b").to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        n = len(a_np)
        sims = np.empty(n, dtype=np.float64)
        keep = np.ones(n, dtype=bool)
        done = np.zeros(n, dtype=bool)  # decided without an intersection
        # vectorized per-pair set sizes via the bucket's local doc index
        uid = np.array(ids, np.int64)
        uorder = np.argsort(uid, kind="stable")
        uid_s = uid[uorder]
        sizes_s = np.fromiter((len(memo[ids[i]]) for i in uorder),
                              np.int64, len(uorder))
        pa_loc = np.searchsorted(uid_s, a_np).clip(0, max(len(uid_s) - 1, 0))
        pb_loc = np.searchsorted(uid_s, b_np).clip(0, max(len(uid_s) - 1, 0))
        in_a = uid_s[pa_loc] == a_np if len(uid_s) else np.zeros(n, bool)
        in_b = uid_s[pb_loc] == b_np if len(uid_s) else np.zeros(n, bool)
        missing = ~(in_a & in_b)
        keep[missing] = False
        done[missing] = True
        if min_jaccard is not None and len(uid_s):
            la = sizes_s[pa_loc]
            lb = sizes_s[pb_loc]
            # jaccard <= min(|A|,|B|) / max(|A|,|B|): below-threshold pairs
            # are dropped with zero intersection work (lossless given the
            # caller's downstream >= min_jaccard filter)
            bound_lt = (np.minimum(la, lb)
                        < _eps_down(min_jaccard * np.maximum(la, lb)))
            cut = bound_lt & ~done
            keep[cut] = False
            done[cut] = True
        todo = np.flatnonzero(~done)
        # small-universe fast path (see docstring): only probed when the
        # pair volume dwarfs the doc count (the concat+unique vocab probe
        # costs one pass over the bucket's postings — noise next to the
        # pair work it replaces, pure overhead for tiny pair lists)
        if len(todo) >= 4 * max(len(uid_s), 1) and bitset_max_vocab > 0:
            flat = (np.concatenate([memo[int(i)] for i in uid_s])
                    if len(uid_s) else np.array([], np.uint64))
            vocab = np.unique(flat)
            if 0 < len(vocab) <= bitset_max_vocab:
                w = (len(vocab) + 63) // 64
                rows = np.repeat(np.arange(len(uid_s), dtype=np.int64),
                                 sizes_s)
                col = np.searchsorted(vocab, flat).astype(np.uint64)
                bitmat = np.zeros((len(uid_s), w), np.uint64)
                np.bitwise_or.at(
                    bitmat, (rows, (col >> np.uint64(6)).astype(np.int64)),
                    np.uint64(1) << (col & np.uint64(63)))
                tile = 1 << 20  # bound the (P, w) gathers
                for s0 in range(0, len(todo), tile):
                    ti = todo[s0:s0 + tile]
                    ia, ib = pa_loc[ti], pb_loc[ti]
                    inter = _popcount_u64(bitmat[ia] & bitmat[ib]).sum(
                        axis=1)
                    union = sizes_s[ia] + sizes_s[ib] - inter
                    sims[ti] = np.where(union > 0,
                                        inter / np.maximum(union, 1), 1.0)
                k = pa.array(keep)
                return pa.table({
                    "doc_a": prs.column("doc_a").filter(k),
                    "doc_b": prs.column("doc_b").filter(k),
                    "jaccard": pa.array(sims[keep], pa.float64()),
                })
        # batched exact Jaccard for the survivors (verdict r4 item 3: the
        # per-pair intersect1d loop was the stress chain's hot spot):
        # pairs group by doc_a, each group runs ONE searchsorted of the
        # concatenated b-sets against the (sorted unique) a-set and one
        # reduceat — per-pair Python shrinks to a dict get + list append
        order = todo[np.argsort(a_np[todo], kind="stable")]
        a_s = a_np[order]
        bounds = (np.flatnonzero(np.concatenate(
            [[True], a_s[1:] != a_s[:-1]])) if len(a_s)
            else np.array([], np.int64))
        ends = np.append(bounds[1:], len(a_s))
        for s_, e_ in zip(bounds.tolist(), ends.tolist()):
            run = order[s_:e_]
            sa = memo[int(a_s[s_])]
            bl = [memo[x] for x in b_np[run].tolist()]
            lens_b = np.fromiter(map(len, bl), np.int64, len(bl))
            flat_b = np.concatenate(bl)
            pos = np.searchsorted(sa, flat_b).clip(0, len(sa) - 1)
            hit = sa[pos] == flat_b
            seg = np.zeros(len(bl), np.int64)
            np.cumsum(lens_b[:-1], out=seg[1:])
            inter = np.add.reduceat(hit, seg)
            union = len(sa) + lens_b - inter
            sims[run] = np.where(union > 0, inter / np.maximum(union, 1),
                                 1.0)
        k = pa.array(keep)
        return pa.table({
            "doc_a": prs.column("doc_a").filter(k),
            "doc_b": prs.column("doc_b").filter(k),
            "jaccard": pa.array(sims[keep], pa.float64()),
        })

    score_bucket.__name__ = "score_bucket"
    return bucket_exchange(both, n_buckets, score_bucket, bucket_col="vb")


def dup_span_stats(ds: "ray.data.Dataset", window: int = 64,
                   sample_mod: int = 8,
                   n_parts: int = 32) -> "ray.data.Dataset":
    """Exact duplicated-substring detection via content-defined anchor
    sampling (the scalable form of suffix-array substring dedup, Lee et
    al. ACL'22 "Deduplicating Training Data Makes Language Models
    Better"): every `window`-byte span whose rolling hash satisfies
    h % sample_mod == 0 becomes an ANCHOR.  Sampling is content-defined
    — identical byte runs sample identical anchors regardless of their
    offset in either document — so any duplicated run long enough to
    contain a sampled window (expected length window + 8*sample_mod) is
    caught exactly, with postings volume ~len/sample_mod per doc instead
    of len (the full suffix-array cost).

    Scale shape: anchor postings (hash-bucket, hash, doc_id) shuffle
    ONCE by coarse hash bucket (joins.bucket_exchange — every occurrence
    of a hash lands in one bucket task, so global occurrence / distinct-
    doc counts are bucket-local); flagged anchors then regroup by doc
    bucket for the per-doc summary.  No driver materialization.

    Input (doc_id:int64, text:string) -> per-doc
    (doc_id, n_anchors, n_dup_anchors, n_xdoc_anchors):
      n_anchors      — sampled anchors in the doc
      n_dup_anchors  — anchors whose span bytes occur >= 2 times in the
                       corpus (any doc, including self-repeats)
      n_xdoc_anchors — anchors whose span occurs in >= 2 DISTINCT docs
    Docs shorter than `window` (or whose hashes never sample) carry no
    anchors and emit no row — filter upstream if full coverage matters.
    Hash collisions across different byte content are possible but at
    2^-61 per pair are negligible (same contract as fingerprint())."""
    from .joins import bucket_exchange, hash_part
    from .textops import _poly_hashes

    mod = np.uint64(sample_mod)

    def anchors(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        o_doc, o_hash = [np.array([], np.int64)], [np.array([], np.int64)]
        for d, t in zip(ids.tolist(), texts):
            data = np.frombuffer((t or "").encode("utf-8"), np.uint8)
            if len(data) < window:
                continue
            h = _poly_hashes(data, window)
            sel = h[h % mod == 0]
            if sel.size:
                o_doc.append(np.full(sel.size, d, np.int64))
                o_hash.append(sel.astype(np.int64))  # < 2^61: int64-safe
        doc = np.concatenate(o_doc)
        h = np.concatenate(o_hash)
        return pa.table({
            "bucket": pa.array(hash_part(h, n_parts), pa.int32()),
            "hash": pa.array(h, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
        })

    def flag(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({"dbucket": pa.array([], pa.int32()),
                             "doc_id": pa.array([], pa.int64()),
                             "dup": pa.array([], pa.int64()),
                             "xdoc": pa.array([], pa.int64())})
        h = grp.column("hash").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h2, d2 = h[order], doc[order]
        starts = np.flatnonzero(np.concatenate([[True], h2[1:] != h2[:-1]]))
        counts = np.diff(np.append(starts, len(h2)))
        run_id = np.repeat(np.arange(len(starts)), counts)
        # distinct docs per hash run: doc boundaries inside each run + 1
        new_doc = np.concatenate([[True], (d2[1:] != d2[:-1])
                                  | (h2[1:] != h2[:-1])])
        ndocs = np.bincount(run_id, weights=new_doc,
                            minlength=len(starts)).astype(np.int64)
        dup = (counts >= 2)[run_id]
        xdoc = (ndocs >= 2)[run_id]
        return pa.table({
            "dbucket": pa.array(hash_part(d2, n_parts), pa.int32()),
            "doc_id": pa.array(d2, pa.int64()),
            "dup": pa.array(dup.astype(np.int64), pa.int64()),
            "xdoc": pa.array(xdoc.astype(np.int64), pa.int64()),
        })

    flag.__name__ = "flag"

    def summarize(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_anchors": pa.array([], pa.int64()),
                             "n_dup_anchors": pa.array([], pa.int64()),
                             "n_xdoc_anchors": pa.array([], pa.int64())})
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        dup = grp.column("dup").to_numpy(zero_copy_only=False)
        xd = grp.column("xdoc").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        d2 = doc[order]
        starts = np.flatnonzero(np.concatenate([[True], d2[1:] != d2[:-1]]))
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(d2))))
        return pa.table({
            "doc_id": pa.array(d2[starts], pa.int64()),
            "n_anchors": pa.array(np.bincount(seg).astype(np.int64),
                                  pa.int64()),
            "n_dup_anchors": pa.array(
                np.bincount(seg, weights=dup[order]).astype(np.int64),
                pa.int64()),
            "n_xdoc_anchors": pa.array(
                np.bincount(seg, weights=xd[order]).astype(np.int64),
                pa.int64()),
        })

    summarize.__name__ = "summarize"

    post = ds.map_batches(anchors, batch_format="pyarrow")
    flagged = bucket_exchange(post, n_parts, flag, bucket_col="bucket")
    return bucket_exchange(flagged, n_parts, summarize, bucket_col="dbucket")


# ---------------- exact span dedup (dedupe + reassemble) -------------------


def _explode_spans(batch: pa.Table, span_words: int,
                   n_buckets: int) -> pa.Table:
    """(doc_id, text) -> one row per aligned span of `span_words`
    consecutive words (split on single space, string_split semantics:
    empties preserved, '' -> ['']).  Fully vectorized: Arrow
    split_pattern gives the word ListArray; span offsets are every
    span_words-th word offset (numpy repeat/arange over the list
    offsets); the span strings come back through ONE binary_join call.
    Because spans tile each doc's word list exactly and the join
    separator equals the split separator, joining the surviving spans
    with ' ' reproduces the original text byte-for-byte when nothing is
    removed."""
    col = batch.column("text")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = pc.fill_null(col, "").cast(pa.large_string())
    words = pc.split_pattern(arr, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    off = np.asarray(words.offsets, dtype=np.int64)
    vals = words.values
    n_words = np.diff(off)          # >= 1 always ('' splits to [''])
    n_spans = -(-n_words // span_words)
    total = int(n_spans.sum())
    doc_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "seg_idx": pa.array([], pa.int64()),
                         "seg": pa.array([], pa.large_string()),
                         "__bucket": pa.array([], pa.int64())})
    span_start_cum = np.concatenate(([0], np.cumsum(n_spans)))[:-1]
    seg_idx = np.arange(total, dtype=np.int64) - np.repeat(span_start_cum,
                                                           n_spans)
    seg_word_starts = np.repeat(off[:-1], n_spans) + seg_idx * span_words
    seg_off = np.empty(total + 1, np.int64)
    seg_off[:-1] = seg_word_starts
    seg_off[-1] = off[-1]
    lists = pa.LargeListArray.from_arrays(seg_off, vals)
    segs = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    # bucket on a mixed FNV of the span bytes (collisions only co-locate:
    # the per-bucket grouping below is on the exact span string)
    sdata, soff, _ = flat_utf8(segs)
    h = fnv_segments(sdata, soff[:-1], np.diff(soff))
    bucket = (_mix64(h) % np.uint64(n_buckets)).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(np.repeat(doc_np, n_spans), pa.int64()),
        "seg_idx": pa.array(seg_idx, pa.int64()),
        "seg": segs,
        "__bucket": pa.array(bucket, pa.int64()),
    })


_SPAN_BUCKETS = 32
_SEG_IDX_BITS = 21  # pack key = doc_id << 21 | seg_idx (8M-span guard)


def _span_losers(t: pa.Table) -> pa.Table:
    """Per span-hash bucket: emit (doc_id, seg_idx) of every NON-FIRST
    occurrence of each exact span string (first = lexicographic min
    (doc_id, seg_idx) corpus-wide; the bucket owns the whole hash slice,
    so per-bucket first-wins IS the global rule).  Grouping is on the
    exact string via dictionary_encode — the route hash only co-locates."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "seg_idx": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    seg = t.column("seg")
    if isinstance(seg, pa.ChunkedArray):
        seg = seg.combine_chunks()
    codes = pc.dictionary_encode(seg).indices.to_numpy(zero_copy_only=False)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    s = t.column("seg_idx").to_numpy(zero_copy_only=False)
    order = np.lexsort((s, d, codes))
    c_sorted = codes[order]
    first = np.empty(len(c_sorted), bool)
    first[0] = True
    first[1:] = c_sorted[1:] != c_sorted[:-1]
    lose = order[~first]
    if len(lose) == 0:
        return empty
    return pa.table({"doc_id": pa.array(d[lose], pa.int64()),
                     "seg_idx": pa.array(s[lose], pa.int64())})


def _span_reassemble(t: pa.Table) -> pa.Table:
    """Per doc bucket: drop loser spans, rejoin the survivors per doc with
    ' ', and summarize (doc_id, n_spans, n_removed, clean_md5).  All
    array work (drop mask, per-doc counts, the rejoin) is vectorized;
    the only per-doc Python is one md5 call per document."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_spans": pa.array([], pa.int64()),
                      "n_removed": pa.array([], pa.int64()),
                      "clean_md5": pa.array([], pa.string())})
    if t.num_rows == 0:
        return empty
    side = t.column("__side")
    spans = t.filter(pc.equal(side, 0))
    losers = t.filter(pc.equal(side, 1))
    if spans.num_rows == 0:
        return empty
    d = spans.column("doc_id").to_numpy(zero_copy_only=False)
    s = spans.column("seg_idx").to_numpy(zero_copy_only=False)
    if s.size and int(s.max()) >= (1 << _SEG_IDX_BITS):
        raise ValueError("span_dedup: document exceeds 2^21 spans; "
                         "raise _SEG_IDX_BITS for longer documents")
    key = (d.astype(np.uint64) << np.uint64(_SEG_IDX_BITS)) | s.astype(
        np.uint64)
    ld = losers.column("doc_id").to_numpy(zero_copy_only=False)
    ls = losers.column("seg_idx").to_numpy(zero_copy_only=False)
    lkey = (ld.astype(np.uint64) << np.uint64(_SEG_IDX_BITS)) | ls.astype(
        np.uint64)
    drop = np.isin(key, lkey)
    order = np.lexsort((s, d))
    d_sorted = d[order]
    drop_sorted = drop[order]
    doc_u, doc_start, counts = np.unique(d_sorted, return_index=True,
                                         return_counts=True)
    n_removed = np.add.reduceat(drop_sorted.astype(np.int64), doc_start)
    keep_order = order[~drop_sorted]
    seg = spans.column("seg")
    if isinstance(seg, pa.ChunkedArray):
        seg = seg.combine_chunks()
    kept = seg.take(pa.array(keep_order, pa.int64()))
    kept_counts = counts - n_removed
    off = np.concatenate(([0], np.cumsum(kept_counts)))
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(off.astype(np.int64), kept),
        pa.scalar(" ", pa.large_string()))
    md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in joined.to_pylist()]
    return pa.table({
        "doc_id": pa.array(doc_u, pa.int64()),
        "n_spans": pa.array(counts.astype(np.int64), pa.int64()),
        "n_removed": pa.array(n_removed, pa.int64()),
        "clean_md5": pa.array(md5s, pa.string()),
    })


def span_dedup(docs: "ray.data.Dataset", span_words: int = 16,
               n_buckets: int = _SPAN_BUCKETS) -> "ray.data.Dataset":
    """EXACT corpus-wide dedup of aligned fixed-word-count spans with
    document reassembly — the span-granular exact-substring dedup of
    C4 / Lee et al. ACL'22 (their three-sentence / 50-token spans become
    aligned `span_words`-word spans here), keeping only the FIRST
    occurrence (min (doc_id, seg_idx)) of every duplicated span and
    rejoining each document from its survivors.

    Distributed shape (two bucket exchanges, no driver materialization):
      1. explode (stateless map_batches): doc -> aligned spans, routed by
         a mixed FNV-1a of the span bytes;
      2. span-hash exchange: per bucket, exact keep-first per span STRING
         (dictionary_encode + lexsort) emits only the loser
         (doc_id, seg_idx) pairs — the only cross-stage traffic besides
         the spans themselves;
      3. doc-hash exchange: spans (re-exploded; the explode is cheaper
         than materializing it) union the tiny loser side, drop, rejoin,
         summarize per doc.
    At 100 TB the exchanged span text is the corpus itself — the same
    volume any exact substring dedup must move once — and the loser side
    is proportional to the duplication rate.  Returns
    (doc_id, n_spans, n_removed, clean_md5); clean_md5 is the md5 of the
    reassembled text so the full byte content is oracle-checkable without
    shipping it to the driver."""
    from .joins import bucket_exchange, hash_part

    def explode(b: pa.Table) -> pa.Table:
        return _explode_spans(b, span_words, n_buckets)

    explode.__name__ = "explode_spans"
    losers = bucket_exchange(docs.map_batches(explode,
                                              batch_format="pyarrow"),
                             n_buckets, _span_losers)

    cols = ["doc_id", "seg_idx", "seg", "__side", "__bucket"]

    def tag_spans(b: pa.Table) -> pa.Table:
        e = _explode_spans(b, span_words, n_buckets)
        dnp = e.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": e.column("doc_id"),
            "seg_idx": e.column("seg_idx"),
            "seg": e.column("seg"),
            "__side": pa.array(np.zeros(e.num_rows, np.int32)),
            "__bucket": pa.array(hash_part(dnp, n_buckets), pa.int64()),
        }).select(cols)

    def tag_losers(b: pa.Table) -> pa.Table:
        dnp = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "seg_idx": b.column("seg_idx"),
            "seg": pa.nulls(b.num_rows, pa.large_string()),
            "__side": pa.array(np.ones(b.num_rows, np.int32)),
            "__bucket": pa.array(hash_part(dnp, n_buckets), pa.int64()),
        }).select(cols)

    both = docs.map_batches(tag_spans, batch_format="pyarrow").union(
        losers.map_batches(tag_losers, batch_format="pyarrow"))
    return bucket_exchange(both, n_buckets, _span_reassemble)
