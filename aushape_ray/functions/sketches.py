"""Mergeable sketches (aggregation-at-scale pattern, ray_guide):
emit one serialized sketch per batch inside map_batches, merge the tiny
partials in a second stage — no row-level shuffle ever.

HyperLogLog here is the canonical example: 2^p byte registers, numpy
vectorized add, register-wise max merge, standard bias-corrected estimate
(Flajolet et al. 2007, public algorithm)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


class HyperLogLog:
    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values) -> np.ndarray:
        """Process-stable 64-bit hashes.  Integer inputs use a pure-numpy
        splitmix64 finalizer (no per-row Python); everything else falls
        back to md5 per value."""
        arr = np.asarray(values)
        if arr.dtype.kind in "iu":
            x = arr.astype(np.uint64)
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            out[i] = int.from_bytes(
                hashlib.md5(str(v).encode("utf-8")).digest()[:8], "little")
        return out

    def add_many(self, values) -> None:
        # drop nulls first: COUNT(DISTINCT) ignores NULLs, and the md5
        # fallback would otherwise count the string 'None' as a value
        values = [v for v in values if v is not None]
        if not len(values):
            return
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


class KllSketch:
    """Simplified KLL-style mergeable quantile sketch (Karnin-Lang-Liberty
    2016, public algorithm) over int64 values.

    Level i holds items of weight 2^i; an over-capacity level is sorted
    and every other item promoted one level up (deterministic alternating
    offset instead of the random coin — same rank-error shape, O(k)
    memory, O(1/k) relative rank error).  Partial sketches are built per
    batch inside map_batches and merged in a per-group reduce — the
    shuffle carries O(k log n) ints per group instead of every row: the
    scale path for quantiles the moment a group outgrows one task
    (events_quantiles' exact per-group sort covers the small case)."""

    def __init__(self, k: int = 256) -> None:
        self.k = k
        self.n = 0
        self.levels: list[np.ndarray] = [np.array([], np.int64)]
        self.flips: list[int] = [0]

    def _capacity(self, level: int) -> int:
        depth = len(self.levels)
        return max(8, int(self.k * (2.0 / 3.0) ** (depth - level - 1)))

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._capacity(i):
                items = np.sort(self.levels[i])
                m = (len(items) // 2) * 2
                off = self.flips[i] & 1
                self.flips[i] ^= 1
                kept = items[:m][off::2]
                self.levels[i] = items[m:]  # odd leftover stays
                if i + 1 == len(self.levels):
                    self.levels.append(np.array([], np.int64))
                    self.flips.append(0)
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])
            i += 1

    def add_many(self, values) -> None:
        v = np.asarray(values, dtype=np.int64)
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def merge(self, other: "KllSketch") -> None:
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(np.array([], np.int64))
            self.flips.append(0)
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compress()

    def quantile(self, q: float) -> int:
        """quantile_disc-flavoured: smallest value whose cumulative weight
        reaches ceil(total * q)."""
        vals = np.concatenate(self.levels)
        if not len(vals):
            raise ValueError("empty sketch")
        wts = np.concatenate([
            np.full(len(lv), 1 << i, np.int64)
            for i, lv in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        target = max(1, int(np.ceil(cum[-1] * q)))
        return int(vals[order][np.searchsorted(cum, target)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self.levels, self.flips))

    @classmethod
    def from_bytes(cls, b: bytes) -> "KllSketch":
        import pickle

        k, n, levels, flips = pickle.loads(b)
        s = cls(k)
        s.n, s.levels, s.flips = n, levels, flips
        return s


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Vectorized Bloom filter over precomputed uint64 element hashes.

    m_bits must be a power of two; probes use the Kirsch-Mitzenmacher
    double-hashing scheme h1 + i*h2 (h2 forced odd so the probe sequence
    covers the table).  The bit array is a packed numpy uint8 buffer —
    m_bits/8 bytes, cheap to `ray.put` once and test against per batch.
    No false negatives; false-positive rate ~ (1 - e^{-kn/m})^k."""

    def __init__(self, m_bits: int = 1 << 20, n_probes: int = 6,
                 bits: "np.ndarray | None" = None) -> None:
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
        self.m_bits = m_bits
        self.n_probes = n_probes
        self.bits = (np.zeros(m_bits >> 3, np.uint8)
                     if bits is None else bits)

    def _idx(self, h: np.ndarray, i: int) -> np.ndarray:
        h1 = h
        h2 = _splitmix64(h) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) & np.uint64(self.m_bits - 1)

    def add_many(self, h: np.ndarray) -> None:
        h = np.asarray(h, np.uint64)
        for i in range(self.n_probes):
            idx = self._idx(h, i)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, np.uint64)
        ok = np.ones(len(h), bool)
        for i in range(self.n_probes):
            idx = self._idx(h, i)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            bit = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
            ok &= (byte & bit) != 0
            if not ok.any():
                break
        return ok


def mg_truncate(keys: np.ndarray, counts: np.ndarray,
                k: int) -> "tuple[np.ndarray, np.ndarray, int]":
    """Reduce exact (key, count) pairs to a Misra-Gries summary of at most
    k entries: subtract the (k+1)-th largest count from every entry and
    drop the non-positives (Misra & Gries 1982; the merge rule is from
    Agarwal et al., "Mergeable Summaries", PODS 2012).

    Returns (keys, residual_counts, subtracted) where `subtracted` is the
    decrement applied — callers accumulate it as the summary's error
    bound: for every surviving key, residual <= true_count <=
    residual + total_subtracted, and any key with true count >
    total_subtracted is guaranteed present.  total_subtracted <=
    n/(k+1), so the summary never loses a heavy hitter."""
    if len(keys) <= k:
        return keys, counts, 0
    order = np.argsort(counts, kind="stable")[::-1]
    thresh = int(counts[order[k]])
    kept = order[:k]
    residual = counts[kept] - thresh
    pos = residual > 0
    return keys[kept][pos], residual[pos], thresh


def heavy_hitters(ds: "ray.data.Dataset", column: str,
                  k: int = 2048) -> "tuple[np.ndarray, np.ndarray, int]":
    """Distributed heavy-hitters candidates: each batch emits its EXACT
    in-batch counts truncated to a k-entry Misra-Gries summary (<= k rows
    per batch cross the wire, never the stream), the driver merges the
    tiny partials by key-sum + re-truncation.

    Returns (keys, residual_counts, total_err).  Guarantee (mergeable-
    summaries bound): every key with true count > total_err <= n/(k+1)
    is in `keys`.  Pair with an exact recount of the candidate set to
    get EXACT top-m (m << k) — the two-pass pattern that keeps the
    shuffle at O(k) rows regardless of key cardinality."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if col.null_count:
            col = col.drop_null()
        enc = col.combine_chunks().dictionary_encode()
        counts = np.bincount(
            np.asarray(enc.indices), minlength=len(enc.dictionary))
        keys = np.asarray(enc.dictionary.cast(pa.int64()))
        ks, cs, err = mg_truncate(keys, counts.astype(np.int64), k)
        # the batch's subtracted error rides on one dedicated flagged row
        # (key stays all-int64: a null key would coerce the driver-side
        # pandas column to float64 and round large 64-bit hash keys)
        return pa.table({
            "key": pa.array(list(ks) + [0], pa.int64()),
            "cnt": pa.array(list(cs) + [0], pa.int64()),
            "err": pa.array([0] * len(ks) + [err], pa.int64()),
            "is_err_row": pa.array([False] * len(ks) + [True], pa.bool_()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return np.array([], np.int64), np.array([], np.int64), 0
    import pandas as pd

    df = pd.DataFrame(parts)
    total_err = int(df["err"].sum())
    df = df[~df["is_err_row"]]
    merged = df.groupby("key", sort=False)["cnt"].sum()
    keys = merged.index.to_numpy(np.int64)
    counts = merged.to_numpy(np.int64)
    ks, cs, err2 = mg_truncate(keys, counts, k)
    return ks, cs, total_err + err2


def hll_distinct(ds: "ray.data.Dataset", column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one sketch per batch, register
    merge of the partials (partials are 4 KiB each — the shuffle carries
    sketches, not rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_many(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = HyperLogLog(p)
    for r in parts:
        acc.merge(HyperLogLog.from_bytes(r["sketch"], p))
    return acc.estimate()


def exact_quantiles(ds: "ray.data.Dataset", col: str,
                    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.9, 0.99),
                    tie_cols: "tuple[str, ...]" = ()) -> "list[tuple[float, float]]":
    """EXACT distributed quantiles by global-rank selection — the exact
    counterpart of the mergeable KllSketch (error vs exact is reported by
    events_quantiles_sketch; this operator is the ground-truth path).

    Scale shape: ONE distributed sort (Ray's sample-based range
    partition), then per-block row counts (a few ints per block on the
    driver — never the data), then `split_at_indices` + `take(1)` per
    target rank, which reads only the first rows of the split boundary
    blocks.  Rank convention: zero-based rank floor(q * (n-1)) of the
    ascending order — the same element a single-process
    sorted(x)[floor(q*(n-1))] selects, SQL-expressible as a row_number
    filter.  Ties: ranked by `col` alone, so equal values make the
    selected VALUE deterministic regardless of tie order."""
    import math

    s = ds.sort(key=[col] + list(tie_cols)).materialize()
    counts = [r["c"] for r in s.map_batches(
        lambda t: pa.table({"c": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow", batch_size=None).take_all()]
    n = sum(counts)
    if n == 0:
        return [(q, float("nan")) for q in qs]
    ranks = [min(n - 1, math.floor(q * (n - 1))) for q in qs]
    # split_at_indices wants increasing indices; dedupe then map back
    uniq = sorted(set(ranks))
    parts = s.split_at_indices(uniq)
    val_at = {}
    for r, part in zip(uniq, parts[1:]):
        row = part.take(1)
        val_at[r] = float(row[0][col]) if row else float("nan")
    return [(q, val_at[r]) for q, r in zip(qs, ranks)]


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over uint64 key
    hashes: depth rows of width counters, point-frequency estimate =
    min over rows (never under-estimates; over-estimate <= e*n/width
    with probability 1 - e^-depth).  Mergeable: elementwise sum — the
    per-batch partial is a (depth x width) int64 grid, a few hundred
    KiB regardless of key cardinality."""

    def __init__(self, width: int = 2048, depth: int = 4,
                 table: "np.ndarray | None" = None) -> None:
        assert width & (width - 1) == 0, "width must be a power of two"
        self.width = width
        self.depth = depth
        self.table = (np.zeros((depth, width), np.int64)
                      if table is None else table)

    def _idx(self, h: np.ndarray, row: int) -> np.ndarray:
        h2 = _splitmix64(h) | np.uint64(1)
        return ((h + np.uint64(row) * h2)
                & np.uint64(self.width - 1)).astype(np.int64)

    def add_many(self, h: np.ndarray) -> None:
        h = np.asarray(h, np.uint64)
        for r in range(self.depth):
            np.add.at(self.table[r], self._idx(h, r), 1)

    def estimate_many(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, np.uint64)
        est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
        for r in range(self.depth):
            np.minimum(est, self.table[r][self._idx(h, r)], out=est)
        return est

    def merge(self, other: "CountMin") -> None:
        assert other.table.shape == self.table.shape
        self.table += other.table


def cm_frequencies(ds: "ray.data.Dataset", column: str,
                   probe_keys: np.ndarray, width: int = 2048,
                   depth: int = 4) -> "tuple[np.ndarray, int]":
    """Merged Count-Min estimates for probe_keys over ds[column] (int64
    keys hashed with splitmix64).  Returns (estimates, total_n)."""

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if col.null_count:
            col = col.drop_null()
        keys = np.asarray(col.cast(pa.int64()).combine_chunks(),
                          np.int64)
        cm = CountMin(width, depth)
        cm.add_many(_splitmix64(keys.view(np.uint64)))
        return pa.table({
            "tab": pa.array([cm.table.ravel().tolist()],
                            pa.list_(pa.int64(), width * depth)),
            "n": pa.array([len(keys)], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = CountMin(width, depth)
    total = 0
    for r in parts:
        acc.merge(CountMin(width, depth, np.asarray(
            r["tab"], np.int64).reshape(depth, width)))
        total += r["n"]
    probes = _splitmix64(np.asarray(probe_keys, np.int64).view(np.uint64))
    return acc.estimate_many(probes), total
