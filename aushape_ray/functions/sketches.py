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
