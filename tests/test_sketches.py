"""HyperLogLog: accuracy and merge semantics."""

import numpy as np

from aushape_ray.functions.sketches import HyperLogLog


def test_hll_accuracy():
    h = HyperLogLog(p=12)
    n = 100_000
    h.add_many([f"user-{i}" for i in range(n)])
    est = h.estimate()
    assert abs(est - n) / n < 0.05  # p=12 -> ~1.6% typical error


def test_hll_merge_equals_union():
    a, b, u = HyperLogLog(), HyperLogLog(), HyperLogLog()
    xs = [f"x{i}" for i in range(5000)]
    ys = [f"y{i}" for i in range(5000)] + xs[:1000]  # overlap
    a.add_many(xs)
    b.add_many(ys)
    u.add_many(xs + ys)
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)  # exact register equality


def test_hll_serialization_roundtrip():
    h = HyperLogLog()
    h.add_many(["a", "b", "c"])
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(h.registers, h2.registers)
    assert h.estimate() == h2.estimate()


def test_hll_small_range_correction():
    h = HyperLogLog()
    h.add_many(["only", "three", "values"])
    assert 2 <= h.estimate() <= 4
