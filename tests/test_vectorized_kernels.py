"""Parity tests: the vectorized text/dedup kernels must be value-identical
to their scalar reference recurrences (the round-1 implementations)."""

import hashlib
import random
import string

import numpy as np
import pyarrow as pa
import pytest

from aushape_ray.functions.dedup import (
    MAX_BUCKET_PAIRS_N,
    MinHasher,
    SimHasher,
    _make_pairs_in_partition,
    explode_bands,
)
from aushape_ray.functions.textops import fingerprint


def scalar_fingerprint(t: str, window: int = 8) -> int:
    """Round-1 scalar rolling-hash reference (textops.py history)."""
    B, M = 257, (1 << 61) - 1
    data = (t or "").encode("utf-8")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * B + b) % M
        return h
    pw = pow(B, window - 1, M)
    h = 0
    for b in data[:window]:
        h = (h * B + b) % M
    mn = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * pw) * B + data[i]) % M
        if h < mn:
            mn = h
    return mn


def scalar_simhash(text: str) -> int:
    """Scalar (pure-Python-int) reference for the vectorized SimHasher:
    ASCII-whitespace word runs over UTF-8 bytes, FNV-1a per word,
    splitmix64 chain per 3-gram, ±1 bit votes."""
    import re

    mask = (1 << 64) - 1

    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for x in b:
            h = ((h ^ x) * 0x100000001B3) & mask
        return h

    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & mask
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
        return x ^ (x >> 31)

    words = re.findall(rb"[^\t\n\x0b\x0c\r ]+", (text or "").encode("utf-8"))
    wh = [fnv(w) for w in words]
    acc = [0] * 64
    n_grams = max(0, len(words) - 2)
    for i in range(n_grams):
        g = mix(mix(mix(wh[i]) ^ wh[i + 1]) ^ wh[i + 2])
        for b in range(64):
            acc[b] += 1 if (g >> b) & 1 else -1
    if n_grams == 0:
        return 0
    v = sum(1 << b for b in range(64) if acc[b] > 0)
    return v - (1 << 64) if v >= (1 << 63) else v


EDGE_TEXTS = ["", "a", "short", "exactly8", "ünïcødé tëxt mït multibyte",
              "\x7f" * 20, "one two three four five", "x" * 4097]


def _random_texts(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + "     .,!?"
    return ["".join(rng.choices(alphabet, k=rng.randint(0, 2000)))
            for _ in range(n)]


class TestFingerprintParity:
    def test_matches_scalar_reference(self):
        texts = EDGE_TEXTS + _random_texts(150)
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())})
        got = fingerprint(batch).column("fingerprint").to_pylist()
        want = [scalar_fingerprint(t) for t in texts]
        assert got == want

    def test_odd_window(self):
        texts = EDGE_TEXTS + _random_texts(30, seed=7)
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())})
        got = fingerprint(batch, window=7).column("fingerprint").to_pylist()
        want = [scalar_fingerprint(t, window=7) for t in texts]
        assert got == want


class TestSimhashParity:
    def test_matches_scalar_reference(self):
        texts = EDGE_TEXTS + _random_texts(80, seed=3)
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())})
        got = SimHasher()(batch).column("simhash").to_pylist()
        want = [scalar_simhash(t) for t in texts]
        assert got == want

    def test_memo_is_consistent_across_batches(self):
        h = SimHasher()
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["alpha beta gamma delta"], pa.string())})
        first = h(t).column("simhash").to_pylist()
        second = h(t).column("simhash").to_pylist()
        assert first == second == [scalar_simhash("alpha beta gamma delta")]


class TestExplodeBands:
    def _sigs(self, texts):
        mh = MinHasher()
        return mh(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string())}))

    def test_bucket_equivalence(self):
        # docs with IDENTICAL text share every band hash; unrelated docs
        # share none (probabilistically certain at 62 bits)
        sigs = self._sigs(["the quick brown fox jumps over the lazy dog",
                           "the quick brown fox jumps over the lazy dog",
                           "entirely different content with other words"])
        bands = explode_bands(sigs)
        df = bands.to_pandas().pivot(index="band", columns="doc_id",
                                     values="band_hash")
        assert (df[0] == df[1]).all()
        assert not (df[0] == df[2]).any()

    def test_band_layout(self):
        sigs = self._sigs(["hello world document"])
        bands = explode_bands(sigs)
        assert bands.num_rows == 16
        assert bands.column("band").to_pylist() == list(range(16))
        assert all(h >= 0 for h in bands.column("band_hash").to_pylist())

    def test_empty_batch(self):
        sigs = self._sigs([])
        out = explode_bands(sigs)
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "band", "band_hash"]


class TestCandidatePairCap:
    @staticmethod
    def _bucket(ids):
        n = len(ids)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array([0] * n, pa.int32()),
                         "band_hash": pa.array([7] * n, pa.int64())})

    def test_small_bucket_all_pairs(self):
        out = _make_pairs_in_partition(MAX_BUCKET_PAIRS_N)(self._bucket([3, 1, 2]))
        pairs = set(zip(out.column("doc_a").to_pylist(),
                        out.column("doc_b").to_pylist()))
        assert pairs == {(1, 2), (1, 3), (2, 3)}

    def test_degenerate_bucket_is_linear(self):
        n = MAX_BUCKET_PAIRS_N + 500
        out = _make_pairs_in_partition(MAX_BUCKET_PAIRS_N)(
            self._bucket(list(range(n))))
        # star from the minimum id: O(n) pairs, connectivity preserved
        assert out.num_rows == n - 1
        assert set(out.column("doc_a").to_pylist()) == {0}
        assert out.column("doc_b").to_pylist() == list(range(1, n))


@pytest.mark.parametrize("n", [0, 1, 5])
def test_minhash_signature_shape(n):
    mh = MinHasher()
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array([f"doc number {i} text" for i in range(n)],
                                   pa.string())})
    out = mh(t)
    assert out.num_rows == n
    assert out.column("minhash").type == pa.list_(pa.int64(), 64)


class TestIntervalCountJoin:
    def test_counts_and_bucket_boundaries(self, ray_session):
        import ray.data

        from aushape_ray.functions.joins import interval_count_join

        # width 10; intervals crossing bucket boundaries, empty intervals,
        # and points exactly on lo (included) / hi (excluded)
        intervals = pa.table({
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "lo": pa.array([5, 18, 100, 30], pa.int64()),
            "hi": pa.array([15, 22, 110, 40], pa.int64()),
        })
        points = pa.table({
            "v": pa.array([5, 9, 10, 14, 15, 18, 21, 22, 39], pa.int64()),
        })
        out = interval_count_join(
            ray.data.from_arrow(intervals), ray.data.from_arrow(points),
            width=10, id_col="id", out_col="n").take_all()
        got = {r["id"]: r["n"] for r in out}
        # brute force truth
        iv = intervals.to_pydict()
        pv = points.column("v").to_pylist()
        want = {i: sum(1 for v in pv if lo <= v < hi)
                for i, lo, hi in zip(iv["id"], iv["lo"], iv["hi"])}
        assert got == want
        assert got[3] == 0  # empty interval still present

    def test_interval_longer_than_width_raises(self, ray_session):
        import ray.data

        from aushape_ray.functions.joins import interval_count_join

        iv = pa.table({"id": pa.array([1], pa.int64()),
                       "lo": pa.array([0], pa.int64()),
                       "hi": pa.array([25], pa.int64())})
        pt = pa.table({"v": pa.array([1], pa.int64())})
        with pytest.raises(Exception, match="exceeds bucket width"):
            interval_count_join(ray.data.from_arrow(iv),
                                ray.data.from_arrow(pt), width=10,
                                id_col="id", out_col="n").take_all()

    @pytest.mark.parametrize("seed,W", [(17, 1000), (23, 137), (5, 7919)])
    def test_matches_bruteforce_random(self, ray_session, seed, W):
        import numpy as np

        import ray.data

        from aushape_ray.functions.joins import interval_count_join

        rng = np.random.default_rng(seed)
        n_iv, n_pt = 300, 5000
        lo = rng.integers(0, 50_000, n_iv)
        hi = lo + rng.integers(1, W, n_iv)  # bounded intervals
        v = rng.integers(0, 50_000, n_pt)
        out = interval_count_join(
            ray.data.from_arrow(pa.table({
                "id": pa.array(range(n_iv), pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64())})),
            ray.data.from_arrow(pa.table({"v": pa.array(v, pa.int64())})),
            width=W, id_col="id", out_col="n").take_all()
        got = {r["id"]: r["n"] for r in out}
        sv = np.sort(v)
        want = {i: int(np.searchsorted(sv, hi[i]) - np.searchsorted(sv, lo[i]))
                for i in range(n_iv)}
        assert got == want


def test_pairs_partition_exact_vs_star_modes():
    from aushape_ray.functions.dedup import _make_pairs_in_partition

    n = 600
    g = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "band": pa.array([0] * n, pa.int32()),
                  "band_hash": pa.array([7] * n, pa.int64())})
    exact = _make_pairs_in_partition(None)(g)
    assert exact.num_rows == n * (n - 1) // 2
    star = _make_pairs_in_partition(512)(g)
    assert star.num_rows == n - 1
    assert set(star.column("doc_a").to_pylist()) == {0}


def test_fingerprint_large_window_matches_scalar():
    """window > 14 exercises the periodic accumulator fold (uint64 would
    wrap without it)."""
    from aushape_ray.functions.textops import fingerprint

    texts = ["\xff" * 200, "high bytes \xf0\xee\xdd " * 30, "x" * 64]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    for w in (16, 32, 33):
        got = fingerprint(batch, window=w).column("fingerprint").to_pylist()
        want = [scalar_fingerprint(t, window=w) for t in texts]
        assert got == want, f"window={w}"


def test_simhash_pairs_matches_bruteforce(ray_session):
    """Banded simhash pair discovery must equal the brute-force set of
    pairs with Hamming distance <= 3 (pigeonhole: 4x16-bit bands give
    total recall at that radius)."""
    import ray.data

    from aushape_ray.functions.dedup import SimHasher, simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the wide open field all day long")
    texts = [base, base, base + " extra", base.replace("lazy", "busy"),
             "entirely different words about data processing engines",
             "another unrelated document talking about file systems",
             base.replace("quick", "swift").replace("dog", "cat")]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_pairs(ray.data.from_arrow(t)).take_all()}

    sh = SimHasher()
    sigs = [sh.simhash(x) for x in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ham = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want[(i, j)] = ham
    assert got == want
    assert want, "fixture must contain at least one near-dup pair"
