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


def test_cluster_pairs_connected_components(ray_session):
    """Min-label propagation finds the exact components, including a
    chain that needs multiple rounds."""
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.dedup import cluster_pairs

    # components: {1,2,3,4 chained}, {10,11}, singleton edges none
    pairs = pa.table({
        "doc_a": pa.array([1, 2, 3, 10], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 11], pa.int64()),
    })
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # both the single-task union-find fast path and the iterative
    # distributed propagation must produce the identical labeling
    for thr in (1_000_000, 0):
        out = cluster_pairs(ray.data.from_arrow(pairs),
                            small_threshold=thr).take_all()
        assert {r["doc_id"]: r["cluster_id"] for r in out} == want, thr


def test_cluster_pairs_long_chain_converges(ray_session):
    """A 15-node chain (diameter 14) must converge to ONE component
    (3rd review: fixed-iteration cap silently returned a broken
    partition)."""
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.dedup import cluster_pairs

    n = 15
    pairs = pa.table({
        "doc_a": pa.array(list(range(n - 1)), pa.int64()),
        "doc_b": pa.array(list(range(1, n)), pa.int64()),
    })
    for thr in (1_000_000, 0):
        out = cluster_pairs(ray.data.from_arrow(pairs),
                            small_threshold=thr).take_all()
        assert {r["doc_id"]: r["cluster_id"] for r in out} == \
            {i: 0 for i in range(n)}, thr


def test_cluster_pairs_10k_edges_distributed(ray_session):
    """Larger random graph: the distributed (edges-join-labels +
    pointer-jumping) propagation must match a union-find ground truth."""
    import random

    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.dedup import cluster_pairs

    rng = random.Random(123)
    n_nodes, n_edges = 3000, 10_000
    ea = [rng.randrange(n_nodes) for _ in range(n_edges)]
    eb = [rng.randrange(n_nodes) for _ in range(n_edges)]
    pairs = pa.table({"doc_a": pa.array(ea, pa.int64()),
                      "doc_b": pa.array(eb, pa.int64())})

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ea, eb):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in zip(ea, eb):
        for x in (a, b):
            truth[x] = find(x)

    # force the ITERATIVE distributed path (the point of this test)
    out = cluster_pairs(ray.data.from_arrow(pairs),
                        small_threshold=0).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == truth


class TestKllSketch:
    def test_quantile_accuracy(self):
        import numpy as np

        from aushape_ray.functions.sketches import KllSketch

        rng = np.random.default_rng(5)
        data = rng.integers(0, 1_000_000, 200_000)
        s = KllSketch(k=256)
        for chunk in np.array_split(data, 37):
            s.add_many(chunk)
        srt = np.sort(data)
        for q in (0.1, 0.5, 0.95, 0.99):
            est = s.quantile(q)
            rank = np.searchsorted(srt, est, side="right") / len(srt)
            assert abs(rank - q) < 0.02, (q, rank)

    def test_merge_matches_single_sketch_error(self):
        import numpy as np

        from aushape_ray.functions.sketches import KllSketch

        rng = np.random.default_rng(11)
        data = rng.integers(0, 100_000, 100_000)
        parts = []
        for chunk in np.array_split(data, 16):
            p = KllSketch(k=256)
            p.add_many(chunk)
            parts.append(KllSketch.from_bytes(p.to_bytes()))
        acc = KllSketch(k=256)
        for p in parts:
            acc.merge(p)
        assert acc.n == len(data)
        srt = np.sort(data)
        for q in (0.5, 0.95):
            rank = np.searchsorted(srt, acc.quantile(q), side="right") / len(srt)
            assert abs(rank - q) < 0.03, (q, rank)

    def test_small_exact(self):
        from aushape_ray.functions.sketches import KllSketch

        s = KllSketch()
        s.add_many([5, 1, 9, 3, 7])
        # below capacity nothing is compacted: quantiles are exact
        assert s.quantile(0.5) == 5
        assert s.quantile(1.0) == 9

    def test_empty_raises(self):
        import pytest

        from aushape_ray.functions.sketches import KllSketch

        with pytest.raises(ValueError):
            KllSketch().quantile(0.5)


def test_kmeans_recovers_separated_blobs(ray_session):
    """Distributed Lloyd's iterations must recover well-separated blobs
    exactly (sizes and near-zero within-blob inertia)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.ann import kmeans_fit

    rng = np.random.default_rng(3)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    vecs, ids = [], []
    for ci, c in enumerate(centers):
        for j in range(40):
            vecs.append(c + rng.normal(0, 0.05, 3))
            ids.append(ci + 3 * j)  # vec_ids 0,1,2 = one seed per blob
    order = np.argsort(ids)
    t = pa.table({
        "vec_id": pa.array(np.asarray(ids)[order], pa.int64()),
        "embedding": pa.array([vecs[i].tolist() for i in order],
                              pa.list_(pa.float64(), 3)),
    })
    cents, sizes, inertia, rounds = kmeans_fit(
        ray.data.from_arrow(t), k=3, iters=10)
    assert sorted(sizes.tolist()) == [40, 40, 40]
    assert inertia < 40 * 3 * 3 * 0.05 ** 2 * 10  # tight within-blob error
    # each fitted centroid is near one true center
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=1)) < 0.2


class TestHeavyHitters:
    def test_mg_truncate_bound(self):
        """MG truncation keeps every key with count > subtracted and the
        residuals under-estimate by at most the returned decrement."""
        import numpy as np

        from aushape_ray.functions.sketches import mg_truncate

        rng = np.random.default_rng(5)
        keys = np.arange(500, dtype=np.int64)
        counts = rng.integers(1, 100, 500).astype(np.int64)
        ks, cs, err = mg_truncate(keys, counts, k=64)
        assert len(ks) <= 64
        true = dict(zip(keys.tolist(), counts.tolist()))
        for key, c in zip(ks.tolist(), cs.tolist()):
            assert 0 < c <= true[key] <= c + err
        # every key above the decrement survives
        for key, c in true.items():
            if c > err:
                assert key in set(ks.tolist())

    def test_heavy_hitters_candidates_contain_top(self, ray_session):
        """Merged summaries over a skewed stream retain the true top keys
        (the n/(k+1) mergeable-summaries guarantee)."""
        import numpy as np
        import pyarrow as pa

        import ray.data

        from aushape_ray.functions.sketches import heavy_hitters

        rng = np.random.default_rng(11)
        # 20 hot keys (~500 each) on a 5000-key uniform background
        hot = np.repeat(np.arange(20), 500)
        cold = rng.integers(100, 5100, 30_000)
        vals = np.concatenate([hot, cold])
        rng.shuffle(vals)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(vals, pa.int64())})).repartition(8)
        keys, residuals, err = heavy_hitters(ds, "k", k=1024)
        assert err <= len(vals) // 1024 + 1024  # loose sanity on the bound
        got = set(keys.tolist())
        for h in range(20):
            assert h in got
        # residual + err brackets the true count for the hot keys
        res = dict(zip(keys.tolist(), residuals.tolist()))
        for h in range(20):
            true_c = 500 + int((cold == h).sum())
            assert res[h] <= true_c <= res[h] + err


class TestBloom:
    def test_no_false_negatives_and_fp_rate(self):
        import numpy as np

        from aushape_ray.functions.sketches import BloomFilter

        rng = np.random.default_rng(7)
        added = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
        other = rng.integers(0, 2**63, 20000, dtype=np.int64).astype(np.uint64)
        other = other[~np.isin(other, added)]
        bf = BloomFilter(m_bits=1 << 17, n_probes=6)
        bf.add_many(added)
        assert bf.contains_many(added).all()  # no false negatives, ever
        fp = bf.contains_many(other).mean()
        # k=6, n=5000, m=131072: (1-e^{-kn/m})^k ~ 2.4e-4; allow 10x slack
        assert fp < 0.005

    def test_bloom_decontaminate_matches_exact_scan(self, ray_session):
        """Bloom prefilter + exact verify == plain exact scan, including
        a high-collision-pressure filter (tiny m_bits forces false
        positives through to the verify stage)."""
        import numpy as np
        import pyarrow as pa

        import ray.data

        from aushape_ray.functions.textops import decontaminate_bloom

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(50)]
        texts = [" ".join(rng.choice(vocab, rng.integers(8, 60)))
                 for _ in range(300)]
        # plant needle occurrences mid-document
        needles = [" ".join(rng.choice(vocab, 8)) for _ in range(40)]
        for i in range(0, 300, 7):
            nd = needles[i % len(needles)]
            toks = texts[i].split(" ")
            pos = int(rng.integers(0, len(toks)))
            texts[i] = " ".join(toks[:pos] + nd.split(" ") + toks[pos:])
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(4)
        got = decontaminate_bloom(docs, sorted(set(needles)), n=8,
                                  m_bits=1 << 10).to_pandas()
        got = got.sort_values("doc_id", ignore_index=True)
        # exact reference scan
        exp_ids, exp_hits = [], []
        for i, t in enumerate(texts):
            h = sum(f" {nd} " in f" {t} " for nd in sorted(set(needles)))
            if h:
                exp_ids.append(i)
                exp_hits.append(h)
        assert got["doc_id"].tolist() == exp_ids
        assert got["n_hits"].tolist() == exp_hits
        assert len(exp_ids) > 20  # the planted hits were actually found


def test_pq_adc_finds_planted_neighbors(ray_session):
    """PQ encode + ADC scan must rank a query's own cluster first on
    well-separated blobs (quantization noise << blob separation), and
    codes must be m_sub bytes."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.ann import pq_adc_topk, pq_encode, pq_fit

    rng = np.random.default_rng(21)
    dim, per = 32, 25
    centers = rng.normal(0, 1, (8, dim)) * 5
    vecs, ids = [], []
    vid = 0
    for c in centers:
        for _ in range(per):
            vecs.append(c + rng.normal(0, 0.05, dim))
            ids.append(vid)
            vid += 1
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64(), dim)),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    cb = pq_fit(ds, m_sub=8, k=16)
    assert cb.shape == (8, 16, 4)
    codes = pq_encode(ds, cb)
    first = codes.take(1)[0]
    assert len(first["codes"]) == 8
    # queries: the first vector of each blob; its true neighbors are the
    # rest of its blob
    qv = {int(b * per): np.asarray(vecs[b * per]) for b in range(8)}
    top = pq_adc_topk(codes, cb, qv, k=10).to_pylist()
    assert len(top) == 80
    ok = sum(1 for r in top
             if r["neighbor_id"] // per == r["query_id"] // per)
    assert ok >= 72  # >=90% of retrieved neighbors from the right blob


def test_count_min_invariants(ray_session):
    """CM never under-estimates; merged estimates stay within the
    e*n/width bound; merge == single-stream."""
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.sketches import CountMin, _splitmix64, cm_frequencies

    rng = np.random.default_rng(23)
    vals = np.concatenate([np.repeat(np.arange(10), 300),
                           rng.integers(100, 3000, 20000)]).astype(np.int64)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(vals, pa.int64())})).repartition(8)
    probes = np.arange(10, dtype=np.int64)
    est, total = cm_frequencies(ds, "k", probes, width=2048, depth=4)
    assert total == len(vals)
    bound = math.ceil(math.e * total / 2048)
    for i in range(10):
        exact = 300 + int((vals == i).sum()) - 300 + 300  # = count of i
        exact = int((vals == i).sum())
        assert exact <= est[i] <= exact + bound
    # merge parity: one sketch over the whole stream gives the same table
    one = CountMin(2048, 4)
    one.add_many(_splitmix64(vals.view(np.uint64)))
    np.testing.assert_array_equal(
        one.estimate_many(_splitmix64(probes.view(np.uint64))), est)


class TestOnlineDedup:
    def test_two_wave_incremental(self, ray_session):
        """The SAME index across two ingestion waves: wave 2 re-sends
        wave-1 content and must come back all-duplicate."""
        import numpy as np
        import pyarrow as pa

        import ray.data

        from aushape_ray.state.dedup_index import OnlineDeduper

        texts = [f"document number {i} body" for i in range(200)]
        t1 = pa.table({
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(texts, pa.string())})
        dedup = OnlineDeduper(n_shards=4)
        w1 = ray.data.from_arrow(t1).repartition(4).map_batches(
            dedup, batch_format="pyarrow").to_pandas()
        assert w1["is_first"].sum() == 200  # all new
        # wave 2: half repeats, half new
        t2 = pa.table({
            "doc_id": pa.array(range(200, 400), pa.int64()),
            "text": pa.array(texts[:100]
                             + [f"fresh {i}" for i in range(100)],
                             pa.string())})
        w2 = ray.data.from_arrow(t2).repartition(4).map_batches(
            dedup, batch_format="pyarrow").to_pandas()
        seen = dict(zip(w2["doc_id"], w2["is_first"]))
        assert all(not seen[i] for i in range(200, 300))   # repeats
        assert all(seen[i] for i in range(300, 400))       # fresh
        assert dedup.index_size() == 300

    def test_stats_order_independent(self, ray_session):
        import numpy as np
        import pyarrow as pa

        import ray.data

        from aushape_ray.state.dedup_index import online_dedup_stats

        rng = np.random.default_rng(31)
        base = [f"text {i}" for i in range(50)]
        picks = rng.integers(0, 50, 400)
        t = pa.table({
            "doc_id": pa.array(range(400), pa.int64()),
            "text": pa.array([base[p] for p in picks], pa.string())})
        out = online_dedup_stats(
            ray.data.from_arrow(t).repartition(8)).to_pylist()[0]
        n_distinct = len(set(picks.tolist()))
        assert out == {"n_docs": 400, "n_first": n_distinct,
                       "n_dup": 400 - n_distinct}
