"""Distributed PageRank vs single-process power iteration: exact node
set, rank parity to 1e-9, mass conservation, and convergence residual."""

import numpy as np
import pyarrow as pa


def _local_pagerank(pairs, damping=0.85, iters=20):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in pairs:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in pairs:
            contrib[idx[b]] += r[idx[a]] / deg[idx[a]]
            contrib[idx[a]] += r[idx[b]] / deg[idx[b]]
        r = (1 - damping) / n + damping * contrib
    return {v: r[idx[v]] for v in nodes}


def _pair_graph(seed=7, n=120, extra=150):
    rng = np.random.default_rng(seed)
    pairs = set()
    # a chain (long diameter) + random chords + a star (hub skew)
    for i in range(40):
        pairs.add((i, i + 1))
    for _ in range(extra):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    for i in range(100, 110):
        pairs.add((50, i) if 50 < i else (i, 50))
    return sorted(pairs)


def test_pagerank_matches_local(ray_session):
    import ray.data

    from aushape_ray.functions.graph import pagerank

    pairs = _pair_graph()
    want = _local_pagerank(pairs)

    t = pa.table({
        "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
        "doc_b": pa.array([b for _, b in pairs], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    out, n_nodes, residual = pagerank(ds, iters=20, n_buckets=4,
                                      small_threshold=0)
    got = {r["node"]: r["rank"] for r in out.take_all()}

    assert set(got) == set(want)
    assert n_nodes == len(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    assert residual < 1e-3  # converged by iteration 20
    # the star hub must outrank chain interior nodes
    assert got[50] == max(got.values())


def test_pagerank_empty(ray_session):
    import ray.data

    from aushape_ray.functions.graph import pagerank

    t = pa.table({"doc_a": pa.array([], pa.int64()),
                  "doc_b": pa.array([], pa.int64())})
    out, n_nodes, residual = pagerank(ray.data.from_arrow(t), iters=3,
                                      n_buckets=2)
    assert n_nodes == 0
    assert out.count() == 0


def test_pagerank_fast_path_matches_distributed(ray_session):
    import ray.data

    from aushape_ray.functions.graph import pagerank

    pairs = _pair_graph(seed=11)
    t = pa.table({
        "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
        "doc_b": pa.array([b for _, b in pairs], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    fast, n1, r1 = pagerank(ds, iters=15)            # fast path
    slow, n2, r2 = pagerank(ds, iters=15, n_buckets=4,
                            small_threshold=0)       # distributed path
    gf = {r["node"]: r["rank"] for r in fast.take_all()}
    gs = {r["node"]: r["rank"] for r in slow.take_all()}
    assert n1 == n2 and set(gf) == set(gs)
    for v in gf:
        assert abs(gf[v] - gs[v]) < 1e-9
    assert abs(r1 - r2) < 1e-9


def test_dedup_central_is_cluster_transversal(ray_session):
    """doc_dedup_central keeps EXACTLY one member per duplicate cluster
    (a valid dedup transversal), same survivor COUNT as min-id dedup,
    and the kept member is the cluster's max-PageRank node."""
    from aushape_ray.functions.dedup import cluster_pairs
    from aushape_ray.functions.graph import pagerank
    from aushape_ray.pipelines.queries import (q_doc_dedup_central,
                                               q_doc_minhash_pairs)

    SF = "/root/testdata/sf0.001"
    survivors = {r["doc_id"] for r in q_doc_dedup_central(SF).take_all()}

    pairs = q_doc_minhash_pairs(SF).materialize()
    clus = {r["doc_id"]: r["cluster_id"]
            for r in cluster_pairs(pairs).take_all()}
    ranks_ds, _, _ = pagerank(pairs, iters=20)
    rank = {r["node"]: r["rank"] for r in ranks_ds.take_all()}

    import collections
    by_cluster = collections.defaultdict(list)
    for node, c in clus.items():
        by_cluster[c].append(node)
    n_docs = 100  # sf0.001 documents table size
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows

    # every clustered node not kept is a victim; unclustered docs survive
    expect_survivors = n_docs - (len(clus) - len(by_cluster))
    assert len(survivors) == expect_survivors
    for c, members in by_cluster.items():
        kept = [m for m in members if m in survivors]
        assert len(kept) == 1, c
        best = max(members, key=lambda m: (rank[m], -m))
        assert kept[0] == best, c
