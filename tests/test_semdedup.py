"""SemDeDup (k-means-bucketed semantic dedup) invariants vs the exact
brute-force chain: precision is exact (every victim has a genuine
>= threshold partner), keep-min semantics hold (the global min id of any
duplicate component always survives), multi-probe only grows the victim
set, and multi-probe output carries no duplicate rows."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(n: int = 120, dim: int = 8, seed: int = 9):
    """Tight duplicate clusters + noise; ids 0..n-1 (kmeans_fit's
    deterministic init needs vec_ids 0..k-1 present)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(6, dim))
    which = rng.integers(0, 6, n)
    vecs = centers[which] + rng.normal(scale=0.03, size=(n, dim))
    noise = rng.normal(size=(n // 2, dim))
    all_vecs = np.vstack([vecs, noise])
    return all_vecs


def _exact_victims(vecs: np.ndarray, threshold: float) -> set:
    """Brute-force reference: connected components of the >= threshold
    pair graph, keep the min id of each component."""
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    n = len(vecs)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    r, c = np.nonzero(sims >= threshold)
    for i, j in zip(r, c):
        if i < j:
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    return {i for i in range(n) if find(i) != i}


def _pair_partners(vecs: np.ndarray, threshold: float) -> set:
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    r, c = np.nonzero(sims >= threshold)
    return {int(i) for i, j in zip(r, c) if i != j}


def _run(vecs: np.ndarray, threshold: float, **kw) -> list:
    import ray.data

    from aushape_ray.functions.ann import semdedup_victims

    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(list(vecs),
                              pa.list_(pa.float64(), vecs.shape[1])),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    return [int(r["vec_id"]) for r in
            semdedup_victims(ds, threshold, **kw).take_all()]


THRESH = 0.97


def test_semdedup_precision_and_keepmin(ray_session):
    vecs = _corpus()
    exact = _exact_victims(vecs, THRESH)
    assert len(exact) > 30  # the corpus must contain real duplicate mass
    partnered = _pair_partners(vecs, THRESH)
    got = _run(vecs, THRESH, k=4, iters=4, probes=1)
    # precision: every victim genuinely has a >= threshold partner
    assert set(got) <= partnered
    # keep-min: the global min of each duplicate component never removed
    comp_min = set(range(len(vecs))) - exact - (set(range(len(vecs)))
                                                - partnered)
    assert not (set(got) & comp_min)


def test_semdedup_multiprobe_grows_victims_and_recall(ray_session):
    vecs = _corpus()
    exact = _exact_victims(vecs, THRESH)
    v1 = set(_run(vecs, THRESH, k=6, iters=4, probes=1))
    v2 = set(_run(vecs, THRESH, k=6, iters=4, probes=2))
    # multi-probe cell contents are supersets of single-probe cells, so
    # the edge set (and hence the victim set) only grows
    assert v1 <= v2
    assert v2 <= exact  # still precision-exact under union
    # and recall is meaningfully recovered (measured ~>=80% on corpora
    # like this; assert a conservative floor)
    assert len(v2) >= 0.6 * len(exact)


def test_semdedup_multiprobe_output_distinct(ray_session):
    vecs = _corpus()
    got = _run(vecs, THRESH, k=4, iters=4, probes=3)
    assert len(got) == len(set(got))


def test_semdedup_query_metrics_shape(ray_session):
    from aushape_ray.pipelines.queries import q_emb_semdedup

    t = q_emb_semdedup("/root/testdata/sf0.001")
    d = t.to_pydict()
    assert t.num_rows == 1
    assert d["victim_hits"][0] == d["n_victims_sem"][0]  # precision 100%
    assert 0 <= d["victim_recall_pct"][0] <= 100
    assert d["n_victims_sem"][0] <= d["n_victims_exact"][0]
