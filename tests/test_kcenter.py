"""Greedy k-center coreset selection: distributed picks vs the scalar
numpy greedy reference, plus monotonicity/determinism properties."""

import numpy as np


def scalar_kcenter(ids, mat, k):
    """Plain-numpy greedy farthest-point reference: seed = min id, then
    argmax of min-distance with smaller-id tie-break (same rule as the
    distributed path)."""
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    seed = int(order[0])
    picks = [int(ids[seed])]
    radii = [None]
    centers = [seed]
    for _ in range(1, k):
        best = np.max(mat[centers] @ mat.T, axis=0)  # nearest-center sim
        j = int(np.lexsort((ids, best))[0])          # min sim, min id
        picks.append(int(ids[j]))
        radii.append(float(np.sqrt(max(0.0, 2.0 - 2.0 * best[j]))))
        centers.append(j)
    return picks, radii


def _data(n=64, d=8, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n * 3)[:n].astype(np.int64)
    mat = rng.normal(size=(n, d))
    return ids, mat


def test_matches_scalar_reference(ray_session):
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.ann import kcenter_select

    ids, mat = _data()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": ids, "embedding": [row.tolist() for row in mat],
    })).repartition(5)
    got = kcenter_select(ds, k=6)
    want_ids, want_radii = scalar_kcenter(ids, mat, 6)
    assert [p["vec_id"] for p in got] == want_ids
    got_radii = [p["radius"] for p in got]
    assert got_radii[0] is None
    assert np.allclose(got_radii[1:], want_radii[1:], rtol=1e-9)


def test_radius_monotone_and_deterministic(ray_session):
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.ann import kcenter_select

    ids, mat = _data(n=80, seed=11)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": ids, "embedding": [row.tolist() for row in mat],
    })).repartition(7)
    a = kcenter_select(ds, k=5)
    b = kcenter_select(ds, k=5)
    assert a == b  # deterministic across runs
    r = [p["radius"] for p in a][1:]
    assert all(x >= y - 1e-12 for x, y in zip(r, r[1:]))  # non-increasing
    assert len({p["vec_id"] for p in a}) == 5  # picks are distinct


def test_query_shape(ray_session):
    from aushape_ray.pipelines.queries import q_emb_kcenter_select

    t = q_emb_kcenter_select("/root/testdata/sf0.001")
    assert t.column_names == ["pick", "vec_id", "radius"]
    assert t.num_rows == 8
    r = t.column("radius").to_pylist()
    assert r[0] is None and all(x > 0 for x in r[1:])
