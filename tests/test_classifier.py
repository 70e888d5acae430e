"""Distributed logistic regression (model-based quality filter):
single-process Newton parity, featurize label rule, and end-to-end
learnability on the documents table."""

import numpy as np
import pyarrow as pa


def _docs_table(n: int = 300, seed: int = 3) -> pa.Table:
    """Synthetic docs: half wordy clean prose (label 1 under the
    heuristic), half short/digit-heavy junk (label 0)."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        if i % 2 == 0:
            k = int(rng.integers(25, 60))
            texts.append(" ".join(
                rng.choice(["the", "quick", "brown", "fox", "jumps",
                            "over", "lazy", "dogs", "while", "some"], k)))
        else:
            k = int(rng.integers(1, 12))
            texts.append(" ".join(
                str(rng.integers(0, 10 ** 6)) for _ in range(k)))
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _local_newton(x, y, iters=8, l2=1e-4):
    """Single-process reference with the same damped-Newton math."""
    n, d = x.shape
    w = np.zeros(d)
    hist = []
    for _ in range(iters):
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        loss = (np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0)
                - z * y).sum() / n
        acc = float(((p >= 0.5) == (y >= 0.5)).mean())
        hist.append((loss, acc))
        g = x.T @ (p - y) / n
        h = ((x.T * (p * (1 - p))) @ x) / n
        w = w - np.linalg.solve(h + (l2 + 1e-6) * np.eye(d), g + l2 * w)
    return w, hist


def test_featurize_label_rule(ray_session):
    from aushape_ray.functions.classifier import featurize

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            " ".join(["word"] * 30),          # wordy, no digits -> 1
            "1 2 3 4 5",                       # digit-heavy, short -> 0
            None,                              # null -> 0
        ]),
    })
    out = featurize(t).to_pydict()
    assert out["label"] == [1, 0, 0]
    # bias column is constant 1
    assert all(f[-1] == 1.0 for f in out["f"])


def test_logreg_matches_local_newton(ray_session):
    import ray.data

    from aushape_ray.functions.classifier import featurize, logreg_fit

    t = _docs_table()
    ds = ray.data.from_arrow(t).repartition(5)
    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    w, mean, std, hist = logreg_fit(feats, iters=6)

    f_local = featurize(t)
    x = np.stack(f_local.column("f").to_numpy(zero_copy_only=False))
    y = f_local.column("label").to_numpy().astype(np.float64)
    mean_l = x.mean(axis=0)
    std_l = np.sqrt(np.maximum((x * x).mean(axis=0) - mean_l ** 2, 1e-12))
    mean_l[-1], std_l[-1] = 0.0, 1.0
    w_l, hist_l = _local_newton((x - mean_l) / std_l, y, iters=6)

    assert np.allclose(mean, mean_l, rtol=1e-9)
    assert np.allclose(std, std_l, rtol=1e-9)
    # float summation order differs (sorted per-batch partials vs one
    # matrix sum) so demand closeness, not bit equality
    assert np.allclose(w, w_l, rtol=1e-5, atol=1e-7)
    assert abs(hist[-1][0] - hist_l[-1][0]) < 1e-6
    assert hist[-1][1] == hist_l[-1][1]


def test_quality_model_query_learns(ray_session):
    from aushape_ray.pipelines.queries import q_doc_quality_model

    d = q_doc_quality_model("/root/testdata/sf0.001").to_pydict()
    assert d["n_train"][0] + d["n_holdout"][0] > 0
    assert d["train_acc_bp"][0] >= 9000
    assert d["holdout_acc_bp"][0] >= 8500
