"""Model-based quality filtering: a distributed-trained logistic
regression over cheap text statistics.

This is the fastText/CCNet-style bootstrap loop real corpus pipelines
use: label documents with a heuristic rule (or a trusted reference
corpus), train a tiny linear model on vectorized features, then apply
the model corpus-wide as a stateless scoring pass.  At 100 TB the
training loop's exchange is ONE tiny partial row per batch per
iteration (gradient vector + loss + counts — (d+4) floats), the model
itself is d+1 floats broadcast with ray.put, and the apply pass is a
pure map_batches matmul; nothing scales with corpus size except the
embarrassingly-parallel feature pass.

Determinism: partial rows carry the minimum doc_id of their batch and
the driver sums them in that sorted order, so float accumulation order
is fixed across runs regardless of task completion order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textops import BPE_REGEX, _PUNCT_CLASS  # shared RE2 kernels

N_FEATURES = 6  # 5 stats + bias


def featurize(batch: pa.Table) -> pa.Table:
    """(doc_id, f list<float64,6>, label int8) — all Arrow RE2 counts,
    no Python loop.  Label = the heuristic quality rule the model is
    trained to mimic (wordy + low-digit + bounded length), computed
    from signals DISJOINT from the stopword feature the rule's
    deployment target cares about."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy().astype(
        np.float64)
    n_tok = pc.count_substring_regex(text, r"\S+").cast(
        pa.int64()).to_numpy().astype(np.float64)
    n_bpe = pc.count_substring_regex(text, BPE_REGEX).cast(
        pa.int64()).to_numpy().astype(np.float64)
    n_up = pc.count_substring_regex(text, r"[A-Z]").cast(
        pa.int64()).to_numpy().astype(np.float64)
    n_dig = pc.count_substring_regex(text, r"[0-9]").cast(
        pa.int64()).to_numpy().astype(np.float64)
    n_pun = pc.count_substring_regex(text, _PUNCT_CLASS).cast(
        pa.int64()).to_numpy().astype(np.float64)
    denom_t = np.maximum(n_tok, 1.0)
    denom_c = np.maximum(n_chars, 1.0)
    feats = np.stack([
        np.log1p(n_tok),
        n_chars / denom_t,          # mean token length
        n_up / denom_c,
        n_dig / denom_c,
        n_pun / denom_c,
        np.ones_like(n_tok),        # bias
    ], axis=1)
    # heuristic label: >= 20 tokens, digit ratio < 5%, < 8192 chars
    label = ((n_tok >= 20) & (n_dig * 20 < n_chars) & (n_chars < 8192))
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "f": pa.array(list(feats), pa.list_(pa.float64(), N_FEATURES)),
        "label": pa.array(label.astype(np.int8), pa.int8()),
    })


def _moment_partials(batch: pa.Table) -> pa.Table:
    m = np.stack(batch.column("f").to_numpy(zero_copy_only=False))
    return pa.table({
        "key": pa.array([int(pc.min(batch.column("doc_id")).as_py())],
                        pa.int64()),
        "n": pa.array([len(m)], pa.int64()),
        "s": pa.array([m.sum(axis=0).tolist()],
                      pa.list_(pa.float64(), N_FEATURES)),
        "s2": pa.array([(m * m).sum(axis=0).tolist()],
                       pa.list_(pa.float64(), N_FEATURES)),
    })


def _sorted_rows(rows: list) -> list:
    return sorted(rows, key=lambda r: r["key"])


def logreg_fit(feats: "ray.data.Dataset", iters: int = 8,
               l2: float = 1e-4):
    """Full-batch damped Newton (IRLS).  Each iteration exchanges ONE
    tiny partial row per batch — gradient (d floats) + Hessian (d*d
    floats, d=6) + loss/count — so 5-8 rounds converge where plain
    gradient descent needs 40+, and per-round Ray fixed cost dominates
    at any corpus size (the matmul work is embarrassingly parallel).
    feats must be the featurize() output and SHOULD be materialized by
    the caller (the loop re-reads it every iteration).  Returns
    (w, mean, std, history) where history is [(loss, acc)] per
    iteration — loss/acc of the weights BEFORE each step, so
    history[-1] is the returned model's training fit."""
    rows = _sorted_rows(feats.map_batches(
        _moment_partials, batch_format="pyarrow").take_all())
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    s2 = np.sum([np.asarray(r["s2"]) for r in rows], axis=0)
    mean = s / n
    std = np.sqrt(np.maximum(s2 / n - mean * mean, 1e-12))
    mean[-1], std[-1] = 0.0, 1.0  # never scale the bias column
    norm_ref = ray.put({"mean": mean, "std": std})

    w = np.zeros(N_FEATURES)
    history = []
    for _ in range(iters):
        wref = ray.put(w)

        def grad_partial(batch: pa.Table) -> pa.Table:
            p = ray.get(norm_ref)
            wv = ray.get(wref)
            m = np.stack(batch.column("f").to_numpy(zero_copy_only=False))
            x = (m - p["mean"]) / p["std"]
            y = batch.column("label").to_numpy().astype(np.float64)
            z = x @ wv
            prob = 1.0 / (1.0 + np.exp(-z))
            # stable log-loss: log(1+e^-|z|) + max(z,0) - z*y
            loss = (np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0)
                    - z * y).sum()
            grad = x.T @ (prob - y)
            s = prob * (1.0 - prob)  # IRLS weights
            hess = (x.T * s) @ x
            correct = int(((prob >= 0.5) == (y >= 0.5)).sum())
            return pa.table({
                "key": pa.array(
                    [int(pc.min(batch.column("doc_id")).as_py())],
                    pa.int64()),
                "n": pa.array([len(y)], pa.int64()),
                "loss": pa.array([float(loss)], pa.float64()),
                "correct": pa.array([correct], pa.int64()),
                "grad": pa.array([grad.tolist()],
                                 pa.list_(pa.float64(), N_FEATURES)),
                "hess": pa.array([hess.reshape(-1).tolist()],
                                 pa.list_(pa.float64(),
                                          N_FEATURES * N_FEATURES)),
            })

        rows = _sorted_rows(feats.map_batches(
            grad_partial, batch_format="pyarrow").take_all())
        g = np.sum([np.asarray(r["grad"]) for r in rows], axis=0) / n
        h = np.sum([np.asarray(r["hess"]).reshape(N_FEATURES, N_FEATURES)
                    for r in rows], axis=0) / n
        loss = sum(r["loss"] for r in rows) / n
        acc = sum(r["correct"] for r in rows) / n
        history.append((loss, acc))
        # damped Newton: ridge keeps the step finite when classes
        # separate (prob saturates and the Hessian goes singular)
        step = np.linalg.solve(h + (l2 + 1e-6) * np.eye(N_FEATURES),
                               g + l2 * w)
        w = w - step
    return w, mean, std, history


def logreg_apply(feats: "ray.data.Dataset", w: np.ndarray,
                 mean: np.ndarray, std: np.ndarray) -> "ray.data.Dataset":
    """Stateless corpus-wide scoring pass: (doc_id, prob_bp, pred,
    label).  prob in integer basis points keeps the output exactly
    comparable across runs."""
    ref = ray.put({"w": w, "mean": mean, "std": std})

    def score(batch: pa.Table) -> pa.Table:
        p = ray.get(ref)
        m = np.stack(batch.column("f").to_numpy(zero_copy_only=False))
        x = (m - p["mean"]) / p["std"]
        prob = 1.0 / (1.0 + np.exp(-(x @ p["w"])))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "prob_bp": pa.array(np.round(prob * 10_000).astype(np.int64),
                                pa.int64()),
            "pred": pa.array((prob >= 0.5).astype(np.int8), pa.int8()),
            "label": batch.column("label"),
        })

    return feats.map_batches(score, batch_format="pyarrow")
