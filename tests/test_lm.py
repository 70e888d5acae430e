"""Bigram-LM perplexity scoring: distributed fit/score vs a scalar
single-process reference, plus signal-direction checks."""

import numpy as np
import pyarrow as pa


def test_bigram_lm_matches_scalar_reference(ray_session):
    import ray.data

    from aushape_ray.functions.lm import ALPHA, bigram_lm_fit, perplexity_score

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 50)))
             for _ in range(120)]
    texts.append("w0 w1 " * 40)      # highly repetitive -> low ppl
    texts.append("")                 # empty -> neutral 0
    texts.append("solo")             # one token, no bigrams -> 0
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(4)
    model = bigram_lm_fit(docs, vocab_k=256)
    got = perplexity_score(docs, model).to_pandas().sort_values(
        "doc_id", ignore_index=True)

    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.split() if t else []
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(uni)  # everything fits in vocab_k, so <unk> is unused
    assert len(model["vocab"]) == V
    assert model["total"] == sum(uni.values())
    ref = []
    for t in texts:
        toks = t.split() if t else []
        prs = list(zip(toks, toks[1:]))
        if not prs:
            ref.append(0)
            continue
        lp = [np.log(bi[p] + ALPHA) - np.log(uni[p[0]] + ALPHA * (V + 1))
              for p in prs]
        ref.append(int(round(np.exp(-np.mean(lp)) * 100)))
    assert got["ppl_e2"].tolist() == ref
    # signal direction: the repetitive doc scores far below the median
    med = float(np.median(got["ppl_e2"][:120]))
    assert got["ppl_e2"][120] < med / 3


def test_bigram_lm_vocab_cap_collapses_tail_to_unk(ray_session):
    """With vocab_k smaller than the vocabulary, tail tokens collapse to
    <unk> and total mass is conserved."""
    import ray.data

    from aushape_ray.functions.lm import bigram_lm_fit

    texts = ["hot " * 50] * 10 + [f"rare{i} only once" for i in range(60)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(4)
    model = bigram_lm_fit(docs, vocab_k=4)
    assert len(model["vocab"]) == 4
    n_tokens = 500 + 60 * 3
    assert model["total"] == n_tokens
    assert model["uni"][-1] > 0  # <unk> carries the tail


def test_compression_stats_signal_and_determinism(ray_session):
    import ray.data

    from aushape_ray.functions.textops import compression_stats

    rng = np.random.default_rng(9)
    rand = "".join(rng.choice(list("abcdefghijklmnop"), 2000))
    rep = "abc " * 500
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([rand, rep], pa.string())}))
    out = compression_stats(docs.take_batch(2, batch_format="pyarrow"))
    d = {r["doc_id"]: r["zlib_ratio_e4"] for r in out.to_pylist()}
    assert d[1] < d[0] / 5          # repetition compresses much harder
    out2 = compression_stats(docs.take_batch(2, batch_format="pyarrow"))
    assert out.equals(out2)          # bit-deterministic


def test_late_event_stats_carry_across_ranges(ray_session):
    """Hand-built stream where the late rows depend on the prefix-max
    CARRY from earlier ranges (n_parts > 1 forces cross-range flow):
    arrival i has event time 1000*i except plants that regress behind
    the watermark."""
    import ray.data

    from aushape_ray.functions.windows import late_event_stats

    n = 400
    tus = np.arange(n, dtype=np.int64) * 1_000_000_000  # 1000 s apart
    # plants: arrival 150 regresses 3000s (late for allow=1800s);
    # arrival 151 regresses 1000s (inside allowance, NOT late);
    # arrival 300 regresses 10_000s (late) — different range than 150
    tus[150] = tus[149] - 3_000 * 1_000_000
    tus[151] = tus[152] - 2 * 1_000_000_000  # monotone vs prefix: not late
    tus[300] = tus[299] - 10_000 * 1_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(tus, pa.timestamp("us")),
        "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)],
                               pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = late_event_stats(ds, allow_s=1800, n_parts=16).to_pandas()
    got = dict(zip(out["event_type"], zip(out["n_total"], out["n_late"])))
    # 150 is even->'b', 300 is even->'b'; 151 odd->'a' not late
    assert got["b"] == (200, 2)
    assert got["a"] == (200, 0)


def test_pca_recovers_planted_subspace(ray_session):
    """Data generated in a known 3-dim subspace + tiny noise: PCA must
    put ~all variance in 3 components and reconstruct near-perfectly,
    and the distributed partials must match an in-memory PCA."""
    import ray.data

    from aushape_ray.functions.ann import pca_fit, pca_transform

    rng = np.random.default_rng(17)
    d, n, k_true = 16, 500, 3
    basis = np.linalg.qr(rng.normal(0, 1, (d, k_true)))[0].T  # (3, d)
    z = rng.normal(0, [5.0, 2.0, 1.0], (n, k_true))
    x = z @ basis + rng.normal(0, 0.01, (n, d)) + 7.0
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in x],
                              pa.list_(pa.float64(), d)),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    comps, mean, explained = pca_fit(ds, n_components=4)
    assert explained[:3].sum() > 0.999
    assert explained[3] < 1e-3
    # distributed == in-memory covariance eigendecomposition
    cov = np.cov(x.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    got = explained * cov.trace() / 1  # un-normalize approximately
    np.testing.assert_allclose(
        explained[:3], evals[:3] / evals.sum(), rtol=1e-6)
    # projection round-trip
    proj = pca_transform(ds, comps[:3], mean).to_pandas()
    assert len(proj) == n and len(proj["proj"][0]) == 3
