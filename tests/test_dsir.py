"""DSIR hashed-ngram importance weights: vectorized path vs the
pure-Python scalar reference, plus the end-to-end selection query."""

import numpy as np
import pytest


RAW = [
    "the quick brown fox jumps over the lazy dog",
    "le renard brun rapide saute par dessus le chien",
    "pack my box with five dozen liquor jugs",
    "der schnelle braune fuchs springt",
    "a b a b a b",
    "",
    "singleword",
    "the the the the the quick quick",
]
TGT = [
    "the quick brown fox",
    "five dozen liquor jugs over the lazy dog",
    "quick brown jumps the",
]
DIM = 1 << 10


def _vectorized_weights(ray_session):
    import pyarrow as pa

    import ray.data

    from aushape_ray.functions.dsir import dsir_weights

    docs = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(RAW))), "text": RAW}))
    tgt = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(TGT))), "text": TGT}))
    out = dsir_weights(docs, tgt, dim=DIM).to_pandas()
    return out.sort_values("doc_id")["dsir_logratio"].to_numpy()


def test_weights_match_scalar_reference(ray_session):
    from aushape_ray.functions.dsir import scalar_dsir_reference

    got = _vectorized_weights(ray_session)
    want = np.array(scalar_dsir_reference(RAW, TGT, DIM))
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9), (got, want)


def test_target_like_docs_score_higher(ray_session):
    w = _vectorized_weights(ray_session)
    # docs sharing the target's vocabulary outrank the French/German docs
    assert w[0] > w[1] and w[0] > w[3]
    assert w[2] > w[1]
    # the empty doc has weight exactly 0 (no features)
    assert w[5] == 0.0


def test_select_query_prefers_target_language(ray_session):
    from aushape_ray.pipelines.queries import q_doc_dsir_select

    out = q_doc_dsir_select("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 100
    assert list(out.columns) == ["doc_id", "lang", "dsir_logratio"]
    # weights sorted desc; precision in-band: the top quartile should be
    # dominated by the target language
    assert (np.diff(out["dsir_logratio"].to_numpy()) <= 1e-12).all()
    top = out.head(25)
    frac_en = (top["lang"] == "en").mean()
    base = (out["lang"] == "en").mean()
    assert frac_en >= base  # selection never anti-correlates with target
