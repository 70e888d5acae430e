"""Distributed n-gram language-model scoring (CCNet-style perplexity
filtering, Wenzek et al. 2020): fit a bigram LM over the corpus in one
pass of per-batch partial counts, then score each document's perplexity
under the broadcast model — the classic quality gate before pre-training.

Scale shape:
- FIT: each batch emits its LOCAL (w1, w2) -> count aggregation (unique
  bigrams per batch, not tokens), a groupby-sum reduces them, and only
  the aggregated model rows reach the driver.  The vocabulary is capped
  to the top-V unigrams first (via the mergeable Misra-Gries heavy-
  hitters summary — sketches.heavy_hitters — so the cap itself never
  shuffles more than k rows per batch); out-of-vocab tokens collapse to
  a single <unk> id before bigram counting, bounding the model at
  (V+1)^2 regardless of corpus vocabulary.
- SCORE: the model (two numpy arrays + a token index) is ray.put once;
  each batch tokenizes with the shared vectorized FNV kernel and scores
  all its documents with one searchsorted + gather pass.

Tokens are identified by their 64-bit FNV word hash (dedup.word_hashes_flat)
— no string dictionaries cross the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

ALPHA = 0.5  # add-alpha smoothing


def _doc_token_hashes(batch: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
    """(word_hash uint64, word_doc int64) for a batch's text column."""
    from .dedup import flat_utf8, word_hashes_flat

    data, off, _ = flat_utf8(batch.column("text"))
    return word_hashes_flat(data, off)


def bigram_lm_fit(docs: "ray.data.Dataset", vocab_k: int = 4096,
                  num_partitions: int = 16) -> dict:
    """Fit the capped-vocab bigram model.  Returns a plain-dict model:
    {vocab (sorted uint64 hashes), uni (int64 counts incl. <unk> at
    index V), bi_idx (int64 V1*(V+1)+V2 sorted), bi_cnt (int64), total}.
    """
    from ray.data.aggregate import Sum

    from .sketches import heavy_hitters

    # vocabulary: top-V token hashes by the mergeable-summaries pattern.
    # MG residuals under-count by <= err, so the cap is approximate at the
    # V-th tail — fine for a smoothing vocabulary (the model stays exact
    # GIVEN the chosen vocab: bigram counts below are exact sums).
    def tok(b: pa.Table) -> pa.Table:
        wh, _ = _doc_token_hashes(b)
        return pa.table({"h": pa.array(wh.view(np.int64), pa.int64())})

    toks = docs.map_batches(tok, batch_format="pyarrow")
    keys, residuals, _err = heavy_hitters(toks, "h", k=max(vocab_k * 2, 64))
    order = np.argsort(residuals, kind="stable")[::-1][:vocab_k]
    vocab = np.sort(keys[order].astype(np.int64).view(np.uint64))
    v = len(vocab)
    vocab_ref = ray.put(vocab)

    def bigram_partial(b: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        wh, wd = _doc_token_hashes(b)
        if len(wh) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # map token hash -> vocab id, OOV -> V (<unk>)
        if len(vb):
            pos_c = np.minimum(np.searchsorted(vb, wh), len(vb) - 1)
            ids = np.where(vb[pos_c] == wh, pos_c, v)
        else:
            ids = np.full(len(wh), v, np.int64)
        # in-doc bigrams only
        valid = wd[:-1] == wd[1:]
        key = ids[:-1][valid] * (v + 1) + ids[1:][valid]
        # local aggregation: unique bigrams leave the batch, not tokens;
        # unigram counts ride along with key = -(id+1)
        ukey = -(ids.astype(np.int64) + 1)
        allk = np.concatenate([key.astype(np.int64), ukey])
        uk, cnt = np.unique(allk, return_counts=True)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = docs.map_batches(bigram_partial, batch_format="pyarrow").groupby(
        "key", num_partitions=num_partitions).aggregate(
        Sum("n", alias_name="n")).take_all()
    uni = np.zeros(v + 1, np.int64)
    bi_keys, bi_cnts = [], []
    for r in agg:
        kk, n = r["key"], r["n"]
        if kk < 0:
            uni[-kk - 1] = n
        else:
            bi_keys.append(kk)
            bi_cnts.append(n)
    bi_idx = np.asarray(bi_keys, np.int64)
    o = np.argsort(bi_idx, kind="stable")
    return {"vocab": vocab, "uni": uni,
            "bi_idx": bi_idx[o],
            "bi_cnt": np.asarray(bi_cnts, np.int64)[o],
            "total": int(uni.sum())}


def perplexity_score(docs: "ray.data.Dataset", model: dict) -> "ray.data.Dataset":
    """Per-doc bigram perplexity under the broadcast model:
    P(w2|w1) = (c(w1,w2)+a) / (c(w1)+a*(V+1)), add-alpha smoothed;
    ppl = exp(-mean log P) over the doc's bigrams (docs with <2 tokens
    score the unigram-free neutral 0).  Output ppl_e2 int64."""
    ref = ray.put(model)

    def score(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vocab, uni = m["vocab"], m["uni"]
        bi_idx, bi_cnt = m["bi_idx"], m["bi_cnt"]
        v = len(vocab)
        wh, wd = _doc_token_hashes(b)
        n_docs = b.num_rows
        ppl = np.zeros(n_docs, np.float64)
        if len(wh):
            if v:
                pos_c = np.minimum(np.searchsorted(vocab, wh), v - 1)
                ids = np.where(vocab[pos_c] == wh, pos_c, v).astype(np.int64)
            else:
                ids = np.full(len(wh), v, np.int64)
            valid = wd[:-1] == wd[1:]
            w1, w2 = ids[:-1][valid], ids[1:][valid]
            bdoc = wd[:-1][valid]
            key = w1 * (v + 1) + w2
            if len(bi_idx):
                loc_c = np.minimum(np.searchsorted(bi_idx, key),
                                   len(bi_idx) - 1)
                c_bi = np.where(bi_idx[loc_c] == key, bi_cnt[loc_c], 0)
            else:
                c_bi = np.zeros(len(key), np.int64)
            logp = (np.log(c_bi + ALPHA)
                    - np.log(uni[w1] + ALPHA * (v + 1)))
            nb = np.bincount(bdoc, minlength=n_docs).astype(np.float64)
            s = np.bincount(bdoc, weights=logp, minlength=n_docs)
            nz = nb > 0
            ppl[nz] = np.exp(-s[nz] / nb[nz])
        return pa.table({
            "doc_id": b.column("doc_id"),
            "ppl_e2": pa.array(np.round(ppl * 100).astype(np.int64),
                               pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")
