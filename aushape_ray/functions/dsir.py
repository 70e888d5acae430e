"""DSIR-style data selection: hashed n-gram importance weights.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023).  Importance weight of a raw
document x is estimated as log p_target(x) - log p_raw(x) under two
bag-of-hashed-ngram language models (unigrams + bigrams hashed into
`dim` buckets), fit on the target corpus and the raw corpus; documents
with the highest weights are selected (or Gumbel-resampled) to shift
the raw corpus toward the target distribution.

Distributed shape (designed for the 100 TB case):
  1. two corpus passes with the shared zero-copy tokenizer kernels
     (dedup.flat_utf8 / word_hashes_flat / ngram_hashes_flat) producing
     per-batch SPARSE (bucket, cnt) partials — O(bytes) scan, partials
     pre-aggregated inside each batch via np.unique;
  2. one bounded groupby-sum exchange per model: at most `dim` rows
     leave the scan regardless of corpus size;
  3. the dim-float log-ratio vector (dim * 8 bytes; 512 KiB at 2^16)
     is `ray.put` ONCE and memoized per worker process — the scoring
     pass is stateless map_batches, zero shuffle on documents.

No all-to-all touches document text at any point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import flat_utf8, ngram_hashes_flat, word_hashes_flat

_BCAST: dict = {}


def _doc_feature_buckets(texts, dim: int) -> "tuple[np.ndarray, np.ndarray]":
    """(bucket, doc_index) of every hashed unigram + bigram feature
    occurrence in an Arrow string column.  Buckets are FNV/splitmix word
    hashes mod dim (the DSIR hashed feature map)."""
    data, doc_off, n_docs = flat_utf8(texts)
    word_h, word_doc = word_hashes_flat(data, doc_off)
    bi_h, bi_doc = ngram_hashes_flat(word_h, word_doc, 2)
    h = np.concatenate([word_h, bi_h])
    d = np.concatenate([word_doc, bi_doc])
    return (h % np.uint64(dim)).astype(np.int64), d


def hashed_ngram_counts(ds: "ray.data.Dataset", dim: int,
                        text_col: str = "text") -> "ray.data.Dataset":
    """Corpus -> at most `dim` rows (bucket, cnt): the sufficient
    statistics of the hashed unigram+bigram bag LM.  One O(bytes) scan,
    partials combined per batch, one bounded exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        buckets, _ = _doc_feature_buckets(batch.column(text_col), dim)
        b, c = np.unique(buckets, return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("bucket").sum("cnt")


def log_ratio_vector(raw_counts: "ray.data.Dataset",
                     tgt_counts: "ray.data.Dataset", dim: int,
                     alpha: float = 0.5) -> np.ndarray:
    """Collect the two bounded count tables (<= dim rows each — an O(dim)
    driver materialization, independent of corpus size) and return the
    add-alpha-smoothed per-bucket log(p_target / p_raw) as float64[dim]."""
    vecs = []
    for cds in (raw_counts, tgt_counts):
        batches = list(cds.iter_batches(batch_format="pyarrow"))
        v = np.zeros(dim, np.float64)
        if batches:  # a feature-less corpus (all-empty texts) is all-zero
            t = pa.concat_tables(batches)
            if t.num_rows:
                v[np.asarray(t.column("bucket"))] = np.asarray(
                    t.column("sum(cnt)"), dtype=np.float64)
        vecs.append(v)
    raw_v, tgt_v = vecs
    lp_tgt = np.log(tgt_v + alpha) - np.log(tgt_v.sum() + alpha * dim)
    lp_raw = np.log(raw_v + alpha) - np.log(raw_v.sum() + alpha * dim)
    return lp_tgt - lp_raw


class DsirScorer:
    """Stateless map_batches scorer: per-document importance weight =
    sum over the doc's hashed features of the broadcast log-ratio
    (fetched once per worker process via the module memo)."""

    def __init__(self, ratio_ref, dim: int, text_col: str = "text") -> None:
        self.ratio_ref = ratio_ref
        self.dim = dim
        self.text_col = text_col
        self.__name__ = "dsir_score"

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = self.ratio_ref.hex()
        lr = _BCAST.get(key)
        if lr is None:
            lr = _BCAST[key] = ray.get(self.ratio_ref)
            if len(_BCAST) > 16:
                _BCAST.pop(next(iter(_BCAST)))
        buckets, docs = _doc_feature_buckets(
            batch.column(self.text_col), self.dim)
        n = batch.num_rows
        w = np.bincount(docs, weights=lr[buckets], minlength=n)
        n_feats = np.bincount(docs, minlength=n)
        return batch.append_column(
            "dsir_logratio", pa.array(w, pa.float64())
        ).append_column("n_feats", pa.array(n_feats.astype(np.int64)))


def dsir_weights(docs: "ray.data.Dataset", target: "ray.data.Dataset",
                 dim: int = 1 << 16, alpha: float = 0.5,
                 text_col: str = "text") -> "ray.data.Dataset":
    """Score every document in `docs` with its DSIR importance weight
    toward `target`.  Appends (dsir_logratio, n_feats) columns."""
    lr = log_ratio_vector(hashed_ngram_counts(docs, dim, text_col),
                          hashed_ngram_counts(target, dim, text_col),
                          dim, alpha)
    ref = ray.put(lr)
    return docs.map_batches(DsirScorer(ref, dim, text_col),
                            batch_format="pyarrow")


def scalar_dsir_reference(raw_texts: "list[str]", tgt_texts: "list[str]",
                          dim: int, alpha: float = 0.5) -> "list[float]":
    """Pure-Python reference (pytest parity oracle): same FNV-1a word
    hashes, splitmix64 bigram chain, hashed bag LMs and smoothing as the
    vectorized path, computed with plain ints and dicts."""
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

    def feats(text: str) -> "list[int]":
        words = [fnv(w) for w in (text or "").encode("utf-8").split()]
        out = [h % dim for h in words]
        for a, b in zip(words, words[1:]):
            out.append(mix(mix(a) ^ b) % dim)
        return out

    def counts(texts):
        c: dict[int, int] = {}
        for t in texts:
            for f in feats(t):
                c[f] = c.get(f, 0) + 1
        return c

    raw_c, tgt_c = counts(raw_texts), counts(tgt_texts)
    raw_tot = sum(raw_c.values()) + alpha * dim
    tgt_tot = sum(tgt_c.values()) + alpha * dim
    import math

    weights = []
    for t in raw_texts:
        w = 0.0
        for f in feats(t):
            w += (math.log(tgt_c.get(f, 0) + alpha) - math.log(tgt_tot)
                  - math.log(raw_c.get(f, 0) + alpha) + math.log(raw_tot))
        weights.append(w)
    return weights
