"""bpe_train: distributed iterative BPE vs the scalar Sennrich loop.

The scalar reference replicates the distributed tie-break exactly: best
pair = max weighted count, then smallest packed (left_id << 32 |
right_id) where merged symbols take ids 0x200000 + rank in creation
order — so the two implementations must agree merge-for-merge.
"""

import collections

import pyarrow as pa
import pytest

import ray

from aushape_ray.functions.bpe import _MERGE_BASE, bpe_train


def scalar_bpe(texts, k, min_count=2):
    wc = collections.Counter(w for t in texts for w in t.split())
    sid = {}

    def gid(s):
        return sid[s] if s in sid else ord(s)

    words = {w: list(w) for w in wc}
    merges = []
    for r in range(k):
        pair_n = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pair_n[(syms[i], syms[i + 1])] += wc[w]
        if not pair_n:
            break
        best = min(pair_n.items(),
                   key=lambda kv: (-kv[1],
                                   (gid(kv[0][0]) << 32) | gid(kv[0][1])))
        (a, b), n = best
        if n < min_count:
            break
        tok = a + b
        sid[tok] = _MERGE_BASE + r
        merges.append((r, a, b, tok, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _run(texts, k, n_buckets=4, **kw):
    tbl = pa.table({"text": pa.array(texts, pa.large_string())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = bpe_train(ds, num_merges=k, min_count=2, n_buckets=n_buckets, **kw)
    return list(got.to_pandas().itertuples(index=False, name=None))


TEXTS = [
    "low low low lower lowest",
    "new newer newest low",
    "wider wide wide new low\t lowest",
    "",
    "aaaa aa aaaa",  # a==b overlap chains (run-parity path)
    "unicodé déjà déjà vu",
]


def test_bpe_train_matches_scalar(ray_session):
    # default: small vocab takes the single-task fast path
    assert _run(TEXTS, 12) == scalar_bpe(TEXTS, 12)


def test_bpe_train_distributed_path_matches_scalar(ray_session):
    # threshold 0 forces the per-round distributed exchange loop
    assert (_run(TEXTS, 12, local_vocab_threshold=0)
            == scalar_bpe(TEXTS, 12))


def test_bpe_encode_matches_scalar(ray_session):
    import numpy as np

    from aushape_ray.functions.bpe import bpe_encode_counts, bpe_train
    from aushape_ray.functions.dedup import _mix64

    tbl = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.large_string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    merges = bpe_train(ds, num_merges=12, min_count=2, n_buckets=4)
    got = (bpe_encode_counts(ds, merges).to_pandas()
           .sort_values("doc_id", ignore_index=True))

    # scalar encode: replay merges left-to-right per word
    rules = [(m[1], m[2], m[3]) for m in scalar_bpe(TEXTS, 12)]

    def encode_word(w):
        syms = list(w)
        for a, b, tok in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    sid = {m[3]: 0x200000 + m[0] for m in scalar_bpe(TEXTS, 12)}
    for d, (t, row) in enumerate(zip(TEXTS, got.itertuples())):
        toks = [s for w in t.split() for s in encode_word(w)]
        assert row.n_tokens == len(toks), (d, t)
        ids = np.array([sid.get(s, ord(s) if len(s) == 1 else -1)
                        for s in toks], np.uint64)
        pos = np.arange(len(ids), dtype=np.uint64)
        v = (int(np.sum(_mix64(ids ^ _mix64(pos)), dtype=np.uint64))
             if len(ids) else 0)
        exp = v - (1 << 64) if v >= (1 << 63) else v
        assert row.token_checksum == exp, (d, t)


def test_bpe_train_early_stop_and_empty(ray_session):
    # all words length 1: no pairs at all -> zero merges
    assert _run(["a b c d", "e f"], 5) == []
    # singleton pairs fall below min_count=2 -> early stop
    texts = ["xy xy qz"]
    got = _run(texts, 8)
    exp = scalar_bpe(texts, 8)
    assert got == exp
    assert all(n >= 2 for *_, n in got)
