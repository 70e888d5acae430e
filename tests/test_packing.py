"""Sequence packing + mixture sampling + shuffle-shard: scalar-reference
parity for the kernels and end-to-end checks for the three training-data
queries added late in round 3 (their DuckDB oracles sit past the driver's
50-row window, so pytest is their correctness gate)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ kernels

def _next_fit_scalar_strict(tokens, capacity):
    """Loop reference matching next_fit_pack exactly: close the current
    pack when the next doc does not fit; an oversize doc occupies a pack
    alone only when it opens the pack (next-fit never splits)."""
    out = []
    pack, used = 0, 0
    for t in tokens:
        if used > 0 and used + t > capacity:
            pack += 1
            used = 0
        used += t
        out.append(pack)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_next_fit_pack_matches_scalar(seed):
    from aushape_ray.functions.packing import next_fit_pack

    rng = np.random.default_rng(seed)
    tokens = rng.integers(1, 120, size=400).astype(np.int64)
    # sprinkle oversize docs (> capacity) among normal ones
    tokens[rng.integers(0, 400, 7)] = rng.integers(300, 500, 7)
    got = next_fit_pack(tokens, 256)
    want = _next_fit_scalar_strict(tokens, 256)
    assert got.tolist() == want


def test_next_fit_pack_edges():
    from aushape_ray.functions.packing import next_fit_pack

    assert next_fit_pack(np.array([], np.int64), 10).tolist() == []
    # exact fill closes the pack for the next doc
    assert next_fit_pack(np.array([5, 5, 1]), 10).tolist() == [0, 0, 1]
    # oversize doc alone in its pack
    assert next_fit_pack(np.array([50, 1, 1]), 10).tolist() == [0, 1, 1]


def test_pack_summary_aggregates():
    from aushape_ray.functions.packing import pack_summary

    ids = np.array([10, 11, 12, 13, 14], np.int64)
    toks = np.array([100, 100, 100, 300, 5], np.int64)
    out = pack_summary(ids, toks, 256)
    df = pd.DataFrame(out)
    # the oversize doc (300) sits alone; the 5-token doc cannot join it
    # (next-fit closes a pack once the running total passes capacity)
    assert df["pack_id"].tolist() == [0, 1, 2, 3]
    assert df["n_docs"].tolist() == [2, 1, 1, 1]
    assert df["n_tokens"].tolist() == [200, 100, 300, 5]
    assert df["first_doc_id"].tolist() == [10, 12, 13, 14]


# ------------------------------------------------------------- end-to-end

def test_doc_pack_matches_single_process_reference(ray_session):
    """q_doc_pack == packing the whole corpus in-memory with the same
    shard assignment, order, and capacity; token totals are conserved."""
    import duckdb

    from aushape_ray.functions.packing import pack_summary
    from aushape_ray.pipelines.queries import q_doc_pack

    got = q_doc_pack(SF).to_pandas().sort_values(
        ["part", "pack_id"]).reset_index(drop=True)

    # single-process reference: count tokens exactly as the query does
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    n_tokens = docs["text"].str.count(r"\S+").astype(np.int64)
    frames = []
    for p in range(8):
        m = (docs["doc_id"] % 8 == p).to_numpy()
        sub = pd.DataFrame({"doc_id": docs["doc_id"][m].to_numpy(),
                            "n_tokens": n_tokens[m].to_numpy()})
        sub = sub.sort_values("doc_id")
        cols = pack_summary(sub["doc_id"].to_numpy(),
                            sub["n_tokens"].to_numpy(), 256)
        f = pd.DataFrame(cols)
        f.insert(0, "part", np.int64(p))
        frames.append(f)
    want = pd.concat(frames).sort_values(
        ["part", "pack_id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert got["n_tokens"].sum() == int(n_tokens.sum())  # conservation


def test_doc_mixture_sample_hits_target_mixture(ray_session):
    """Selected per-lang counts equal the integer quota derived from the
    true corpus counts; selection is the smallest-hash prefix per lang
    (the SQL-equality check lives in the oracle gate; this asserts the
    SEMANTICS, independent of DuckDB)."""
    import duckdb

    from aushape_ray.pipelines.queries import q_doc_mixture_sample

    out = q_doc_mixture_sample(SF).to_pandas()
    counts = duckdb.sql(
        f"SELECT lang, count(*) AS n FROM '{SF}/documents.parquet' "
        f"GROUP BY lang").df().set_index("lang")["n"].to_dict()
    targets = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}
    n_out = min(counts[lang] * 100 // w for lang, w in targets.items())
    quota = {lang: w * n_out // 100 for lang, w in targets.items()}
    got = out.groupby("lang")["doc_id"].count().to_dict()
    assert got == quota
    assert out["doc_id"].is_unique


def test_doc_shuffle_shard_is_a_permutation(ray_session):
    from aushape_ray.pipelines.queries import q_doc_shuffle_shard

    out = q_doc_shuffle_shard(SF).to_pandas()
    # every doc exactly once; ranks are 1..n_shard within each shard
    assert out["doc_id"].is_unique
    for _, g in out.groupby("shard"):
        assert sorted(g["rank"].tolist()) == list(range(1, len(g) + 1))


def test_doc_bpe_pairs_matches_scalar_reference(ray_session):
    """Distributed pair counting == a per-doc python loop over the same
    corpus (whitespace-excluded adjacent codepoint pairs, top 20 with
    (n desc, pair) tie-break) — the SQL oracle covers DuckDB parity, this
    covers the packed-uint64 vectorization against obvious scalar code."""
    import collections

    import duckdb

    from aushape_ray.pipelines.queries import q_doc_bpe_pairs

    got = q_doc_bpe_pairs(SF).to_pandas()

    texts = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'").df()["text"]
    ws = set(" \t\n")
    counter = collections.Counter()
    for t in texts:
        for a, b in zip(t, t[1:]):
            if a not in ws and b not in ws:
                counter[a + b] += 1
    want = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["pair"], got["n"])) == want


def test_chunk_plan_matches_scalar(ray_session):
    """chunk_plan == pure-python reference over multi-block input with
    empty docs, null text, and docs longer than one chunk."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray.data

    from aushape_ray.functions.packing import chunk_plan

    rng = np.random.default_rng(23)
    texts = []
    for i in range(80):
        if i % 13 == 0:
            texts.append("")          # empty doc: no chunk may start here
        elif i % 17 == 0:
            texts.append(None)        # null text
        else:
            texts.append(" ".join(
                ["tok"] * int(rng.integers(1, 120))))
    t = pa.table({"doc_id": pa.array(np.arange(80), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    C = 32
    pos, ref = 0, []
    for did, text in zip(range(80), texts):
        n = len(re.findall(r"\S+", text or ""))
        k0, k1 = -(-pos // C), -(-(pos + n) // C) - 1
        for k in range(k0, k1 + 1):
            ref.append((k, did, k * C - pos))
        pos += n
    assert len(ref) == -(-pos // C)  # every chunk start exists exactly once

    ds = ray.data.from_arrow(t).repartition(7)
    got = sorted((r["chunk_idx"], r["start_doc"], r["start_off"])
                 for r in chunk_plan(ds, chunk_tokens=C, n_parts=5)
                 .take_all())
    assert got == ref


def test_chunk_texts_matches_scalar(ray_session):
    """chunk_texts == pure-python assembly: every chunk md5/count equal;
    all chunks except the last are exactly C tokens (conservation)."""
    import hashlib
    import re

    import numpy as np
    import pyarrow as pa
    import ray.data

    from aushape_ray.functions.packing import chunk_texts

    rng = np.random.default_rng(31)
    texts = []
    for i in range(60):
        if i % 11 == 0:
            texts.append("")
        else:
            texts.append(" ".join(
                f"w{int(x)}" for x in rng.integers(0, 500,
                                                   rng.integers(1, 90))))
    t = pa.table({"doc_id": pa.array(np.arange(60), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    C = 48
    stream = [tok for x in texts for tok in re.findall(r"\S+", x)]
    ref = {}
    for k in range(-(-len(stream) // C)):
        seg = stream[k * C:(k + 1) * C]
        ref[k] = (len(seg), hashlib.md5(" ".join(seg).encode()).hexdigest())

    ds = ray.data.from_arrow(t).repartition(7)
    got = {r["chunk_idx"]: (r["n_tokens"], r["chunk_md5"])
           for r in chunk_texts(ds, chunk_tokens=C, n_parts=5).take_all()}
    assert got == ref
    sizes = [v[0] for k, v in sorted(got.items())]
    assert all(s == C for s in sizes[:-1]) and 0 < sizes[-1] <= C
