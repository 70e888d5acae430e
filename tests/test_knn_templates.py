"""Parity tests for the round-3 additions: exact k-NN graph (brute-force
rank parity across multiple blocks), log template mining and per-tool
latency (scalar-reference parity over the sf0.001 fixture corpus)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aushape_ray.fixtures import ensure_transcripts


def _read_fixture_df(sf_dir="/root/testdata/sf0.001"):
    import glob

    path = ensure_transcripts(sf_dir)
    parts = [pq.read_table(f) for f in sorted(glob.glob(f"{path}/*.parquet"))]
    return pa.concat_tables(parts).to_pandas()


def test_knn_graph_matches_bruteforce_multiblock(ray_session):
    """knn_graph == brute-force exact ranks, ties broken (sim DESC,
    neighbor_id ASC), across block counts and a multi-block Dataset."""
    import ray.data

    from aushape_ray.functions.ann import knn_graph

    rng = np.random.default_rng(11)
    n, dim, k = 137, 8, 5
    vecs = rng.normal(size=(n, dim))
    # inject exact duplicates so equal-sim ties exercise the tie-break
    vecs[50] = vecs[10]
    vecs[51] = vecs[10]
    ids = np.arange(2000, 2000 + n, dtype=np.int64)

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    want = set()
    for i in range(n):
        order = np.lexsort((ids, -sims[i]))  # sim desc, id asc
        for rank, j in enumerate(order[:k], start=1):
            want.add((int(ids[i]), rank, int(ids[j])))

    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64(), dim)),
    })
    for n_blocks in (2, 4):
        ds = ray.data.from_arrow(t).repartition(6)
        out = knn_graph(ds, k=k, n_blocks=n_blocks).take_all()
        got = {(r["node"], r["rank"], r["neighbor_id"]) for r in out}
        assert len(out) == n * k, n_blocks
        assert got == want, n_blocks


def _scalar_template(text: str) -> str:
    out = []
    for tok in text.split(" "):
        if "=" not in tok:
            continue
        if tok.startswith("type="):
            out.append(tok)
        else:
            out.append(tok[: tok.index("=") + 1] + "<V>")
    return " ".join(out)


def test_templates_scalar_parity(ray_session):
    """q_t_templates over the fixture corpus == a per-row scalar Python
    reference (token filter + mask + pair-distinct counting)."""
    from aushape_ray.pipelines.queries import q_t_templates

    df = _read_fixture_df()
    df["template"] = [_scalar_template(t) for t in df["text"]]
    want = (df.groupby("template")
            .agg(n_turns=("template", "size"), n_convs=("conv_id", "nunique"))
            .reset_index())

    got = q_t_templates("/root/testdata/sf0.001").to_pandas()
    got = got.sort_values("template", ignore_index=True)
    want = want.sort_values("template", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["template", "n_turns", "n_convs"]].astype(
            {"n_turns": np.int64, "n_convs": np.int64}),
        want.astype({"n_turns": np.int64, "n_convs": np.int64}))
    # the miner must actually compress: far fewer templates than turns
    assert len(got) < len(df) / 20


def test_tool_latency_scalar_parity(ray_session):
    from aushape_ray.pipelines.queries import q_t_tool_latency

    df = _read_fixture_df().sort_values(["conv_id", "turn_idx"],
                                        ignore_index=True)
    ts = df["ts"].astype("int64")
    nxt_same = df["conv_id"].shift(-1).eq(df["conv_id"])
    gap = (ts.shift(-1) - ts).where(nxt_same)
    sub = pd.DataFrame({"tool": df["tool"], "gap": gap})[df["tool"].ne("")]
    want = sub.groupby("tool").agg(
        n_calls=("gap", "size"), n_answered=("gap", "count"),
        sum_gap_us=("gap", lambda s: int(s.sum())),
        max_gap_us=("gap", lambda s: int(s.max()))).reset_index()

    got = q_t_tool_latency("/root/testdata/sf0.001").to_pandas()
    got = got.sort_values("tool", ignore_index=True)
    want = want.sort_values("tool", ignore_index=True)
    cols = ["n_calls", "n_answered", "sum_gap_us", "max_gap_us"]
    pd.testing.assert_frame_equal(got[["tool"] + cols].astype(
        {c: np.int64 for c in cols}), want.astype({c: np.int64 for c in cols}))


def test_knn_classify_recovers_clusters(ray_session, tmp_path):
    """On a corpus of tight clusters, 5-NN majority vote must recover
    every vector's own cluster label (all neighbors share the cluster)."""
    import pyarrow.parquet as pq_

    from aushape_ray.pipelines.queries import q_emb_knn_classify

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 10
    which = np.repeat(np.arange(4), 30)
    vecs = centers[which] + rng.normal(scale=0.01, size=(120, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(120), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(which.astype(np.int32), pa.int32()),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq_.write_table(t, sf / "embeddings.parquet")
    got = q_emb_knn_classify(str(sf)).to_pandas().sort_values(
        "node", ignore_index=True)
    assert len(got) == 120
    assert (got["pred_label"].to_numpy() == which).all()


def test_similar_convs_matches_bruteforce(ray_session):
    """t_similar_convs == brute-force byte-5-gram Jaccard over the
    assembled kind chains of the fixture corpus."""
    import re

    from aushape_ray.functions.dedup import _shingles
    from aushape_ray.pipelines.queries import q_t_similar_convs

    df = _read_fixture_df().sort_values(["conv_id", "turn_idx"],
                                        ignore_index=True)
    kind_rx = re.compile(r"type=([A-Za-z_]+)")

    def kind(t):
        m = kind_rx.search(t)
        return m.group(1) if m else "UNKNOWN"

    chains = (df.assign(kind=[kind(t) for t in df["text"]])
              .groupby("conv_id")["kind"].agg(",".join))
    # identical chains collapse to one representative (min conv_id);
    # qualifying pairs between DISTINCT chains union-find into clusters
    rep, members = {}, {}
    for conv, seq in chains.items():
        members[seq] = members.get(seq, 0) + 1
        if seq not in rep or conv < rep[seq]:
            rep[seq] = conv
    sh = {c: set(_shingles(s).tolist()) for s, c in rep.items()}
    n_mem = {rep[s]: n for s, n in members.items()}
    convs = sorted(sh)
    parent = {c: c for c in convs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for i, a in enumerate(convs):
        for b in convs[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.8:
                n_pairs += 1
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for c in convs:
        comps.setdefault(find(c), []).append(c)
    want = {(min(v), len(v), sum(n_mem[c] for c in v))
            for v in comps.values() if len(v) > 1}

    got_df = q_t_similar_convs("/root/testdata/sf0.001").to_pandas()
    got = {(r.rep_conv, r.n_chains, r.n_convs) for r in got_df.itertuples()}
    assert got == want
    assert n_pairs > 0  # the fixture must exercise real near-dups


def test_cross_dedup_drops_planted_overlap(ray_session, tmp_path):
    """doc_cross_dedup must drop exactly the docs whose text exists in
    the reference corpus (the sf0.01 corpus has zero natural overlap,
    so plant some)."""
    import pyarrow.parquet as pq_

    from aushape_ray.pipelines.queries import q_doc_cross_dedup

    ref = pq_.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    planted = ref.slice(0, 7).column("text").to_pylist()
    fresh = [f"unique text {i} zz" for i in range(13)]
    t = pa.table({
        "doc_id": pa.array(np.arange(20), pa.int64()),
        "text": pa.array(planted + fresh, pa.string()),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq_.write_table(t, sf / "documents.parquet")
    got = q_doc_cross_dedup(str(sf)).to_pandas()
    assert sorted(got["doc_id"]) == list(range(7, 20))


def test_emb_outliers_flags_planted(ray_session, tmp_path):
    """A vector far from every cluster must be flagged; tight cluster
    members must not be."""
    import pyarrow.parquet as pq_

    from aushape_ray.pipelines.queries import q_emb_outliers

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(8, 8)) * 5
    which = np.tile(np.arange(8), 20)
    vecs = centers[which] + rng.normal(scale=0.02, size=(160, 8))
    vecs[159] = centers[which[159]] + 40.0  # planted far outlier
    t = pa.table({
        "vec_id": pa.array(np.arange(160), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq_.write_table(t, sf / "embeddings.parquet")
    got = q_emb_outliers(str(sf)).to_pandas()
    assert got["n_members"].sum() == 160
    assert 1 <= got["n_outliers"].sum() <= 16  # planted flagged, not mass
