"""Similarity search over the embeddings table.

Brute-force cosine top-k: the query matrix is broadcast once (ray.put on
the driver, ray.get once per actor in __init__), each batch is one numpy
matmul — no shuffle at all; per-batch partial top-k then a tiny global
merge.  The scale path (IVF) assigns each row to a coarse centroid bucket
in the same pass and only probes matching buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def make_batch_topk(queries_ref, k: int):
    """STATELESS per-batch cosine top-k against a broadcast query matrix.

    A plain task function, not an actor pool: ray.get of the broadcast
    ref is a zero-copy plasma read after the first per-node fetch, and
    stateless tasks avoid the actor-pool MapWorker's in-flight-batch GIL
    sharing (measured ~10x per-batch inflation — see perf notes)."""

    def topk(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)  # {"ids": int64[nq], "mat": f64[nq, d]}
        q_ids = q["ids"]
        qm = _normalize(q["mat"])
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        mat = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        sims = qm @ _normalize(mat).T  # (nq, nb)
        kk = min(k, sims.shape[1])
        # partial top-k per query within this batch, fully vectorized
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = sims.shape[0]
        qidx = np.repeat(np.arange(nq), kk)
        flat = idx.ravel()
        return pa.table({
            "query_id": pa.array(q_ids[qidx], pa.int64()),
            "neighbor_id": pa.array(ids[flat], pa.int64()),
            "cosine": pa.array(sims[qidx, flat], pa.float64()),
        })

    topk.__name__ = "batch_topk"
    return topk


def brute_force_topk(ds: "ray.data.Dataset", query_ids: list[int], k: int = 10,
                     exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k for the given query vec_ids.  Returns
    (query_id, rank, neighbor_id) with deterministic (-cosine, neighbor_id)
    tie-breaking; ranks are 1-based."""
    qset = set(query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("vec_id"),
                                     pa.array(query_ids, pa.int64())))

    q_rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    q_rows.sort(key=lambda r: r["vec_id"])
    q_mat = np.stack([np.asarray(r["embedding"], np.float64) for r in q_rows])
    q_ids = np.array([r["vec_id"] for r in q_rows], np.int64)
    ref = ray.put({"ids": q_ids, "mat": q_mat})

    partials = ds.map_batches(
        make_batch_topk(ref, k + (1 if exclude_self else 0)),
        batch_format="pyarrow",
    ).take_all()

    # tiny global merge on the driver (nq * k * n_batches rows)
    best: dict[int, list[tuple[float, int]]] = {int(q): [] for q in q_ids}
    for r in partials:
        best[r["query_id"]].append((-r["cosine"], r["neighbor_id"]))
    out_q, out_r, out_n = [], [], []
    for qid in sorted(best):
        cand = sorted(best[qid])
        rank = 0
        for negs, nid in cand:
            if exclude_self and nid == qid:
                continue
            rank += 1
            if rank > k:
                break
            out_q.append(qid)
            out_r.append(rank)
            out_n.append(nid)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "neighbor_id": pa.array(out_n, pa.int64()),
    })


def _mix_ids(ids: np.ndarray) -> np.ndarray:
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    return x ^ (x >> np.uint64(33))


def all_pairs_cosine(ds: "ray.data.Dataset", threshold: float,
                     n_blocks: int = 4) -> "ray.data.Dataset":
    """EXACT all-pairs cosine >= threshold, distributed — no driver
    materialization, no corpus broadcast.  Block-pair (theta-join)
    exchange: rows are hashed into n_blocks blocks; each row is shipped
    to the n_blocks groups (p,q) its block participates in, ONE groupby
    delivers both blocks of every unordered block pair to one task, and
    the task runs a normalized matmul.  Each unordered vector pair
    occurs in exactly one group, so no dedup pass is needed.

    Replication factor is n_blocks; per-task memory is ~2/n_blocks of
    the corpus.  At cluster scale choose n_blocks ~ sqrt(2 * tasks) so
    block pairs saturate the cluster while two blocks fit one worker —
    this is the honest exact path; the approximate discovery path is
    lsh_bucket_stats/IvfIndexer probing.

    Returns (vec_a, vec_b) with vec_a < vec_b.
    """
    B = n_blocks

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        block = (_mix_ids(ids) % np.uint64(B)).astype(np.int64)
        reps = np.repeat(np.arange(n), B)
        xs = np.tile(np.arange(B), n)
        b = block[reps]
        p = np.minimum(b, xs)
        q = np.maximum(b, xs)
        t = batch.take(pa.array(reps))
        t = t.append_column("pk", pa.array(p * B + q, pa.int64()))
        t = t.append_column("side", pa.array((b != p).astype(np.int8), pa.int8()))
        return t

    import pandas as pd

    def pair_block(g: "pd.DataFrame") -> "pd.DataFrame":
        # diagonal-ness must come from the GROUP KEY, not the side
        # composition: an off-diagonal group whose partner block is
        # globally empty contains only side-0 rows and must emit nothing
        # (treating it as diagonal would re-emit block p's pairs once
        # per empty partner)
        pk = int(g["pk"].iloc[0])
        diagonal = (pk // B) == (pk % B)
        side = g["side"].to_numpy()
        ids = g["vec_id"].to_numpy(np.int64)
        empty = pd.DataFrame({"vec_a": np.array([], np.int64),
                              "vec_b": np.array([], np.int64)})
        # row-chunked: the sim matrix never materializes beyond
        # CHUNK x m per task (the full-matrix form was 312MB/task at
        # 6250-row blocks; same rationale as knn_graph's kernel)
        CHUNK = 512
        va_l, vb_l = [], []
        if diagonal:
            mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
            for i0 in range(0, len(ids), CHUNK):
                sm = mat[i0:i0 + CHUNK] @ mat.T
                r, c = np.nonzero(sm >= threshold)
                ra = ids[i0 + r]
                cb = ids[c]
                keep = ra < cb  # upper triangle once, no self-pairs
                va_l.append(ra[keep])
                vb_l.append(cb[keep])
        else:
            a = side == 0
            if not a.any() or a.all():
                return empty  # one side of the block pair is empty
            mat = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
            ia, ib = ids[a], ids[~a]
            ma, mb = mat[a], mat[~a]
            for i0 in range(0, len(ia), CHUNK):
                sm = ma[i0:i0 + CHUNK] @ mb.T
                r, c = np.nonzero(sm >= threshold)
                va_l.append(np.minimum(ia[i0 + r], ib[c]))
                vb_l.append(np.maximum(ia[i0 + r], ib[c]))
        va = np.concatenate(va_l) if va_l else np.array([], np.int64)
        vb = np.concatenate(vb_l) if vb_l else np.array([], np.int64)
        return pd.DataFrame({"vec_a": va.astype(np.int64),
                             "vec_b": vb.astype(np.int64)})

    pair_block.__name__ = "pair_block"
    # reduce-task count = the actual group cardinality (B*(B+1)/2 block
    # pairs), not the sort exchange's ~200-task default
    return ds.map_batches(expand, batch_format="pyarrow").groupby(
        "pk", num_partitions=B * (B + 1) // 2).map_groups(
        pair_block, batch_format="pandas")


def knn_graph(ds: "ray.data.Dataset", k: int = 5,
              n_blocks: int = 4,
              label_col: "str | None" = None) -> "ray.data.Dataset":
    """EXACT k-nearest-neighbor graph (cosine), distributed — the
    building block under SemDeDup exemplars, graph-based dedup and
    curriculum mining.  Same block-pair (theta-join) exchange as
    all_pairs_cosine: each node meets every other node in exactly one
    block-pair task; that task emits the node's top-k candidates FROM
    THAT PAIR ONLY (partial top-k, so the merge shuffle carries
    O(n * k * n_blocks) 24-byte rows, never O(n^2) sims); a node-keyed
    groupby merges partials into the exact global top-k.

    Ties broken (sim DESC, neighbor_id ASC) — a total order, so output
    is deterministic and matches the SQL row_number() oracle.  Returns
    (node, rank, neighbor_id) with rank 1..k; sims never leave the
    merge (float columns would be hash-unstable across engines).

    label_col: when set, neighbors sharing the node's label are
    EXCLUDED — the k nearest DIFFERENT-label vectors, i.e. hard-negative
    mining for contrastive training (in-batch negatives are easy; the
    near-but-wrong ones carry the gradient signal).  Masking happens
    inside the fused matmul chunk (same-label sims -> -inf, dropped
    before anything leaves the task), so the exchange posture is
    unchanged; nodes with fewer than k different-label peers in a block
    pair simply emit fewer partials.
    """
    B = n_blocks

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        block = (_mix_ids(ids) % np.uint64(B)).astype(np.int64)
        reps = np.repeat(np.arange(n), B)
        xs = np.tile(np.arange(B), n)
        b = block[reps]
        p = np.minimum(b, xs)
        q = np.maximum(b, xs)
        t = batch.take(pa.array(reps))
        t = t.append_column("pk", pa.array(p * B + q, pa.int64()))
        t = t.append_column("side",
                            pa.array((b != p).astype(np.int8), pa.int8()))
        return t

    import pandas as pd

    CHUNK = 512  # rows per fused matmul+select slice

    def _block_topk(src_ids, src_mat, cand_ids, cand_mat, diagonal,
                    src_lab=None, cand_lab=None):
        """Per-source top-k among the candidate side, row-chunked: the
        sim matrix never materializes beyond CHUNK x m (numpy's
        argpartition over one huge 2-D array is also ~15x slower than
        the same work in cache-sized slices — measured 8.8s vs 0.54s at
        6250^2).  On the diagonal the self column is -inf'd and kk
        capped at m-1 so a self edge can never be emitted, even when the
        block has <= k members.  With labels, same-label columns are
        -inf'd per chunk (self included, since self shares its own
        label) and the masked entries are dropped before returning."""
        m = len(cand_ids)
        kk = min(k, m - 1 if diagonal else m)
        if kk <= 0:
            return (np.array([], np.int64), np.array([], np.float64),
                    np.array([], np.int64))
        nodes_l, sims_l, nbrs_l = [], [], []
        for i0 in range(0, len(src_ids), CHUNK):
            sm = src_mat[i0:i0 + CHUNK] @ cand_mat.T
            c = sm.shape[0]
            if src_lab is not None:
                sm[np.equal.outer(src_lab[i0:i0 + c], cand_lab)] = -np.inf
            if diagonal:
                sm[np.arange(c), i0 + np.arange(c)] = -np.inf
            if kk < m:
                idx = np.argpartition(sm, m - kk, axis=1)[:, m - kk:]
            else:
                idx = np.broadcast_to(np.arange(m), (c, m)).copy()
            nodes_l.append(np.repeat(src_ids[i0:i0 + c], idx.shape[1]))
            sims_l.append(np.take_along_axis(sm, idx, axis=1).ravel())
            nbrs_l.append(cand_ids[idx.ravel()])
        nodes = np.concatenate(nodes_l)
        sv = np.concatenate(sims_l)
        nbrs = np.concatenate(nbrs_l)
        if src_lab is not None:
            live = sv > -np.inf  # masked same-label picks never emit
            nodes, sv, nbrs = nodes[live], sv[live], nbrs[live]
        return nodes, sv, nbrs

    def pair_block(g: "pd.DataFrame") -> "pd.DataFrame":
        pk = int(g["pk"].iloc[0])
        diagonal = (pk // B) == (pk % B)
        side = g["side"].to_numpy()
        ids = g["vec_id"].to_numpy(np.int64)
        empty = pd.DataFrame({"node": np.array([], np.int64),
                              "sim": np.array([], np.float64),
                              "neighbor_id": np.array([], np.int64)})
        lab = (g[label_col].to_numpy(np.int64)
               if label_col is not None else None)
        if diagonal:
            mat = _normalize(np.stack(g["embedding"].to_numpy())
                             .astype(np.float64))
            nodes, sv, nbrs = _block_topk(ids, mat, ids, mat, True,
                                          lab, lab)
        else:
            a = side == 0
            if not a.any() or a.all():
                return empty  # one side of the block pair is empty
            mat = _normalize(np.stack(g["embedding"].to_numpy())
                             .astype(np.float64))
            la = lab[a] if lab is not None else None
            lb = lab[~a] if lab is not None else None
            n0, s0, c0 = _block_topk(ids[a], mat[a], ids[~a], mat[~a],
                                     False, la, lb)
            n1, s1, c1 = _block_topk(ids[~a], mat[~a], ids[a], mat[a],
                                     False, lb, la)
            nodes = np.concatenate([n0, n1])
            sv = np.concatenate([s0, s1])
            nbrs = np.concatenate([c0, c1])
        return pd.DataFrame({"node": nodes, "sim": sv,
                             "neighbor_id": nbrs})

    pair_block.__name__ = "knn_pair_block"
    cands = ds.map_batches(expand, batch_format="pyarrow").groupby(
        "pk", num_partitions=B * (B + 1) // 2).map_groups(
        pair_block, batch_format="pandas")

    N_PARTS = 16

    def merge_topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["node", "sim", "neighbor_id"],
                          ascending=[True, False, True],
                          ignore_index=True)
        rank = g.groupby("node", sort=False).cumcount() + 1
        out = g[rank <= k].copy()
        out["rank"] = rank[rank <= k].to_numpy(np.int64)
        return out[["node", "rank", "neighbor_id"]]

    merge_topk.__name__ = "knn_merge_topk"
    with_part = cands.map_batches(
        lambda t: t.append_column(
            "part", pa.array((np.asarray(t.column("node"), np.int64)
                              % N_PARTS), pa.int64())),
        batch_format="pyarrow")
    return with_part.groupby("part", num_partitions=N_PARTS).map_groups(
        merge_topk, batch_format="pandas")


def kmeans_fit(ds: "ray.data.Dataset", k: int = 8, iters: int = 10,
               tol: float = 1e-6):
    """Distributed Lloyd's k-means over an embedding column.

    Iterative-broadcast shape: centroids (k x d floats — tiny) are
    ray.put once per round; each batch assigns its vectors with one
    matmul and emits per-cluster PARTIALS (count, vector sum, squared
    error), so the per-round exchange is k rows per batch regardless of
    corpus size.  New centroids are reduced with a k-row groupby and the
    loop stops when the max centroid shift drops below tol.

    Deterministic init: the k lowest vec_ids.  Returns (centroids
    ndarray, sizes ndarray, inertia float, n_rounds).
    """
    import pyarrow.compute as pc

    # pin the input once: the loop re-reads it every round, and without
    # this each Lloyd iteration would re-execute the whole upstream
    # pipeline (parquet read included) — same reason cluster_pairs
    # materializes its edges
    ds = ds.materialize()
    first = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), k)),
        batch_format="pyarrow").take_all()
    first.sort(key=lambda r: r["vec_id"])
    centroids = np.stack([np.asarray(r["embedding"], np.float64)
                          for r in first])
    if len(centroids) < k:
        raise ValueError(f"need vec_ids 0..{k-1} for deterministic init")

    dim = centroids.shape[1]
    n_rounds = 0
    for _ in range(iters):
        n_rounds += 1
        ref = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)  # (k, d)
            mat = np.stack(batch.column("embedding").to_numpy(
                zero_copy_only=False)).astype(np.float64)
            # squared L2 via the expansion: argmin over centroids
            d2 = (mat * mat).sum(1)[:, None] - 2 * mat @ c.T + (c * c).sum(1)[None, :]
            assign = d2.argmin(axis=1)
            err = d2[np.arange(len(mat)), assign]
            rows = {"cluster": [], "n": [], "sse": [], "vsum": []}
            for ci in np.unique(assign):
                sel = assign == ci
                rows["cluster"].append(int(ci))
                rows["n"].append(int(sel.sum()))
                rows["sse"].append(float(err[sel].sum()))
                rows["vsum"].append(mat[sel].sum(axis=0).tolist())
            return pa.table({
                "cluster": pa.array(rows["cluster"], pa.int32()),
                "n": pa.array(rows["n"], pa.int64()),
                "sse": pa.array(rows["sse"], pa.float64()),
                "vsum": pa.array(rows["vsum"], pa.list_(pa.float64(), dim)),
            })

        from ray.data.aggregate import Sum

        def merge(g: "pa.Table") -> "pa.Table":
            vs = np.stack(g.column("vsum").to_numpy(zero_copy_only=False)).sum(axis=0)
            return pa.table({
                "cluster": g.column("cluster").slice(0, 1),
                "n": pa.array([int(np.asarray(g.column("n")).sum())], pa.int64()),
                "sse": pa.array([float(np.asarray(g.column("sse")).sum())], pa.float64()),
                "vsum": pa.array([vs.tolist()], pa.list_(pa.float64(), dim)),
            })

        merge.__name__ = "kmeans_merge"
        reduced = ds.map_batches(partials, batch_format="pyarrow").groupby(
            "cluster", num_partitions=min(k, 8)).map_groups(
            merge, batch_format="pyarrow").take_all()  # k tiny rows

        new_centroids = centroids.copy()
        sizes = np.zeros(k, np.int64)
        inertia = 0.0
        for r in reduced:
            ci = r["cluster"]
            sizes[ci] = r["n"]
            inertia += r["sse"]
            new_centroids[ci] = np.asarray(r["vsum"], np.float64) / max(r["n"], 1)
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, sizes, inertia, n_rounds


class IvfIndexer:
    """LSH/IVF-bucketed scale path: assign each vector to its nearest of C
    random-projection buckets; near-neighbor probes then touch only
    matching buckets.  Demonstrated as bucket assignment + per-bucket
    top-k (the partitioning assumption: neighbors share a bucket with
    high probability for clustered data)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        bits = (self.planes @ mat.T > 0).astype(np.int64)
        return (bits * (1 << np.arange(bits.shape[0])[:, None])).sum(axis=0)


def lsh_bucket_stats(ds: "ray.data.Dataset", dim: int) -> "ray.data.Dataset":
    """bucket -> count (the IVF partition histogram; skew diagnostic)."""
    def assign(batch: pa.Table, *, idx=IvfIndexer(dim)) -> pa.Table:
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(idx.bucket_of(mat), pa.int64()),
        })

    from ray.data.aggregate import Count

    return ds.map_batches(assign, batch_format="pyarrow").groupby("bucket").count()


def _lloyd_numpy(x: np.ndarray, k: int, iters: int = 12) -> np.ndarray:
    """Small deterministic in-memory Lloyd's (codebook training on a
    SAMPLE — the FAISS-standard PQ recipe; the corpus-scale path is
    kmeans_fit).  Init: k points spread by hashed order."""
    order = np.argsort(_mix_ids(np.arange(len(x))), kind="stable")
    cents = x[order[:k]].copy()
    for _ in range(iters):
        d2 = ((x * x).sum(1)[:, None] - 2 * x @ cents.T
              + (cents * cents).sum(1)[None, :])
        assign = d2.argmin(axis=1)
        for c in range(k):
            pts = x[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def pq_fit(ds: "ray.data.Dataset", m_sub: int = 8, k: int = 16,
           sample_cap: int = 4096, iters: int = 12,
           centroids: "np.ndarray | None" = None) -> np.ndarray:
    """Train product-quantization codebooks (Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) on a
    deterministic hash-sample of the corpus.

    Vectors are L2-normalized (so squared-L2 ADC ranks exactly like
    cosine) and split into m_sub contiguous sub-spaces; each sub-space
    gets its own k-entry codebook.  Training runs on <= sample_cap
    sampled vectors on the driver — sample-based training is the
    standard PQ recipe (the codebook is a few KiB; the EXPENSIVE parts,
    encoding and scanning, stay distributed).  Returns codebooks with
    shape (m_sub, k, dim/m_sub)."""
    import pyarrow.compute as pc_

    n = ds.count()
    mod = max(1, n // sample_cap)

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return b.filter(pa.array(_mix_ids(ids) % np.uint64(mod) == 0))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    mat = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    mat = _normalize(mat)
    if centroids is not None:
        # RESIDUAL PQ (IVF-PQ, Jegou et al. 2011 §III): codebooks are
        # trained on r = v - c(v) for the nearest coarse centroid c(v).
        # Residuals have far less variance than raw vectors, so the same
        # code budget quantizes much finer (measured: recall@10 56% flat
        # -> 90%+ with coarse k=16 + rerank at sf0.01, BASELINE.md)
        mat = mat - centroids[_nearest_cell(mat, centroids)]
    dim = mat.shape[1]
    assert dim % m_sub == 0, "dim must divide into m_sub sub-spaces"
    d_sub = dim // m_sub
    return np.stack([
        _lloyd_numpy(np.ascontiguousarray(mat[:, j * d_sub:(j + 1) * d_sub]),
                     k, iters)
        for j in range(m_sub)])


def _nearest_cell(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    d2 = ((mat * mat).sum(1)[:, None] - 2 * mat @ centroids.T
          + (centroids * centroids).sum(1)[None, :])
    return d2.argmin(axis=1)


def pq_encode(ds: "ray.data.Dataset", codebooks: np.ndarray,
              centroids: "np.ndarray | None" = None) -> "ray.data.Dataset":
    """Distributed PQ encoding: (vec_id, codes uint8[m_sub][, cell]) —
    dim*8 bytes per vector shrink to m_sub bytes (+2 for the coarse cell
    id in residual mode).  Codebooks (and centroids) broadcast once.
    With `centroids`, codes quantize the RESIDUAL to the nearest coarse
    centroid and the chosen cell is emitted alongside (IVF-PQ layout)."""
    m_sub, k, d_sub = codebooks.shape
    ref = ray.put({"cb": codebooks, "cents": centroids})

    def encode(b: pa.Table) -> pa.Table:
        bc = ray.get(ref)
        cb = bc["cb"]
        mat = _normalize(np.stack(b.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64))
        cols = {"vec_id": b.column("vec_id").cast(pa.int64())}
        if bc["cents"] is not None:
            cell = _nearest_cell(mat, bc["cents"])
            mat = mat - bc["cents"][cell]
            cols["cell"] = pa.array(cell.astype(np.uint16), pa.uint16())
        n = len(mat)
        codes = np.empty((n, m_sub), np.uint8)
        for j in range(m_sub):
            sub = mat[:, j * d_sub:(j + 1) * d_sub]
            c = cb[j]
            d2 = ((sub * sub).sum(1)[:, None] - 2 * sub @ c.T
                  + (c * c).sum(1)[None, :])
            codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
        cols["codes"] = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), m_sub)
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def _query_luts(codebooks: np.ndarray, query_vecs: "dict[int, np.ndarray]",
                centroids: "np.ndarray | None") -> dict:
    """Per-query ADC lookup tables.  Flat PQ: (m_sub, k) sub-distances to
    the unquantized query.  Residual PQ: one (m_sub, k) table PER COARSE
    CELL, built from (q - centroid_i) — flattened to (C*m_sub*k,) so the
    scan can gather with a single fancy index."""
    m_sub, kk, d_sub = codebooks.shape
    luts = {}
    for q in sorted(query_vecs):
        v = np.asarray(query_vecs[q], np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        if centroids is None:
            luts[q] = np.stack([
                ((codebooks[j] - v[j * d_sub:(j + 1) * d_sub]) ** 2).sum(axis=1)
                for j in range(m_sub)])
        else:
            res = v[None, :] - centroids            # (C, dim)
            per_cell = np.stack([
                ((codebooks[j][None, :, :]
                  - res[:, None, j * d_sub:(j + 1) * d_sub]) ** 2).sum(axis=2)
                for j in range(m_sub)], axis=1)      # (C, m_sub, k)
            luts[q] = np.ascontiguousarray(per_cell).reshape(-1)
    return luts


def pq_adc_topk(codes_ds: "ray.data.Dataset", codebooks: np.ndarray,
                query_vecs: "dict[int, np.ndarray]", k: int = 10,
                centroids: "np.ndarray | None" = None) -> pa.Table:
    """Asymmetric-distance top-k over PQ codes: per query a LUT of
    sub-distances to the UNQUANTIZED query (per coarse cell in residual
    mode), per batch one LUT gather + sum per sub-space (no decode, no
    float matmul against the corpus), partial top-k per batch, tiny
    driver merge.  Returns (query_id, rank, neighbor_id) like
    brute_force_topk.  Pass a larger k (e.g. 4*k_final) to produce a
    shortlist for exact_rerank — the IVF-PQ recipe."""
    m_sub, kk, d_sub = codebooks.shape
    qids = sorted(query_vecs)
    ref = ray.put(_query_luts(codebooks, query_vecs, centroids))

    def scan(b: pa.Table) -> pa.Table:
        lt = ray.get(ref)
        codes = np.asarray(b.column("codes").combine_chunks().values
                           ).reshape(-1, m_sub)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        if centroids is not None:
            cell = b.column("cell").to_numpy(zero_copy_only=False)\
                .astype(np.int64)
            # flat gather index into the (C, m_sub, k) table per sub-space
            base = cell[:, None] * (m_sub * kk) \
                + np.arange(m_sub)[None, :] * kk
            gather = base + codes
        out_q, out_n, out_d = [], [], []
        for q in qids:
            lut = lt[q]
            if centroids is None:
                d = np.zeros(len(codes))
                for j in range(m_sub):
                    d += lut[j][codes[:, j]]
            else:
                d = lut[gather].sum(axis=1)
            top = np.argsort(d, kind="stable")[: k + 1]
            out_q += [q] * len(top)
            out_n += ids[top].tolist()
            out_d += d[top].tolist()
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "dist": pa.array(out_d, pa.float64()),
        })

    partials = codes_ds.map_batches(scan, batch_format="pyarrow").take_all()
    best: dict[int, list] = {q: [] for q in qids}
    for r in partials:
        best[r["query_id"]].append((r["dist"], r["neighbor_id"]))
    out_q, out_r, out_n = [], [], []
    for q in qids:
        rank = 0
        for d, nid in sorted(best[q]):
            if nid == q:
                continue
            rank += 1
            if rank > k:
                break
            out_q.append(q)
            out_r.append(rank)
            out_n.append(nid)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "neighbor_id": pa.array(out_n, pa.int64()),
    })


def exact_rerank(ds: "ray.data.Dataset",
                 shortlist: "dict[int, list[int]]",
                 query_vecs: "dict[int, np.ndarray]",
                 k: int = 10) -> pa.Table:
    """Exact cosine re-ranking of ADC shortlists (the standard IVF-PQ
    refinement): ONE column-pruned filtered pass fetches only the
    candidate embeddings (|queries| * R rows, never the corpus), exact
    cosine runs on the driver over that tiny set, top-k per query with
    (sim DESC, neighbor_id) tie-break.  Self-matches are excluded."""
    cand_ids = sorted({i for ids in shortlist.values() for i in ids})
    id_arr = pa.array(cand_ids, pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return b.filter(pc_.is_in(b.column("vec_id").cast(pa.int64()),
                                  id_arr))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
            for r in rows}
    out_q, out_r, out_n = [], [], []
    for q in sorted(shortlist):
        qv = np.asarray(query_vecs[q], np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        cands = [c for c in shortlist[q] if c != q and c in vecs]
        if not cands:  # shortlist was self-only or fully pruned
            continue
        mat = _normalize(np.stack([vecs[c] for c in cands]))
        sim = mat @ qv
        order = sorted(range(len(cands)), key=lambda i: (-sim[i], cands[i]))
        for rank, i in enumerate(order[:k], 1):
            out_q.append(q)
            out_r.append(rank)
            out_n.append(cands[i])
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "neighbor_id": pa.array(out_n, pa.int64()),
    })


def pca_fit(ds: "ray.data.Dataset", n_components: int = 8):
    """Distributed PCA over the embedding column — the classic two-pass
    covariance reduction: each batch emits (count, sum vector, X^T X
    partial), the driver sums the tiny (d x d) partials, forms the
    covariance, and eigendecomposes (d x d is KiB-scale for any sane
    embedding dim; the corpus-sized work stays in the batches).

    Returns (components (k x d), mean (d,), explained_ratio (k,))."""

    def partial(b: pa.Table) -> pa.Table:
        mat = np.stack(b.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        d = mat.shape[1]
        return pa.table({
            "n": pa.array([len(mat)], pa.int64()),
            "s": pa.array([mat.sum(axis=0).tolist()],
                          pa.list_(pa.float64(), d)),
            "xtx": pa.array([(mat.T @ mat).ravel().tolist()],
                            pa.list_(pa.float64(), d * d)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = len(s)
    xtx = np.sum([np.asarray(r["xtx"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                    # (k, d)
    # deterministic sign: make the largest-|.| coordinate positive
    for i in range(len(comps)):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    explained = evals[order] / max(evals.sum(), 1e-300)
    return comps, mean, explained


def pca_transform(ds: "ray.data.Dataset", comps: np.ndarray,
                  mean: np.ndarray) -> "ray.data.Dataset":
    """Project the corpus onto the broadcast components (one matmul per
    batch): (vec_id, proj list<float64, k>)."""
    ref = ray.put({"c": comps, "m": mean})
    k = comps.shape[0]

    def proj(b: pa.Table) -> pa.Table:
        p = ray.get(ref)
        mat = np.stack(b.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        out = (mat - p["m"]) @ p["c"].T
        return pa.table({
            "vec_id": b.column("vec_id").cast(pa.int64()),
            "proj": pa.array([r.tolist() for r in out],
                             pa.list_(pa.float64(), k)),
        })

    return ds.map_batches(proj, batch_format="pyarrow")


def semdedup_victims(ds: "ray.data.Dataset", threshold: float,
                     k: int = 16, iters: int = 5,
                     probes: int = 1) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    removal that only compares vectors WITHIN a k-means cluster.

    The scale story vs the exact path (all_pairs_cosine): exact all-pairs
    ships every row n_blocks times and does O(n^2 / tasks) matmul work per
    task; SemDeDup does one k-means fit (k-row partials per round), ONE
    cluster-key exchange, and O(sum c_i^2) within-cluster work — with k
    grown proportionally to n, cluster sizes stay bounded and total work
    is ~O(n^2/k).  The price is misses across cluster boundaries, which
    q_emb_semdedup reports in-band as victim recall vs the exact chain.

    probes > 1 is the IVF multi-probe upgrade: each vector is shipped to
    its `probes` nearest cells (replication factor = probes), so pairs
    straddling one boundary are still co-located somewhere.  Victims
    stay precision-exact under union: a vector is a victim only if some
    shared cell proves a >= threshold chain to a smaller vec_id, and the
    globally-min id of any duplicate component is never a victim in any
    cell, so no component is ever fully removed.  Victim rows are
    deduplicated before return.

    Within a cluster: rows sorted by vec_id (determinism), normalized
    matmul in row chunks (bounds the sims temporary regardless of cluster
    size), union-find with keep-min-vec_id representative — identical
    keep semantics to cluster_pairs + keep-min, restricted to the
    cluster.  Returns a Dataset of (vec_id,) victims (rows to drop).
    """
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401 (parity with module style)

    centroids, _, _, _ = kmeans_fit(ds, k=k, iters=iters)
    cref = ray.put(centroids)
    p = max(1, min(probes, k))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)
        d2 = ((mat * mat).sum(1)[:, None] - 2 * mat @ c.T
              + (c * c).sum(1)[None, :])
        if p == 1:
            return batch.append_column(
                "cell", pa.array(d2.argmin(axis=1).astype(np.int64),
                                 pa.int64()))
        near = np.argpartition(d2, p - 1, axis=1)[:, :p]  # p nearest cells
        n = batch.num_rows
        t = batch.take(pa.array(np.repeat(np.arange(n), p)))
        return t.append_column(
            "cell", pa.array(near.reshape(-1).astype(np.int64), pa.int64()))

    def per_cell(g: "pd.DataFrame") -> "pd.DataFrame":
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(np.stack(g["embedding"].to_numpy())[order]
                         .astype(np.float64))
        n = len(ids)
        parent = np.arange(n)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        # chunk rows so the sims temporary stays ~<=32 MiB at any cluster
        # size; the pair loop below touches only above-threshold pairs
        # (near-dup mass, not cluster mass)
        chunk = max(1, (1 << 22) // max(n, 1))
        for lo in range(0, n, chunk):
            sims = mat[lo:lo + chunk] @ mat.T
            r, c = np.nonzero(sims >= threshold)
            r = r + lo
            keep = r < c
            for i, j in zip(r[keep], c[keep]):
                ri, rj = find(int(i)), find(int(j))
                if ri != rj:
                    # ids are sorted, so the smaller index IS the
                    # smaller vec_id — union toward it
                    parent[max(ri, rj)] = min(ri, rj)
        victims = np.array([i for i in range(n) if find(i) != i], np.int64)
        return pd.DataFrame({"vec_id": ids[victims]})

    per_cell.__name__ = "semdedup_cell"
    cells = ds.map_batches(assign, batch_format="pyarrow")
    out = cells.groupby("cell", num_partitions=min(k, 16)).map_groups(
        per_cell, batch_format="pandas")
    # emit Arrow blocks: downstream raw bucket exchanges (hash_join)
    # consume block refs directly and require pa.Table.  Under
    # multi-probe the same victim can surface in up to p cells — dedup
    # within each output block; cross-block duplicates are removed by
    # one tiny groupby (victim rows are a small fraction of the corpus)
    out = out.map_batches(
        lambda t: t.select(["vec_id"]), batch_format="pyarrow")
    if p == 1:
        return out
    return out.groupby("vec_id").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")


def kcenter_select(ds: "ray.data.Dataset", k: int = 8,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> "list[dict]":
    """Greedy k-center / farthest-point coreset selection (Gonzalez 1985,
    the classic 2-approximation for the k-center objective; used as a
    diversity-maximizing data-selection pass over embedding columns).

    Deterministic: the seed is the row with the minimum id; every later
    pick is the point farthest (max over points of min cosine-sphere
    distance) from the current centers, ties broken by smaller id.

    Distributed shape: one stateless map_batches pass per pick — the
    current center matrix ((r, d) floats) is ray.put ONCE per round and
    each batch emits a SINGLE candidate row (its locally farthest point:
    id, vec, min-similarity); the driver reduces O(num_batches) partial
    rows per round.  Total work k passes x one (r x d) @ (d x n) matmul
    each — no shuffle, no pairwise matrix, embeddings never leave their
    blocks.  Returns [{pick, vec_id, radius}] where radius is the
    max-min Euclidean distance at pick time (monotone non-increasing;
    radius[k] bounds the corpus's covering radius within 2x of optimal).
    """
    import pyarrow.compute as pc

    def seed_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64())),
                             "minsim": pa.array([], pa.float64())})
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        i = int(np.argmin(ids))
        vec = np.asarray(
            t.column(emb_col).to_numpy(zero_copy_only=False)[i], np.float64)
        return pa.table({"id": pa.array([int(ids[i])], pa.int64()),
                         "vec": pa.array([vec.tolist()],
                                         pa.list_(pa.float64())),
                         "minsim": pa.array([1.0], pa.float64())})

    def far_partial_fn(centers_ref):
        def far(t: pa.Table) -> pa.Table:
            empty = pa.table({"id": pa.array([], pa.int64()),
                              "vec": pa.array([], pa.list_(pa.float64())),
                              "minsim": pa.array([], pa.float64())})
            if t.num_rows == 0:
                return empty
            cm = ray.get(centers_ref)  # (r, d) normalized
            ids = np.asarray(t.column(id_col), dtype=np.int64)
            mat = _normalize(np.stack(t.column(emb_col).to_numpy(
                zero_copy_only=False)).astype(np.float64))
            # nearest-center similarity per point; farthest point = min
            best = (cm @ mat.T).max(axis=0)
            order = np.lexsort((ids, best))  # min sim, then min id
            j = int(order[0])
            return pa.table({
                "id": pa.array([int(ids[j])], pa.int64()),
                "vec": pa.array([mat[j].tolist()], pa.list_(pa.float64())),
                "minsim": pa.array([float(best[j])], pa.float64())})
        far.__name__ = "kcenter_far"
        return far

    def reduce_partials(tbl) -> "tuple[int, np.ndarray, float]":
        ids = tbl["id"].to_numpy()
        sims = tbl["minsim"].to_numpy()
        j = int(np.lexsort((ids, sims))[0])
        return int(ids[j]), np.asarray(tbl["vec"].iloc[j], np.float64), \
            float(sims[j])

    first = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    if len(first) == 0:  # empty dataset: no seed, no picks
        return []
    ids = first["id"].to_numpy()
    j = int(np.argmin(ids))
    seed_vec = _normalize(np.asarray(first["vec"].iloc[j],
                                     np.float64)[None, :])[0]
    picks = [{"pick": 0, "vec_id": int(ids[j]), "radius": None}]
    centers = [seed_vec]
    for r in range(1, k):
        ref = ray.put(np.stack(centers))
        part = ds.map_batches(far_partial_fn(ref),
                              batch_format="pyarrow").to_pandas()
        pid, pvec, psim = reduce_partials(part)
        if psim >= 1.0 - 1e-12:
            # every remaining point coincides with a center (k exceeds the
            # number of distinct points) — stop instead of re-picking
            # already-selected ids
            break
        picks.append({"pick": r, "vec_id": pid,
                      "radius": float(np.sqrt(max(0.0, 2.0 - 2.0 * psim)))})
        centers.append(pvec)
    return picks
