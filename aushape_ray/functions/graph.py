"""Graph analytics over similarity graphs: distributed PageRank.

A near-dup pair graph is the natural place to pick CLUSTER
REPRESENTATIVES by centrality (rather than min-id): PageRank over the
verified-pair graph ranks the most-connected member of every duplicate
neighborhood.  The distributed shape reuses cluster_pairs' static-edge
design (functions/dedup.py): edges are hash-bucketed by src ONCE into
plasma-pinned Arrow tables with the per-edge weight 1/deg(src)
precomputed, and each power-iteration round moves ONLY the rank rows
(16 bytes/node) through one groupby exchange:

    ranks -> route by hash(node)            (one exchange, 1 row/node)
    bucket task: static edges |><| ranks,   (zero-copy plasma read)
                 partial sum r(src)/deg per dst
    sum partials by dst                     (one coarse-bucket exchange)
    new rank = (1-d)/N + d * contrib

Float determinism: every segment sum runs over arrays lexsorted by
(node, emitting bucket), so addition order is fixed across runs and
task placements.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .joins import hash_part


def _to_sym_edges(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").cast(pa.int64())
        b = batch.column("doc_b").cast(pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    return pairs.map_batches(sym, batch_format="pyarrow")


def _split_weighted_block(tbl: pa.Table, n_buckets: int) -> "list[pa.Table]":
    # zero-row blocks may arrive schema-less (empty bucket groups /
    # blocks Ray passed through without running the UDF) — route as
    # empties, same posture as joins._split_by_bucket
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        return [tbl.slice(0, 0)] * n_buckets
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    bucket = hash_part(src, n_buckets)
    order = np.argsort(bucket, kind="stable")
    st = tbl.take(pa.array(order, pa.int64()))
    counts = np.bincount(bucket, minlength=n_buckets)
    out, off = [], 0
    for c in counts:
        out.append(st.slice(off, int(c)))
        off += int(c)
    return out


def _concat_parts(*tables: pa.Table) -> pa.Table:
    # drop schema-less empty slices before concat (empty upstream
    # blocks); keep the widest empty if ALL are empty
    live = [t for t in tables if t.num_rows]
    if not live:
        live = [max(tables, key=lambda t: t.num_columns)]
    return pa.concat_tables(live).combine_chunks()


class _ContribBucket:
    """Per-bucket contribution task: static weighted edges joined with
    the routed rank rows; emits bucket-local partial sums per dst."""

    __name__ = "pr_contrib"

    def __init__(self, bucket_refs: list, n_buckets: int) -> None:
        self.bucket_refs = bucket_refs
        self.n_buckets = n_buckets

    def __call__(self, group: pa.Table) -> pa.Table:
        import ray as _ray

        empty = pa.table({"node": pa.array([], pa.int64()),
                          "v": pa.array([], pa.float64()),
                          "b": pa.array([], pa.int64())})
        if group.num_rows == 0:
            return empty
        bkt = int(group.column("__bucket")[0].as_py())
        eb = _ray.get(self.bucket_refs[bkt])
        if eb.num_rows == 0:
            return empty
        node = group.column("node").to_numpy(zero_copy_only=False)
        r = group.column("r").to_numpy(zero_copy_only=False)
        # rank lookup for this bucket's srcs: edges sorted by src at
        # build time, so searchsorted against the routed (sorted) nodes
        no = np.argsort(node)
        node_s, r_s = node[no], r[no]
        src = eb.column("src").to_numpy(zero_copy_only=False)
        dst = eb.column("dst").to_numpy(zero_copy_only=False)
        w = eb.column("w").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(node_s, src)
        # every edge src must have a rank row (rank set == node set)
        contrib = r_s[idx] * w
        do = np.argsort(dst, kind="stable")
        d2, c2 = dst[do], contrib[do]
        bounds = np.flatnonzero(np.concatenate([[True], d2[1:] != d2[:-1]]))
        sums = np.add.reduceat(c2, bounds)
        return pa.table({
            "node": pa.array(d2[bounds], pa.int64()),
            "v": pa.array(sums, pa.float64()),
            "b": pa.array(np.full(len(bounds), bkt, np.int64), pa.int64()),
        })


def _pagerank_block(edges: pa.Table, damping: float, iters: int):
    """Single-task power iteration over one symmetric edge block — the
    small-graph fast path (identical math to the distributed rounds;
    runs in a REMOTE task, never the driver)."""
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes, s_idx = np.unique(src, return_inverse=True)
    d_idx = np.searchsorted(nodes, dst)
    n = len(nodes)
    deg = np.bincount(s_idx, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    residual = float("inf")
    for _ in range(iters):
        contrib = np.bincount(d_idx, weights=r[s_idx] / deg[s_idx],
                              minlength=n)
        new_r = (1.0 - damping) / n + damping * contrib
        residual = float(np.abs(new_r - r).sum())
        r = new_r
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(r, pa.float64()),
                     "res": pa.array(np.full(n, residual), pa.float64())})


def pagerank(pairs: "ray.data.Dataset", damping: float = 0.85,
             iters: int = 20, n_buckets: int = 16,
             small_threshold: int = 1_000_000):
    """PageRank over the undirected pair graph (doc_a, doc_b).

    Returns (ranks_dataset, n_nodes, last_residual): ranks as
    (node, rank float64) summing to ~1; residual = sum |r_t - r_{t-1}|
    of the final round (in-band convergence evidence).  Every node in
    the pair graph has degree >= 1, so there are no dangling nodes and
    the per-round mass balance is exact.

    Below small_threshold symmetric edges, ALL rounds run in ONE remote
    task with the same math (same rationale as cluster_pairs' fast
    path: 20 rounds x 3 exchanges of fixed cost buy nothing for a graph
    that fits one task — measured 50s -> ~2s at 47 nodes).  The
    iterative bucket exchange below is the scale path; tests force it
    with small_threshold=0.
    """
    edges = _to_sym_edges(pairs).materialize()
    n_edges = edges.count()
    if 0 < n_edges <= small_threshold:
        out = edges.repartition(1).map_batches(
            lambda t: _pagerank_block(t, damping, iters),
            batch_format="pyarrow", batch_size=None).materialize()
        first = out.take(1)
        residual = float(first[0]["res"]) if first else 0.0
        ranks = out.map_batches(
            lambda t: t.select(["node", "rank"]), batch_format="pyarrow")
        return ranks, out.count(), residual

    # degree per src once, then the static weighted buckets
    def deg_partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False)
        o = np.argsort(src, kind="stable")
        s2 = src[o]
        bounds = np.flatnonzero(np.concatenate([[True], s2[1:] != s2[:-1]]))
        cnt = np.diff(np.append(bounds, len(s2)))
        return pa.table({
            "node": pa.array(s2[bounds], pa.int64()),
            "v": pa.array(cnt.astype(np.float64), pa.float64()),
            "b": pa.array(np.zeros(len(bounds), np.int64), pa.int64()),
        })

    deg = _sum_by_node(edges.map_batches(deg_partial,
                                         batch_format="pyarrow"),
                       n_buckets).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "rank": t.column("v")}),
            batch_format="pyarrow"), 0, 0.0

    # join 1/deg onto edges by src with one bucket-aligned pass, then
    # pin the weighted buckets.  Both sides are routed by hash(src) so
    # the lookup is bucket-local.
    def tag_by(col):
        def tag(t: pa.Table) -> pa.Table:
            k = t.column(col).to_numpy(zero_copy_only=False)
            return t.append_column(
                "__bucket", pa.array(hash_part(k, n_buckets), pa.int32()))
        return tag

    deg_tagged = deg.map_batches(tag_by("node"), batch_format="pyarrow")
    edges_tagged = edges.map_batches(tag_by("src"), batch_format="pyarrow")

    def weight_bucket(g: pa.Table) -> pa.Table:
        # group = this bucket's edges ∪ degree rows (unioned upstream,
        # separated by the marker column)
        is_deg = g.column("kind").to_numpy(zero_copy_only=False) == 1
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        dnode = src[is_deg]
        dval = g.column("w").to_numpy(zero_copy_only=False)[is_deg]
        e_src, e_dst = src[~is_deg], dst[~is_deg]
        o = np.argsort(dnode)
        idx = np.searchsorted(dnode[o], e_src)
        w = 1.0 / dval[o][idx]
        so = np.argsort(e_src, kind="stable")  # sorted by src for rounds
        return pa.table({"src": pa.array(e_src[so], pa.int64()),
                         "dst": pa.array(e_dst[so], pa.int64()),
                         "w": pa.array(w[so], pa.float64())})

    weight_bucket.__name__ = "pr_weight"
    e_u = edges_tagged.map_batches(
        lambda t: pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "w": pa.array(np.zeros(t.num_rows), pa.float64()),
            "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
            "__bucket": t.column("__bucket")}),
        batch_format="pyarrow")
    d_u = deg_tagged.map_batches(
        lambda t: pa.table({
            "src": t.column("node"),
            "dst": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "w": t.column("v"),
            "kind": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            "__bucket": t.column("__bucket")}),
        batch_format="pyarrow")
    weighted = e_u.union(d_u).groupby(
        "__bucket", num_partitions=n_buckets).map_groups(
        weight_bucket, batch_format="pyarrow").materialize()

    split_remote = ray.remote(num_returns=n_buckets)(_split_weighted_block)
    concat_remote = ray.remote(_concat_parts)
    parts = [split_remote.remote(ref, n_buckets)
             for ref in weighted.to_arrow_refs()]
    bucket_refs = [concat_remote.remote(*[p[b] for p in parts])
                   for b in range(n_buckets)]
    contrib = _ContribBucket(bucket_refs, n_buckets)

    base = (1.0 - damping) / n_nodes
    ranks = deg.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "r": pa.array(np.full(t.num_rows, 1.0 / n_nodes), pa.float64()),
        }), batch_format="pyarrow").materialize()

    residual = float("inf")
    for _ in range(iters):
        routed = ranks.map_batches(tag_by("node"), batch_format="pyarrow")
        partials = routed.groupby(
            "__bucket", num_partitions=n_buckets).map_groups(
            contrib, batch_format="pyarrow")
        summed = _sum_by_node(partials, n_buckets)
        new_ranks = summed.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "r": pa.array(base + damping * t.column("v").to_numpy(
                    zero_copy_only=False), pa.float64()),
            }), batch_format="pyarrow").materialize()
        # residual via one partial pass over the joined old/new ranks
        residual = _rank_residual(ranks, new_ranks, n_buckets)
        ranks = new_ranks
    out = ranks.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "rank": t.column("r")}),
        batch_format="pyarrow")
    return out, n_nodes, residual


def _sum_by_node(ds: "ray.data.Dataset",
                 n_buckets: int) -> "ray.data.Dataset":
    """groupby(node).sum(v) as a coarse-bucket vectorized exchange
    (same rationale as dedup._min_label_by_node: the generic sort
    aggregate carries seconds of fixed cost).  Rows carry an emitting-
    bucket column b; segments are lexsorted by (node, b) so float
    addition order is deterministic across runs."""

    def tag(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__bucket", pa.array(hash_part(node, n_buckets), pa.int32()))

    def bucket_sum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        node = g.column("node").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        o = np.lexsort((b, node))
        n2, v2 = node[o], v[o]
        bounds = np.flatnonzero(np.concatenate([[True], n2[1:] != n2[:-1]]))
        return pa.table({
            "node": pa.array(n2[bounds], pa.int64()),
            "v": pa.array(np.add.reduceat(v2, bounds), pa.float64()),
        })

    bucket_sum.__name__ = "pr_sum"
    return ds.map_batches(tag, batch_format="pyarrow").groupby(
        "__bucket", num_partitions=n_buckets).map_groups(
        bucket_sum, batch_format="pyarrow")


def _rank_residual(old: "ray.data.Dataset", new: "ray.data.Dataset",
                   n_buckets: int) -> float:
    """sum |r_new - r_old| via one bucket exchange + partial sums (the
    driver sees n_buckets floats)."""

    def tag_kind(kind):
        def tag(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({
                "node": pa.array(node, pa.int64()),
                "r": t.column("r"),
                "kind": pa.array(np.full(t.num_rows, kind, np.int8),
                                 pa.int8()),
                "__bucket": pa.array(hash_part(node, n_buckets), pa.int32()),
            })
        return tag

    def diff(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy(zero_copy_only=False)
        r = g.column("r").to_numpy(zero_copy_only=False)
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        o = np.lexsort((kind, node))
        n2, r2 = node[o], r[o]
        # nodes appear exactly twice (old + new), adjacent after sort
        d = np.abs(r2[1::2] - r2[0::2])
        assert (n2[1::2] == n2[0::2]).all()
        return pa.table({"s": pa.array([float(d.sum())], pa.float64())})

    diff.__name__ = "pr_residual"
    u = old.map_batches(tag_kind(0), batch_format="pyarrow").union(
        new.map_batches(tag_kind(1), batch_format="pyarrow"))
    parts = u.groupby("__bucket", num_partitions=n_buckets).map_groups(
        diff, batch_format="pyarrow").take_all()
    return float(sum(r["s"] for r in parts))


def triangle_stats(pairs: "ray.data.Dataset",
                   n_parts: int = 32) -> "pa.Table":
    """EXACT triangle / wedge / edge counts of the undirected simple
    graph given as distinct (doc_a < doc_b) edge rows — the global
    clustering-coefficient ingredients (cc = 3*tri / wedges) as three
    exact int64s, via the distributed FORWARD algorithm (Schank &
    Wagner 2005): orient every edge from its lower-(degree, id)
    endpoint to the higher, generate candidate wedges only among each
    source's OUT-neighbors (out-degree is bounded by O(sqrt(m)), so a
    dense near-dup clique can never explode the wedge stage the way
    naive node-iteration does), and close each wedge against the
    oriented edge set.  Every triangle {a ≺ b ≺ c} is counted exactly
    once — as the wedge (b, c) generated at a.

    Exchanges: (1) endpoint partials -> degree groupby; (2)(3) two
    partitioned hash joins attach deg(a) / deg(b) to each edge; (4) a
    src-hash bucket exchange groups each source's out-neighbors and
    emits wedge candidates keyed (lo, hi) in ≺ order; (5) one
    (lo, hi)-hash bucket exchange matches wedges against oriented
    edges.  The driver receives three integers."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .joins import bucket_exchange, hash_join, hash_part

    def endpoint_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t.column("doc_a").to_numpy(zero_copy_only=False),
            t.column("doc_b").to_numpy(zero_copy_only=False)])
        node, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(node.astype(np.int64)),
                         "deg": pa.array(cnt.astype(np.int64))})

    endpoint_partial.__name__ = "endpoint_partial"
    degrees = pairs.map_batches(
        endpoint_partial, batch_format="pyarrow").groupby(
        "node").aggregate(Sum("deg", alias_name="deg")).materialize()

    # n_edges / n_wedges are degree-local: wedges = sum C(deg, 2)
    def wedge_partial(t: pa.Table) -> pa.Table:
        d = t.column("deg").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
            "e": pa.array([int(d.sum())], pa.int64()),
        })

    wedge_partial.__name__ = "wedge_partial"
    we = degrees.map_batches(wedge_partial, batch_format="pyarrow") \
        .aggregate(Sum("w", alias_name="w"), Sum("e", alias_name="e"))
    # divide the GLOBAL degree sum (handshake lemma) — a per-batch //2
    # would lose odd remainders
    n_wedges, n_edges = int(we["w"]), int(we["e"]) // 2

    deg_a = degrees.map_batches(
        lambda t: pa.table({
            "doc_a": t.column("node").cast(pa.int64()),
            "deg_a": t.column("deg").cast(pa.int64())}),
        batch_format="pyarrow")
    deg_b = degrees.map_batches(
        lambda t: pa.table({
            "doc_b": t.column("node").cast(pa.int64()),
            "deg_b": t.column("deg").cast(pa.int64())}),
        batch_format="pyarrow")
    with_a = hash_join(pairs, deg_a, "doc_a", "doc_a",
                       n_buckets=n_parts // 2)
    with_ab = hash_join(with_a, deg_b, "doc_b", "doc_b",
                        n_buckets=n_parts // 2)

    MIX_A = np.uint64(0x9E3779B97F4A7C15)
    MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)

    def _pair_part(v: np.ndarray, w: np.ndarray) -> np.ndarray:
        h = (v.astype(np.uint64) * MIX_A) ^ (w.astype(np.uint64) * MIX_B)
        return ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(
            np.int32)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = t.column("doc_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        da = t.column("deg_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        db = t.column("deg_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        # src = lower (deg, id) endpoint
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddst = np.where(a_first, db, da)
        return pa.table({
            "src": pa.array(src), "dst": pa.array(dst),
            "deg_dst": pa.array(ddst),
            "spart": pa.array(hash_part(src, n_parts)),
        })

    orient.__name__ = "orient"
    oriented = with_ab.map_batches(
        orient, batch_format="pyarrow").materialize()

    def gen_wedges(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        dd = g.column("deg_dst").to_numpy(zero_copy_only=False)
        o = np.lexsort((dst, dd, src))  # per-src out-neighbors ≺-sorted
        s2, d2, dd2 = src[o], dst[o], dd[o]
        bounds = np.flatnonzero(np.concatenate(
            [[True], s2[1:] != s2[:-1]]))
        counts = np.diff(np.append(bounds, len(s2)))
        lo = [np.array([], np.int64)]
        hi = [np.array([], np.int64)]
        # out-degree <= O(sqrt(m)) under forward orientation, so each
        # run's C(c,2) emission is bounded; the loop is per-SOURCE, the
        # emission per source fully vectorized (emit_pairs precedent)
        for s, c in zip(bounds[counts >= 2].tolist(),
                        counts[counts >= 2].tolist()):
            iu, ju = np.triu_indices(c, k=1)
            # neighbors are ≺-sorted within the run, so (iu, ju) is
            # already (lo ≺ hi) — matches the b→c orientation
            lo.append(d2[s + iu])
            hi.append(d2[s + ju])
        v = np.concatenate(lo)
        w = np.concatenate(hi)
        return pa.table({
            "v": pa.array(v), "w": pa.array(w),
            "is_edge": pa.array(np.zeros(len(v), np.int8)),
            "ppart": pa.array(_pair_part(v, w)),
        })

    gen_wedges.__name__ = "gen_wedges"
    wedges = bucket_exchange(oriented, n_parts, gen_wedges,
                             bucket_col="spart")

    def as_edge_rows(t: pa.Table) -> pa.Table:
        v = t.column("src").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        w = t.column("dst").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "v": pa.array(v), "w": pa.array(w),
            "is_edge": pa.array(np.ones(len(v), np.int8)),
            "ppart": pa.array(_pair_part(v, w)),
        })

    as_edge_rows.__name__ = "as_edge_rows"
    edge_rows = oriented.map_batches(as_edge_rows, batch_format="pyarrow")

    def close_wedges(g: pa.Table) -> pa.Table:
        ise = g.column("is_edge").to_numpy(zero_copy_only=False) > 0
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        ev, ew = v[ise], w[ise]
        wv, ww = v[~ise], w[~ise]
        if not len(ev) or not len(wv):
            return pa.table({"t": pa.array([0], pa.int64())})
        # two-column membership test: pandas inner merge on (v, w) —
        # exact and vectorized in C (edge pairs are unique in a simple
        # graph, so the merge never multiplies wedge rows)
        import pandas as pd

        em = pd.DataFrame({"v": ev, "w": ew})
        wm = pd.DataFrame({"v": wv, "w": ww})
        hit = wm.merge(em, on=["v", "w"], how="inner")
        return pa.table({"t": pa.array([int(len(hit))], pa.int64())})

    close_wedges.__name__ = "close_wedges"
    both = wedges.union(edge_rows)
    tri = bucket_exchange(both, n_parts, close_wedges,
                          bucket_col="ppart").aggregate(
        Sum("t", alias_name="t"))
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([int(tri["t"])], pa.int64()),
    })
