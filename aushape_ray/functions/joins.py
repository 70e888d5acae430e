"""Joins for both-sides-large inputs: explicit partitioned hash join.

Pattern (ray_guide 'Joins and lookups'): tag each side with
bucket = hash(key) % B and a side marker, null-pad to a common schema,
union the tagged datasets, groupby(bucket), and join the two sides
pairwise inside map_groups with a pandas merge.  One shuffle of each
side, no driver materialization.  B bounds per-task memory: choose B so
(|A| + |B|) / B fits a worker.  Skewed keys: salt hot keys into
sub-buckets upstream (same recipe as the conv_id salt in
stages/assemble.py).

Small-side joins should NOT use this — broadcast the small side instead
(see pipelines/queries.q_mktsegment_orders).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def hash_part(ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Shared splitmix-style partition hash for integer keys: the ONE
    place the mix lives, so every coarse-partition stage (sessionize,
    as-of, funnel, keep-latest, ...) buckets identically."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (h % np.uint64(n_parts)).astype(np.int32)


def _tag(batch: pa.Table, key: str, side: int, n_buckets: int,
         pad: list[tuple[str, pa.DataType]]) -> pa.Table:
    col = batch.column(key)
    if col.null_count:
        # a null key has no well-defined bucket (NaN astype uint64 is
        # undefined); SQL join semantics drop null keys anyway — make the
        # caller filter or fill them explicitly rather than guessing
        raise ValueError(f"hash_join: key column {key!r} contains "
                         f"{col.null_count} null(s); filter or fill first")
    k = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    bucket = hash_part(k, n_buckets)
    out = batch
    for name, typ in pad:
        out = out.append_column(name, pa.nulls(batch.num_rows, typ))
    out = out.append_column("__bucket", pa.array(bucket, pa.int32()))
    out = out.append_column("__side", pa.array(
        np.full(len(bucket), side, np.int8), pa.int8()))
    return out


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str, n_buckets: int = 32,
              how: str = "inner") -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on integer keys.

    Non-key column names must be disjoint (rename upstream).  Join
    columns keep their original names.
    """
    l_schema, r_schema = left.schema(), right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {left_key, right_key}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    l_pad = [(n, t) for n, t in zip(r_schema.names, r_schema.types)
             if n not in l_cols]
    r_pad = [(n, t) for n, t in zip(l_schema.names, l_schema.types)
             if n not in r_cols]

    lt = left.map_batches(
        lambda b: _tag(b, left_key, 0, n_buckets, l_pad),
        batch_format="pyarrow")
    rt = right.map_batches(
        lambda b: _tag(b, right_key, 1, n_buckets, r_pad),
        batch_format="pyarrow")

    ordered = sorted(set(l_cols) | set(r_cols))

    def align(b: pa.Table) -> pa.Table:
        return b.select(ordered + ["__bucket", "__side"])

    lt = lt.map_batches(align, batch_format="pyarrow")
    rt = rt.map_batches(align, batch_format="pyarrow")

    # output schema: left columns then right-only columns, ORIGINAL arrow
    # types — values are gathered from the Arrow sides by row index (see
    # join_bucket), so types survive exactly; unmatched rows become nulls
    type_of = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    type_of.update({n: t for n, t in zip(l_schema.names, l_schema.types)})
    out_names = l_cols + [c for c in r_cols if c not in l_cols]
    out_schema = pa.schema([(n, type_of[n]) for n in out_names])

    def join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # NO value column ever passes through pandas: the merge runs on
        # (key, row-index) frames only, and the output rows are gathered
        # from the original Arrow tables with take() — float64 upcasts
        # (null padding, or pandas' own upcast of a non-inner merge's
        # unmatched rows) can therefore never round a >2^53 int
        side = group.column("__side")
        a = group.filter(pc.equal(side, 0)).select(l_cols)
        b = group.filter(pc.equal(side, 1)).select(r_cols)
        ak = pd.DataFrame({
            "k": a.column(left_key).to_numpy(zero_copy_only=False),
            "__ia": np.arange(a.num_rows, dtype=np.int64)})
        bk = pd.DataFrame({
            "k": b.column(right_key).to_numpy(zero_copy_only=False),
            "__ib": np.arange(b.num_rows, dtype=np.int64)})
        m = ak.merge(bk, on="k", how=how)
        # unmatched side indices are NaN; as nullable Int64 they become
        # null take-indices, which Arrow take() turns into null rows
        ia = pa.array(m["__ia"].astype("Int64"), from_pandas=True)
        ib = pa.array(m["__ib"].astype("Int64"), from_pandas=True)
        at = a.take(ia)
        bt = b.take(ib)
        cols = {n: at.column(n) for n in l_cols}
        for n in r_cols:
            if n not in cols:
                cols[n] = bt.column(n)
        return pa.table({n: cols[n] for n in out_names}).cast(out_schema)

    join_bucket.__name__ = "join_bucket"
    both = lt.union(rt)
    # raw-Ray bucketed exchange (the sort exchange's fixed cost dwarfed
    # the per-bucket merges); join_bucket merges on the actual keys, so
    # one reduce task owning one hash bucket is exactly the groupby
    # semantics
    return bucket_exchange(both, n_buckets, join_bucket,
                           bucket_col="__bucket")


def interval_count_join(intervals: "ray.data.Dataset",
                        points: "ray.data.Dataset",
                        width: int, id_col: str = "id",
                        out_col: str = "n",
                        num_partitions: int = 32) -> "ray.data.Dataset":
    """Range (interval) join Ray Data lacks natively: for each interval
    [lo, hi) count the points whose value falls inside it — NO equi key.

    ONE exchange: each interval goes to the single bucket of its lower
    bound (lo // width); each point is replicated to its own bucket AND
    the previous one, so the task owning bucket b sees every point an
    interval starting in b can reach.  A per-task sorted searchsorted
    then counts each interval EXACTLY once — no partial-sum aggregate,
    no double counting.  Intervals with zero points still appear (their
    bucket task emits count 0).

    Contract: hi - lo <= width for every interval (raises otherwise) —
    pick width >= the maximum interval length; larger widths mean fewer,
    bigger bucket tasks (points are only ever duplicated 2x).

    intervals: (id_col:int64, lo:int64, hi:int64); points: (v:int64).
    Returns (id_col, out_col:int64).
    """

    def tag_points(b: pa.Table) -> pa.Table:
        v = b.column("v").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = v // width
        return pa.table({
            "__tbucket": pa.array(np.concatenate([bk, bk - 1]), pa.int64()),
            "__side": pa.array(np.ones(2 * len(v), np.int8), pa.int8()),
            id_col: pa.nulls(2 * len(v), pa.int64()),
            "lo": pa.nulls(2 * len(v), pa.int64()),
            "hi": pa.nulls(2 * len(v), pa.int64()),
            "v": pa.array(np.concatenate([v, v]), pa.int64()),
        })

    def tag_intervals(b: pa.Table) -> pa.Table:
        lo = b.column("lo").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = b.column("hi").cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(lo) and int((hi - lo).max()) > width:
            raise ValueError(
                f"interval_count_join: interval length "
                f"{int((hi - lo).max())} exceeds bucket width {width}")
        n = len(lo)
        return pa.table({
            "__tbucket": pa.array(lo // width, pa.int64()),
            "__side": pa.array(np.zeros(n, np.int8), pa.int8()),
            id_col: b.column(id_col).cast(pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "v": pa.nulls(n, pa.int64()),
        })

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    iv = intervals.map_batches(tag_intervals, batch_format="pyarrow")

    def count_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # stay Arrow: a pandas conversion of the null-padded union would
        # upcast id/lo/hi/v to float64 and round values above 2^53
        side = g.column("__side")
        ivs = g.filter(pc.equal(side, 0))
        if not ivs.num_rows:
            return pa.table({id_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        # this bucket's + next bucket's points, each exactly once
        pts = np.sort(g.filter(pc.equal(side, 1)).column("v")
                      .to_numpy(zero_copy_only=False).astype(np.int64))
        lo = ivs.column("lo").to_numpy(zero_copy_only=False).astype(np.int64)
        hi = ivs.column("hi").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.searchsorted(pts, hi) - np.searchsorted(pts, lo)
        return pa.table({id_col: ivs.column(id_col).cast(pa.int64()),
                         out_col: pa.array(cnt.astype(np.int64), pa.int64())})

    count_bucket.__name__ = "count_bucket"

    def add_bucket(b: pa.Table) -> pa.Table:
        tb = b.column("__tbucket").to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bucket", pa.array(hash_part(tb, num_partitions), pa.int32()))

    def count_partition(g: pa.Table) -> pa.Table:
        # one coarse partition holds many tbuckets (hash-assigned);
        # segment by tbucket and run the exact per-bucket kernel on each
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          out_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        tb = g.column("__tbucket").to_numpy(zero_copy_only=False)
        order = np.argsort(tb, kind="stable")
        gs = g.take(pa.array(order, pa.int64()))
        tbs = tb[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], tbs[1:] != tbs[:-1]]))
        ends = np.append(bounds[1:], len(tbs))
        outs = [count_bucket(gs.slice(int(s), int(e - s)))
                for s, e in zip(bounds, ends)]
        return pa.concat_tables(outs) if outs else empty

    count_partition.__name__ = "count_partition"
    # raw-Ray bucketed exchange: the sort exchange's fixed sampling/sort
    # cost dominated this join (bounded bucket count, one pass)
    both = iv.union(pt).map_batches(add_bucket, batch_format="pyarrow")
    out = bucket_exchange(both, num_partitions, count_partition,
                          bucket_col="__bucket")

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column(id_col).cast(pa.int64()),
                         out_col: b.column(out_col).cast(pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def _ensure_arrow(tbl) -> pa.Table:
    """Blocks handed to the raw exchanges are usually Arrow, but Ray
    Data propagates EMPTY blocks past map_batches without running the
    UDF — so a pandas-blocked upstream (map_groups batch_format=
    "pandas") can leak zero-row DataFrame blocks through an Arrow
    conversion stage straight into to_arrow_refs."""
    if isinstance(tbl, pd.DataFrame):
        return pa.Table.from_pandas(tbl, preserve_index=False)
    return tbl


def _split_by_bucket(tbl: pa.Table, n_buckets: int,
                     col: str) -> "list[pa.Table]":
    """Map side of bucket_reduce: slice one block into n_buckets
    sub-tables by its precomputed bucket column.  Zero-row blocks may
    arrive schema-less (empty upstream stages); route them as empties."""
    tbl = _ensure_arrow(tbl)
    if tbl.num_rows == 0 or col not in tbl.column_names:
        return [tbl.slice(0, 0)] * n_buckets
    b = tbl.column(col).to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="stable")
    st = tbl.take(pa.array(order, pa.int64()))
    counts = np.bincount(b, minlength=n_buckets)
    out, off = [], 0
    for c in counts:
        out.append(st.slice(off, int(c)))
        off += int(c)
    return out


def bucket_reduce(ds: "ray.data.Dataset", n_buckets: int, reduce_fn,
                  bucket_col: str = "b") -> "list[pa.Table]":
    """Raw-Ray two-stage tree exchange for SMALL driver-bound
    aggregations (hot-key detection, broadcast dict building).

    ds must already carry an int bucket column in [0, n_buckets).  Every
    block is split into per-bucket slices (one remote task per block,
    num_returns=n_buckets), then one remote reduce task per bucket
    concatenates its slices and applies reduce_fn(table) -> table.
    Returns the resolved per-bucket result tables.

    Rationale: Ray Data's sort-based groupby exchange carries ~2-3s of
    fixed sampling/sort cost that dwarfs kilobyte-scale reductions
    (measured: 3.9s for a 150k-row hot-key sweep vs 0.2s on this path).
    Use the Dataset groupby when the reduced output is itself a Dataset
    a pipeline keeps processing; use this when the result is about to be
    ray.put as a broadcast side or turned into a driver dict anyway."""
    import ray as _ray

    if n_buckets < 2:
        raise ValueError("bucket_reduce needs n_buckets >= 2")

    split = _ray.remote(num_returns=n_buckets)(_split_by_bucket)

    def _reduce(*tables: pa.Table) -> pa.Table:
        # same empty-slice posture as bucket_exchange: schema-less empty
        # slices (from empty upstream blocks) are dropped before concat;
        # the widest empty survives if ALL are empty so reduce_fn still
        # sees the real columns when any block had them
        tables = [_ensure_arrow(t) for t in tables]
        live = [t for t in tables if t.num_rows]
        if not live:
            live = [max(tables, key=lambda t: t.num_columns)]
        return reduce_fn(pa.concat_tables(live).combine_chunks())

    red = _ray.remote(_reduce)
    parts = [split.remote(ref, n_buckets, bucket_col)
             for ref in ds.to_arrow_refs()]
    return _ray.get([red.remote(*[p[b] for p in parts])
                     for b in range(n_buckets)])


def bucket_exchange(ds: "ray.data.Dataset", n_buckets: int, fn,
                    bucket_col: str = "__bucket") -> "ray.data.Dataset":
    """Raw-Ray bucketed exchange returning a DATASET: split every block
    by its precomputed bucket column, one reduce task per bucket applies
    fn(table) -> table, and the results become a Dataset via
    from_arrow_refs — no driver materialization (the driver holds only
    object refs).

    Semantically equivalent to groupby(bucket_col, num_partitions=
    n_buckets).map_groups(fn) for bounded bucket counts, minus the sort
    exchange's seconds-scale fixed sampling/sort cost (measured: the
    interval join's exchange 1.5-3s -> ~0.3s).  Memory posture matches
    Ray Data's AllToAll: the exchange materializes in the object store
    (spillable); use the Dataset groupby when buckets are unbounded or
    the pipeline needs streaming backpressure through the exchange.
    fn receives the bucket's rows WITH bucket_col still present (same as
    map_groups) and may return an empty typed table."""
    import ray as _ray

    split = (_ray.remote(num_returns=n_buckets)(_split_by_bucket)
             if n_buckets > 1 else None)

    def _reduce(*tables: pa.Table) -> pa.Table:
        # fn also runs on empty buckets (typed empty in, typed empty
        # out) so the result blocks always carry the output schema.
        # Schema-less empty slices (from empty upstream blocks) are
        # dropped before concat; the widest empty survives if ALL are
        # empty so fn still sees the real columns when any block had them.
        # NO combine_chunks: on multi-GB buckets (dense near-dup verify)
        # the contiguous copy doubles peak memory; fn gets a chunked
        # table, which filter/take/to_numpy all handle
        tables = [_ensure_arrow(t) for t in tables]
        live = [t for t in tables if t.num_rows]
        if not live:
            live = [max(tables, key=lambda t: t.num_columns)]
        return fn(pa.concat_tables(live))

    red = _ray.remote(_reduce)
    block_refs = ds.to_arrow_refs()
    if n_buckets == 1:  # degenerate: one reduce over all blocks
        return ray.data.from_arrow_refs([red.remote(*block_refs)])
    parts = [split.remote(ref, n_buckets, bucket_col)
             for ref in block_refs]
    out_refs = [red.remote(*[p[b] for p in parts]) for b in range(n_buckets)]
    # blocks stay in the object store; the driver holds only refs
    return ray.data.from_arrow_refs(out_refs)
