"""Windowed aggregates / sessionization over the events stream table.

Ray Data has no event-time windows; tumbling windows become a derived
bucket column + groupby (pre-aggregated per batch so only per-(key,window)
partials shuffle), and sessionization is a per-key ordered fold inside
groupby(user_id).map_groups (ordering assumption: sort by ts within the
group — stated per SURVEY.md §2.7 guidance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_counts(ds: "ray.data.Dataset", width_s: int = 3600) -> "ray.data.Dataset":
    """(event_type, window_start) -> n, sum_cents.  Partial-aggregated in
    map_batches (only (type, window) partials shuffle); integer-cent sums
    so results are order-independent and DuckDB-hash-equal."""

    def partial(batch: pa.Table) -> pa.Table:
        # dictionary-encode type + factorize window, one bincount per
        # aggregate — no Python strings leave Arrow (same kernel shape
        # as the q1 partial; float64 bincount weights exact: per-batch
        # cents sums << 2^53)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // (width_s * 1_000_000)) * (width_s * 1_000_000)
        v = np.asarray(batch.column("value"), np.float64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        et = pc.dictionary_encode(batch.column("event_type").combine_chunks())
        ti = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        win_u, wi = np.unique(win, return_inverse=True)
        nw = max(1, len(win_u))
        key = ti * nw + wi
        nk = max(1, len(et.dictionary)) * nw
        n = np.bincount(key, minlength=nk)
        sc = np.bincount(key, weights=cents.astype(np.float64),
                         minlength=nk).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({
            "event_type": et.dictionary.take(pa.array(nz // nw)),
            "window_us": pa.array(win_u[nz % nw], pa.int64()),
            "n": pa.array(n[nz].astype(np.int64)),
            "sum_cents": pa.array(sc[nz]),
        })

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_us"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "window_start": batch.column("window_us").cast(pa.int64()).cast(pa.timestamp("us")),
            "n": batch.column("n").cast(pa.int64()),
            "sum_cents": batch.column("sum_cents").cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def sessionize(ds: "ray.data.Dataset", gap_s: int = 1800,
               n_parts: int = 64) -> "ray.data.Dataset":
    """user_id -> n_sessions, n_events: a new session starts when the gap
    to the previous event of that user exceeds gap_s.

    Partitions on hash(user_id) % n_parts and processes ALL of a
    partition's users in one vectorized pandas pass (sort + shift) —
    per-user map_groups would cost one interpreter call per user, which
    is O(users) at corpus scale."""

    def to_us(batch: pa.Table) -> pa.Table:
        # explicit Arrow cast to epoch-us BEFORE any pandas conversion:
        # pandas may coerce timestamp[us] to ns depending on version, which
        # would silently scale the gap threshold by 1000
        from .joins import hash_part

        uid = batch.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "part": pa.array(hash_part(uid, n_parts)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts_us"], ignore_index=True)
        same = df["user_id"].eq(df["user_id"].shift())
        brk = same & (df["ts_us"].diff() > gap_s * 1_000_000)
        out = (df.assign(brk=brk)
               .groupby("user_id", sort=False, as_index=False)
               .agg(n_sessions=("brk", "sum"), n_events=("brk", "size")))
        out["n_sessions"] = out["n_sessions"].astype("int64") + 1
        return out

    per_partition.__name__ = "sessionize_partition"
    return ds.map_batches(to_us, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas")
