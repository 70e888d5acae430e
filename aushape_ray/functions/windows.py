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


def debounce(ds: "ray.data.Dataset", min_gap_s: int = 60,
             n_parts: int = 64) -> "ray.data.Dataset":
    """Per-(user_id, event_type) event throttling (telemetry debounce):
    keep an event iff it is its key's first, or arrives more than
    min_gap_s after the PREVIOUS event of that key.  "Previous" is the
    previous event in (ts, event_id) order — not the previous KEPT one:
    the stateless-lag semantics is SQL-window-expressible and
    embarrassingly partitionable, where chained suppression would be a
    serial scan per key.  Same coarse hash(user_id)-partition +
    one-vectorized-pandas-pass shape as sessionize (event_type only
    subdivides within a user's rows, so partitioning on user alone
    keeps every key whole)."""

    def to_us(batch: pa.Table) -> pa.Table:
        from .joins import hash_part

        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "part": pa.array(hash_part(uid, n_parts)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                           ignore_index=True)
        same = (df["user_id"].eq(df["user_id"].shift())
                & df["event_type"].eq(df["event_type"].shift()))
        keep = (~same) | (df["ts_us"].diff() > min_gap_s * 1_000_000)
        return df.loc[keep, ["event_id"]]

    per_partition.__name__ = "debounce_partition"
    return ds.map_batches(to_us, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas")


def running_total(ds: "ray.data.Dataset", n_parts: int = 64) -> "ray.data.Dataset":
    """Per-user running total — the SQL window function
    SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING), row-per-event output.

    Same coarse hash(user_id)-partition shape as sessionize/debounce:
    every user's rows land whole in ONE partition (one exchange), and the
    partition is processed in a single vectorized pass — sort by
    (user, ts, event_id), one grouped cumsum — never a per-user Python
    call.  Values go through integer cents (floor(v*100+0.5)) so the
    running sums are order-independent ints, exact at any accumulation
    depth < 2^53 and hash-equal to the SQL replica."""

    def to_us(batch: pa.Table) -> pa.Table:
        from .joins import hash_part

        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = np.asarray(batch.column("value"), np.float64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "part": pa.array(hash_part(uid, n_parts)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts_us", "event_id"],
                           ignore_index=True)
        run = df.groupby("user_id", sort=False)["cents"].cumsum()
        return pd.DataFrame({"event_id": df["event_id"],
                             "running_cents": run.astype("int64")})

    per_partition.__name__ = "running_total_partition"
    return ds.map_batches(to_us, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas")


def moving_sum(ds: "ray.data.Dataset", frame: int = 5,
               n_parts: int = 64) -> "ray.data.Dataset":
    """Per-user BOUNDED-frame window — the SQL
    SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW), row-per-event.

    Same coarse user-hash partition as running_total; the frame sum is
    two gathers into one exclusive cumsum (cs[i+1] - cs[max(i-frame+1,
    run_start)]), so a partition costs O(n) regardless of frame size —
    no pandas rolling, no per-user Python.  Integer cents keep the sums
    exact and order-independent."""

    def to_us(batch: pa.Table) -> pa.Table:
        from .joins import hash_part

        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = np.asarray(batch.column("value"), np.float64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": pa.array(uid, pa.int64()),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "part": pa.array(hash_part(uid, n_parts)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts_us", "event_id"],
                           ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        n = len(cents)
        starts = np.flatnonzero(np.concatenate(
            [[True], uid[1:] != uid[:-1]]))
        run_start = np.repeat(starts, np.diff(np.append(starts, n)))
        cs = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(np.arange(n) - (frame - 1), run_start)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "moving_cents": (cs[np.arange(n) + 1] - cs[lo]).astype(
                "int64"),
        })

    per_partition.__name__ = "moving_sum_partition"
    return ds.map_batches(to_us, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas")


def range_interval_sum(ds: "ray.data.Dataset", gap_s: int = 3600,
                       n_parts: int = 64) -> "ray.data.Dataset":
    """Per-user TIME-based window frame — the SQL
    SUM(cents) OVER (PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL gap_s SECOND PRECEDING AND CURRENT ROW),
    row-per-event.  The RANGE complement of moving_sum's ROWS frame:
    the frame is every row whose ts lies in [cur_ts - gap, cur_ts],
    INCLUDING peers (rows sharing cur_ts), per SQL RANGE semantics.

    Same coarse user-hash partition as moving_sum; the frame bounds are
    TWO searchsorted calls over the whole partition via the disjoint-
    run-offset composite: each user run's timestamps are rebased onto a
    shared axis with > gap spacing between runs, so one globally sorted
    array answers every row's [lo, hi) in O(n log n) — no per-user
    Python.  If the rebased axis would overflow int64 (astronomically
    many runs x span), falls back to an exact per-run searchsorted loop.
    Integer cents keep the sums exact and order-independent."""
    gap_us = gap_s * 1_000_000

    def to_us(batch: pa.Table) -> pa.Table:
        from .joins import hash_part

        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = np.asarray(batch.column("value"), np.float64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": pa.array(uid, pa.int64()),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            "part": pa.array(hash_part(uid, n_parts)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["user_id", "ts_us", "event_id"],
                           ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        n = len(ts)
        if not n:
            return pd.DataFrame({"event_id": np.array([], np.int64),
                                 "range_cents": np.array([], np.int64)})
        starts = np.flatnonzero(np.concatenate(
            [[True], uid[1:] != uid[:-1]]))
        ends = np.append(starts[1:], n)
        mn, mx = ts[starts], ts[ends - 1]
        # rebase run r onto [shift_r, shift_r + span_r] with gap_us + 1
        # spacing after run r-1 — t2 is then globally sorted and a window
        # can never reach across a run boundary
        spans = (mx - mn).astype(np.float64)
        shift_f = np.concatenate(
            [[0.0], np.cumsum(spans[:-1] + (gap_us + 1.0))])
        cs = np.concatenate([[0], np.cumsum(cents)])
        if n and shift_f[-1] + spans[-1] < 2.0 ** 62:
            shift = shift_f.astype(np.int64)
            t2 = (ts - np.repeat(mn, ends - starts)
                  + np.repeat(shift, ends - starts))
            lo = np.searchsorted(t2, t2 - gap_us, side="left")
            hi = np.searchsorted(t2, t2, side="right")
        else:  # exact fallback; unreachable at any realistic scale
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for s, e in zip(starts, ends):
                lo[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e] - gap_us, side="left")
                hi[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e], side="right")
        return pd.DataFrame({
            "event_id": df["event_id"],
            "range_cents": (cs[hi] - cs[lo]).astype("int64"),
        })

    per_partition.__name__ = "range_interval_partition"
    return ds.map_batches(to_us, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas")


def user_day_streaks(ds: "ray.data.Dataset",
                     n_parts: int = 32) -> "ray.data.Dataset":
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days, returned as a bounded histogram (streak_days, n_users) — the
    engagement-streak metric (and the classic SQL islands shape,
    day - row_number() grouping).

    Scale shape: each batch reduces to its distinct (user, day) rows
    (<= users x days partials); ONE coarse user-hash exchange
    co-locates each user's day set; a single vectorized pass over the
    sorted partition finds island boundaries, island lengths via index
    diffs, per-user maxima via maximum.reduceat (islands of a user are
    contiguous after the sort), and pre-bins the histogram — the
    closing groupby moves <= distinct-streak-length counters per
    partition."""
    US_DAY = 86_400_000_000

    def distinct_partial(t: pa.Table) -> pa.Table:
        from .joins import hash_part

        day = pc.divide(t.column("ts").cast(pa.int64()),
                        pa.scalar(US_DAY, pa.int64()))
        g = pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "day": day,
        }).group_by(["user_id", "day"]).aggregate([])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        return g.append_column("part", pa.array(hash_part(uid, n_parts)))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], ignore_index=True)
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        n = len(d)
        if not n:
            return pd.DataFrame({"streak_days": np.array([], np.int64),
                                 "n_users": np.array([], np.int64)})
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)])
        starts = np.flatnonzero(brk)
        lengths = np.diff(np.append(starts, n))
        iu = u[starts]
        user_starts = np.flatnonzero(np.concatenate(
            [[True], iu[1:] != iu[:-1]]))
        best = np.maximum.reduceat(lengths, user_starts)
        streak, cnt = np.unique(best, return_counts=True)
        return pd.DataFrame({"streak_days": streak.astype(np.int64),
                             "n_users": cnt.astype(np.int64)})

    per_partition.__name__ = "streaks_partition"
    from ray.data.aggregate import Sum

    return ds.map_batches(
        distinct_partial, batch_format="pyarrow").groupby(
        "part", num_partitions=n_parts).map_groups(
        per_partition, batch_format="pandas").groupby(
        "streak_days").aggregate(Sum("n_users", alias_name="n_users"))


def late_event_stats(ds: "ray.data.Dataset", allow_s: int = 600,
                     n_parts: int = 32,
                     order_col: str = "event_id") -> "ray.data.Dataset":
    """Watermark-based late-data accounting (the streaming-engine
    semantics, simulated deterministically over a table): arrival order
    is `order_col` ascending; after each arrival the watermark is
    max(event time so far) - allow_s; an event is LATE iff its event
    time is below the watermark of the strictly preceding arrivals.
    Returns (event_type, n_total, n_late).

    Distributed shape — a classic PREFIX SCAN WITH CARRY, no sort and no
    sequential pass:
      1. events are range-partitioned by event_id VALUE (order-preserving
         partitioning; one pass emits each range's max event-time, P tiny
         rows to the driver);
      2. the driver exclusive-cummaxes the P maxima into per-range
         carries (P ints, broadcast back);
      3. a second pass computes each range's late flags vectorized:
         running max = np.maximum.accumulate shifted one right, seeded
         with the carry — and emits per-type (n_total, n_late) partials;
         a final k-row groupby sums them.
    Skew note: value-range partitioning assumes event_ids are roughly
    uniform (dense surrogate keys); a skewed id space would need
    sample-based range bounds (Ray's sort exchange does exactly that)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    allow_us = allow_s * 1_000_000

    lohi = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column(order_col)).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t.column(order_col)).as_py()], pa.int64()),
        }), batch_format="pyarrow").take_all()
    lo = min(r["lo"] for r in lohi)
    hi = max(r["hi"] for r in lohi)
    span = max(hi - lo + 1, 1)

    def add_part(t: pa.Table) -> pa.Table:
        eid = t.column(order_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        part = ((eid - lo) * n_parts // span).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow").materialize()

    # pass 1: per-range event-time max (P tiny rows)
    def range_max(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy(zero_copy_only=False)
        tus = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        out_p, out_m = [], []
        for p in np.unique(part):
            out_p.append(int(p))
            out_m.append(int(tus[part == p].max()))
        return pa.table({"part": pa.array(out_p, pa.int64()),
                         "mx": pa.array(out_m, pa.int64())})

    # per-batch partials are <= n_parts rows; the driver max-merge is
    # O(n_batches * n_parts) ints — no exchange needed
    maxima = parted.map_batches(range_max, batch_format="pyarrow").take_all()
    mx = np.full(n_parts, np.iinfo(np.int64).min, np.int64)
    for r in maxima:
        mx[r["part"]] = max(mx[r["part"]], r["mx"])
    # exclusive cummax: carry[p] = max event time of all ranges before p
    carry = np.empty(n_parts, np.int64)
    carry[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(mx[:-1], out=carry[1:]) if n_parts > 1 else None
    carry_ref = _ray.put(carry)

    # pass 2: per-range vectorized late flags + per-type partials
    def flags(g: pa.Table) -> pa.Table:
        cr = _ray.get(carry_ref)
        df = pa.table({
            "event_id": g.column(order_col).cast(pa.int64()),
            "tus": g.column("ts").cast(pa.int64()),
            "event_type": g.column("event_type"),
        }).to_pandas()
        df = df.sort_values("event_id", ignore_index=True)
        p = int(g.column("part")[0].as_py())
        tus = df["tus"].to_numpy(np.int64)
        run = np.empty(len(tus), np.int64)
        run[0] = cr[p]
        if len(tus) > 1:
            np.maximum.accumulate(tus[:-1], out=run[1:])
            run[1:] = np.maximum(run[1:], cr[p])
        big = np.iinfo(np.int64).min
        late = (run != big) & (tus < run - allow_us)
        out = df.groupby("event_type", sort=False).agg(
            n_total=("tus", "size"))
        out["n_late"] = pd.Series(late, index=df.index).groupby(
            df["event_type"], sort=False).sum().astype(np.int64)
        out = out.reset_index()
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_total": pa.array(out["n_total"].to_numpy(np.int64)),
            "n_late": pa.array(out["n_late"].to_numpy(np.int64)),
        })

    flags.__name__ = "late_flags_partition"
    partials = parted.groupby("part", num_partitions=n_parts).map_groups(
        flags, batch_format="pyarrow")
    return partials.groupby("event_type", num_partitions=2).aggregate(
        Sum("n_total", alias_name="n_total"),
        Sum("n_late", alias_name="n_late"))


def _range_partition_with_carry(ds: "ray.data.Dataset", value_col: str,
                                id_col: str, n_parts: int):
    """Shared scaffold of the exact global-order family (global_rank /
    global_ntile): range-partition rows by value (order-preserving),
    send per-range COUNTS to the driver (P ints), exclusive-cumsum them
    into per-range rank carries.  Returns (parted, carry, n_total) where
    parted is a materialized Dataset of (id_col, value_col, part)."""
    import ray  # noqa: F401

    lohi = ds.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column(value_col)).as_py()],
                           pa.int64()),
            "hi": pa.array([pc.max(t.column(value_col)).as_py()],
                           pa.int64()),
        }), batch_format="pyarrow").take_all()
    lo = min(r["lo"] for r in lohi)
    hi = max(r["hi"] for r in lohi)
    span = max(hi - lo + 1, 1)

    def add_part(t: pa.Table) -> pa.Table:
        v = t.column(value_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        part = ((v - lo) * n_parts // span).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            value_col: pa.array(v, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    parted = ds.map_batches(add_part, batch_format="pyarrow").materialize()

    def range_count(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy(zero_copy_only=False)
        cnt = np.bincount(part, minlength=n_parts)
        nz = np.flatnonzero(cnt)
        return pa.table({"part": pa.array(nz, pa.int64()),
                         "c": pa.array(cnt[nz], pa.int64())})

    counts = parted.map_batches(range_count,
                                batch_format="pyarrow").take_all()
    per_range = np.zeros(n_parts, np.int64)
    for r in counts:
        per_range[r["part"]] += r["c"]
    carry = np.concatenate([[0], np.cumsum(per_range)[:-1]])
    return parted, carry, int(per_range.sum())


def global_ntile(ds: "ray.data.Dataset", value_col: str, id_col: str,
                 k: int, n_parts: int = 32) -> "ray.data.Dataset":
    """SQL NTILE(k) OVER (ORDER BY value_col, id_col) — every row's
    equal-frequency bucket (1-based), standard split: with n rows the
    first n % k tiles hold ceil(n/k) rows, the rest floor(n/k).

    Same prefix-scan-with-carry shape as global_rank (one exchange, the
    driver holds P ints); the rank→tile map is pure arithmetic on the
    carried global rank, so no second pass is needed.  Returns
    (id_col, value_col, tile) so downstream per-tile aggregates don't
    have to join the value back."""
    parted, carry, n = _range_partition_with_carry(
        ds, value_col, id_col, n_parts)
    big = n % k
    size_big = n // k + 1
    size_small = max(n // k, 1)  # n < k ⇒ every row sits in a big tile
    cut = big * size_big

    def tile_range(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        i = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v))
        rank = np.empty(len(v), np.int64)
        rank[order] = carry[p] + np.arange(len(v))
        tile = np.where(rank < cut, rank // size_big + 1,
                        big + (rank - cut) // size_small + 1)
        return pa.table({id_col: pa.array(i, pa.int64()),
                         value_col: pa.array(v, pa.int64()),
                         "tile": pa.array(tile, pa.int64())})

    tile_range.__name__ = "ntile_range"
    return parted.groupby("part", num_partitions=n_parts).map_groups(
        tile_range, batch_format="pyarrow")


def global_rank(ds: "ray.data.Dataset", value_col: str, id_col: str,
                n_parts: int = 32) -> "ray.data.Dataset":
    """EXACT global dense ordering: rank of every row under
    (value_col, id_col) ascending — row_number semantics with a
    deterministic tie-break, WITHOUT a full sort exchange.

    Distributed shape (prefix scan with carry, same family as
    late_event_stats / packing.chunk_plan): rows range-partition by
    value_col VALUE (order-preserving); pass 1 sends per-range COUNTS to
    the driver (P ints), which exclusive-cumsums them into per-range
    rank carries; pass 2 sorts only WITHIN each range and adds the
    carry.  The exchange ships each row once; the driver holds P ints —
    vs Ray's sort exchange, which samples, range-splits, and merges the
    same rows with a ~2-3s fixed cost at any size.

    Skew note: value-range partitioning assumes value_col is roughly
    uniform over its min/max span.  A skewed distribution needs sampled
    range bounds (what Ray's sort exchange does) — stated, not hidden.
    Returns (id_col, rank) with rank 0-based."""
    parted, carry, _n = _range_partition_with_carry(
        ds, value_col, id_col, n_parts)

    def rank_range(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        i = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v))
        rank = np.empty(len(v), np.int64)
        rank[order] = carry[p] + np.arange(len(v))
        return pa.table({id_col: pa.array(i, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    rank_range.__name__ = "rank_range"
    return parted.groupby("part", num_partitions=n_parts).map_groups(
        rank_range, batch_format="pyarrow")
