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
    """(event_type, window_start) -> n, sum_value.  Partial-aggregated in
    map_batches; the groupby shuffles only (type, window) partials."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // (width_s * 1_000_000)) * width_s * 1_000_000
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "window_start": win,
            "value": batch.column("value").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))

    def cast_win(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("window_start")
        return batch.set_column(i, "window_start",
                                batch.column("window_start").cast(pa.timestamp("us")))

    return out.map_batches(cast_win, batch_format="pyarrow")


def sessionize(ds: "ray.data.Dataset", gap_s: int = 1800) -> "ray.data.Dataset":
    """user_id -> n_sessions, n_events: a new session starts when the gap
    to the previous event of that user exceeds gap_s."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().astype("int64").to_numpy()
        gaps = np.diff(ts) > gap_s * 1_000_000
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [int(gaps.sum()) + 1],
            "n_events": [len(ts)],
        })

    per_user.__name__ = "per_user"
    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
