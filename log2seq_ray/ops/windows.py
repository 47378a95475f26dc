"""Windowed / stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (ray_guide "Streaming-shaped
workloads"); the idiom is: partition by key, sort within the group, and
compute windows in pandas inside ``groupby(key).map_groups``. Ordering
assumption: per-key ordering only (established by the in-group sort);
no cross-key ordering is required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_sec: int = 1800):
    """Gap-based session windows: one output row per (key, session) with
    n_events and session bounds. A new session starts when the gap from
    the previous event exceeds ``gap_sec``."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("datetime64[us]")
        gap = ts.diff().dt.total_seconds()
        new_sess = (gap.isna() | (gap > gap_sec)).astype("int64")
        sess_id = new_sess.cumsum()
        out = g.assign(__sess=sess_id).groupby("__sess").agg(
            n_events=(ts_col, "size"),
            t_start=(ts_col, "min"),
            t_end=(ts_col, "max"),
        ).reset_index()
        out[key] = g[key].iloc[0]
        out = out.rename(columns={"__sess": "session_no"})
        return out[[key, "session_no", "n_events", "t_start", "t_end"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def session_counts(ds, key: str = "user_id", ts_col: str = "ts",
                   gap_sec: int = 1800):
    """(key, n_sessions, n_events) per key — compact, SQL-checkable."""
    sess = sessionize(ds, key, ts_col, gap_sec)

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_sessions": np.array([g["session_no"].nunique()],
                                   dtype="int64"),
            "n_events": np.array([int(g["n_events"].sum())], dtype="int64"),
        })

    return sess.groupby(key).map_groups(collapse, batch_format="pandas")


def distinct_counts(ds, group_col: str, value_col: str):
    """Exact count-distinct per group, two-phase: per-batch unique pairs →
    groupby(pair) dedup → per-group counts. The shuffle moves only unique
    (group, value) pairs."""
    from ray.data.aggregate import Count, Sum

    def pairs(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col])
        return t.group_by([group_col, value_col]).aggregate([])

    uniq = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby([group_col, value_col]).aggregate(Count(alias_name="_c"))

    def count_group(b: pa.Table) -> pa.Table:
        g = b.select([group_col]).group_by([group_col]).aggregate(
            [([], "count_all")])
        return pa.table({group_col: g.column(group_col),
                         "partial_n": g.column("count_all")})

    return uniq.map_batches(count_group, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("partial_n", alias_name="n"))
