"""Statistical / windowed aggregates beyond plain groupby counts.

* ``group_quantile`` — exact discrete quantile per group (the element at
  sorted index ``floor((n-1) * q)``, matching DuckDB ``quantile_disc``).
  Needs the group's values together → ``map_groups``; the shuffle moves
  (group, value) pairs only.
* ``hopping_counts`` — hopping (sliding) window counts: window ``size``
  advancing by ``hop``; each event is emitted into size/hop windows
  vectorially inside ``map_batches`` (partials), then one small merge —
  no per-event python, no shuffle of raw events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000


def group_quantile(ds, group_col: str, value_col: str, q: float = 0.5,
                   alias: str = "q"):
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(g[value_col].to_numpy())
        idx = int(np.floor((len(vals) - 1) * q))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             alias: [vals[idx]]})

    return ds.groupby(group_col).map_groups(per_group,
                                            batch_format="pandas")


def hopping_counts(ds, ts_col: str = "ts", by: str = "event_type",
                   size_sec: int = 3600, hop_sec: int = 1800):
    """(by, window_start, n) where windows are [start, start+size) advancing
    by ``hop``. Every event lands in ``size/hop`` windows."""
    from ray.data.aggregate import Sum
    assert size_sec % hop_sec == 0
    k = size_sec // hop_sec

    def partial(b: pa.Table) -> pa.Table:
        # drop null timestamps first: a null in the ChunkedArray int cast
        # silently yields float64/NaN and corrupts the window arithmetic
        b = b.filter(pc.is_valid(b.column(ts_col)))
        ts_us = pc.cast(pc.cast(b.column(ts_col), pa.timestamp("us")),
                        pa.int64()).to_numpy()
        base = (ts_us // (hop_sec * US)) * (hop_sec * US)
        keys = b.column(by)
        tabs = []
        for j in range(k):
            start = base - j * hop_sec * US
            tabs.append(pa.table({by: keys,
                                  "window_start": pa.array(start)}))
        t = pa.concat_tables(tabs)
        g = t.group_by([by, "window_start"]).aggregate([([], "count_all")])
        return pa.table({
            by: g.column(by),
            "window_start": pc.cast(g.column("window_start"),
                                    pa.timestamp("us")),
            "partial_n": g.column("count_all")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "window_start"]) \
        .aggregate(Sum("partial_n", alias_name="n"))
