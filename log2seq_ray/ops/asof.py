"""As-of join and per-group top-k (rank) operators.

As-of join (ray_guide "Joins and lookups"): both sides are bucketed by
key, sorted by (key, ts) within the bucket, and matched with
``pandas.merge_asof`` inside ``map_groups``. Partitioning assumption:
rows of one key land in one group (guaranteed by the groupby); per-key
ordering is established inside the group, no global order needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, key: str, ts_col: str,
              right_cols: list[str], suffix: str = "_prev",
              strict: bool = True):
    """For each left row, the latest right row of the same ``key`` with
    ``right.ts < left.ts`` (strict) or ``<=``. Returns left columns +
    ``<col><suffix>`` for each of ``right_cols`` (+ ``ts_prev``).

    Implementation: tag-union both sides, group by key, and merge_asof the
    sorted sides per group — one shuffle total.
    """

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("__side",
                                   pa.array([side] * len(b)))
        return fn

    l = left.map_batches(tag("l"), batch_format="pyarrow")
    r = right.map_batches(tag("r"), batch_format="pyarrow")

    l_schema = left.schema()
    l_schema_names = l_schema.names
    # the tagged union pads each side's missing columns with nulls, which
    # floats pandas int columns; restore the left dtypes after the merge
    l_int_cols = []
    base = getattr(l_schema, "base_schema", l_schema)
    if isinstance(base, pa.Schema):
        l_int_cols = [f.name for f in base
                      if pa.types.is_integer(f.type)]
    keep_right = [ts_col] + [c for c in right_cols if c != ts_col]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].drop(columns="__side") \
            .sort_values(ts_col).reset_index(drop=True)
        rg = g.loc[g["__side"] == "r", [key] + keep_right] \
            .sort_values(ts_col).reset_index(drop=True)
        if lg.empty:
            return pd.DataFrame()
        lg = lg[[c for c in lg.columns if c in l_schema_names]]
        # carry the matched right ts as a value column
        rg = rg.drop(columns=[key]).rename(
            columns={c: c + suffix for c in rg.columns
                     if c not in (key, ts_col)})
        rg[ts_col + suffix] = rg[ts_col]
        out = pd.merge_asof(
            lg, rg, on=ts_col,
            allow_exact_matches=not strict, direction="backward")
        for c in l_int_cols:
            if c in out.columns and out[c].dtype == "float64":
                out[c] = out[c].astype("int64")
        return out

    union = l.union(r)
    return union.groupby(key).map_groups(per_key, batch_format="pandas")


def _topk_frame(df: pd.DataFrame, group_col: str, order_col: str, k: int,
                descending: bool, tiebreak, with_rank: bool) -> pd.DataFrame:
    """Vectorized multi-group top-k over one frame: one sort + one
    C-level cumcount — no per-group Python."""
    by = [group_col, order_col] + ([tiebreak] if tiebreak else [])
    asc = [True, not descending] + ([True] if tiebreak else [])
    df = df.sort_values(by, ascending=asc, kind="mergesort")
    r = df.groupby(group_col, sort=False).cumcount() + 1
    out = df[r <= k]
    if with_rank:
        out = out.assign(rank=r[r <= k].astype("int64"))
    return out.reset_index(drop=True)


def _topk_partition(group_col, order_col, k, descending, tiebreak, pieces):
    from .exchange import resolve_pieces
    pieces = resolve_pieces(pieces)
    if not pieces:
        return pa.table({})
    df = pa.concat_tables(pieces).to_pandas()
    return pa.Table.from_pandas(
        _topk_frame(df, group_col, order_col, k, descending, tiebreak,
                    with_rank=True), preserve_index=False)


def top_k_per_group(ds, group_col: str, order_col: str, k: int,
                    descending: bool = True, tiebreak: str | None = None,
                    num_parts: int = 16):
    """Top-k rows per group with deterministic tie-break; adds ``rank``.

    Two phases, both vectorized: each batch prunes to its LOCAL per-group
    top-k (the global top-k rows survive any local prune), then a hash
    exchange by group computes the final ranks one task per partition —
    no per-group Python callable, no full-group shuffle of pruned-away
    rows."""
    from .exchange import hash_exchange

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return _topk_frame(df, group_col, order_col, k, descending,
                           tiebreak, with_rank=False)

    pruned = ds.map_batches(prune, batch_format="pandas")
    return hash_exchange(pruned, group_col, _topk_partition, num_parts,
                         fn_args=(group_col, order_col, k, descending,
                                  tiebreak))
