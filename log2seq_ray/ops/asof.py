"""As-of join and per-group top-k (rank) operators.

As-of join (ray_guide "Joins and lookups"): both sides hash-partition by
key (ops.exchange), and each pair of matching partitions is matched with
ONE grouped ``pandas.merge_asof(by=key)`` call. Partitioning assumption:
rows of one key land in one partition (guaranteed by the shared key
hash); per-key ordering is established inside the partition sort, no
global order needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _asof_partition(key, ts_col, keep_right, suffix, strict,
                    l_pieces, r_pieces):
    """All keys of one partition in ONE ``pd.merge_asof(by=key)`` call —
    the grouped as-of is a single C pass over the (ts, key)-sorted sides,
    no per-key Python loop."""
    from .exchange import concat_typed
    # zero-row pieces can carry the untransformed upstream schema (Ray
    # map_batches pass-through) — concat rows only; an all-empty side
    # keeps the transformed schema when any piece has it
    lt = concat_typed(l_pieces, key, ts_col)
    rt = concat_typed(r_pieces, key, *keep_right)
    if lt is None:
        return pa.table({})  # zero-block input: no schema available at all
    # null timestamps: pd.merge_asof raises on null merge keys; a null ts
    # matches nothing in ASOF semantics (DuckDB drops such rows from an
    # inner ASOF join), so filter both sides — same guard as sessionize /
    # the running/trailing window kernels
    lt = lt.filter(pc.is_valid(lt.column(ts_col)))
    if rt is not None:
        rt = rt.filter(pc.is_valid(rt.column(ts_col)))
    lg = lt.to_pandas() \
        .sort_values([ts_col, key], kind="mergesort").reset_index(drop=True)
    if rt is not None:
        # an all-empty right side still flows through merge_asof (empty rg
        # with the right dtypes → all-null <col><suffix> columns)
        rg = rt.to_pandas()[[key] + keep_right] \
            .sort_values([ts_col, key], kind="mergesort") \
            .reset_index(drop=True)
        rg = rg.rename(columns={c: c + suffix for c in rg.columns
                                if c not in (key, ts_col)})
        rg[ts_col + suffix] = rg[ts_col]
        out = pd.merge_asof(lg, rg, on=ts_col, by=key,
                            allow_exact_matches=not strict,
                            direction="backward")
    else:
        out = lg.copy()
        for c in keep_right:
            if c != ts_col:
                out[c + suffix] = pd.Series([None] * len(out))
        out[ts_col + suffix] = pd.Series(
            [pd.NaT] * len(out), dtype=lg[ts_col].dtype)
    return pa.Table.from_pandas(out, preserve_index=False)


def asof_join(left, right, key: str, ts_col: str,
              right_cols: list[str], suffix: str = "_prev",
              strict: bool = True, num_parts: int = 16):
    """For each left row, the latest right row of the same ``key`` with
    ``right.ts < left.ts`` (strict) or ``<=``. Returns left columns +
    ``<col><suffix>`` for each of ``right_cols`` (+ ``ts_prev``).

    Implementation: both sides hash-partition by key (narrow rows, no
    tagged union padding) and matching partitions run one vectorized
    ``merge_asof(by=key)`` each — one exchange total, one Python call per
    partition."""
    import ray
    import ray.data as rd
    from .exchange import split_by_key

    keep_right = [ts_col] + [c for c in right_cols if c != ts_col]
    work = ray.remote(_asof_partition)

    def fan_out(ds):
        from .exchange import fan_out_pieces, stream_block_refs
        return fan_out_pieces(split_by_key, stream_block_refs(ds),
                              num_parts, args=(key, num_parts))

    l_parts = fan_out(left)
    r_parts = fan_out(right)
    return rd.from_arrow_refs(
        [work.remote(key, ts_col, keep_right, suffix, strict, lp, rp)
         for lp, rp in zip(l_parts, r_parts)])


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
    from .exchange import concat_typed
    # concat rows only (zero-row pieces can carry the untransformed
    # upstream schema); an all-empty partition keeps the transformed
    # schema when any piece has it
    t = concat_typed(pieces, group_col, order_col)
    if t is None:
        return pa.table({})  # zero-block input: no schema available at all
    df = t.to_pandas()
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
