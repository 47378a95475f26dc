"""Join operators (ray_guide "Joins and lookups" patterns).

* ``broadcast_join`` — small side shipped ONCE via ``ray.put``; every batch
  does a vectorized ``pc.index_in`` + ``take`` lookup in an actor pool. No
  shuffle; the pattern for dimension tables / vocab / lang lookups.
* ``hash_join`` — both sides large: explicit partitioned hash join. Each
  side gets a ``__bucket = key % B`` column inside ``map_batches``, the
  tagged union is grouped by bucket, and matching buckets join pairwise
  with a pandas merge inside ``map_groups``. B and the (documented)
  assumption: key hashing is uniform; salt hot keys into sub-buckets if a
  bucket exceeds worker memory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class BroadcastJoinStage:
    """Actor: resolve ``key_col`` against a broadcast (keys, columns) small
    side; appends the small side's columns (null when unmatched = left
    join)."""

    def __init__(self, small_ref, key_col: str):
        import ray
        small = small_ref if isinstance(small_ref, pa.Table) \
            else ray.get(small_ref)
        self.key_col = key_col
        self.keys = small.column(key_col)
        if isinstance(self.keys, pa.ChunkedArray):
            self.keys = self.keys.combine_chunks()
        self.values = {n: small.column(n).combine_chunks()
                       if isinstance(small.column(n), pa.ChunkedArray)
                       else small.column(n)
                       for n in small.column_names if n != key_col}

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.key_col), value_set=self.keys)
        for name, col in self.values.items():
            batch = batch.append_column(name, col.take(idx))
        return batch


def broadcast_join(ds, small: pa.Table, key_col: str, concurrency=(1, 8)):
    """Left join *ds* against the small *small* table on ``key_col``."""
    import ray
    ref = ray.put(small)
    return ds.map_batches(BroadcastJoinStage,
                          fn_constructor_kwargs=dict(small_ref=ref,
                                                     key_col=key_col),
                          batch_format="pyarrow", batch_size=8192,
                          concurrency=concurrency)


def hash_join(left, right, left_key: str, right_key: str,
              num_buckets: int = 16,
              left_cols: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None):
    """Inner join of two large Datasets via explicit bucket co-partitioning.

    Shuffles each side once (the bucket groupby); each bucket joins with a
    pandas merge. Returns a Dataset of the merged rows.
    """
    import pandas as pd

    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(left_cols) if left_cols else list(l_schema.names)
    r_names = list(right_cols) if right_cols else list(r_schema.names)
    clash = (set(l_names) & set(r_names)) - {left_key, right_key}
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    def _field_type(sch, name):
        if hasattr(sch, "base_schema"):
            sch = sch.base_schema
        if isinstance(sch, pa.Schema):
            return sch.field(name).type
        # PandasBlockSchema: parallel .names / .types (numpy dtypes)
        t = dict(zip(sch.names, sch.types))[name]
        return t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t)

    types = {}
    for names, sch in ((l_names, l_schema), (r_names, r_schema)):
        for n in names:
            types[n] = _field_type(sch, n)
    all_names = l_names + [n for n in r_names if n not in l_names]

    def bucketize(side: str, key: str, own: list):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select(own)
            n = len(b)
            cols = {}
            for name in all_names:
                cols[name] = (b.column(name) if name in own
                              else pa.nulls(n, types[name]))
            cols["__bucket"] = pa.array(
                b.column(key).to_numpy() % num_buckets, type=pa.int32())
            cols["__side"] = pa.array([side] * n, type=pa.string())
            return pa.table(cols)
        return fn

    lds = left.map_batches(bucketize("l", left_key, l_names),
                           batch_format="pyarrow")
    rds = right.map_batches(bucketize("r", right_key, r_names),
                            batch_format="pyarrow")
    tagged = lds.union(rds)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "l", l_names]
        rg = g.loc[g["__side"] == "r", r_names]
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=all_names)
        return lg.merge(rg, left_on=left_key, right_on=right_key)

    return tagged.groupby("__bucket").map_groups(join_bucket,
                                                 batch_format="pandas")
