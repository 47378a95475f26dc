"""Join operators (ray_guide "Joins and lookups" patterns).

* ``broadcast_join`` — small side shipped ONCE via ``ray.put``; every batch
  does a vectorized ``pc.index_in`` + ``take`` lookup in an actor pool. No
  shuffle; the pattern for dimension tables / vocab / lang lookups.
* ``hash_join`` — both sides large: explicit partitioned hash join as a
  two-stage exchange over raw Ray tasks (the one place the Dataset API
  can't express the semantics without shipping a padded union of both
  schemas through the shuffle):

  1. each input block is split into ``num_buckets`` sub-tables by a
     vectorized hash of its OWN key column (``num_returns=num_buckets``,
     so each (block, bucket) piece is its own plasma object — narrow rows,
     no null padding, no side tag);
  2. one join task per bucket concatenates its pieces from both sides and
     joins them with Acero (``pa.Table.join``) — vectorized C++, not a
     pandas merge.

  Defaults: ``num_buckets ≈ 2×CPUs``; the key hash is
  ``pandas.util.hash_array`` (deterministic, vectorized, works for ints
  AND strings — never ``%`` on raw values). Skew: per-bucket Acero joins
  tolerate within-bucket key repetition; genuinely hot keys can be routed
  through the broadcast path with ``hot_keys`` (their right-side rows are
  broadcast and left rows joined per batch, no shuffle participation).

  Ray 2.49's built-in ``Dataset.join`` was measured 10x slower on the
  lineitem⋈orders benchmark (49.9s vs 5.3s at sf0.1/32cpu), so the
  explicit exchange stays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool

from .exchange import bincount_i64


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


def broadcast_join(ds, small: pa.Table, key_col: str, concurrency=None):
    """Left join *ds* against the small *small* table on ``key_col``.
    ``concurrency`` defaults to the node-relative pool (resolved at CALL
    time — a def-time default would bake in the pre-ray.init CPU count).
    """
    import ray
    if concurrency is None:
        concurrency = actor_pool()
    ref = ray.put(small)
    return ds.map_batches(BroadcastJoinStage,
                          fn_constructor_kwargs=dict(small_ref=ref,
                                                     key_col=key_col),
                          batch_format="pyarrow", batch_size=8192,
                          concurrency=concurrency)


def _key_hash(col) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of an Arrow key column (ints,
    strings, anything pandas can hold)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.to_pandas().to_numpy()
    return pd.util.hash_array(values)


def _keys_list(key) -> list:
    return [key] if isinstance(key, str) else list(key)


def _keys_hash(tbl: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Combined row hash over one or more key columns (FNV-style mix —
    order-sensitive, identical on both join sides)."""
    h = _key_hash(tbl.column(keys[0]))
    for k in keys[1:]:
        h = h * np.uint64(0x100000001B3) ^ _key_hash(tbl.column(k))
    return h


def _split_by_bucket(tbl: pa.Table, key, num_buckets: int,
                     cols: Sequence[str]):
    """One input block → num_buckets sub-tables (narrow, own side only)."""
    if tbl.num_rows == 0:
        # Ray group-by outputs can contain a zero-COLUMN empty block;
        # empties are dropped downstream, so pass it through untouched
        sub = tbl.select([c for c in cols if c in tbl.column_names])
        return [sub] * num_buckets if num_buckets > 1 else [sub]
    tbl = tbl.select(list(cols))
    b = (_keys_hash(tbl, _keys_list(key))
         % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    counts = np.bincount(b, minlength=num_buckets)
    out, lo = [], 0
    for n in counts:
        out.append(sorted_tbl.slice(lo, n))
        lo += n
    return out


def _select_bucket_cols(tbl: pa.Table, cols: Sequence[str]) -> pa.Table:
    """num_buckets=1 piece: column-prune only (zero-column empty blocks
    pass through untouched, like _split_by_bucket)."""
    if tbl.num_rows == 0:
        return tbl.select([c for c in cols if c in tbl.column_names])
    return tbl.select(list(cols))


def _concat_filtered(schema: pa.Schema, pieces) -> pa.Table:
    """Task: concat already-filtered pieces; typed empty table when every
    piece is empty (``pa.concat_tables([])`` raises)."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return schema.empty_table()
    return pa.concat_tables(pieces).combine_chunks()


_JOIN_TYPES = {"inner": "inner", "left": "left outer",
               "full": "full outer",
               "semi": "left semi", "anti": "left anti"}


def _join_bucket(left_key, right_key, empty_schema: pa.Schema,
                 l_pieces, r_pieces, how: str = "inner"):
    import ray
    lks, rks = _keys_list(left_key), _keys_list(right_key)
    # pieces arrive as lists of ObjectRefs (nested refs are not auto-
    # resolved); task-side ray.get is a zero-copy plasma read
    if l_pieces and isinstance(l_pieces[0], ray.ObjectRef):
        l_pieces = ray.get(list(l_pieces))
    if r_pieces and isinstance(r_pieces[0], ray.ObjectRef):
        r_pieces = ray.get(list(r_pieces))
    lt = pa.concat_tables([t for t in l_pieces if t.num_rows]) \
        if any(t.num_rows for t in l_pieces) else None
    rt = pa.concat_tables([t for t in r_pieces if t.num_rows]) \
        if any(t.num_rows for t in r_pieces) else None
    if lt is None:
        if how == "full" and rt is not None:
            # right-only rows: keys land in the (coalesced) left key
            # columns, left non-key columns are null
            ren = dict(zip(rks, lks))
            out = rt.rename_columns(
                [ren.get(n, n) for n in rt.column_names])
            for f in empty_schema:
                if f.name not in out.column_names:
                    out = out.append_column(
                        f, pa.nulls(out.num_rows, f.type))
            return out.select(empty_schema.names).combine_chunks()
        return empty_schema.empty_table()
    if rt is None:
        if how in ("inner", "semi"):
            return empty_schema.empty_table()
        if how == "anti":  # nothing to exclude: every left row survives
            return lt.select(empty_schema.names).combine_chunks()
        # left/full outer: left rows with null right columns
        out = lt
        for f in empty_schema:
            if f.name not in out.column_names:
                out = out.append_column(f, pa.nulls(out.num_rows, f.type))
        return out.select(empty_schema.names).combine_chunks()
    out = lt.join(rt, keys=lks, right_keys=rks,
                  join_type=_JOIN_TYPES[how])
    if how == "inner":
        for lk, rk in zip(lks, rks):
            if rk != lk and rk not in out.column_names:
                # Acero drops the right key column; reinstate it for
                # schema parity
                out = out.append_column(rk, out.column(lk))
    return out.select(empty_schema.names).combine_chunks()


#: strategy="auto": a right side at or below this many rows broadcasts
#: (one plasma table read by every join actor) instead of shuffling
AUTO_BROADCAST_ROWS = 100_000
#: strategy="auto": a right side whose PROJECTED bytes (sampled avg row
#: width × count) fit under this broadcasts even above the row cap — a
#: 5 MB 320k-row lookup table is cheaper shipped once to every join
#: task than an all-to-all of a billion-row left side
AUTO_BROADCAST_BYTES = 64 * 1024 * 1024
#: never byte-estimate (or broadcast) a right side above this many rows
#: — the per-task build of the in-memory hash index stops being cheap
AUTO_BROADCAST_MAX_ROWS = 8_000_000


def plan_join_strategy(l_rows: int, r_rows: int, how: str,
                       n_keys: int, num_buckets: int,
                       r_bytes: Optional[int] = None):
    """The ``strategy="auto"`` planner, pure on two row counts (plus an
    optional sampled right-side byte estimate): returns
    ``(strategy, hot_threshold)``. A small right side broadcasts (no
    shuffle) — small by row count, or by projected bytes when the
    caller sampled them; a big one buckets, with a hot-key threshold
    (inner single-key only) set so any key hotter than ~4 average
    buckets takes the broadcast side-route — the same exact output,
    without one task holding the whole hot bucket."""
    if how != "full":
        if r_rows <= AUTO_BROADCAST_ROWS:
            return "broadcast", None
        if (r_bytes is not None and r_rows <= AUTO_BROADCAST_MAX_ROWS
                and r_bytes <= AUTO_BROADCAST_BYTES):
            return "broadcast", None
    if how == "inner" and n_keys == 1:
        return "bucket", max(HOT_FLOOR, 4 * l_rows // max(num_buckets, 1))
    return "bucket", None


#: auto hot-key thresholds never fall below this many occurrences — the
#: invariant count_and_hot_keys relies on to pre-filter candidates
#: before the final threshold (which needs the total count) is known
HOT_FLOOR = 65536


def _key_counts_fn(key: str):
    """Per-batch key value-counts — the pre-aggregation both hot-key
    passes ship into the small groupby instead of raw key rows."""

    def _kcounts(b: pa.Table) -> pa.Table:
        col = b.column(key)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        vc = pc.value_counts(col)
        return pa.table({key: vc.field("values"),
                         "n_part": pc.cast(vc.field("counts"),
                                           pa.int64())})

    return _kcounts


def detect_hot_keys(left, key: str, threshold: int) -> list:
    """Distributed hot-key detection: one narrow pass of per-batch key
    value-counts (reduced before the small groupby) collects every key
    whose total multiplicity exceeds ``threshold``. The collected list
    is bounded by ``total_rows / threshold`` keys."""
    from ray.data.aggregate import Sum

    hot_rows = left.map_batches(_key_counts_fn(key),
                                batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("n_part", alias_name="n")) \
        .filter(expr=f"n > {int(threshold)}").take_all()
    return [r[key] for r in hot_rows]


def count_and_hot_keys(left, key: str, num_buckets: int):
    """Fused ``strategy="auto"`` planner pass: ONE narrow execution of
    ``left`` returns ``(l_rows, hot_keys)`` — versus the two full
    executions (``count()`` then :func:`detect_hot_keys`) the naive
    order costs on an unmaterialized pipeline.

    The final threshold ``max(HOT_FLOOR, 4·l_rows/num_buckets)`` is
    only known once ``l_rows`` is, but it is always ≥ ``HOT_FLOOR`` —
    so each block of the grouped per-key totals emits its count partial
    plus the keys above the FLOOR (a bounded superset: at most
    ``l_rows / HOT_FLOOR`` keys), and the driver resolves the exact
    threshold over that small collection. Count partials ride rows with
    ``n = 0`` (never above any threshold), so data keys — including a
    genuinely-null hot key — cannot collide with them."""
    from ray.data.aggregate import Sum

    def _partials(b: pa.Table) -> pa.Table:
        n = b.column("n")
        tot = pc.sum(n).as_py() or 0
        cand = b.filter(pc.greater(n, HOT_FLOOR))
        k = cand.column(key)
        k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        return pa.table({
            key: pa.concat_arrays([k, pa.array([None], type=k.type)]),
            "n": pa.array(cand.column("n").to_pylist() + [0],
                          type=pa.int64()),
            "tot_part": pa.array([0] * cand.num_rows + [tot],
                                 type=pa.int64())})

    rows = left.map_batches(_key_counts_fn(key), batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("n_part", alias_name="n")) \
        .map_batches(_partials, batch_format="pyarrow").take_all()
    l_rows = sum(r["tot_part"] for r in rows)
    threshold = max(HOT_FLOOR, 4 * l_rows // max(num_buckets, 1))
    return l_rows, [r[key] for r in rows if r["n"] > threshold]


def hash_join(left, right, left_key, right_key,
              num_buckets: Optional[int] = None,
              left_cols: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              hot_keys: Optional[Sequence] = None,
              how: str = "inner",
              hot_threshold: Optional[int] = None,
              strategy: Optional[str] = None):
    """Join two large Datasets via an explicit two-stage bucket exchange
    (module docstring). Returns a Dataset of the joined rows.

    ``left_key`` / ``right_key``: a column name or a SEQUENCE of names
    (composite key — both sides bucket by one combined row hash, and the
    per-bucket Acero join equates the columns pairwise in order).

    ``how``: ``inner`` (default), ``left`` (left outer — unmatched left
    rows keep null right columns), ``full`` (full outer — unmatched rows
    on EITHER side survive; the join keys are coalesced into the left key
    column, so right-only rows carry their key there), ``semi`` (left
    rows with >=1 match, left columns only), ``anti`` (left rows with NO
    match, left columns only). Hash co-partitioning makes every mode
    exact per bucket: a left row's matches all live in its own bucket, so
    match/no-match is decided locally. For ``semi``/``anti`` only the KEY column of the right side
    enters the shuffle — the membership-test shape decontamination and
    "customers without orders" curation passes want.

    ``hot_keys``: keys routed around the shuffle — their right-side rows
    are broadcast once and the matching left rows join per input batch
    (the salt escape hatch for keys whose bucket would not fit a worker).
    Inner-only (raise otherwise).

    ``hot_threshold``: detect the hot keys automatically — one extra
    narrow pass over the LEFT side (per-batch key value-counts, already
    reduced before the small groupby) collects every key whose total
    multiplicity exceeds the threshold; those become ``hot_keys``. The
    collected list is bounded by ``total_rows / hot_threshold`` keys, so
    driver memory stays small at any corpus size. Inner-only.

    ``strategy``: ``None``/``"bucket"`` = the two-stage bucket exchange
    exactly as configured above; ``"broadcast"`` = the right side is
    concatenated once in a task and every join actor reads it from
    plasma — no shuffle at all (any ``how`` except ``full``: a full
    outer's right-only rows are not per-left-batch decidable);
    ``"auto"`` = plan from cheap counts: a right side ≤
    ``AUTO_BROADCAST_ROWS`` (or byte-sampled small) broadcasts;
    otherwise bucket, and (inner, single-column key) one fused narrow
    pass over the left (:func:`count_and_hot_keys`) yields its count
    and every key hotter than ~4 average buckets, which take the
    broadcast side-route automatically. Auto costs ``right.count()``
    always, plus that single left planning pass only when the plan is
    a hot-key-eligible bucket join — worth it for the shuffle it can
    remove; pass an explicit strategy when the caller already knows
    the shape.
    """
    import ray
    import ray.data as rd

    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    if strategy not in (None, "auto", "bucket", "broadcast"):
        raise ValueError("strategy must be None/'auto'/'bucket'/"
                         "'broadcast'")
    lks, rks = _keys_list(left_key), _keys_list(right_key)
    if len(lks) != len(rks) or not lks:
        raise ValueError("left_key and right_key must name the same "
                         "number of (>=1) columns")
    if (hot_keys or hot_threshold is not None) and how != "inner":
        raise ValueError("hot_keys / hot_threshold need how='inner'")
    if (hot_keys or hot_threshold is not None) and len(lks) > 1:
        raise ValueError("hot_keys / hot_threshold need a single-column "
                         "key")
    if strategy == "broadcast" and how == "full":
        raise ValueError("strategy='broadcast' cannot express a full "
                         "outer join")
    left_key, right_key = lks[0], rks[0]  # hot path reads the scalars

    if num_buckets is None:
        try:
            num_buckets = max(16, 2 * int(ray.cluster_resources()
                                          .get("CPU", 8)))
        except Exception:
            num_buckets = 32

    if strategy == "auto":
        r_rows = right.count()
        r_bytes = None
        if (how != "full" and AUTO_BROADCAST_ROWS < r_rows
                <= AUTO_BROADCAST_MAX_ROWS):
            # row count alone says bucket; sample the projected row
            # width to see if the right side is byte-small anyway
            smp = right.take_batch(2048, batch_format="pyarrow")
            proj = [c for c in (right_cols or smp.column_names)
                    if c in smp.column_names]
            smp = smp.select(proj)
            r_bytes = int(smp.nbytes / max(1, smp.num_rows) * r_rows)
        # broadcast-vs-bucket is decided from the RIGHT side alone —
        # the left count only feeds the bucket branch's hot threshold,
        # derived below in the same pass that finds the hot keys (the
        # previous order paid a full left execution even when the plan
        # came out broadcast and never used it)
        strategy, auto_ht = plan_join_strategy(
            0, r_rows, how, len(lks), num_buckets, r_bytes=r_bytes)
        if (strategy == "bucket" and auto_ht is not None
                and hot_keys is None and hot_threshold is None):
            _, hot_keys = count_and_hot_keys(left, left_key, num_buckets)

    if hot_threshold is not None and hot_keys is None:
        hot_keys = detect_hot_keys(left, left_key, hot_threshold)

    # A side with zero rows AND no recoverable type info (schema() is
    # None — e.g. a map_batches chain whose every block came out empty)
    # can't flow through the typed exchange; resolve the join by its
    # semantics instead of crashing on the missing schema.
    if left.schema() is None:
        if how == "full":
            # every left column's type is unrecoverable; the result is
            # the right side with its key under the left key's name
            # (left non-key columns omitted — degenerate-input contract)
            out = right if right_cols is None \
                else right.select_columns(list(right_cols))
            if rks != lks and out.schema() is not None:
                ren = dict(zip(rks, lks))
                out = out.map_batches(
                    lambda b, ren=ren: b.rename_columns(
                        [ren.get(n, n) for n in b.column_names]),
                    batch_format="pyarrow")
            return out
        return left  # empty left → empty result for every other type
    if right.schema() is None:
        l_out = left if left_cols is None \
            else left.select_columns(list(left_cols))
        if how in ("anti", "left", "full"):
            return l_out  # nothing on the right matches/filters
        return l_out.limit(0)  # inner/semi: no matches possible

    def _names(ds, given):
        if given:
            return list(given)
        sch = ds.schema()
        return list(sch.base_schema.names if hasattr(sch, "base_schema")
                    else sch.names)

    l_names = _names(left, left_cols)
    r_names = _names(right, right_cols)
    clash = (set(l_names) & set(r_names)) - set(lks) - set(rks)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")

    def _types(ds):
        sch = ds.schema()
        sch = sch.base_schema if hasattr(sch, "base_schema") else sch
        if isinstance(sch, pa.Schema):
            return {f.name: f.type for f in sch}

        def conv(t):
            if isinstance(t, pa.DataType):
                return t
            if np.dtype(t) == np.dtype("O"):
                return pa.string()  # pandas object column ≈ strings
            return pa.from_numpy_dtype(t)

        return {n: conv(t) for n, t in zip(sch.names, sch.types)}

    lt, rt = _types(left), _types(right)
    out_fields = [pa.field(n, lt[n]) for n in l_names]
    if how == "inner":
        out_fields += [pa.field(n, rt[n]) for n in r_names
                       if n not in l_names]
    elif how in ("left", "full"):
        # left: unmatched rows have no right key value — it stays out of
        # the output (callers read the left key; matched rows are equal).
        # full: Acero coalesces the keys into the LEFT key column, so
        # right-only rows carry their key there too.
        out_fields += [pa.field(n, rt[n]) for n in r_names
                       if n not in l_names and n not in rks]
    else:  # semi / anti: left columns only; right side is a key filter
        r_names = list(rks)
    empty_schema = pa.schema(out_fields)

    if strategy == "broadcast":
        r_schema = pa.schema([pa.field(n, rt[n]) for n in r_names])
        r_blocks = right.map_batches(
            lambda b: b.select([c for c in r_names
                                if c in b.column_names]),
            batch_format="pyarrow").to_arrow_refs()
        r_ref = ray.remote(_concat_filtered).remote(r_schema, r_blocks)

        def bcast_join(b: pa.Table) -> pa.Table:
            rt = ray.get(r_ref)  # zero-copy plasma read, every batch
            lb = b.select([c for c in l_names if c in b.column_names])
            return _join_bucket(lks, rks, empty_schema, [lb], [rt], how)

        # task function, not an actor pool: the per-call state is one
        # zero-copy plasma read, and pool spin-up would dominate
        # (BASELINE.md round-5 lesson)
        return left.map_batches(bcast_join, batch_format="pyarrow")

    hot_result = None
    if hot_keys:
        hot_arr = pa.array(list(hot_keys))
        r_schema = pa.schema([pa.field(n, rt[n]) for n in r_names])
        # distributed hot-row collect: filter in tasks (the right dataset
        # never streams through the driver), concat the tiny survivors in
        # ONE task whose output ref the HotJoin actors read from plasma
        r_hot_blocks = right.map_batches(
            lambda b: b.select(r_names).filter(
                pc.is_in(b.column(right_key), value_set=hot_arr)),
            batch_format="pyarrow").to_arrow_refs()
        r_hot_ref = ray.remote(_concat_filtered).remote(
            r_schema, r_hot_blocks)

        def hot_join(b: pa.Table) -> pa.Table:
            rt = ray.get(r_hot_ref)  # zero-copy plasma read
            lb = b.select(l_names).filter(
                pc.is_in(b.column(left_key), value_set=hot_arr))
            return _join_bucket(left_key, right_key, empty_schema,
                                [lb], [rt])

        hot_result = left.map_batches(hot_join, batch_format="pyarrow")
        not_hot_l = left.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(
                b.column(left_key), value_set=hot_arr))),
            batch_format="pyarrow")
        not_hot_r = right.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(
                b.column(right_key), value_set=hot_arr))),
            batch_format="pyarrow")
        left, right = not_hot_l, not_hot_r

    split = ray.remote(_split_by_bucket)

    def exchange(ds, key, names):
        block_refs = ds.to_arrow_refs()
        if num_buckets == 1:
            # degenerate: each block is its own (column-pruned) piece; a
            # num_returns=1 split task would ship the LIST _split_by_bucket
            # returns, not the table
            sel = ray.remote(_select_bucket_cols)
            return [[sel.remote(ref, names) for ref in block_refs]]
        per_bucket = [[] for _ in range(num_buckets)]
        for ref in block_refs:
            pieces = split.options(num_returns=num_buckets).remote(
                ref, key, num_buckets, names)
            for i, p in enumerate(pieces):
                per_bucket[i].append(p)
        return per_bucket

    l_buckets = exchange(left, lks, l_names)
    r_buckets = exchange(right, rks, r_names)
    joiner = ray.remote(_join_bucket)
    out_refs = [joiner.remote(lks, rks, empty_schema, lp, rp, how)
                for lp, rp in zip(l_buckets, r_buckets)]
    # refs stay in plasma — the joined blocks never pass through the driver
    joined = rd.from_arrow_refs(out_refs)
    if hot_result is not None:
        joined = joined.union(hot_result)
    return joined


# ---------------------------------------------------------------------------
# Interval (range) join
# ---------------------------------------------------------------------------

def _interval_count_partition(key: str, left_ts: str, right_ts: str,
                              lo_us: int, hi_us: int, id_col: str,
                              l_pieces, r_pieces):
    """One co-partition: for every left row, count right rows with the
    same key and ``left.ts + lo_us < right.ts <= left.ts + hi_us``.

    Fully vectorized via a rank-composite trick: right rows sort once by
    ``key_code * M + rank(ts)`` (M = distinct right ts + 1, so the
    composite orders exactly like (key, ts)); each left bound becomes two
    ``np.searchsorted`` probes — no per-key Python, no pair explosion."""
    from .exchange import resolve_all_pieces
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64())})
    lp = [t for t in resolve_all_pieces(l_pieces) if t.num_columns]
    rp = [t for t in resolve_all_pieces(r_pieces) if t.num_columns]
    if not lp:
        return empty
    lt = pa.concat_tables(lp, promote_options="permissive")
    if lt.num_rows == 0:
        return empty
    l_ids = np.asarray(lt.column(id_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    out_n = np.zeros(len(l_ids), dtype=np.int64)
    rt = pa.concat_tables(rp, promote_options="permissive") if rp else None
    if rt is not None and rt.num_rows:
        rt = rt.filter(pc.is_valid(rt.column(right_ts)))
    if rt is not None and rt.num_rows:
        lv = pc.is_valid(lt.column(left_ts)).to_numpy(zero_copy_only=False)
        lts = np.asarray(pc.cast(pc.cast(
            lt.column(left_ts), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        rts = np.asarray(pc.cast(pc.cast(
            rt.column(right_ts), pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        # joint key dictionary so both sides share codes
        n_l = lt.num_rows
        both = pa.chunked_array([lt.column(key).combine_chunks()
                                 if isinstance(lt.column(key),
                                               pa.ChunkedArray)
                                 else lt.column(key),
                                 rt.column(key).combine_chunks()
                                 if isinstance(rt.column(key),
                                               pa.ChunkedArray)
                                 else rt.column(key)]).combine_chunks()
        codes = np.asarray(both.dictionary_encode().indices,
                           dtype=np.int64)
        l_codes, r_codes = codes[:n_l], codes[n_l:]
        uts = np.unique(rts)
        M = np.int64(len(uts) + 1)
        K = np.sort(r_codes * M + np.searchsorted(uts, rts))
        lo = np.searchsorted(uts, lts + np.int64(lo_us), side="right")
        hi = np.searchsorted(uts, lts + np.int64(hi_us), side="right")
        cnt = (np.searchsorted(K, l_codes * M + hi, side="left")
               - np.searchsorted(K, l_codes * M + lo, side="left"))
        out_n[lv] = cnt[lv]  # null left ts matches nothing (SQL semantics)
    return pa.table({id_col: pa.array(l_ids),
                     "n": pa.array(out_n)})


def interval_count_join(left, right, key: str, left_ts: str = "ts",
                        right_ts: str = "ts", lo_us: int = 0,
                        hi_us: int = 600_000_000, id_col: str = "event_id",
                        num_parts: int = 16):
    """Range/interval join aggregate: one output row per LEFT row
    (``id_col``, ``n``) where ``n`` counts right rows with the same
    ``key`` whose ``right_ts`` lies in the half-open interval
    ``(left_ts + lo_us, left_ts + hi_us]`` (microseconds).

    Scale shape: ONE two-sided hash exchange on ``key`` (narrow,
    pre-projected rows), then one vectorized task per partition — right
    rows are binary-searched, never pair-expanded, so a left row matching
    a million right rows costs two searchsorted probes, not a million
    output pairs. Partitioning assumption: all rows of one key fit a
    worker (same as the reference's per-key grouping; salt with a
    composite key upstream if a single key exceeds that)."""
    from .exchange import hash_exchange2
    return hash_exchange2(left, right, key, key,
                          _interval_count_partition, num_parts,
                          fn_args=(key, left_ts, right_ts, int(lo_us),
                                   int(hi_us), id_col))


def range_lookup_join(ds, bands, value_col: str, out_col: str = "band",
                      band_col: str = "band", lo_col: str = "lo",
                      hi_col: str = "hi"):
    """Broadcast range-lookup (band) join: classify every row's
    ``value_col`` into the band whose half-open interval [lo, hi)
    contains it — the severity-band / latency-bucket / IP-range enrich a
    log pipeline runs on every record. Rows matching no band (or with a
    null value) get a null ``out_col``.

    ``bands``: a SMALL pandas DataFrame (band label, lo, hi) with
    non-overlapping intervals; ``hi`` may be NaN/None for +inf. Scale
    shape: the sorted boundary arrays broadcast ONCE via ``ray.put``
    (zero-copy numpy views per task, like the lang-lookup enrich —
    never re-shipped per batch); each batch costs one ``searchsorted``
    + one ``take``; no shuffle at all."""
    import ray

    b = bands.sort_values(lo_col).reset_index(drop=True)
    los = b[lo_col].to_numpy(dtype=np.float64)
    his = b[hi_col].to_numpy(dtype=np.float64)  # NaN → +inf
    his = np.where(np.isnan(his), np.inf, his)
    if (los[1:] < his[:-1]).any():
        raise ValueError("range_lookup_join: overlapping bands")
    labels = pa.array(list(b[band_col]) + [None])
    ref = ray.put((los, his, labels))

    def lookup(batch: pa.Table) -> pa.Table:
        los_, his_, labels_ = ray.get(ref) \
            if isinstance(ref, ray.ObjectRef) else ref
        v = pc.cast(batch.column(value_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los_, v, side="right") - 1
        miss = len(labels_) - 1
        safe = np.clip(idx, 0, len(los_) - 1)
        ok = (idx >= 0) & ~np.isnan(v) & (v < his_[safe])
        return batch.append_column(
            out_col, labels_.take(pa.array(np.where(ok, safe, miss))))

    return ds.map_batches(lookup, batch_format="pyarrow")


def _interval_pairs_partition(key: str, left_ts: str, right_ts: str,
                              lo_us: int, hi_us: int, left_id: str,
                              right_id: str, l_pieces, r_pieces):
    """One co-partition of :func:`interval_pairs_join`: the counting
    kernel's rank-composite searchsorted gives each left row its
    [lo, hi) span in the (key, ts)-sorted right rows; pairs expand via
    the arange-minus-offsets trick — O(output pairs), no per-key
    Python."""
    from .exchange import resolve_all_pieces
    empty = pa.table({left_id: pa.array([], type=pa.int64()),
                      right_id: pa.array([], type=pa.int64()),
                      "n_matches": pa.array([], type=pa.int64())})
    lp = [t for t in resolve_all_pieces(l_pieces) if t.num_columns]
    rp = [t for t in resolve_all_pieces(r_pieces) if t.num_columns]
    if not lp or not rp:
        return empty
    lt = pa.concat_tables(lp, promote_options="permissive")
    rt = pa.concat_tables(rp, promote_options="permissive")
    if lt.num_rows == 0 or rt.num_rows == 0:
        return empty
    lt = lt.filter(pc.is_valid(lt.column(left_ts)))
    rt = rt.filter(pc.is_valid(rt.column(right_ts)))
    if lt.num_rows == 0 or rt.num_rows == 0:
        return empty
    l_ids = np.asarray(pc.cast(lt.column(left_id), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
    r_ids = np.asarray(pc.cast(rt.column(right_id), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
    lts = np.asarray(pc.cast(pc.cast(
        lt.column(left_ts), pa.timestamp("us")), pa.int64())
        .to_numpy(zero_copy_only=False), dtype=np.int64)
    rts = np.asarray(pc.cast(pc.cast(
        rt.column(right_ts), pa.timestamp("us")), pa.int64())
        .to_numpy(zero_copy_only=False), dtype=np.int64)
    n_l = lt.num_rows
    both = pa.chunked_array([
        lt.column(key).combine_chunks()
        if isinstance(lt.column(key), pa.ChunkedArray)
        else lt.column(key),
        rt.column(key).combine_chunks()
        if isinstance(rt.column(key), pa.ChunkedArray)
        else rt.column(key)]).combine_chunks()
    codes = np.asarray(both.dictionary_encode().indices, dtype=np.int64)
    l_codes, r_codes = codes[:n_l], codes[n_l:]
    uts = np.unique(rts)
    M = np.int64(len(uts) + 1)
    comp = r_codes * M + np.searchsorted(uts, rts)
    ridx = np.argsort(comp, kind="stable")
    K = comp[ridx]
    lo = np.searchsorted(K, l_codes * M
                         + np.searchsorted(uts, lts + np.int64(lo_us),
                                           side="right"), side="left")
    hi = np.searchsorted(K, l_codes * M
                         + np.searchsorted(uts, lts + np.int64(hi_us),
                                           side="right"), side="left")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return empty
    left_of = np.repeat(np.arange(n_l, dtype=np.int64), counts)
    cum_before = np.concatenate([[np.int64(0)],
                                 np.cumsum(counts)[:-1]])
    r_pos = np.repeat(lo, counts) \
        + (np.arange(total, dtype=np.int64)
           - np.repeat(cum_before, counts))
    return pa.table({
        left_id: pa.array(l_ids[left_of]),
        right_id: pa.array(r_ids[ridx[r_pos]]),
        "n_matches": pa.array(counts[left_of], type=pa.int64())})


def interval_pairs_join(left, right, key: str, left_ts: str = "ts",
                        right_ts: str = "ts", lo_us: int = 0,
                        hi_us: int = 600_000_000,
                        left_id: str = "event_id",
                        right_id: str = "event_id", num_parts: int = 16):
    """PAIR-emitting windowed stream-stream join: for every left row,
    every right row of the same ``key`` whose ts lies in the half-open
    ``(left_ts + lo_us, left_ts + hi_us]`` — the multi-touch
    attribution / co-session join, where the aggregate form
    (``interval_count_join``) isn't enough because downstream needs the
    matched rows themselves. Each output pair carries its left row's
    total match count ``n_matches`` (the denominator an equal-split
    attribution divides by). Null timestamps on either side drop.

    Scale shape: ONE two-sided co-partitioned exchange of narrow rows;
    per partition the counting kernel's searchsorted spans expand via
    arange-minus-offsets — cost is O(pairs emitted), bounded by the
    window width, never |L|×|R|."""
    from .exchange import hash_exchange2
    if left_id == right_id:
        raise ValueError("interval_pairs_join: left_id and right_id "
                         "must differ (rename one side upstream)")
    return hash_exchange2(left, right, key, key,
                          _interval_pairs_partition, num_parts,
                          fn_args=(key, left_ts, right_ts, int(lo_us),
                                   int(hi_us), left_id, right_id))


# ---------------------------------------------------------------------------
# join cardinality estimation (plan-time size + hot keys, no join run)
# ---------------------------------------------------------------------------

def _card_partition(pieces_l, pieces_r):
    """One key partition: finalize per-key counts for both sides,
    multiply matches, return (local top rows, local pair total)."""
    from .exchange import resolve_pieces
    empty = pa.table({"key": pa.array([], type=pa.int64()),
                      "nl": pa.array([], type=pa.int64()),
                      "nr": pa.array([], type=pa.int64()),
                      "pairs": pa.array([], type=pa.int64())})
    L = resolve_pieces(pieces_l)
    R = resolve_pieces(pieces_r)
    if not L or not R:
        return empty, 0

    def _tot(tabs):
        t = pa.concat_tables(tabs)
        k = t.column("key").to_numpy()
        n = t.column("n").to_numpy()
        u, inv = np.unique(k, return_inverse=True)
        return u, bincount_i64(inv, n)

    kl, nl = _tot(L)
    kr, nr = _tot(R)
    pos = np.searchsorted(kl, kr)
    pos_c = np.minimum(pos, len(kl) - 1)
    hit = kl[pos_c] == kr
    if not hit.any():
        return empty, 0
    keys = kr[hit]
    nls = nl[pos_c[hit]]
    nrs = nr[hit]
    pairs = nls * nrs
    return pa.table({"key": pa.array(keys, type=pa.int64()),
                     "nl": pa.array(nls),
                     "nr": pa.array(nrs),
                     "pairs": pa.array(pairs)}), int(pairs.sum())


def join_cardinality(left, right, key_l: str, key_r: str, k: int = 10,
                     num_parts: int = 16):
    """Plan-time join-size estimation: the EXACT output cardinality of
    an inner equi-join and its hottest keys, computed from per-key
    counts alone — never running the join. The broadcast-vs-shuffle-
    vs-salt decision input: a key with share_ppm ≫ 1e6/num_parts is
    the straggler the plain hash join would produce.

    Scale shape: each side ships per-batch (key, n) count partials
    (not rows) through one co-partitioned exchange; per-partition work
    is two unique+bincounts and one searchsorted; k×num_parts rows +
    num_parts scalars reach the driver. Returns a pandas frame
    (key, nl, nr, pairs, share_ppm), top-k by (pairs desc, key asc)."""
    import pandas as pd
    import ray
    from .exchange import _fan_out

    def partial(col):
        def f(b: pa.Table) -> pa.Table:
            key = pc.cast(b.column(col), pa.int64())
            t = pa.table({"key": key})
            g = t.group_by(["key"]).aggregate([([], "count_all")])
            return pa.table({"key": g.column("key"),
                             "n": pc.cast(g.column("count_all"),
                                          pa.int64())})
        return f

    lp = left.map_batches(partial(key_l), batch_format="pyarrow")
    rp = right.map_batches(partial(key_r), batch_format="pyarrow")
    work = ray.remote(num_returns=2)(_card_partition)
    outs = [work.remote(a, b) for a, b in
            zip(_fan_out(lp, "key", num_parts),
                _fan_out(rp, "key", num_parts))]
    tabs = ray.get([o[0] for o in outs])
    totals = ray.get([o[1] for o in outs])
    total = sum(totals)
    nonempty = [x for x in tabs if x.num_rows]
    if total == 0 or not nonempty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("key", "nl", "nr", "pairs",
                                       "share_ppm")})
    t = pa.concat_tables(nonempty)
    df = t.to_pandas().sort_values(["pairs", "key"],
                                   ascending=[False, True]).head(k)
    df["share_ppm"] = df["pairs"] * 1_000_000 // total
    return df.reset_index(drop=True)
