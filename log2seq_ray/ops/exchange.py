"""Shared two-stage hash exchange over raw Ray tasks.

The one pattern the Dataset API can't express without per-group Python
callables or padded unions: hash-partition blocks by a key column
(``num_returns`` fan-out, narrow rows), then run ONE vectorized task per
partition over all of its keys. Used by sessionization, per-group top-k,
group quantiles and the partitioned hash join; ``groupby().map_groups``
remains the right tool only when a per-group Python UDF is genuinely
needed.

Fault tolerance: both stages are deterministic side-effect-free tasks, so
Ray lineage reconstructs any lost partition block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bincount_i64(idx: np.ndarray, weights: np.ndarray,
                 minlength: int = 0) -> np.ndarray:
    """Exact int64 weighted bincount. ``np.bincount(weights=...)``
    accumulates in float64 and silently loses exactness above 2^53 —
    a violation of the exact-integer oracle contract for token/count
    totals. This sums in int64 (wrap-checked by numpy semantics never
    applying: partition totals fit int64 by construction)."""
    out = np.zeros(max(minlength, int(idx.max()) + 1 if len(idx) else 0),
                   dtype=np.int64)
    np.add.at(out, idx, np.asarray(weights).astype(np.int64))
    return out


def actor_pool(cap: int | None = None) -> tuple[int, int]:
    """Node-relative actor-pool sizing for ``map_batches(Cls,
    concurrency=...)``: ``(1, cluster CPUs - reserve)``, optionally
    capped. A hardcoded ``(1, 8)`` ceiling starves a 32-core node (the
    stage tops out at 25% utilization — measured as the dominant term in
    the 8→32 scaling gap of the minhash pipeline); leaving a small CPU
    reserve keeps the driver + exchange tasks schedulable."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    hi = max(2, cpus - max(2, cpus // 8))
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)


def split_by_key(tbl: pa.Table, key: str, num_parts: int):
    """One block → num_parts sub-tables by a deterministic vectorized hash
    of ``key`` (pandas.util.hash_array — ints AND strings, never raw %)."""
    if isinstance(tbl, pd.DataFrame):
        # zero-row pandas-backed blocks pass through to_arrow_refs
        # unconverted (e.g. an empty rd.from_pandas input)
        tbl = pa.Table.from_pandas(tbl, preserve_index=False)
    if tbl.num_rows == 0:
        # Ray group-by outputs can contain a zero-COLUMN empty block;
        # route the (possibly schemaless) empty through every partition —
        # resolve_pieces drops empties, resolve_all_pieces keeps them only
        # for their schema
        return [tbl] * num_parts
    col = tbl.column(key)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    h = pd.util.hash_array(col.to_pandas().to_numpy())
    part = (h % np.uint64(num_parts)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    s = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=num_parts)
    out, lo = [], 0
    for n in counts:
        out.append(s.slice(lo, n))
        lo += n
    return out


def resolve_pieces(pieces):
    """Task-side: resolve a list of (possibly ref) pieces and drop empties."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    return [p for p in pieces if p.num_rows]


def resolve_all_pieces(pieces):
    """Task-side resolve KEEPING empty pieces — an empty piece still
    carries the input schema, letting an empty partition produce a
    correctly-typed empty output instead of a zero-column ``pa.table({})``
    (mixed block schemas break ``Dataset.schema()`` / ``union``)."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    return list(pieces)


def segment_pair_indices(keys: np.ndarray, max_seg: int | None = None,
                         warn_label: str | None = None):
    """All i<j row-index pairs within equal-key segments of a SORTED key
    array — the shared kernel of every bucketed pair expansion (MinHash
    bands, SimHash buckets, n-gram Jaccard shingles, near-dup ingest).
    Fully vectorized: Σ m(m-1)/2 pairs from one repeat/cumsum pass.

    ``max_seg`` truncates each segment to its first ``max_seg`` rows (the
    hot-bucket cap — logs when it bites; candidate recall is reduced).
    Returns ``(kept, i_row, j_row)``: ``kept`` is the boolean mask over
    the INPUT rows that survived the cap (``None`` when nothing was
    truncated) — callers must index their parallel payload arrays with it
    before using the pair indices, which are positions in the KEPT rows.
    ``i_row`` is the earlier (smaller-position) side of each pair."""
    starts = np.ones(len(keys), dtype=bool)
    starts[1:] = keys[1:] != keys[:-1]
    seg_start = np.maximum.accumulate(
        np.where(starts, np.arange(len(keys)), 0))
    within = np.arange(len(keys)) - seg_start
    kept = None
    if max_seg is not None:
        over = within >= max_seg
        if over.any():
            if warn_label:
                import logging
                logging.getLogger(__name__).warning(
                    "%s: truncated %d rows beyond max_seg=%d (hot "
                    "bucket) — candidate recall reduced",
                    warn_label, int(over.sum()), max_seg)
            kept = ~over
            keys = keys[kept]
            starts = np.ones(len(keys), dtype=bool)
            starts[1:] = keys[1:] != keys[:-1]
            seg_start = np.maximum.accumulate(
                np.where(starts, np.arange(len(keys)), 0))
            within = np.arange(len(keys)) - seg_start
    tot = int(within.sum())
    if tot == 0:
        e = np.empty(0, dtype=np.int64)
        return kept, e, e
    j_row = np.repeat(np.arange(len(keys)), within)
    block_start = np.cumsum(within) - within
    i_in_block = np.arange(tot) - np.repeat(block_start, within)
    i_row = np.repeat(seg_start, within) + i_in_block
    return kept, i_row, j_row


def concat_typed(pieces, *required):
    """Task-side concat of one partition's pieces for kernels that need a
    plain (single-schema) ``concat_tables``. Zero-row pieces are excluded
    from the concat — Ray passes zero-row blocks through ``map_batches``
    UNTOUCHED, so they can carry the upstream schema (or, one map later,
    no schema at all) and break a plain concat against the transformed
    pieces. When EVERY piece is empty, returns the zero-row piece that
    carries all ``required`` columns (i.e. the transformed schema) so the
    partition's output stays typed, or ``None`` when none does."""
    pieces = resolve_all_pieces(pieces)
    rows = [p for p in pieces if p.num_rows]
    if rows:
        return pa.concat_tables(rows)
    for p in pieces:
        if p.num_columns and all(c in p.column_names for c in required):
            return p
    return None


def col_type(t, name, default):
    """Type of column ``name`` in (possibly zero-row) table ``t``, or
    ``default`` when ``t`` is None / lacks the column / carries it
    null-typed. The mixed-schema guard for empty partitions: an empty
    partition that HARDCODES an output type while populated partitions
    emit the input's real type (string keys, say) hands the Dataset
    mixed block schemas that break schema()/union/to_pandas downstream."""
    if t is not None and name in t.column_names:
        tp = t.column(name).type
        if not pa.types.is_null(tp):
            return tp
    return default


def resolve_mixed_pieces(pieces):
    """Task-side: resolve a piece list that may mix Arrow tables, object
    refs, and parquet file PATHS (bucket-aligned reads from a compacted
    index) into a list of tables. Refs are fetched in one batched
    ``ray.get``; paths are read locally in the calling task."""
    import ray
    import pyarrow.parquet as pq
    ref_idx = [i for i, p in enumerate(pieces)
               if isinstance(p, ray.ObjectRef)]
    fetched = ray.get([pieces[i] for i in ref_idx]) if ref_idx else []
    out = list(pieces)
    for i, t in zip(ref_idx, fetched):
        out[i] = t
    return [pq.read_table(p) if isinstance(p, str) else p for p in out]


def fan_out_pieces(split_fn, block_refs, num_parts: int, args=()):
    """Fan block refs into per-partition piece-ref lists via
    ``split_fn(block, *args) -> [num_parts tables]`` run as Ray tasks
    with ``num_returns=num_parts``.

    Handles the ``num_parts == 1`` degenerate correctly: with
    ``num_returns=1`` Ray would ship the one-element LIST the splitter
    returns (not the table), so a wrapper task unpacks ``[0]`` instead —
    the bug every hand-rolled fan-out loop used to share."""
    import ray
    if num_parts == 1:
        one = ray.remote(lambda ref, *a: split_fn(ref, *a)[0])
        return [[one.remote(ref, *args) for ref in block_refs]]
    split = ray.remote(split_fn)
    per_part = [[] for _ in range(num_parts)]
    for ref in block_refs:
        pieces = split.options(num_returns=num_parts).remote(ref, *args)
        for i, p in enumerate(pieces):
            per_part[i].append(p)
    return per_part


def stream_block_refs(ds):
    """Yield a Dataset's block refs AS STREAMING EXECUTION PRODUCES
    them — the memory-progressive alternative to ``to_arrow_refs()``,
    which materializes (and pins) every upstream block before the first
    consumer task runs. Fed to :func:`fan_out_pieces`, each upstream
    block becomes eligible for release as soon as its split task
    finishes, so an exchange's peak footprint is the narrow pieces plus
    the blocks currently in flight, not the whole projected input.
    Blocks may arrive in any format ``split_by_key`` handles (Arrow or
    pandas)."""
    for bundle in ds.iter_internal_ref_bundles():
        yield from bundle.block_refs


def _fan_out(ds, key: str, num_parts: int):
    """Fan a Dataset's blocks into per-partition piece-ref lists,
    streaming: split tasks launch while upstream execution is still
    producing blocks."""
    return fan_out_pieces(split_by_key, stream_block_refs(ds), num_parts,
                          args=(key, num_parts))


def hash_exchange(ds, key: str, partition_fn, num_parts: int = 16,
                  fn_args: tuple = ()):
    """ds → hash-partition by ``key`` → ``partition_fn(*fn_args, pieces)``
    per partition (a plain function run as a Ray task; receives the list
    of piece refs, use :func:`resolve_pieces`) → Dataset of the returned
    Arrow tables. Blocks never pass through the driver."""
    import ray
    import ray.data as rd
    work = ray.remote(partition_fn)
    return rd.from_arrow_refs(
        [work.remote(*fn_args, pieces)
         for pieces in _fan_out(ds, key, num_parts)])


def hash_exchange2(ds_l, ds_r, key_l: str, key_r: str, partition_fn,
                   num_parts: int = 16, fn_args: tuple = ()):
    """Two-sided co-partitioned exchange: both datasets hash-partition by
    their key (same hash, so equal keys land in the same partition) and
    ``partition_fn(*fn_args, l_pieces, r_pieces)`` runs once per
    partition. The two-input analogue of :func:`hash_exchange`."""
    import ray
    import ray.data as rd
    work = ray.remote(partition_fn)
    L = _fan_out(ds_l, key_l, num_parts)
    R = _fan_out(ds_r, key_r, num_parts)
    return rd.from_arrow_refs(
        [work.remote(*fn_args, lp, rp) for lp, rp in zip(L, R)])
