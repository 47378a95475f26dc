"""Windowed / stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows (ray_guide "Streaming-shaped
workloads"). Sessionization here is a two-stage exchange (the hash_join
pattern): rows hash-partition by key in raw Ray tasks, and each partition
computes sessions for ALL its keys in ONE vectorized pass (lexsort +
boundary masks + ``np.reduceat``) — no per-group Python callable, so a
web-scale key space (millions of users) costs one task per partition,
not one interpreter call per user. Ordering assumption: per-key ordering
only, established by the in-partition sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import hash_exchange, resolve_pieces

_GAP_SENTINEL = np.int64(1 << 62)


def _session_segments(t: pa.Table, key: str, ts_col: str, gap_sec: int):
    """Vectorized per-partition sessionization core. Returns
    (key_dictionary, per-session (key_code, session_no, start_idx) plus the
    sorted ts int64 array and session row counts)."""
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    enc = pc.dictionary_encode(t.column(key).combine_chunks()
                               if isinstance(t.column(key), pa.ChunkedArray)
                               else t.column(key))
    codes = np.asarray(enc.indices, dtype=np.int64)
    order = np.lexsort((ts, codes))
    k, s = codes[order], ts[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    gap = np.empty(n, dtype=np.int64)
    gap[0] = _GAP_SENTINEL
    gap[1:] = s[1:] - s[:-1]
    new_sess = new_key | (gap > gap_sec * 1_000_000)
    starts = np.nonzero(new_sess)[0]
    n_events = np.diff(np.append(starts, n))
    # session_no: 1-based cumulative count within each key
    sess_key = k[starts]
    sess_new_key = np.ones(len(starts), dtype=bool)
    sess_new_key[1:] = sess_key[1:] != sess_key[:-1]
    grp_start = np.maximum.accumulate(
        np.where(sess_new_key, np.arange(len(starts)), 0))
    session_no = np.arange(len(starts)) - grp_start + 1
    return enc.dictionary, sess_key, session_no, starts, n_events, s, \
        sess_new_key


def _sessionize_partition(key: str, ts_col: str, gap_sec: int, mode: str,
                          pieces):
    from .exchange import resolve_all_pieces
    all_pieces = resolve_all_pieces(pieces)
    pieces = [p for p in all_pieces if p.num_rows]
    # an empty partition must type its key column like the OTHERS do, or
    # string-keyed sessionize yields mixed int64/string block schemas;
    # typed empty pieces carry the input schema for exactly this
    key_type = next((p.column(key).type for p in all_pieces
                     if key in p.column_names
                     and not pa.types.is_null(p.column(key).type)),
                    pa.int64())
    if pieces:
        # Null timestamps would become NaN → INT64_MIN garbage in the
        # int64 cast and silently corrupt session boundaries; drop them
        # before segmenting (same guard as hopping_counts in stats.py).
        # permissive: an all-null input block may carry a null-typed ts
        t = pa.concat_tables(pieces, promote_options="permissive")
        valid = pc.is_valid(t.column(ts_col))
        if not pc.all(valid).as_py():
            t = t.filter(valid)
        if t.num_rows == 0:
            pieces = []
    if not pieces:
        if mode == "sessions":
            return pa.table({
                key: pa.array([], type=key_type),
                "session_no": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "t_start": pa.array([], type=pa.timestamp("us")),
                "t_end": pa.array([], type=pa.timestamp("us"))})
        return pa.table({
            key: pa.array([], type=key_type),
            "n_sessions": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64())})
    dictionary, sess_key, session_no, starts, n_events, s, sess_new_key = \
        _session_segments(t, key, ts_col, gap_sec)
    key_vals = dictionary.take(pa.array(sess_key))
    if mode == "sessions":
        t_start = s[starts]
        ends = np.append(starts[1:], len(s)) - 1
        return pa.table({
            key: key_vals,
            "session_no": pa.array(session_no, type=pa.int64()),
            "n_events": pa.array(n_events, type=pa.int64()),
            "t_start": pa.array(t_start, type=pa.int64()).cast(
                pa.timestamp("us")),
            "t_end": pa.array(s[ends], type=pa.int64()).cast(
                pa.timestamp("us")),
        })
    # counts mode: collapse sessions per key (sessions of one key are
    # contiguous in the sorted session list)
    kstarts = np.nonzero(sess_new_key)[0]
    n_sessions = np.diff(np.append(kstarts, len(sess_key)))
    ev_cum = np.concatenate([[0], np.cumsum(n_events)])
    n_events_per_key = ev_cum[np.append(kstarts[1:], len(sess_key))] \
        - ev_cum[kstarts]
    return pa.table({
        key: key_vals.take(pa.array(kstarts)),
        "n_sessions": pa.array(n_sessions, type=pa.int64()),
        "n_events": pa.array(n_events_per_key, type=pa.int64()),
    })


def _session_exchange(ds, key: str, ts_col: str, gap_sec: int, mode: str,
                      num_parts: int):
    # narrow projection BEFORE the exchange: the partition fn reads only
    # (key, ts) — never ship wide payload columns through the shuffle
    narrow = ds.map_batches(lambda b: b.select([key, ts_col]),
                            batch_format="pyarrow")
    return hash_exchange(narrow, key, _sessionize_partition, num_parts,
                         fn_args=(key, ts_col, gap_sec, mode))


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_sec: int = 1800, num_parts: int = 16):
    """Gap-based session windows: one output row per (key, session) with
    1-based ``session_no``, ``n_events`` and session bounds. A new session
    starts when the gap from the previous event exceeds ``gap_sec``."""
    return _session_exchange(ds, key, ts_col, gap_sec, "sessions", num_parts)


def session_counts(ds, key: str = "user_id", ts_col: str = "ts",
                   gap_sec: int = 1800, num_parts: int = 16):
    """(key, n_sessions, n_events) per key — compact, SQL-checkable."""
    return _session_exchange(ds, key, ts_col, gap_sec, "counts", num_parts)


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


def _running_partition(key: str, ts_col: str, id_col: str, val_col: str,
                       pieces):
    """Per-partition segmented cumulative stats: one lexsort by
    (key, ts, id), then vectorized per-key running count + running sum of
    ``floor(value * 1e6)`` (integer micro-units — floor of a double is
    exact in both numpy and SQL, so the cumulative sums are
    engine-independent, unlike ordered float addition)."""
    from .exchange import resolve_all_pieces
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "cum_n": pa.array([], type=pa.int64()),
                      "cum_val": pa.array([], type=pa.int64())})
    pieces = [t for t in resolve_all_pieces(pieces) if t.num_columns]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces, promote_options="permissive")
    if t.num_rows:
        valid = pc.is_valid(t.column(ts_col))
        if not pc.all(valid).as_py():
            t = t.filter(valid)  # same null-ts guard as sessionize
    if t.num_rows == 0:
        return empty
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    enc = pc.dictionary_encode(t.column(key).combine_chunks()
                               if isinstance(t.column(key), pa.ChunkedArray)
                               else t.column(key))
    codes = np.asarray(enc.indices, dtype=np.int64)
    raw = np.asarray(
        pc.fill_null(t.column(val_col), 0.0).to_numpy(zero_copy_only=False),
        dtype=np.float64)
    # NaN/inf are not Arrow nulls: floor(nan*1e6).astype(int64) lands on
    # INT64_MIN and corrupts every later cumsum in the key — coerce
    # non-finite to 0 exactly like nulls
    v = np.floor(np.where(np.isfinite(raw), raw, 0.0)
                 * 1e6).astype(np.int64)
    order = np.lexsort((ids, ts, codes))
    k, s_ids, s_v = codes[order], ids[order], v[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new_key)[0]
    seg = np.repeat(np.arange(len(starts)),
                    np.diff(np.append(starts, n)))
    cum_n = np.arange(n, dtype=np.int64) - starts[seg] + 1
    cs = np.cumsum(s_v)
    pre = np.concatenate([[np.int64(0)], cs[:-1]])
    cum_val = cs - pre[starts[seg]]
    return pa.table({id_col: pa.array(s_ids),
                     "cum_n": pa.array(cum_n),
                     "cum_val": pa.array(cum_val)})


def running_totals(ds, key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", val_col: str = "value",
                   num_parts: int = 16):
    """Per-key running (cumulative) count and value sum in event-time
    order — the streaming "running aggregate" shape. One output row per
    input row: (``id_col``, ``cum_n``, ``cum_val``) where ``cum_val``
    accumulates ``floor(value * 1e6)`` micro-units ordered by
    (``ts_col``, ``id_col``) within the key.

    Scale shape: one hash exchange of narrow rows, one vectorized
    segmented-cumsum task per partition — no per-key Python, no window
    pair explosion."""
    narrow = ds.map_batches(
        lambda b: b.select([key, ts_col, id_col, val_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, key, _running_partition, num_parts,
                         fn_args=(key, ts_col, id_col, val_col))


def _trailing_partition(key: str, ts_col: str, id_col: str, val_col: str,
                        window: int, pieces):
    """Per-partition trailing-``window``-event sums: same segmented layout
    as :func:`_running_partition`, with the window lower bound clamped to
    the key's segment start — ``trail_val[i] = cs[i] - cs[max(seg_start,
    i-window+1) - 1]``, all integer micro-units."""
    from .exchange import resolve_all_pieces
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "trail_n": pa.array([], type=pa.int64()),
                      "trail_val": pa.array([], type=pa.int64())})
    pieces = [t for t in resolve_all_pieces(pieces) if t.num_columns]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces, promote_options="permissive")
    if t.num_rows:
        valid = pc.is_valid(t.column(ts_col))
        if not pc.all(valid).as_py():
            t = t.filter(valid)
    if t.num_rows == 0:
        return empty
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    enc = pc.dictionary_encode(t.column(key).combine_chunks()
                               if isinstance(t.column(key), pa.ChunkedArray)
                               else t.column(key))
    codes = np.asarray(enc.indices, dtype=np.int64)
    raw = np.asarray(
        pc.fill_null(t.column(val_col), 0.0).to_numpy(zero_copy_only=False),
        dtype=np.float64)
    # NaN/inf are not Arrow nulls: floor(nan*1e6).astype(int64) lands on
    # INT64_MIN and corrupts every later cumsum in the key — coerce
    # non-finite to 0 exactly like nulls
    v = np.floor(np.where(np.isfinite(raw), raw, 0.0)
                 * 1e6).astype(np.int64)
    order = np.lexsort((ids, ts, codes))
    k, s_ids, s_v = codes[order], ids[order], v[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new_key)[0]
    seg = np.repeat(np.arange(len(starts)),
                    np.diff(np.append(starts, n)))
    lower = np.maximum(starts[seg],
                       np.arange(n, dtype=np.int64) - window + 1)
    cs = np.cumsum(s_v)
    pre = np.concatenate([[np.int64(0)], cs[:-1]])
    return pa.table({id_col: pa.array(s_ids),
                     "trail_n": pa.array(np.arange(n, dtype=np.int64)
                                         - lower + 1),
                     "trail_val": pa.array(cs - pre[lower])})


def trailing_totals(ds, key: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", val_col: str = "value",
                    window: int = 5, num_parts: int = 16):
    """Per-key TRAILING ``window``-event count + value sum (the bounded
    sliding-window analogue of :func:`running_totals`): one hash
    exchange, one vectorized segmented pass — the trailing sum is two
    cumsum lookups per row, never a per-row rescan of the window."""
    narrow = ds.map_batches(
        lambda b: b.select([key, ts_col, id_col, val_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, key, _trailing_partition, num_parts,
                         fn_args=(key, ts_col, id_col, val_col,
                                  int(window)))


def _bigram_partition(key: str, ts_col: str, ev_col: str, id_col: str,
                      pieces):
    """One key partition: consecutive event-type pairs per key in
    (ts, id) order, pre-counted (one lexsort + shift compare — no
    per-key Python)."""
    from .exchange import resolve_all_pieces
    empty = pa.table({"ev_from": pa.array([], type=pa.string()),
                      "ev_to": pa.array([], type=pa.string()),
                      "n_part": pa.array([], type=pa.int64())})
    # rows only: zero-row pieces can carry the untransformed upstream
    # schema (Ray map_batches pass-through) and break a plain concat
    ps = [p for p in resolve_all_pieces(pieces) if p.num_rows]
    if not ps:
        return empty
    t = pa.concat_tables(ps)
    if t.num_rows < 2:
        return empty
    codes = np.asarray(pc.dictionary_encode(
        t.column(key).combine_chunks()).indices, dtype=np.int64)
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    order = np.lexsort((ids, ts, codes))
    k = codes[order]
    same = k[1:] == k[:-1]
    if not same.any():
        return empty
    ev = t.column(ev_col).combine_chunks().take(pa.array(order))
    sel = pa.array(np.nonzero(same)[0])
    pairs = pa.table({
        "ev_from": ev.take(sel),
        "ev_to": ev.take(pc.add(sel, pa.scalar(1, pa.int64()))),
    })
    g = pairs.group_by(["ev_from", "ev_to"]).aggregate([([], "count_all")])
    return pa.table({"ev_from": g.column("ev_from"),
                     "ev_to": g.column("ev_to"),
                     "n_part": g.column("count_all")})


def event_bigrams(ds, key: str = "user_id", ts_col: str = "ts",
                  ev_col: str = "event_type", id_col: str = "event_id",
                  num_parts: int = 16):
    """Per-key consecutive event-type transition counts (user-path
    bigram mining): for each key's events in (ts, id) order, count
    (from, to) pairs globally. Null timestamps are excluded (their sort
    position is undefined).

    Scale shape: one hash exchange of narrow (key, ts, id, type) rows;
    each partition does one lexsort + shift compare and pre-counts its
    pairs, so the final groupby merges a few (from, to) partials per
    partition — never raw transitions."""
    from ray.data.aggregate import Sum
    from .exchange import hash_exchange

    rows = ds.map_batches(
        lambda b: b.select([key, ts_col, id_col, ev_col])
        .filter(pc.is_valid(b.column(ts_col))),
        batch_format="pyarrow")
    partials = hash_exchange(rows, key, _bigram_partition, num_parts,
                             fn_args=(key, ts_col, ev_col, id_col))
    return partials.groupby(["ev_from", "ev_to"]) \
        .aggregate(Sum("n_part", alias_name="n"))


def _cum_block(offset: int, count_col: str, tbl: pa.Table) -> pa.Table:
    n = tbl.column(count_col).to_numpy().astype(np.int64)
    return tbl.append_column(
        "cum_" + count_col,
        pa.array(offset + np.cumsum(n), type=pa.int64()))


def first_seen_cumulative(ds, key_col: str = "user_id",
                          ts_col: str = "ts", unit: str = "day"):
    """Growth curve: per period, how many keys appear for the FIRST time,
    plus the running total of distinct keys seen so far — the
    "cumulative unique users/domains" metric a crawl or event corpus is
    sized by.

    Scale shape: per-batch min-ts partials → one ``groupby(key).min``
    (the only exchange, narrow (key, ts) rows) → per-batch period counts
    → a tiny per-period table, range-sorted, with the cumulative sum
    computed by the O(n_blocks) :func:`~log2seq_ray.ops.scan.scan_offsets`
    block scan — rows never pass through the driver, and the cumulative
    is exact without a single-task global sort of raw events."""
    from ray.data.aggregate import Min, Sum
    from .scan import _sorted_refs, scan_offsets
    import ray
    import ray.data as rd

    def min_partial(b: pa.Table) -> pa.Table:
        t = b.select([key_col, ts_col]).filter(
            pc.is_valid(b.column(ts_col)))
        g = t.group_by([key_col]).aggregate([(ts_col, "min")])
        return pa.table({key_col: g.column(key_col),
                         "fts": g.column(f"{ts_col}_min")})

    first = ds.map_batches(min_partial, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Min("fts", alias_name="fts"))

    def day_partial(b: pa.Table) -> pa.Table:
        period = pc.floor_temporal(b.column("fts"), unit=unit)
        g = pa.table({"period": period}).group_by(["period"]) \
            .aggregate([([], "count_all")])
        return pa.table({"period": g.column("period"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    daily = first.map_batches(day_partial, batch_format="pyarrow") \
        .groupby("period").aggregate(Sum("p", alias_name="n_new")) \
        .sort("period")
    refs = _sorted_refs(daily)
    # the sort can emit zero-row blocks carrying a STALE upstream schema
    # (no n_new column) — drop empties before the offset scan
    from .scan import _count_block
    cnt = ray.remote(_count_block)
    nrows = ray.get([cnt.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, nrows) if c]
    if not refs:
        sch = daily.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return rd.from_arrow(pa.schema(
                list(base) + [pa.field("cum_n_new", pa.int64())]
            ).empty_table())
        return daily  # no rows and no recoverable types
    offsets = scan_offsets(refs, "n_new")
    cum = ray.remote(_cum_block)
    out = [cum.remote(int(off), "n_new", r)
           for off, r in zip(offsets, refs)]
    return rd.from_arrow_refs(out)


def _cooc_partition(key: str, item_col: str, pieces) -> pa.Table:
    """One key partition of the co-occurrence count: distinct
    (key, item) rows → within-key i<j pair expansion (shared
    segment-pair kernel) → per-partition (item_a, item_b) partial
    counts. Items are sorted ascending within each key, so item_a <
    item_b lexically by construction."""
    from .exchange import concat_typed, segment_pair_indices
    empty = pa.table({"item_a": pa.array([], type=pa.string()),
                      "item_b": pa.array([], type=pa.string()),
                      "pn": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, item_col)
    if t is None or t.num_rows == 0:
        return empty
    # cross-batch distinct + (key asc, item asc) ordering in one pass
    t = t.group_by([key, item_col]).aggregate([]) \
        .sort_by([(key, "ascending"), (item_col, "ascending")])
    keys = t.column(key).to_numpy(zero_copy_only=False)
    items = t.column(item_col).combine_chunks() \
        if isinstance(t.column(item_col), pa.ChunkedArray) \
        else t.column(item_col)
    _, i_row, j_row = segment_pair_indices(keys)
    if not len(i_row):
        return empty
    pairs = pa.table({"item_a": items.take(pa.array(i_row)),
                      "item_b": items.take(pa.array(j_row))})
    g = pairs.group_by(["item_a", "item_b"]).aggregate([([], "count_all")])
    return pa.table({"item_a": g.column("item_a"),
                     "item_b": g.column("item_b"),
                     "pn": pc.cast(g.column("count_all"), pa.int64())})


def cooccurrence_pairs(ds, key: str = "user_id",
                       item_col: str = "event_type",
                       num_parts: int = 16):
    """Market-basket co-occurrence mining: for every unordered item pair
    (a < b), in how many keys (users/sessions/docs) do BOTH appear —
    the support table behind "users who did X also did Y".

    Scale shape: per-batch DISTINCT (key, item) partials shrink the
    exchange to O(keys × distinct items per key) narrow rows (never raw
    events); one key-hash exchange co-locates each key's items; pair
    expansion reuses the vectorized segment-pair kernel, bounded by the
    per-key distinct-item count (items-per-key is small in basket data —
    a pathological key with m items costs m(m-1)/2 rows in ITS partition
    only); the final groupby merges already-counted (item_a, item_b)
    partials."""
    from ray.data.aggregate import Sum
    from .exchange import hash_exchange

    def distinct_partial(b: pa.Table) -> pa.Table:
        return b.select([key, item_col]) \
            .group_by([key, item_col]).aggregate([])

    partials = ds.map_batches(distinct_partial, batch_format="pyarrow")
    counted = hash_exchange(partials, key, _cooc_partition, num_parts,
                            fn_args=(key, item_col))
    return counted.groupby(["item_a", "item_b"]) \
        .aggregate(Sum("pn", alias_name="n_keys"))


def _gap_stats_partition(key: str, ts_col: str, pieces) -> pa.Table:
    """One key partition of the inter-arrival stats: lexsort by
    (key, ts), per-key adjacent diffs, segmented integer aggregates —
    n_events, n_gaps, min/max/sum gap in exact microseconds."""
    from .exchange import col_type, concat_typed
    t = concat_typed(pieces, key, ts_col)
    empty = pa.table({key: pa.array([], type=col_type(t, key,
                                                      pa.int64())),
                      "n_events": pa.array([], type=pa.int64()),
                      "n_gaps": pa.array([], type=pa.int64()),
                      "min_gap_us": pa.array([], type=pa.int64()),
                      "max_gap_us": pa.array([], type=pa.int64()),
                      "sum_gap_us": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows == 0:
        return empty
    ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                 pa.int64()).to_numpy()
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    order = np.lexsort((ts, codes))
    k, s = codes[order], ts[order]
    new_key = np.ones(len(k), dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(new_key)
    ends = np.append(starts[1:], len(k))
    n_events = ends - starts
    diffs = s[1:] - s[:-1]               # within-key where ~new_key[1:]
    gap_valid = ~new_key[1:]
    # per-key gap segments: key i owns diffs[starts[i]..ends[i]-1) rows
    n_gaps = n_events - 1
    mins = np.full(len(starts), np.iinfo(np.int64).max, dtype=np.int64)
    maxs = np.zeros(len(starts), dtype=np.int64)
    sums = np.zeros(len(starts), dtype=np.int64)
    if gap_valid.any():
        gk = np.repeat(np.arange(len(starts)), n_gaps)  # key idx per gap
        gv = diffs[gap_valid]
        np.minimum.at(mins, gk, gv)
        np.maximum.at(maxs, gk, gv)
        np.add.at(sums, gk, gv)
    has = n_gaps > 0
    keys_out = kcol.take(pa.array(np.arange(len(kcol))[order][starts]))
    return pa.table({
        key: keys_out,
        "n_events": pa.array(n_events, type=pa.int64()),
        "n_gaps": pa.array(n_gaps, type=pa.int64()),
        "min_gap_us": pa.array(np.where(has, mins, 0), type=pa.int64()),
        "max_gap_us": pa.array(maxs, type=pa.int64()),
        "sum_gap_us": pa.array(sums, type=pa.int64())})


def inter_arrival_stats(ds, key: str = "user_id", ts_col: str = "ts",
                        num_parts: int = 16):
    """Per-key inter-arrival (gap) statistics: event count, gap count,
    min/max/sum gap in EXACT integer microseconds (mean = sum/n is the
    caller's one division) — the rate/burstiness profile behind
    throttling, anomaly baselines and session-gap tuning. Gaps are
    adjacent diffs of the key's time-sorted events (ties → 0-gaps; the
    gap multiset of a ts multiset is order-independent). Null
    timestamps are excluded; keys with one event report zero gaps.

    Scale shape: one narrow (key, ts) hash exchange (the sessionize
    precedent — gaps span batch boundaries, so partials can't
    pre-aggregate); per-partition work is one lexsort + three segmented
    ufunc reductions, no per-key Python."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(lambda b: b.select([key, ts_col]),
                            batch_format="pyarrow")
    return hash_exchange(narrow, key, _gap_stats_partition, num_parts,
                         fn_args=(key, ts_col))


def _debounce_partition(key: str, sub_key: str, ts_col: str, id_col: str,
                        min_gap_sec: int, pieces) -> pa.Table:
    """One key partition of ``debounce``: lexsort by (key, sub_key, ts,
    id), keep a row iff it opens its (key, sub_key) group or its gap
    from the IMMEDIATELY PRECEDING event exceeds ``min_gap_sec`` (LAG
    semantics — the comparison baseline is the previous event, kept or
    not, so the decision is per-row local after the sort and needs no
    sequential state)."""
    from .exchange import col_type, concat_typed
    t = concat_typed(pieces, key, sub_key, ts_col, id_col)
    empty = pa.table({
        id_col: pa.array([], type=col_type(t, id_col, pa.int64())),
        key: pa.array([], type=col_type(t, key, pa.int64())),
        sub_key: pa.array([], type=col_type(t, sub_key, pa.string())),
        ts_col: pa.array([], type=pa.timestamp("us"))})
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows == 0:
        return empty
    ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                 pa.int64()).to_numpy()
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False), dtype=np.int64)

    def _codes(col):
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        return np.asarray(pc.dictionary_encode(c).indices, dtype=np.int64)

    kc, sc = _codes(t.column(key)), _codes(t.column(sub_key))
    order = np.lexsort((ids, ts, sc, kc))
    k, s, tt = kc[order], sc[order], ts[order]
    keep = np.ones(len(k), dtype=bool)
    same = (k[1:] == k[:-1]) & (s[1:] == s[:-1])
    keep[1:] = ~same | (tt[1:] - tt[:-1] > min_gap_sec * 1_000_000)
    kept = order[keep]
    sel = pa.array(kept)
    return pa.table({
        id_col: t.column(id_col).take(sel),
        key: t.column(key).take(sel),
        sub_key: t.column(sub_key).take(sel),
        ts_col: pc.cast(t.column(ts_col), pa.timestamp("us")).take(sel)})


def debounce(ds, key: str = "user_id", sub_key: str = "event_type",
             ts_col: str = "ts", id_col: str = "event_id",
             min_gap_sec: int = 3600, num_parts: int = 16):
    """Per-(key, sub_key) event throttling: drop every event that lands
    within ``min_gap_sec`` of the previous event for the same (key,
    sub_key) — the debounce/rate-limit pass that collapses retry storms
    and duplicate client sends before sessionization or billing counts.
    Gap baseline is the previous RAW event (SQL ``LAG`` semantics, so
    the rule is reproducible by any engine); ties (equal ts) keep only
    the lowest-id row; null timestamps are dropped.

    Scale shape: one narrow (id, key, sub_key, ts) hash exchange keyed
    by ``key`` (gaps span batch boundaries — partials can't
    pre-aggregate); per-partition work is one lexsort + one adjacent
    diff, no per-key Python. Output streams as a Dataset."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(
        lambda b: b.select([id_col, key, sub_key, ts_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, key, _debounce_partition, num_parts,
                         fn_args=(key, sub_key, ts_col, id_col,
                                  min_gap_sec))


def _cohort_partition(key: str, ts_col: str, pieces) -> pa.Table:
    """One user partition of cohort retention: per user, cohort =
    first active day; emit distinct (cohort_day, day_offset) user
    counts."""
    from .exchange import concat_typed
    empty = pa.table({"cohort_day": pa.array([], type=pa.timestamp("us")),
                      "day_offset": pa.array([], type=pa.int64()),
                      "n_users": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, ts_col)
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows == 0:
        return empty
    day = (pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                   pa.int64()).to_numpy() // 86_400_000_000)
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    order = np.lexsort((day, codes))
    k, d = codes[order], day[order]
    new_key = np.ones(len(k), dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    cohort = d[np.maximum.accumulate(
        np.where(new_key, np.arange(len(k)), 0))]
    offset = d - cohort
    # distinct (user, offset), then count users per (cohort, offset)
    first = np.ones(len(k), dtype=bool)
    first[1:] = new_key[1:] | (offset[1:] != offset[:-1])
    co, off = cohort[first], offset[first]
    key2 = co * (1 << 20) + off          # offsets < 2^20 days ~ 2.8k yrs
    uniq, counts = np.unique(key2, return_counts=True)
    return pa.table({
        "cohort_day": pa.array((uniq >> 20) * 86_400_000_000,
                               type=pa.int64()).cast(pa.timestamp("us")),
        "day_offset": pa.array(uniq & ((1 << 20) - 1), type=pa.int64()),
        "n_users": pa.array(counts, type=pa.int64())})


def cohort_retention(ds, key: str = "user_id", ts_col: str = "ts",
                     num_parts: int = 16):
    """Cohort retention table: users cohorted by their FIRST active
    day; for every (cohort_day, day_offset) the number of cohort
    members active ``day_offset`` days later (offset 0 row = cohort
    size) — the standard retention triangle. Null timestamps drop.

    Scale shape: one narrow (user, ts) hash exchange keyed by user
    (a user's first-seen day needs all their events together); per
    partition one lexsort + boundary masks; only O(cohorts x offsets)
    count partials leave the partition for the final small groupby."""
    from ray.data.aggregate import Sum

    from .exchange import hash_exchange
    narrow = ds.map_batches(lambda b: b.select([key, ts_col]),
                            batch_format="pyarrow")
    partials = hash_exchange(narrow, key, _cohort_partition, num_parts,
                             fn_args=(key, ts_col))
    return partials.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n_users", alias_name="n_users"))


def markov_transitions(ds, key: str = "user_id", ts_col: str = "ts",
                       ev_col: str = "event_type",
                       id_col: str = "event_id", num_parts: int = 16):
    """First-order Markov transition matrix over per-key event paths:
    ``event_bigrams`` counts normalized per source state to an exact
    integer probability ``p_ppm = n * 10^6 // n_from`` — the user-path
    model behind next-event prediction and anomaly scoring. Returns
    (ev_from, ev_to, n, n_from, p_ppm).

    Scale shape: the corpus-sized work is event_bigrams' one keyed
    exchange; the transition matrix itself is O(|event types|^2) —
    state-catalog-sized, so the per-source normalization runs in one
    map_batches over a single coalesced block (repartition(1) of a
    types^2 table, the sketch-finalizer contract)."""
    big = event_bigrams(ds, key, ts_col, ev_col, id_col, num_parts)

    def normalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "ev_from": pa.array([], type=pa.string()),
                "ev_to": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "n_from": pa.array([], type=pa.int64()),
                "p_ppm": pa.array([], type=pa.int64())})
        ev_from = b.column("ev_from").combine_chunks() \
            if isinstance(b.column("ev_from"), pa.ChunkedArray) \
            else b.column("ev_from")
        n = np.asarray(pc.cast(b.column("n"), pa.int64()).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        codes = np.asarray(pc.dictionary_encode(ev_from).indices,
                           dtype=np.int64)
        totals = np.zeros(int(codes.max()) + 1, dtype=np.int64)
        np.add.at(totals, codes, n)
        n_from = totals[codes]
        return pa.table({
            "ev_from": ev_from,
            "ev_to": b.column("ev_to"),
            "n": pa.array(n, type=pa.int64()),
            "n_from": pa.array(n_from, type=pa.int64()),
            "p_ppm": pa.array(n * 1_000_000 // n_from, type=pa.int64())})

    return big.repartition(1).map_batches(
        normalize, batch_format="pyarrow", batch_size=None)


def _assign_partition(key: str, ts_col: str, id_col: str, gap_sec: int,
                      pieces) -> pa.Table:
    """One key partition of ``assign_sessions``: the sessionize sort +
    boundary mask, then a per-key cumulative sum of boundaries gives
    each EVENT its 1-based session number."""
    from .exchange import col_type, concat_typed
    t = concat_typed(pieces, key, ts_col, id_col)
    empty = pa.table({
        id_col: pa.array([], type=col_type(t, id_col, pa.int64())),
        key: pa.array([], type=col_type(t, key, pa.int64())),
        "session_no": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows == 0:
        return empty
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    order = np.lexsort((ts, codes))
    k, s = codes[order], ts[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    gap = np.empty(n, dtype=np.int64)
    gap[0] = _GAP_SENTINEL
    gap[1:] = s[1:] - s[:-1]
    brk = (new_key | (gap > gap_sec * 1_000_000)).astype(np.int64)
    cum = np.cumsum(brk)
    # per-key session_no: subtract the cumulative count BEFORE the key
    key_start = np.maximum.accumulate(
        np.where(new_key, np.arange(n), 0))
    session_no = cum - (cum[key_start] - brk[key_start])  # 1-based
    sel = pa.array(order)
    return pa.table({
        id_col: t.column(id_col).take(sel),
        key: t.column(key).take(sel),
        "session_no": pa.array(session_no, type=pa.int64())})


def assign_sessions(ds, key: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", gap_sec: int = 1800,
                    num_parts: int = 16):
    """Per-EVENT session assignment: every event gets its key's 1-based
    ``session_no`` under the same gap rule as ``sessionize`` — the
    enrichment form (downstream joins events to their session) rather
    than the aggregate form. Equal-timestamp ties never split a
    session, so the assignment is order-stable. Null timestamps drop.

    Scale shape: identical to sessionize — one narrow (id, key, ts)
    exchange, one lexsort + boundary cumsum per partition; output is
    one row per event and streams as a Dataset."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(lambda b: b.select([id_col, key, ts_col]),
                            batch_format="pyarrow")
    return hash_exchange(narrow, key, _assign_partition, num_parts,
                         fn_args=(key, ts_col, id_col, gap_sec))


def _zscore_partition(key: str, ts_col: str, id_col: str, val_col: str,
                      window: int, min_n: int, z: int, pieces) -> pa.Table:
    """One key partition of :func:`trailing_zscore_outliers`: the
    trailing-sum layout of ``_trailing_partition`` over value AND
    value², window EXCLUSIVE of the current row, then the integer
    cross-multiplied test ``(m·x − S)² > z²·(m·SS − S²)``."""
    from .exchange import concat_typed
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "trail_n": pa.array([], type=pa.int64()),
                      "is_outlier": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, ts_col, id_col, val_col)
    if t is None or t.num_rows == 0:
        return empty
    valid = pc.is_valid(t.column(ts_col))
    if not pc.all(valid).as_py():
        t = t.filter(valid)
    if t.num_rows == 0:
        return empty
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    # MILLI-units (not the micro convention): the test squares m·x, and
    # micro² at window=20 overflows int64 — milli keeps every product
    # under 2^63 for |value| <= 1e4 (documented contract)
    raw = np.asarray(
        pc.fill_null(t.column(val_col), 0.0).to_numpy(zero_copy_only=False),
        dtype=np.float64)
    x = np.floor(np.where(np.isfinite(raw), raw, 0.0)
                 * 1e3).astype(np.int64)
    order = np.lexsort((ids, ts, codes))
    k, s_ids, s_x = codes[order], ids[order], x[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    starts = np.nonzero(new_key)[0]
    seg = np.repeat(np.arange(len(starts)),
                    np.diff(np.append(starts, n)))
    idx = np.arange(n, dtype=np.int64)
    lower = np.maximum(starts[seg], idx - window)
    pre = np.concatenate([[np.int64(0)], np.cumsum(s_x)[:-1]])
    pre2 = np.concatenate([[np.int64(0)], np.cumsum(s_x * s_x)[:-1]])
    m = idx - lower
    S = pre[idx] - pre[lower]
    SS = pre2[idx] - pre2[lower]
    test = m >= min_n
    lhs = (m * s_x - S) ** 2
    rhs = z * z * (m * SS - S * S)
    return pa.table({
        id_col: pa.array(s_ids[test]),
        "trail_n": pa.array(m[test], type=pa.int64()),
        "is_outlier": pa.array((lhs[test] > rhs[test]).astype(np.int64))})


def trailing_zscore_outliers(ds, key: str = "user_id", ts_col: str = "ts",
                             id_col: str = "event_id",
                             val_col: str = "value", window: int = 20,
                             min_n: int = 8, z: int = 3,
                             num_parts: int = 16):
    """Streaming per-key anomaly flags: an event is an outlier when its
    value is more than ``z`` trailing standard deviations from the mean
    of the PREVIOUS ``window`` events of its key (events with fewer
    than ``min_n`` predecessors aren't testable and are excluded). The
    σ-test is the integer cross-multiplication ``(m·x − S)² >
    z²·(m·SS − S²)`` over milli-unit values — no float division, no
    sqrt, so the flag is engine-exact and SQL-reproducible. Null
    timestamps drop.

    Scale shape: one narrow (key, ts, id, value) exchange; trailing
    sums of x and x² are two cumsum lookups per row (the
    ``trailing_totals`` layout) — never a per-row window rescan."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(
        lambda b: b.select([key, ts_col, id_col, val_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, key, _zscore_partition, num_parts,
                         fn_args=(key, ts_col, id_col, val_col,
                                  int(window), int(min_n), int(z)))


def _late_partition(key: str, ts_col: str, id_col: str, tol_sec: int,
                    pieces) -> pa.Table:
    """One key partition of :func:`late_events`: per-key running max of
    ts over PRIOR arrivals (id order), late iff it leads the event's
    own ts by more than ``tol_sec``."""
    import pandas as pd
    from .exchange import concat_typed
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "is_late": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, ts_col, id_col)
    if t is None or t.num_rows == 0:
        return empty
    valid = pc.is_valid(t.column(ts_col))
    if not pc.all(valid).as_py():
        t = t.filter(valid)
    if t.num_rows == 0:
        return empty
    ts = np.asarray(pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                            pa.int64()).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64())
                     .to_numpy(zero_copy_only=False), dtype=np.int64)
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    order = np.lexsort((ids, codes))
    k, s_ids, s_ts = codes[order], ids[order], ts[order]
    seg = np.cumsum(np.concatenate([[True], k[1:] != k[:-1]])) - 1
    s = pd.Series(s_ts)
    prev_max = s.groupby(seg).cummax().groupby(seg).shift()
    late = (prev_max - s > tol_sec * 1_000_000).fillna(False)
    return pa.table({
        id_col: pa.array(s_ids),
        "is_late": pa.array(late.to_numpy().astype(np.int64))})


def late_events(ds, key: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", tol_sec: int = 3600,
                num_parts: int = 16):
    """Watermark-style late-arrival flags: in ARRIVAL order (ascending
    id) per key, an event is late when the max event-time already seen
    for its key exceeds its own timestamp by more than ``tol_sec`` —
    the out-of-order accounting a streaming ingest needs to size its
    watermark delay. First arrival per key is never late; null
    timestamps drop.

    Scale shape: one narrow (key, ts, id) exchange; per partition one
    lexsort + a segmented running max (vectorized cummax + shift)."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(lambda b: b.select([key, ts_col, id_col]),
                            batch_format="pyarrow")
    return hash_exchange(narrow, key, _late_partition, num_parts,
                         fn_args=(key, ts_col, id_col, int(tol_sec)))


# ---------------------------------------------------------------------------
# windowed exact dedup (at-least-once delivery cleanup)
# ---------------------------------------------------------------------------

def _windowed_dedup_partition(key: str, sub_key: str, payload: str,
                              ts_col: str, id_col: str, window_sec: int,
                              pieces) -> pa.Table:
    """One key partition: lexsort by (key, sub_key, payload, bucket,
    ts, id) and keep each calendar-window group's first row, carrying
    the group's duplicate count."""
    from .exchange import concat_typed
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n_dups": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, sub_key, payload, ts_col, id_col)
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows == 0:
        return empty
    ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                 pa.int64()).to_numpy()
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    bucket = ts // (window_sec * 1_000_000)

    def _codes(col):
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        return np.asarray(pc.dictionary_encode(c).indices,
                          dtype=np.int64)

    # dictionary-encode like sub_key/payload — casting the key to int64
    # crashes on the string keys debounce/sessionize support; grouping
    # only needs code EQUALITY, not the key's numeric order
    kc = _codes(t.column(key))
    sc, pcid = _codes(t.column(sub_key)), _codes(t.column(payload))
    order = np.lexsort((ids, ts, bucket, pcid, sc, kc))
    kc, sc, pcid, bucket = (kc[order], sc[order], pcid[order],
                            bucket[order])
    first = np.ones(len(kc), dtype=bool)
    first[1:] = ((kc[1:] != kc[:-1]) | (sc[1:] != sc[:-1])
                 | (pcid[1:] != pcid[:-1]) | (bucket[1:] != bucket[:-1]))
    sidx = np.nonzero(first)[0]
    n = np.diff(np.append(sidx, len(kc))).astype(np.int64)
    return pa.table({id_col: pa.array(ids[order][sidx],
                                      type=pa.int64()),
                     "n_dups": pa.array(n - 1)})


def windowed_dedup(ds, key: str = "user_id", sub_key: str = "event_type",
                   payload: str = "props", ts_col: str = "ts",
                   id_col: str = "event_id", window_sec: int = 3600,
                   num_parts: int = 16):
    """Exact windowed event dedup — the at-least-once-delivery cleanup:
    within each fixed calendar window (``ts // window_sec``), identical
    (key, sub_key, payload) events collapse to their first occurrence
    (min ts, then min id), with the suppressed duplicate count carried
    as ``n_dups``. Unlike :func:`debounce` (gap-based, payload-blind)
    this is calendar-bucketed and payload-exact, so a client retrying
    the same message twice in an hour dedups while a genuinely new
    payload in the same window survives. Null timestamps drop.

    Scale shape: one narrow (id, key, sub_key, payload, ts) hash
    exchange keyed by ``key``; per-partition work is one lexsort + one
    adjacent diff, no per-key Python. Output streams as a Dataset of
    (id, n_dups)."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(
        lambda b: b.select([id_col, key, sub_key, payload, ts_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, key, _windowed_dedup_partition,
                         num_parts,
                         fn_args=(key, sub_key, payload, ts_col, id_col,
                                  window_sec))


# ---------------------------------------------------------------------------
# interval union coverage (overlap-merged time per key)
# ---------------------------------------------------------------------------

def _coverage_partition(key: str, s_col: str, e_col: str,
                        pieces) -> pa.Table:
    """One key partition: sort (key, s, e), merge overlapping/adjacent
    intervals into islands with a reset-cummax (each key's rows live in
    a disjoint value block, so ONE np.maximum.accumulate serves every
    key), then two reduceat passes for island spans and per-key sums."""
    from .exchange import concat_typed
    empty = pa.table({key: pa.array([], type=pa.int64()),
                      "n_intervals": pa.array([], type=pa.int64()),
                      "n_islands": pa.array([], type=pa.int64()),
                      "covered_us": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, s_col, e_col)
    if t is None or t.num_rows == 0:
        return empty
    u = t.column(key).to_numpy()
    s = t.column(s_col).to_numpy()
    e = t.column(e_col).to_numpy()
    order = np.lexsort((e, s, u))
    u, s, e = u[order], s[order], e[order]
    seg_start = np.ones(len(u), dtype=bool)
    seg_start[1:] = u[1:] != u[:-1]
    seg_idx = np.nonzero(seg_start)[0]
    code = np.cumsum(seg_start) - 1
    s_first = s[seg_idx][code]
    s_rel = s - s_first
    e_rel = e - s_first
    K = int(e_rel.max()) + 1
    if (len(seg_idx) + 1) * K < 2**62:
        em = e_rel + code * K
        cm = np.maximum.accumulate(em)
        prev_rel = np.empty(len(u), dtype=np.int64)
        prev_rel[0] = -1
        prev_rel[1:] = cm[:-1] - code[1:] * K
        brk = seg_start | (s_rel > prev_rel)
    else:  # degenerate huge spans: per-key loop, same semantics
        brk = seg_start.copy()
        for a, b in zip(seg_idx, np.append(seg_idx[1:], len(u))):
            run = np.maximum.accumulate(e[a:b])
            brk[a + 1:b] = s[a + 1:b] > run[:-1]
    gid = np.cumsum(brk) - 1
    gidx = np.nonzero(brk)[0]
    gspan = np.maximum.reduceat(e, gidx) - s[gidx]
    g_u = u[gidx]
    kidx = np.nonzero(np.concatenate(
        [[True], g_u[1:] != g_u[:-1]]))[0]
    covered = np.add.reduceat(gspan, kidx).astype(np.int64)
    n_islands = np.diff(np.append(kidx, len(g_u))).astype(np.int64)
    n_intervals = np.add.reduceat(np.ones(len(u), dtype=np.int64),
                                  seg_idx).astype(np.int64)
    return pa.table({key: pa.array(u[seg_idx], type=pa.int64()),
                     "n_intervals": pa.array(n_intervals),
                     "n_islands": pa.array(n_islands),
                     "covered_us": pa.array(covered)})


def interval_coverage(ds, key: str = "user_id", ts_col: str = "ts",
                      dur_col: str = "value", num_parts: int = 16):
    """Per-key interval UNION coverage: each event opens an interval
    ``[ts, ts + floor(dur)·60 s)``; overlapping or touching intervals
    merge, and the op reports interval count, merged-island count, and
    total covered microseconds — the de-overlapped "time actually
    active" metric (billing, device uptime, session stitching) that a
    plain SUM(duration) double-counts. Null/non-positive durations and
    null timestamps drop.

    Scale shape: one narrow (key, start_us, end_us) exchange; the
    island merge is ONE reset-cummax over the partition (per-key value
    blocks) + two reduceat passes — no per-key Python on the normal
    path. Exact integer microseconds end to end."""
    from .exchange import hash_exchange

    def narrow(b: pa.Table) -> pa.Table:
        ts = b.column(ts_col)
        v = b.column(dur_col)
        ok = pc.and_(pc.is_valid(ts),
                     pc.and_(pc.coalesce(pc.is_finite(v),
                                         pa.scalar(False)),
                             pc.greater(v, pa.scalar(0.0))))
        f = b.filter(ok)
        s = pc.cast(pc.cast(f.column(ts_col), pa.timestamp("us")),
                    pa.int64())
        dur = pc.multiply(
            pc.cast(pc.floor(f.column(dur_col)), pa.int64()),
            pa.scalar(60_000_000, type=pa.int64()))
        return pa.table({key: pc.cast(f.column(key), pa.int64()),
                         "s_us": s,
                         "e_us": pc.add(s, dur)})

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    return hash_exchange(rows, key, _coverage_partition, num_parts,
                         fn_args=(key, "s_us", "e_us"))


# ---------------------------------------------------------------------------
# session path mining (within-session event-type n-grams)
# ---------------------------------------------------------------------------

def _path_partition(key: str, ts_col: str, id_col: str, type_col: str,
                    gap_sec: int, pieces) -> pa.Table:
    """One key partition: lexsort (key, ts, id), gap-cumsum session
    ids, then count consecutive event-type TRIGRAMS whose three events
    share a session — emitted as (t1, t2, t3, n) partials."""
    from .exchange import concat_typed
    empty = pa.table({"t1": pa.array([], type=pa.string()),
                      "t2": pa.array([], type=pa.string()),
                      "t3": pa.array([], type=pa.string()),
                      "n_part": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, ts_col, id_col, type_col)
    if t is None or t.num_rows == 0:
        return empty
    t = t.filter(pc.is_valid(t.column(ts_col)))
    if t.num_rows < 3:
        return empty
    ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                 pa.int64()).to_numpy()
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    kcol = t.column(key).combine_chunks() \
        if isinstance(t.column(key), pa.ChunkedArray) else t.column(key)
    kc = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    ty = t.column(type_col)
    ty = ty.combine_chunks() if isinstance(ty, pa.ChunkedArray) else ty
    enc = pc.dictionary_encode(ty)
    tc = np.asarray(enc.indices, dtype=np.int64)
    order = np.lexsort((ids, ts, kc))
    kc, ts, tc = kc[order], ts[order], tc[order]
    brk = np.ones(len(kc), dtype=bool)
    brk[1:] = (kc[1:] != kc[:-1]) | (ts[1:] - ts[:-1]
                                     > gap_sec * 1_000_000)
    sess = np.cumsum(brk)
    same3 = (sess[2:] == sess[1:-1]) & (sess[1:-1] == sess[:-2])
    if not same3.any():
        return empty
    a, b, c = tc[:-2][same3], tc[1:-1][same3], tc[2:][same3]
    V = int(tc.max()) + 1
    code = (a * V + b) * V + c
    u, n = np.unique(code, return_counts=True)
    d = enc.dictionary
    return pa.table({
        "t1": d.take(pa.array(u // (V * V), type=pa.int64())),
        "t2": d.take(pa.array((u // V) % V, type=pa.int64())),
        "t3": d.take(pa.array(u % V, type=pa.int64())),
        "n_part": pa.array(n.astype(np.int64))})


def session_paths(ds, key: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", type_col: str = "event_type",
                  gap_sec: int = 1800, num_parts: int = 16):
    """Within-session path mining: counts of consecutive event-type
    TRIGRAMS whose three events share a gap-based session — the
    behavioral-sequence signal (onboarding funnels, pre-churn paths)
    that global bigrams smear across session boundaries. Ties (equal
    ts) order by event id, the sessionize convention; null ts drop.

    Scale shape: one narrow (id, key, ts, type) exchange keyed by the
    session key; per-partition work is one lexsort + shifted
    comparisons; only (t1, t2, t3, n) partials (≤ types³) leave the
    partition for the final tiny groupby."""
    from ray.data.aggregate import Sum
    from .exchange import hash_exchange
    narrow = ds.map_batches(
        lambda b: b.select([id_col, key, ts_col, type_col]),
        batch_format="pyarrow")
    parts = hash_exchange(narrow, key, _path_partition, num_parts,
                          fn_args=(key, ts_col, id_col, type_col,
                                   gap_sec))
    return parts.groupby(["t1", "t2", "t3"]).aggregate(
        Sum("n_part", alias_name="n"))


def _concentration_partition(key: str, sub_key: str, pieces) -> pa.Table:
    """One key partition: finalize per-(key, sub) counts, then the
    integer Simpson collision ppm per key — Σc(c−1)·10⁶ // (n(n−1))."""
    from .exchange import concat_typed
    empty = pa.table({key: pa.array([], type=pa.int64()),
                      "n_events": pa.array([], type=pa.int64()),
                      "n_types": pa.array([], type=pa.int64()),
                      "conc_ppm": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, sub_key, "n_part")
    if t is None or t.num_rows == 0:
        return empty
    k = t.column(key).to_numpy()
    s = t.column(sub_key)
    s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    sc = np.asarray(pc.dictionary_encode(s).indices, dtype=np.int64)
    n = t.column("n_part").to_numpy()
    V = int(sc.max()) + 1
    # Dense-encode the key before arithmetic coding: raw * V wraps
    # int64 for |key| >= 2^63/V (e.g. 60-bit pseudonymize() output).
    kvals, ki = np.unique(k, return_inverse=True)
    code = ki.astype(np.int64) * V + sc
    u, inv = np.unique(code, return_inverse=True)
    c = np.zeros(len(u), dtype=np.int64)
    np.add.at(c, inv, n.astype(np.int64))
    uk = u // V
    fk = np.nonzero(np.concatenate([[True], uk[1:] != uk[:-1]]))[0]
    tot = np.add.reduceat(c, fk).astype(np.int64)
    coll = np.add.reduceat(c * (c - 1), fk).astype(np.int64)
    types = np.diff(np.append(fk, len(uk))).astype(np.int64)
    denom = np.maximum(tot * (tot - 1), 1)
    ppm = coll * 1_000_000 // denom
    # exact-integer guard: coll*1e6 wraps int64 once a key exceeds
    # ~3.04M events in a partition (coll <= tot(tot-1) > 2^63/1e6), and
    # c*(c-1) itself wraps beyond c ~ 3e9 — recompute those (rare,
    # bot-grade) keys with Python ints; tot <= 3M implies both safe
    hot = np.nonzero(tot > 3_000_000)[0]
    if len(hot):
        seg_ends = np.append(fk[1:], len(uk))
        for i in hot:
            cs = [int(x) for x in c[fk[i]:seg_ends[i]]]
            cl = sum(x * (x - 1) for x in cs)
            tt = int(tot[i])
            ppm[i] = cl * 1_000_000 // max(tt * (tt - 1), 1)
    return pa.table({key: pa.array(kvals[uk[fk]], type=pa.int64()),
                     "n_events": pa.array(tot),
                     "n_types": pa.array(types),
                     "conc_ppm": pa.array(ppm)})


def activity_concentration(ds, key: str = "user_id",
                           sub_key: str = "event_type",
                           num_parts: int = 16):
    """Per-key activity concentration: the integer Simpson collision
    probability (ppm) of the key's ``sub_key`` mix — 10⁶ means a
    single-behavior account (bot signature), low values a diverse one.
    The per-entity analogue of the per-doc token-concentration signal.

    Scale shape: per-batch (key, sub, n) count partials → one
    key-keyed exchange → vectorized segment reductions; exact integer
    arithmetic throughout."""
    from .exchange import hash_exchange

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: pc.cast(b.column(key), pa.int64()),
                      sub_key: b.column(sub_key)})
        g = t.group_by([key, sub_key]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key),
                         sub_key: g.column(sub_key),
                         "n_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(rows, key, _concentration_partition,
                         num_parts, fn_args=(key, sub_key))


def _streak_partition(key: str, pieces) -> pa.Table:
    """One key partition: distinct (key, day) pairs, consecutive-day
    islands, per-key max/active-day/streak counts."""
    from .exchange import concat_typed
    empty = pa.table({key: pa.array([], type=pa.int64()),
                      "active_days": pa.array([], type=pa.int64()),
                      "n_streaks": pa.array([], type=pa.int64()),
                      "max_streak": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, key, "day")
    if t is None or t.num_rows == 0:
        return empty
    k = t.column(key).to_numpy()
    d = t.column("day").to_numpy()
    order = np.lexsort((d, k))
    k, d = k[order], d[order]
    first = np.ones(len(k), dtype=bool)
    first[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
    k, d = k[first], d[first]            # distinct (key, day)
    new_key = np.ones(len(k), dtype=bool)
    new_key[1:] = k[1:] != k[:-1]
    brk = new_key.copy()
    brk[1:] |= d[1:] != d[:-1] + 1
    gidx = np.nonzero(brk)[0]
    slen = np.diff(np.append(gidx, len(k))).astype(np.int64)
    g_k = k[gidx]
    kidx = np.nonzero(np.concatenate([[True],
                                      g_k[1:] != g_k[:-1]]))[0]
    max_streak = np.maximum.reduceat(slen, kidx).astype(np.int64)
    n_streaks = np.diff(np.append(kidx, len(g_k))).astype(np.int64)
    active = np.add.reduceat(slen, kidx).astype(np.int64)
    return pa.table({key: pa.array(g_k[kidx], type=pa.int64()),
                     "active_days": pa.array(active),
                     "n_streaks": pa.array(n_streaks),
                     "max_streak": pa.array(max_streak)})


def activity_streaks(ds, key: str = "user_id", ts_col: str = "ts",
                     num_parts: int = 16):
    """Per-key consecutive-day activity streaks: distinct active days,
    number of maximal runs of consecutive days, and the longest run —
    the retention/habit metric. Null timestamps drop; days are UTC
    epoch-day integers (``epoch_us // 86400e6``), exactly what the SQL
    side computes.

    Scale shape: per-batch DISTINCT (key, day) partials shrink the
    exchange to active (key, day) pairs; one key exchange; islands via
    lexsort + adjacent diff."""
    from .exchange import hash_exchange

    def days(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column(ts_col)))
        us = pc.cast(pc.cast(f.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(us, pa.scalar(86_400_000_000, type=pa.int64()))
        t = pa.table({key: pc.cast(f.column(key), pa.int64()),
                      "day": day})
        return t.group_by([key, "day"]).aggregate([])

    rows = ds.map_batches(days, batch_format="pyarrow")
    return hash_exchange(rows, key, _streak_partition, num_parts,
                         fn_args=(key,))
