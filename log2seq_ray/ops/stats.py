"""Statistical / windowed aggregates beyond plain groupby counts.

* ``group_quantile`` — exact discrete quantile per group (the element at
  sorted index ``ceil(q*n)-1``, matching DuckDB ``quantile_disc``).
  Needs the group's values together → hash exchange of (group, value)
  pairs + one vectorized pass per partition (ops.exchange).
* ``hopping_counts`` — hopping (sliding) window counts: window ``size``
  advancing by ``hop``; each event is emitted into size/hop windows
  vectorially inside ``map_batches`` (partials), then one small merge —
  no per-event python, no shuffle of raw events.
* ``pivot_counts`` — crosstab: one row per key, one count column per
  pivot value; dense bincount partials per batch, wide rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool

from .exchange import bincount_i64

US = 1_000_000


def _finite_mask(col) -> pa.Array:
    """Validity mask for histogram binning: non-null AND (for float
    columns) finite. NaN is NOT an Arrow null — without this,
    ``np.floor(nan*scale).astype(int64)`` yields a platform-defined bin
    (INT64_MIN) that silently skews the quantile, while DuckDB sorts NaN
    greatest; NaN/inf rows are excluded on both sides instead."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_floating(col.type):
        return pc.coalesce(pc.is_finite(col), pa.scalar(False))
    return pc.is_valid(col)


def _disc_index(n, q: float):
    """DuckDB ``quantile_disc`` element index: ``ceil(q*n) - 1`` clamped
    to 0, with the multiply in IEEE double exactly as DuckDB computes it
    (coincides with ``floor((n-1)*q)`` at q=0.5 but not at e.g. q=0.9).
    ``n`` may be a scalar or an int64 ndarray."""
    return np.maximum(np.ceil(q * np.asarray(n, dtype=np.float64))
                      .astype(np.int64) - 1, 0)


def _quantile_partition(group_col, value_col, q, alias, pieces):
    """All groups of one partition in one vectorized pass: lexsort by
    (group, value), segment boundaries, per-segment index pick."""
    import pyarrow as pa
    from .exchange import concat_typed
    # zero-row pieces can carry the untransformed upstream schema (Ray
    # map_batches pass-through) — concat rows only; an all-empty
    # partition keeps the transformed schema when any piece has it
    t = concat_typed(pieces, group_col, value_col)
    if t is None:
        return pa.table({})  # zero-block input: no schema available at all
    # exclude null/NaN values (DuckDB quantile_disc ignores them; a NaN
    # here would also force the int64→float64 to_numpy path and emit
    # mixed block dtypes across partitions); all-null groups are omitted,
    # matching group_histogram_quantile's _finite_mask semantics
    t = t.filter(_finite_mask(t.column(value_col)))
    gcol = t.column(group_col)
    gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) \
        else gcol
    enc = pc.dictionary_encode(gcol)
    codes = np.asarray(enc.indices, dtype=np.int64)
    vals = np.asarray(t.column(value_col).to_numpy(zero_copy_only=False))
    order = np.lexsort((vals, codes))
    k, v = codes[order], vals[order]
    starts = np.ones(len(k), dtype=bool)
    starts[1:] = k[1:] != k[:-1]
    sidx = np.nonzero(starts)[0]
    m = np.diff(np.append(sidx, len(k)))
    pick = sidx + _disc_index(m, q)
    return pa.table({
        group_col: enc.dictionary.take(pa.array(k[sidx])),
        alias: pa.array(v[pick]),
    })


def group_quantile(ds, group_col: str, value_col: str, q: float = 0.5,
                   alias: str = "q", num_parts: int = 16):
    """Exact discrete quantile per group (sorted index ``ceil(q*n)-1``,
    = DuckDB ``quantile_disc``). Needs each group's values together by
    definition — one hash exchange of (group, value) pairs, then every
    partition computes ALL its groups' quantiles in one vectorized pass
    (no per-group Python)."""
    from .exchange import hash_exchange
    pairs = ds.map_batches(
        lambda b: b.select([group_col, value_col]), batch_format="pyarrow")
    return hash_exchange(pairs, group_col, _quantile_partition, num_parts,
                         fn_args=(group_col, value_col, q, alias))


def group_histogram_quantile(ds, group_col: str, value_col: str,
                             q: float = 0.5, scale: int = 100,
                             alias: str = "q_bin", num_parts: int = 16):
    """Bounded-shuffle per-group quantile of a CONTINUOUS column: values
    quantize to integer bins (``floor(value * scale)``), per-batch
    (group, bin) count partials pre-aggregate BEFORE any exchange, so the
    shuffle carries O(groups × bins) narrow rows — never the raw
    (group, value) pairs ``group_quantile`` ships. Per-partition memory is
    O(its groups × bins), independent of row count; error ≤ ``1/scale``.

    Returns (group, ``alias``) where ``alias`` is the bin of the group's
    exact discrete quantile element — SQL-reproducible as
    ``quantile_disc(CAST(floor(value*scale) AS BIGINT), q) GROUP BY
    group``. Nulls are excluded, like SQL quantiles; NaN/inf rows are
    excluded too (unsupported by integer binning — DuckDB would instead
    sort NaN greatest)."""
    from ray.data.aggregate import Sum
    from .exchange import hash_exchange

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(_finite_mask(b.column(value_col)))
        bins = np.floor(np.asarray(
            b.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.float64) * scale).astype(np.int64)
        t = pa.table({group_col: b.column(group_col),
                      "bin": pa.array(bins)})
        g = t.group_by([group_col, "bin"]).aggregate([([], "count_all")])
        return pa.table({group_col: g.column(group_col),
                         "bin": g.column("bin"),
                         "n_part": g.column("count_all")})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "bin"]).aggregate(Sum("n_part", alias_name="n"))

    def pick(pieces):
        from .exchange import resolve_all_pieces
        ps = resolve_all_pieces(pieces)
        if not ps:
            return pa.table({})
        t = pa.concat_tables(ps, promote_options="permissive")
        if t.num_rows == 0:
            if group_col not in t.column_names:
                return pa.table({})  # zero-column empty (Ray groupby quirk)
            return pa.table({group_col: t.column(group_col),
                             alias: pa.array([], type=pa.int64())})
        gcol = t.column(group_col)
        gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) \
            else gcol
        enc = pc.dictionary_encode(gcol)
        codes = np.asarray(enc.indices, dtype=np.int64)
        bins = np.asarray(t.column("bin").to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        cnts = np.asarray(t.column("n").to_numpy(zero_copy_only=False),
                          dtype=np.int64)
        order = np.lexsort((bins, codes))
        k, b_, c = codes[order], bins[order], cnts[order]
        starts = np.ones(len(k), dtype=bool)
        starts[1:] = k[1:] != k[:-1]
        sidx = np.nonzero(starts)[0]
        # per-segment cumulative counts → index of the bin holding the
        # quantile_disc-index element of each group
        csum = c.cumsum()
        seg_base = np.repeat(np.concatenate(([0], csum[sidx[1:] - 1])),
                             np.diff(np.append(sidx, len(k))))
        within = csum - seg_base  # cumulative within each group segment
        seg_end = np.concatenate((csum[sidx[1:] - 1], [csum[-1]]))
        n_group = seg_end - np.concatenate(([0], csum[sidx[1:] - 1]))
        target = _disc_index(n_group, q)  # per segment
        tgt_row = np.repeat(target, np.diff(np.append(sidx, len(k))))
        hit = within > tgt_row  # first bin whose cumulative passes target
        seg_id = np.repeat(np.arange(len(sidx)), np.diff(
            np.append(sidx, len(k))))
        rows = np.nonzero(hit)[0]
        first_hit = np.full(len(sidx), len(k), dtype=np.int64)
        np.minimum.at(first_hit, seg_id[rows], rows)
        return pa.table({
            group_col: enc.dictionary.take(pa.array(k[sidx])),
            alias: pa.array(b_[first_hit]),
        })

    return hash_exchange(hist, group_col, pick, num_parts)


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


def pivot_counts(ds, key: str, pivot_col: str, values, prefix: str = "n_"):
    """Pivot/crosstab counts: one output row per ``key`` with a count
    column per listed pivot value (``prefix + value``) — the wide
    per-entity feature shape (events per user by type, tokens per doc by
    class). Keys whose rows all carry OTHER pivot values still appear,
    with all-zero counts (SQL ``GROUP BY`` + ``FILTER`` semantics).

    Scale shape: per batch, joint dictionary-encode (key, pivot-index)
    and ONE ``bincount`` build a dense (keys-in-batch × len(values))
    partial, so the shuffle carries one already-pivoted row per (batch,
    key) — never raw events; the final ``groupby(key)`` sums the few
    wide partials per key."""
    from ray.data.aggregate import Sum

    vals = list(values)
    K = len(vals)
    vset = pa.array(vals)
    names = [prefix + str(v) for v in vals]

    def partial(b: pa.Table) -> pa.Table:
        kcol = b.column(key)
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
            else kcol
        enc = pc.dictionary_encode(kcol)
        codes = np.asarray(enc.indices, dtype=np.int64)
        pidx = pc.fill_null(pc.index_in(b.column(pivot_col),
                                        value_set=vset), -1)
        pidx = np.asarray(pc.cast(pidx, pa.int64()).to_numpy(),
                          dtype=np.int64)
        ok = pidx >= 0
        n_keys = len(enc.dictionary)
        cnt = np.bincount(codes[ok] * K + pidx[ok],
                          minlength=n_keys * K).reshape(n_keys, K)
        cols = {key: enc.dictionary}
        for j, name in enumerate(names):
            cols[name] = pa.array(cnt[:, j])
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(*[Sum(n, alias_name=n) for n in names])


def percentile_rank(ds, value_col: str, id_col: str,
                    alias: str = "n_less"):
    """Per-row global rank: the count of rows with a STRICTLY smaller
    value (``RANK() OVER (ORDER BY value) - 1``, ties share). The
    integer-exact building block for percentile normalization of quality
    scores / lengths (percentile = n_less / (n-1) is one IEEE division
    the caller applies).

    Scale shape: like ``global_quantile_disc``, a distributed counting
    sort — per-batch value-count partials → one distinct-value-sized
    histogram → the driver builds the cumulative-below table and
    broadcasts it ONCE (``ray.put``); every batch then resolves its rows
    with one vectorized ``searchsorted``. Driver and per-task memory are
    O(distinct values), never O(rows); rows never shuffle."""
    import ray
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        g = b.select([value_col]).group_by(value_col) \
            .aggregate([([], "count_all")])
        return pa.table({value_col: g.column(value_col),
                         "n_part": g.column("count_all")})

    vc = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby(value_col).aggregate(Sum("n_part", alias_name="n")) \
        .to_pandas()
    if len(vc) == 0:  # empty-dataset to_pandas also drops the columns
        values = np.empty(0, dtype=np.int64)
        below = np.empty(0, dtype=np.int64)
    else:
        vc = vc.sort_values(value_col)
        values = np.asarray(vc[value_col].to_numpy())
        below = np.concatenate(([0], vc["n"].to_numpy(dtype=np.int64)
                                .cumsum()[:-1]))
    ref = ray.put((values, below))

    class Ranker:
        def __init__(self):
            self.values, self.below = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            v = np.asarray(b.column(value_col)
                           .to_numpy(zero_copy_only=False))
            idx = np.searchsorted(self.values, v, side="left")
            return pa.table({
                id_col: b.column(id_col),
                alias: pa.array(self.below[idx], type=pa.int64()),
            })

    return ds.map_batches(Ranker, batch_format="pyarrow",
                          concurrency=actor_pool())


def hourly_spikes(ds, ts_col: str = "ts", by: str = "event_type",
                  factor: int = 3):
    """Rate-anomaly detection: per-(key, hour) counts with an
    integer-exact spike flag — ``spike = 1`` iff
    ``n * hours_present > factor * total_n`` for that key, i.e. the hour
    ran more than ``factor``× the key's mean hourly rate, decided without
    float division.

    Scale shape: raw events reduce to per-batch (key, hour) count
    partials (the only shuffle carries those, O(keys × hours) rows); the
    per-key totals then come from the ALREADY-aggregated hourly table
    (materialized — it is the bounded aggregate, not the corpus) and are
    broadcast once as a lookup for the vectorized flag pass."""
    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column(ts_col), unit="hour")
        t = pa.table({by: b.column(by), "hour": hour})
        g = t.group_by([by, "hour"]).aggregate([([], "count_all")])
        return pa.table({by: g.column(by), "hour": g.column("hour"),
                         "partial_n": g.column("count_all")})

    hourly = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "hour"]).aggregate(Sum("partial_n", alias_name="n")) \
        .materialize()

    def totals(b: pa.Table) -> pa.Table:
        g = b.group_by([by]).aggregate([("n", "sum"), ([], "count_all")])
        return pa.table({by: g.column(by),
                         "t_part": g.column("n_sum"),
                         "h_part": g.column("count_all")})

    tot = hourly.map_batches(totals, batch_format="pyarrow") \
        .groupby(by).aggregate(Sum("t_part", alias_name="total"),
                               Sum("h_part", alias_name="hours")) \
        .to_pandas()
    if len(tot) == 0:  # empty-dataset to_pandas drops the columns
        import pandas as _pd
        tot = _pd.DataFrame({by: [], "total": [], "hours": []})
    keys = pa.array(tot[by])
    total = np.asarray(tot["total"].to_numpy(), dtype=np.int64)
    hours = np.asarray(tot["hours"].to_numpy(), dtype=np.int64)
    ref = ray.put((keys, total, hours))

    class Flag:
        def __init__(self):
            self.keys, self.total, self.hours = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = np.asarray(
                pc.cast(pc.index_in(b.column(by), value_set=self.keys),
                        pa.int64()).to_numpy(zero_copy_only=False),
                dtype=np.int64)
            n = np.asarray(b.column("n").to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            spike = (n * self.hours[idx]
                     > np.int64(factor) * self.total[idx])
            return b.append_column("spike",
                                   pa.array(spike.astype(np.int64)))

    return hourly.map_batches(Flag, batch_format="pyarrow",
                              concurrency=actor_pool())


def group_value_stats(ds, key: str, value_col: str):
    """One-pass per-key sufficient statistics over a double column:
    ``n`` (non-null), ``min_micro`` / ``max_micro`` / ``sum_micro`` in
    integer micro-units (``floor(value * 1e6)``). Micro-unit BIGINT sums
    are additive and order-independent — unlike float sums, whose value
    depends on block arrival order — so the merge is engine-exact at any
    parallelism. ``mean = sum_micro / n / 1e6`` is the caller's one IEEE
    division. Shuffle carries only per-(batch, key) partial rows."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        # NaN/inf must drop with the nulls: floor(NaN*1e6).astype(int64)
        # is a platform-defined bin (INT64_MIN) that corrupts min/sum
        b = b.filter(_finite_mask(b.column(value_col)))
        m = np.floor(np.asarray(
            b.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.float64) * 1e6).astype(np.int64)
        t = pa.table({key: b.column(key), "m": pa.array(m)})
        g = t.group_by([key]).aggregate(
            [("m", "min"), ("m", "max"), ("m", "sum"), ([], "count_all")])
        return pa.table({key: g.column(key),
                         "min_part": g.column("m_min"),
                         "max_part": g.column("m_max"),
                         "sum_part": g.column("m_sum"),
                         "n_part": g.column("count_all")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(
            Sum("n_part", alias_name="n"),
            Min("min_part", alias_name="min_micro"),
            Max("max_part", alias_name="max_micro"),
            Sum("sum_part", alias_name="sum_micro"))


def profile_columns(ds, numeric_cols=(), string_cols=()):
    """One-pass ANALYZE-style column profile: per column, the valid /
    null counts plus min/max (numeric columns as DOUBLE, string columns
    lexicographic). The streaming prerequisite for planning a 100 TB run
    — batch sizing, skew triage, filter selectivity — without a per-column
    scan each.

    Scale shape: every batch emits ONE narrow partial row per column
    (counts + extremes already reduced), so the shuffle carries
    O(batches × columns) rows regardless of corpus size; the final
    ``groupby(column)`` merges a handful of partials per column. Integer
    mins/maxes are exact as DOUBLE for |v| < 2^53."""
    from ray.data.aggregate import Max, Min, Sum

    num = list(numeric_cols)
    st = list(string_cols)

    def partial(b: pa.Table) -> pa.Table:
        names, nv, nn = [], [], []
        mins_n, maxs_n, mins_s, maxs_s = [], [], [], []
        for c in num:
            col = b.column(c)
            valid = len(col) - col.null_count
            names.append(c)
            nv.append(valid)
            nn.append(col.null_count)
            if valid:
                mm = pc.min_max(col)
                mins_n.append(float(mm["min"].as_py()))
                maxs_n.append(float(mm["max"].as_py()))
            else:
                mins_n.append(None)
                maxs_n.append(None)
            mins_s.append(None)
            maxs_s.append(None)
        for c in st:
            col = b.column(c)
            valid = len(col) - col.null_count
            names.append(c)
            nv.append(valid)
            nn.append(col.null_count)
            mins_n.append(None)
            maxs_n.append(None)
            if valid:
                mm = pc.min_max(col)
                mins_s.append(mm["min"].as_py())
                maxs_s.append(mm["max"].as_py())
            else:
                mins_s.append(None)
                maxs_s.append(None)
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "nv": pa.array(nv, type=pa.int64()),
            "nn": pa.array(nn, type=pa.int64()),
            "mn": pa.array(mins_n, type=pa.float64()),
            "mx": pa.array(maxs_n, type=pa.float64()),
            "ms": pa.array(mins_s, type=pa.string()),
            "xs": pa.array(maxs_s, type=pa.string()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("nv", alias_name="n_valid"),
            Sum("nn", alias_name="n_null"),
            Min("mn", alias_name="min_num"),
            Max("mx", alias_name="max_num"),
            Min("ms", alias_name="min_str"),
            Max("xs", alias_name="max_str"))


def rollup_counts(ds, k1: str, k2: str, sentinel: str = "__all__"):
    """Hierarchical ROLLUP counts in ONE corpus pass: (k1, k2) counts,
    per-k1 subtotals, and the grand total, with ``sentinel`` marking the
    rolled-up key levels (string keys without real nulls — Ray groupby
    cannot partition null keys). The subtotal and total levels are
    derived from the ALREADY-aggregated finest level (bounded by distinct
    key pairs, materialized once), never from a second corpus scan."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select([k1, k2]).group_by([k1, k2]) \
            .aggregate([([], "count_all")])
        return pa.table({k1: g.column(k1), k2: g.column(k2),
                         "partial_n": g.column("count_all")})

    fine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([k1, k2]).aggregate(Sum("partial_n", alias_name="n")) \
        .materialize()

    def sub_partial(b: pa.Table) -> pa.Table:
        g = b.group_by([k1]).aggregate([("n", "sum")])
        return pa.table({k1: g.column(k1),
                         "partial_n": g.column("n_sum")})

    sub = fine.map_batches(sub_partial, batch_format="pyarrow") \
        .groupby(k1).aggregate(Sum("partial_n", alias_name="n")) \
        .map_batches(
            lambda b: pa.table({
                k1: b.column(k1),
                k2: pa.array([sentinel] * b.num_rows),
                "n": b.column("n")}),
            batch_format="pyarrow")

    def tot_partial(b: pa.Table) -> pa.Table:
        n = pc.sum(b.column("n")).as_py() or 0
        return pa.table({k1: pa.array([sentinel]),
                         k2: pa.array([sentinel]),
                         "partial_n": pa.array([n], type=pa.int64())})

    # seed row so an EMPTY input still yields the grand-total row with
    # n = 0, matching SQL ROLLUP's () grouping set on an empty table
    import ray.data as rd
    seed = rd.from_arrow(pa.table({
        k1: pa.array([sentinel]), k2: pa.array([sentinel]),
        "partial_n": pa.array([0], type=pa.int64())}))
    tot = fine.map_batches(tot_partial, batch_format="pyarrow") \
        .union(seed) \
        .groupby([k1, k2]).aggregate(Sum("partial_n", alias_name="n"))

    return fine.union(sub).union(tot)


def histogram_quantile(ds, value_col: str, q: float = 0.5,
                       scale: int = 100) -> int:
    """Approximate GLOBAL quantile of a CONTINUOUS column with bounded
    memory: values are quantized to integer bins (``floor(value * scale)``
    micro-units) before the counting sort, so per-task / driver memory is
    O(value-range × scale) — independent of BOTH corpus size and
    distinct-value count. This is the scale path where
    ``global_quantile_disc`` (exact, O(distinct values)) degrades: a
    continuous float column at 10^12 rows has ~10^12 distincts, but only
    ``range × scale`` bins. Error is bounded by the bin width ``1/scale``.

    Returns the bin of the exact discrete quantile element (the value the
    ``ceil(q*n)-1``-th sorted row falls in), as an integer bin id —
    deterministic, engine-exact, and SQL-reproducible as
    ``quantile_disc(CAST(floor(value * scale) AS BIGINT), q)``.
    Null values are excluded, like SQL quantiles; NaN/inf rows are
    excluded too (unsupported by integer binning — DuckDB would instead
    sort NaN greatest)."""
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        col = b.column(value_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = col.filter(_finite_mask(col))
        bins = np.floor(np.asarray(col.to_numpy(zero_copy_only=False),
                                   dtype=np.float64)
                        * scale).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u), "n_part": pa.array(c)})

    vc = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n_part", alias_name="n")) \
        .to_pandas()
    if len(vc) == 0:
        raise ValueError("histogram_quantile of an empty dataset")
    vc = vc.sort_values("bin")
    n = int(vc["n"].sum())
    idx = int(_disc_index(n, q))
    pos = int(np.searchsorted(vc["n"].cumsum().to_numpy(), idx,
                              side="right"))
    return int(vc["bin"].iloc[pos])


def global_quantile_disc(ds, value_col: str, q: float = 0.5) -> float:
    """Exact GLOBAL discrete quantile (sorted index ``ceil(q*n)-1``,
    = DuckDB ``quantile_disc``) of a column whose distinct-value count is
    bounded (token counts, scores, lengths — the curation metrics).

    Distributed counting sort: per-batch value-count partials → one
    narrow ``groupby(value)`` of distinct-value-sized rows → a driver
    cumulative-sum pick over the tiny value histogram. Unlike routing
    every row to one quantile partition, per-task and driver memory are
    O(distinct values), independent of corpus size."""
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        g = b.select([value_col]).group_by(value_col) \
            .aggregate([([], "count_all")])
        return pa.table({value_col: g.column(value_col),
                         "n_part": g.column("count_all")})

    vc = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby(value_col).aggregate(Sum("n_part", alias_name="n")) \
        .to_pandas()
    if len(vc) == 0:  # empty-dataset to_pandas also drops the columns
        raise ValueError("global_quantile_disc of an empty dataset")
    vc = vc.sort_values(value_col)
    n = int(vc["n"].sum())
    idx = int(_disc_index(n, q))
    pos = int(np.searchsorted(vc["n"].cumsum().to_numpy(), idx,
                              side="right"))
    return vc[value_col].iloc[pos]


_UNIT_SEC = {"hour": 3600, "day": 86400, "minute": 60}


def _dense_fill_partition(key: str, unit_us: int, pieces) -> pa.Table:
    """One key partition of the gap fill: sum the (key, period) partials,
    then emit EVERY unit step between each key's first and last active
    period, zero-filled — all index arithmetic, no per-key Python."""
    from .exchange import col_type, concat_typed
    t = concat_typed(pieces, key, "period", "p")
    empty = pa.table({key: pa.array([], type=col_type(t, key,
                                                      pa.int64())),
                      "period": pa.array([], type=pa.timestamp("us")),
                      "n": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return empty
    kcol = t.column(key)
    kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) \
        else kcol
    codes = np.asarray(pc.dictionary_encode(kcol).indices, dtype=np.int64)
    per = pc.cast(t.column("period"), pa.int64()).to_numpy()
    p = t.column("p").to_numpy().astype(np.int64)
    order = np.lexsort((per, codes))
    codes, per, p = codes[order], per[order], p[order]
    row_of = np.arange(len(codes))[order]  # original row index per sorted
    # sum partials per (key, period)
    first = np.ones(len(codes), dtype=bool)
    first[1:] = (codes[1:] != codes[:-1]) | (per[1:] != per[:-1])
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(p, starts)
    codes, per, row_of = codes[first], per[first], row_of[first]
    # per-key span → dense grid
    kfirst = np.ones(len(codes), dtype=bool)
    kfirst[1:] = codes[1:] != codes[:-1]
    kstarts = np.flatnonzero(kfirst)
    kends = np.append(kstarts[1:], len(codes))
    mins = per[kstarts]
    maxs = per[kends - 1]
    m = (maxs - mins) // unit_us + 1          # grid rows per key
    total = int(m.sum())
    off = np.cumsum(m) - m                    # grid offset per key
    step = np.arange(total, dtype=np.int64) - np.repeat(off, m)
    grid_per = np.repeat(mins, m) + step * unit_us
    n = np.zeros(total, dtype=np.int64)
    # scatter the observed sums into the grid
    key_idx = np.repeat(np.arange(len(kstarts)), kends - kstarts)
    pos = off[key_idx] + (per - mins[key_idx]) // unit_us
    n[pos] = sums
    # key values: first original row of each key, repeated over its grid
    keys_uniq = kcol.take(pa.array(row_of[kstarts]))
    grid_key_idx = np.repeat(np.arange(len(kstarts), dtype=np.int64), m)
    return pa.table({key: keys_uniq.take(pa.array(grid_key_idx)),
                     "period": pa.array(grid_per).cast(pa.timestamp("us")),
                     "n": pa.array(n, type=pa.int64())})


def dense_counts(ds, key: str, ts_col: str = "ts", unit: str = "hour",
                 num_parts: int = 16):
    """Gap-filled per-key time series: (key, period, n) with EVERY
    ``unit`` step between the key's first and last active period present
    (missing periods → n = 0) — the resampling/densification step a
    telemetry dashboard or rate model needs before windowed math.

    Scale shape: per-batch (key, period) count partials pre-aggregate
    BEFORE the exchange (the shuffle carries O(keys × active periods)
    rows, never raw events); one key-hash exchange co-locates each key's
    partials; the per-partition fill is pure index arithmetic (lexsort +
    reduceat + one scatter into the dense grid). Output size is
    Σ_key span_key/unit — the gap fill itself is the caller's explicit
    densification choice, distributed across partitions, never built on
    the driver."""
    from .exchange import hash_exchange
    unit_us = _UNIT_SEC[unit] * US

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(ts_col)))
        period = pc.floor_temporal(
            pc.cast(b.column(ts_col), pa.timestamp("us")), unit=unit)
        g = pa.table({key: b.column(key), "period": period}) \
            .group_by([key, "period"]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key),
                         "period": g.column("period"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(partials, key, _dense_fill_partition, num_parts,
                         fn_args=(key, unit_us))


def _mad_partition(group_col, value_col, pieces):
    """All groups of one partition: median by segment pick, then the
    median of |v - med| (same sorted-segment machinery) — both from ONE
    exchange, since MAD needs the group's values resident anyway."""
    from .exchange import concat_typed
    t = concat_typed(pieces, group_col, value_col)
    if t is None:
        return pa.table({})
    t = t.filter(_finite_mask(t.column(value_col)))
    gcol = t.column(group_col)
    gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) \
        else gcol
    empty = pa.table({group_col: pa.array([], type=gcol.type),
                      "n": pa.array([], type=pa.int64()),
                      "med": pa.array([], type=pa.float64()),
                      "mad": pa.array([], type=pa.float64())})
    if t.num_rows == 0:
        return empty
    enc = pc.dictionary_encode(gcol)
    codes = np.asarray(enc.indices, dtype=np.int64)
    vals = np.asarray(t.column(value_col).to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    order = np.lexsort((vals, codes))
    k, v = codes[order], vals[order]
    starts = np.ones(len(k), dtype=bool)
    starts[1:] = k[1:] != k[:-1]
    sidx = np.flatnonzero(starts)
    m = np.diff(np.append(sidx, len(k)))
    med = v[sidx + _disc_index(m, 0.5)]
    dev = np.abs(v - np.repeat(med, m))
    order2 = np.lexsort((dev, k))
    d = dev[order2]
    mad = d[sidx + _disc_index(m, 0.5)]
    return pa.table({
        group_col: enc.dictionary.take(pa.array(k[sidx])),
        "n": pa.array(m, type=pa.int64()),
        "med": pa.array(med, type=pa.float64()),
        "mad": pa.array(mad, type=pa.float64())})


def group_mad_stats(ds, group_col: str, value_col: str,
                    num_parts: int = 16):
    """Robust per-group location/scale: exact discrete median and MAD
    (median absolute deviation), the outlier-resistant alternative to
    mean/std for anomaly thresholds (x is anomalous if
    |x - med| > k * mad). Both statistics are ELEMENT PICKS (DuckDB
    ``quantile_disc`` convention) over deterministic float64 ops, so
    the SQL oracle matches bit-for-bit — no summation-order drift.

    Scale shape: one (group, value) hash exchange — a group's exact
    median needs its values together by definition; the second pass
    (deviations) reuses the resident partition, so MAD costs no extra
    shuffle; output is O(groups)."""
    from .exchange import hash_exchange
    pairs = ds.map_batches(
        lambda b: b.select([group_col, value_col]), batch_format="pyarrow")
    return hash_exchange(pairs, group_col, _mad_partition, num_parts,
                         fn_args=(group_col, value_col))


def _rank_partition(group_col: str, val_col: str, id_col: str,
                    pieces) -> pa.Table:
    """One group partition of :func:`group_value_rank`: lexsort by
    (group, value, id); a row's rank is its value-run start's offset
    within the group segment (ties share a rank — RANK() semantics)."""
    from .exchange import col_type, concat_typed
    t = concat_typed(pieces, group_col, val_col, id_col)
    empty = pa.table({
        id_col: pa.array([], type=col_type(t, id_col, pa.int64())),
        group_col: pa.array([], type=col_type(t, group_col,
                                              pa.string())),
        "rnk": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return empty
    valid = pc.is_valid(t.column(val_col))
    if not pc.all(valid).as_py():
        t = t.filter(valid)
    if t.num_rows == 0:
        return empty
    v = np.asarray(t.column(val_col).to_numpy(zero_copy_only=False),
                   dtype=np.float64)
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64())
                     .to_numpy(zero_copy_only=False), dtype=np.int64)
    gcol = t.column(group_col).combine_chunks() \
        if isinstance(t.column(group_col), pa.ChunkedArray) \
        else t.column(group_col)
    codes = np.asarray(pc.dictionary_encode(gcol).indices, dtype=np.int64)
    order = np.lexsort((ids, v, codes))
    g, sv = codes[order], v[order]
    n = len(g)
    idx = np.arange(n, dtype=np.int64)
    new_g = np.ones(n, dtype=bool)
    new_g[1:] = g[1:] != g[:-1]
    new_run = new_g.copy()
    new_run[1:] |= sv[1:] != sv[:-1]
    seg_start = np.maximum.accumulate(np.where(new_g, idx, 0))
    run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
    rnk = run_start - seg_start
    sel = pa.array(order)
    return pa.table({id_col: t.column(id_col).take(sel),
                     group_col: t.column(group_col).take(sel),
                     "rnk": pa.array(rnk, type=pa.int64())})


def group_value_rank(ds, group_col: str, val_col: str, id_col: str,
                     num_parts: int = 16):
    """Per-group value rank for EVERY row — ``RANK() OVER (PARTITION BY
    group ORDER BY value) − 1`` (ties share a rank): the per-group
    normalization step before quantile binning or difficulty-ordered
    curriculum sampling. Null values drop. No arithmetic touches the
    values (pure sort), so doubles rank engine-exactly.

    Scale shape: ONE narrow (group, value, id) exchange; per partition
    a single lexsort + two run-boundary scans — the global-rank analogue
    of ``percentile_rank`` for when the distinct-value histogram
    broadcast would be corpus-sized (continuous values)."""
    from .exchange import hash_exchange
    narrow = ds.map_batches(
        lambda b: b.select([group_col, val_col, id_col]),
        batch_format="pyarrow")
    return hash_exchange(narrow, group_col, _rank_partition, num_parts,
                         fn_args=(group_col, val_col, id_col))


def ingest_hist_run(ds, state_dir: str, value_col: str, q: float = 0.5,
                    scale: int = 100):
    """Incremental cross-RUN quantile — the persisted-histogram member
    of the ingest family: each run commits its integer-binned value
    histogram (``floor(value * scale)``, the ``histogram_quantile``
    contract) under ``state_dir``; the returned quantile covers ALL
    committed runs plus this one. Bin counts merge by ADDITION, so N
    runs estimate their union's quantile in O(range × scale) without
    re-reading history; error ≤ the bin width. NaN/inf/null excluded.
    Commit = temp+rename. Returns (bin, n_total) as a one-row pandas
    frame."""
    import os
    import uuid

    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    os.makedirs(state_dir, exist_ok=True)
    runs = sorted(d for d in os.listdir(state_dir) if d.startswith("run_"))

    def counts(b: pa.Table) -> pa.Table:
        col = b.column(value_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = col.filter(_finite_mask(col))
        bins = np.floor(np.asarray(col.to_numpy(zero_copy_only=False),
                                   dtype=np.float64)
                        * scale).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u), "n_part": pa.array(c)})

    mine = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n_part", alias_name="n")) \
        .materialize()
    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    mine.write_parquet(tmp)
    os.rename(tmp, f"{state_dir}/run_{len(runs):05d}")

    files = [f"{state_dir}/run_{i:05d}/{f}"
             for i in range(len(runs) + 1)
             if os.path.isdir(f"{state_dir}/run_{i:05d}")
             for f in sorted(os.listdir(f"{state_dir}/run_{i:05d}"))
             if f.endswith(".parquet")]
    if not files:   # every run so far was empty
        raise ValueError("ingest_hist_run: no finite values in history")
    vc = rd.read_parquet(files).groupby("bin") \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if len(vc) == 0:
        raise ValueError("ingest_hist_run: no finite values in history")
    vc = vc.sort_values("bin")
    n = int(vc["n"].sum())
    idx = int(_disc_index(n, q))
    pos = int(np.searchsorted(vc["n"].cumsum().to_numpy(), idx,
                              side="right"))
    return pd.DataFrame({"bin": [int(vc["bin"].iloc[pos])],
                         "n_total": [n]})


def weighted_quantile_disc(ds, value_col: str, weight_col: str, qs):
    """WEIGHTED discrete quantiles of an integer-valued column: the
    value whose cumulative weight (in value order) first reaches
    ``ceil(q · total_weight)`` — e.g. the token-weighted median doc
    length answers "half the corpus TOKENS live in docs at least this
    long", which the unweighted median structurally understates.

    Scale shape: per-batch (value, weight-sum) partials → one groupby
    over the DISTINCT values (bounded for integer metrics like token
    counts — the global_quantile_disc contract) → a driver-side
    cumsum over that bounded table. Exact integer arithmetic; ties in
    ``value`` are order-independent by construction. Returns one row
    per q: (q_ppm, value, cum_weight, total_weight)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(value_col), pa.int64()).to_numpy()
        w = pc.cast(b.column(weight_col), pa.int64()).to_numpy()
        u, inv = np.unique(v, return_inverse=True)
        return pa.table({"v": pa.array(u),
                         "w_part": pa.array(
                             bincount_i64(inv, w))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("w_part", alias_name="w")) \
        .sort("v").to_pandas()
    out = {"q_ppm": [], "value": [], "cum_weight": [],
           "total_weight": []}
    if len(agg):
        cw = agg["w"].cumsum()
        tot = int(cw.iloc[-1])
        for q in qs:
            # round, not truncate: int(0.29 * 1e6) == 289999 would
            # shift both q_ppm and the ceil target off the ppm contract
            q_ppm = int(round(q * 1_000_000))
            target = -(-q_ppm * tot // 1_000_000)  # ceil
            i = int(np.searchsorted(cw.to_numpy(), target))
            out["q_ppm"].append(q_ppm)
            out["value"].append(int(agg["v"].iloc[i]))
            out["cum_weight"].append(int(cw.iloc[i]))
            out["total_weight"].append(tot)
    return pd.DataFrame(out).astype("int64")


def winsorize_by_group(ds, group_col: str, value_col: str,
                       id_col: str, lo_q: float = 0.01,
                       hi_q: float = 0.99, scale: int = 100,
                       num_parts: int = 16):
    """Per-group winsorization: values (in ``floor(v*scale)`` integer
    bin units) clip to the group's [lo_q, hi_q] discrete quantiles,
    with a -1/0/+1 clip flag — the outlier-robust rewrite before
    training on heavy-tailed metrics. NaN/inf/null values drop (the
    binned-quantile contract).

    Scale shape: bounds come from two bounded-shuffle
    :func:`group_histogram_quantile` passes (the shuffle carries
    (group, bin, count) partials, never values); the tiny per-group
    bounds table broadcasts back via plasma and the rewrite is one
    vectorized clip per batch. Returns
    (id, group, bin_clipped, clip_flag)."""
    import ray

    lo = group_histogram_quantile(ds, group_col, value_col, lo_q,
                                  scale, alias="lo",
                                  num_parts=num_parts).to_pandas()
    hi = group_histogram_quantile(ds, group_col, value_col, hi_q,
                                  scale, alias="hi",
                                  num_parts=num_parts).to_pandas()
    bounds = {g: (int(l), None) for g, l in zip(lo[group_col],
                                                lo["lo"])}
    for g, h in zip(hi[group_col], hi["hi"]):
        bounds[g] = (bounds[g][0], int(h))
    ref = ray.put(bounds)

    def clip(b: pa.Table) -> pa.Table:
        bm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b = b.filter(_finite_mask(b.column(value_col)))
        if not len(b):
            # build the empty block from the REAL input group type — a
            # hardcoded string schema mixes block schemas when the
            # group column is non-string and fails downstream
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                group_col: pa.array(
                    [], type=b.schema.field(group_col).type),
                "bin_clipped": pa.array([], type=pa.int64()),
                "clip_flag": pa.array([], type=pa.int64())})
        bins = np.floor(np.asarray(
            b.column(value_col).to_numpy(zero_copy_only=False),
            dtype=np.float64) * scale).astype(np.int64)
        groups = b.column(group_col).to_pylist()
        lo_a = np.array([bm[g][0] for g in groups], dtype=np.int64)
        hi_a = np.array([bm[g][1] for g in groups], dtype=np.int64)
        clipped = np.clip(bins, lo_a, hi_a)
        flag = np.where(bins < lo_a, -1,
                        np.where(bins > hi_a, 1, 0)).astype(np.int64)
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            group_col: b.column(group_col),
            "bin_clipped": pa.array(clipped),
            "clip_flag": pa.array(flag)})

    return ds.map_batches(clip, batch_format="pyarrow")
