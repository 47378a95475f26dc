"""Mergeable sketches: HyperLogLog approximate distinct counts.

The scale path for count-distinct (ray_guide "Aggregation at scale"):
each batch emits at most ``m = 2^p`` (group, register, rho) rows — a
partial sketch — and registers merge associatively with one tiny
``groupby(group, register).max(rho)``; the shuffle carries fixed-size
register rows instead of (group, value) pairs, so cardinality cost is
independent of distinct-value volume.

Deterministic and SQL-reproducible by construction: the value hash is the
60-bit md5 prefix (computable as ``('0x'||substr(md5(v),1,15))::BIGINT``
in DuckDB), and for ``m in {16, 32, 64}`` the estimate is evaluated in
EXACT integer arithmetic (the denominator ``sum(2^-rho)`` is the integer
``S' = sum(2^(R-rho)) / 2^R``, so ``est = floor(alpha_num * m^2 * 2^R /
(alpha_den * S'))`` — no float summation order to disagree about). The
standard small-range (linear-counting) correction is intentionally NOT
part of this estimator (it needs a transcendental ``ln``); pick p with
``2.5 * 2^p`` below the cardinalities of interest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool

HASH_BITS = 60
# exact rational alpha_m for the small register counts (Flajolet et al.);
# larger m would need the float 0.7213/(1+1.079/m) formula
_ALPHA = {16: (673, 1000), 32: (697, 1000), 64: (709, 1000)}


def _hash60(values) -> np.ndarray:
    from .hashutil import value_bytes
    return np.fromiter(
        (int(hashlib.md5(v).hexdigest()[:15], 16)
         for v in value_bytes(values)), dtype=np.int64, count=len(values))


def hll_rows(values, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register_idx, rho) per value. idx = top p bits of the 60-bit hash;
    rho = 1 + leading zeros of the remaining ``60-p`` bits (so rho in
    [1, 60-p+1])."""
    h = _hash60(values)
    w_bits = HASH_BITS - p
    idx = h >> w_bits
    w = h & ((1 << w_bits) - 1)
    # bit_length vectorized: floor(log2) is exact for w < 2^53 (w_bits<=55:
    # values in [2^53, 2^55) round in float64 but never across a power of
    # two except exactly AT one, where the value is representable) — use
    # int bit_length per distinct value instead to stay exact.
    bl = np.fromiter((int(x).bit_length() for x in w),
                     dtype=np.int64, count=len(w))
    rho = w_bits - bl + 1
    return idx, rho


def hll_estimate_int(registers: dict[int, int], p: int) -> int:
    """Exact-integer raw HLL estimate (no small-range correction).
    ``registers`` maps idx -> rho for the non-zero registers."""
    m = 1 << p
    if m not in _ALPHA:
        raise ValueError(f"integer alpha only for m in {sorted(_ALPHA)}")
    num, den = _ALPHA[m]
    r_exp = HASH_BITS - p + 1  # max rho
    s = (m - len(registers)) << r_exp
    for rho in registers.values():
        s += 1 << (r_exp - rho)
    est = (num * m * m * (1 << r_exp)) // (den * s)
    if est <= 5 * m // 2 and len(registers) < m:
        import warnings
        warnings.warn(
            f"hll_estimate_int: raw estimate {est} is in the uncorrected "
            f"small-range regime (<= 2.5*m = {5 * m // 2} with zero "
            "registers); expect 20-35% error — use estimator='float' or a "
            "larger p for accuracy", stacklevel=2)
    return est


def hll_estimate_float(registers: dict[int, int], p: int) -> float:
    """Classic float estimate incl. linear-counting small-range correction
    (NOT SQL-gated — use for accuracy, p up to ~16)."""
    m = 1 << p
    alpha = (dict(_ALPHA).get(m, None))
    alpha = alpha[0] / alpha[1] if alpha else 0.7213 / (1 + 1.079 / m)
    s = float(m - len(registers))  # zero registers contribute 2^0
    for rho in registers.values():
        s += 2.0 ** (-rho)
    est = alpha * m * m / s
    zeros = m - len(registers)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, group_col: str, value_col: str, p: int = 12,
                    estimator: str = "float"):
    """(group, n_approx) via per-batch HLL register partials + one register
    max-merge; the estimate is computed from the merged (tiny) register
    table driver-side. Defaults are the ACCURATE configuration (p=12,
    corrected float estimate, ~1.6% error). ``estimator='int'`` with
    p in {4,5,6} is the exact-integer raw estimate the SQL oracle
    reproduces bit-for-bit — callers wanting SQL determinism pass those
    explicitly (it warns in the uncorrected small-range regime)."""
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.select([group_col, value_col]).to_pandas()
        out = []
        for g, sub in df.groupby(group_col):
            idx, rho = hll_rows(sub[value_col].tolist(), p)
            t = pd.DataFrame({"idx": idx, "rho": rho}) \
                .groupby("idx")["rho"].max()
            for i, r in t.items():
                out.append((g, int(i), int(r)))
        return pd.DataFrame(out, columns=[group_col, "register", "partial"])

    regs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "register"]) \
        .aggregate(Max("partial", alias_name="rho")).to_pandas()
    rows = []
    est = hll_estimate_int if estimator == "int" else hll_estimate_float
    for g, sub in regs.groupby(group_col):
        registers = dict(zip(sub["register"], sub["rho"]))
        v = est(registers, p)
        rows.append((g, int(v) if estimator == "int" else int(round(v))))
    return pd.DataFrame(rows, columns=[group_col, "n_approx"]) \
        .sort_values(group_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# count-min sketch (heavy-hitter frequency estimates)
# ---------------------------------------------------------------------------

class CMSPartialStage:
    """Per-batch count-min partials over a token column: a dense
    ``depth × width`` int64 matrix per batch, emitted as sparse nonzero
    (r, c, n_part) register rows. The sketch merges by ADDITION, so the
    shuffle carries at most ``depth*width`` fixed-size rows per block
    regardless of vocabulary size — the scale path for frequency
    estimation where an exact token groupby would shuffle the whole
    vocabulary.

    Hash = 60-bit md5 prefix of ``"{r}:{token}"`` modulo width
    (SQL-reproducible register-for-register); the token→columns map is
    cached per actor — web vocabulary is heavy-tailed, so the cache
    absorbs almost every lookup after warmup."""

    def __init__(self, depth: int = 4, width: int = 256,
                 col: str = "text"):
        self.depth, self.width, self.col = depth, width, col
        self._cache: dict[str, np.ndarray] = {}

    def _cols(self, tok: str) -> np.ndarray:
        cols = self._cache.get(tok)
        if cols is None:
            from .hashutil import cache_put
            cols = cache_put(self._cache, tok, np.array(
                [int(hashlib.md5(f"{r}:{tok}".encode())
                     .hexdigest()[:15], 16) % self.width
                 for r in range(self.depth)], dtype=np.int64))
        return cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from .text import _token_lists
        flat = pc.list_flatten(_token_lists(batch.column(self.col)))
        sk = np.zeros((self.depth, self.width), dtype=np.int64)
        if len(flat):
            vc = pc.value_counts(flat)
            toks = vc.field("values").to_pylist()
            cnts = np.asarray(vc.field("counts"), dtype=np.int64).tolist()
            rr = np.arange(self.depth)
            for tok, cnt in zip(toks, cnts):
                sk[rr, self._cols(tok)] += cnt
        r, c = sk.nonzero()
        return pa.table({"r": pa.array(r.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64)),
                         "n_part": pa.array(sk[r, c])})


def cms_sketch(ds, depth: int = 4, width: int = 256, col: str = "text"):
    """Merged count-min sketch registers over a token column: Dataset of
    (r, c, n) — the sparse nonzero cells of the ``depth × width`` count
    matrix. The point estimate for any token x is
    ``min_r sketch[r][h_r(x)]`` (an upper bound on the true count, within
    ``ε·N`` with probability ``1-δ`` for ``width=e/ε, depth=ln(1/δ)``).
    Deterministic: SQL reproduces every register from the same md5
    column hashes."""
    from ray.data.aggregate import Sum
    return ds.map_batches(
        CMSPartialStage, fn_constructor_kwargs=dict(
            depth=depth, width=width, col=col),
        batch_format="pyarrow", concurrency=actor_pool()) \
        .groupby(["r", "c"]).aggregate(Sum("n_part", alias_name="n"))


# ---------------------------------------------------------------------------
# exact heavy hitters (Misra-Gries-pruned two-pass)
# ---------------------------------------------------------------------------

def _mg_partial(col: str, k: int, batch: pa.Table) -> pa.Table:
    """Per-batch Misra-Gries summary over the token stream: exact batch
    counts compressed to at most ``k`` counters by subtracting the
    (k+1)-th largest count ``d`` (every dropped token had count <= d).
    One extra row with token ``""`` (impossible for real tokens — the
    tokenizer drops empties) carries (d, batch token total): after the
    merge, ``sum(d)`` bounds how much any token's true count can exceed
    its merged counter, and ``sum(total)`` is the corpus token count."""
    import pyarrow.compute as pc
    from .text import _token_lists
    flat = pc.list_flatten(_token_lists(batch.column(col)))
    total = len(flat)
    d = 0
    if total:
        vc = pc.value_counts(flat)
        tokens = vc.field("values")
        counts = np.asarray(vc.field("counts"), dtype=np.int64)
        if len(counts) > k:
            d = int(np.partition(counts, -(k + 1))[-(k + 1)])
            keep = counts > d
            tokens = tokens.filter(pa.array(keep))
            counts = counts[keep] - d
    else:
        tokens = pa.array([], type=pa.string())
        counts = np.array([], dtype=np.int64)
    tok_arr = pc.cast(tokens, pa.string())
    if isinstance(tok_arr, pa.ChunkedArray):
        tok_arr = tok_arr.combine_chunks()
    return pa.table({
        "token": pa.concat_arrays([tok_arr, pa.array([""])]),
        "partial_n": pa.array(np.append(counts, d)),
        "partial_total": pa.array(
            np.append(np.zeros(len(counts), dtype=np.int64), total)),
    })


def heavy_hitters(ds, num: int = 1, den: int = 64, k: int = 256,
                  col: str = "text"):
    """EXACT tokens with count >= ceil(num/den * corpus token count), at
    any ``k`` (two-pass): pass 1 merges per-batch Misra-Gries summaries
    (<= k+1 narrow rows per batch cross the shuffle, never the
    vocabulary) and prunes to candidates whose UPPER BOUND
    ``merged counter + sum(d)`` clears the threshold — a superset of the
    true heavy hitters by the MG guarantee; pass 2 broadcasts the (small)
    candidate set and counts only those tokens exactly. ``k`` trades
    candidate-set size against summary width; correctness never depends
    on it. Returns a Dataset of (token, n)."""
    import ray
    from functools import partial as _p
    from ray.data.aggregate import Sum

    merged = ds.map_batches(_p(_mg_partial, col, k),
                            batch_format="pyarrow") \
        .repartition(8).groupby("token") \
        .aggregate(Sum("partial_n", alias_name="ub"),
                   Sum("partial_total", alias_name="tot"))
    meta = merged.filter(expr="token == ''").take_all()
    d_sum = int(meta[0]["ub"]) if meta else 0
    n_tok = int(meta[0]["tot"]) if meta else 0
    mc = -(-n_tok * num // den)          # ceil
    cands = merged.filter(
        expr=f"token != '' and ub >= {mc - d_sum}") \
        .select_columns(["token"]).take_all()
    cand_arr = pa.array(sorted(r["token"] for r in cands),
                        type=pa.string())
    ref = ray.put(cand_arr)

    def exact_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from .text import _token_lists
        flat = pc.list_flatten(_token_lists(b.column(col)))
        flat = flat.filter(pc.is_in(flat, value_set=ray.get(ref)))
        if not len(flat):
            return pa.table({"token": pa.array([], type=pa.string()),
                             "partial_n": pa.array([], type=pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table({
            "token": pc.cast(vc.field("values"), pa.string()),
            "partial_n": pc.cast(vc.field("counts"), pa.int64())})

    return ds.map_batches(exact_partial, batch_format="pyarrow") \
        .repartition(4).groupby("token") \
        .aggregate(Sum("partial_n", alias_name="n")) \
        .filter(expr=f"n >= {mc}")


# ---------------------------------------------------------------------------
# Bloom-filter membership (dedup pre-filter)
# ---------------------------------------------------------------------------

def bloom_positions(values, m_bits: int, k: int) -> np.ndarray:
    """``(len(values), k)`` bit positions via Kirsch-Mitzenmacher double
    hashing over the 60-bit md5 prefix: ``h1 = h >> 30``,
    ``h2 = h & (2^30 - 1)``, ``pos_i = (h1 + i*h2) % m_bits``.
    ``values`` are the exact digest input BYTES (``hashutil.bytes_list``);
    SQL-reproducible with the md5 bridge + integer div/mod."""
    h = np.fromiter(
        (int(hashlib.md5(v).hexdigest()[:15], 16) for v in values),
        dtype=np.int64, count=len(values))
    h1 = h >> 30
    h2 = h & ((1 << 30) - 1)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m_bits


def bloom_member(build_ds, probe_ds, key_col: str = "text",
                 m_bits: int = 1 << 16, k: int = 4):
    """Bloom-filter membership of ``probe_ds[key_col]`` against the keys
    of ``build_ds`` — the classic dedup PRE-filter (hit=1 rows go to an
    exact check; hit=0 rows are definitely new). Deterministic including
    its false positives, so the SQL oracle reproduces it exactly.

    Scale shape: per-batch bitmap partials (m_bits/8 bytes each) OR-merge
    associatively — first within coalesced blocks, then over the <=
    num_blocks block results driver-side — so the driver never sees more
    than ``num_blocks`` bitmaps; the probe side streams against one
    ``ray.put`` broadcast of the final bitmap."""
    import ray
    from .hashutil import bytes_list
    nbytes = m_bits // 8

    def bitmap_partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        if b.num_rows:
            pos = bloom_positions(bytes_list(b.column(key_col)),
                                  m_bits, k).ravel()
            np.bitwise_or.at(bm, pos >> 3,
                             np.left_shift(1, pos & 7).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    def or_block(b: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for v in b.column("bm").to_pylist():
            acc |= np.frombuffer(v, dtype=np.uint8)
        return pa.table({"bm": pa.array([acc.tobytes()],
                                        type=pa.binary())})

    parts = build_ds.map_batches(bitmap_partial, batch_format="pyarrow") \
        .repartition(8).map_batches(or_block, batch_format="pyarrow") \
        .take_all()
    final = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        final |= np.frombuffer(row["bm"], dtype=np.uint8)
    ref = ray.put(final)

    def probe(b: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        if not b.num_rows:
            return b.append_column("hit", pa.array([], type=pa.int64()))
        pos = bloom_positions(bytes_list(b.column(key_col)), m_bits, k)
        bits = (bm[pos >> 3] >> (pos & 7)) & 1
        return b.append_column(
            "hit", pa.array(bits.all(axis=1).astype(np.int64)))

    return probe_ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch + pairwise set overlap
# ---------------------------------------------------------------------------

def _kmv_kernel(groups, h: np.ndarray, k: int):
    """Per-group k smallest DISTINCT hashes. ``groups`` is an Arrow
    array (any type), ``h`` the parallel int64 hash array. Returns
    (group_take_indices, pos, h_kept) — one lexsort, no per-group
    Python."""
    enc = pc.dictionary_encode(
        groups.combine_chunks() if isinstance(groups, pa.ChunkedArray)
        else groups)
    codes = np.asarray(enc.indices, dtype=np.int64)
    order = np.lexsort((h, codes))
    g, hh = codes[order], h[order]
    # drop duplicate (group, hash) rows (adjacent after the sort)
    first = np.ones(len(g), dtype=bool)
    first[1:] = (g[1:] != g[:-1]) | (hh[1:] != hh[:-1])
    g, hh, orig = g[first], hh[first], order[first]
    new_g = np.ones(len(g), dtype=bool)
    new_g[1:] = g[1:] != g[:-1]
    seg_start = np.maximum.accumulate(
        np.where(new_g, np.arange(len(g)), 0))
    pos = np.arange(len(g)) - seg_start
    keep = pos < k
    return orig[keep], pos[keep], hh[keep]


def _kmv_partial(group_col: str, value_col: str, k: int,
                 b: pa.Table) -> pa.Table:
    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "h": pa.array([], type=pa.int64())})
    t = b.select([group_col, value_col])
    valid = pc.and_kleene(pc.is_valid(t.column(group_col)),
                          pc.is_valid(t.column(value_col)))
    if not pc.all(valid).as_py():
        t = t.filter(pc.fill_null(valid, False))
    if t.num_rows == 0:
        return empty
    h = _hash60(np.asarray(t.column(value_col)))
    idx, _, hh = _kmv_kernel(t.column(group_col), h, k)
    return pa.table({group_col: t.column(group_col).take(pa.array(idx)),
                     "h": pa.array(hh, type=pa.int64())})


def _kmv_final(group_col: str, k: int, pieces) -> pa.Table:
    from .exchange import concat_typed
    t = concat_typed(pieces, group_col, "h")
    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "pos": pa.array([], type=pa.int64()),
                      "h": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return empty
    h = np.asarray(pc.cast(t.column("h"), pa.int64()).to_numpy(
        zero_copy_only=False), dtype=np.int64)
    idx, pos, hh = _kmv_kernel(t.column(group_col), h, k)
    return pa.table({group_col: t.column(group_col).take(pa.array(idx)),
                     "pos": pa.array(pos, type=pa.int64()),
                     "h": pa.array(hh, type=pa.int64())})


def kmv_sketch(ds, group_col: str, value_col: str, k: int = 64,
               num_parts: int = 8):
    """Per-group KMV (k-minimum-values) sketch: the ``k`` smallest
    DISTINCT 60-bit md5 hashes of ``value_col`` per group, as rows
    ``(group, pos, h)`` with ``pos`` the 0-based rank. KMV sketches
    union by hash-merge (take the k smallest of the combined sets), so
    per-batch partials pre-aggregate perfectly: each batch contributes
    at most ``k`` rows per group it sees, and one group-keyed exchange
    merges them — the shuffle carries O(batches x groups x k) sketch
    rows, never raw values. md5-bridged, so the SQL oracle reproduces
    every hash bit-for-bit."""
    from .exchange import hash_exchange
    from functools import partial as _p
    partials = ds.map_batches(_p(_kmv_partial, group_col, value_col, k),
                              batch_format="pyarrow")
    return hash_exchange(partials, group_col, _kmv_final, num_parts,
                         fn_args=(group_col, k))


def kmv_overlap(ds, group_col: str, value_col: str,
                k: int = 64, num_parts: int = 8) -> pd.DataFrame:
    """Pairwise distinct-set overlap between groups, estimated from KMV
    sketches: for each group pair a<b, merge the two sketches, keep the
    k smallest hashes of the union, and count how many of those sit in
    BOTH sketches — ``n_inter / n_union`` is the standard KMV Jaccard
    estimator (Beyer et al.), reported as exact integers plus a
    floor-division ppm so the SQL oracle matches bit-for-bit. The
    audience-overlap / cross-corpus-contamination sketch query: O(k)
    space per group regardless of corpus size.

    The pairwise finalize runs driver-side over the merged sketch table
    (<= groups x k rows — sketch-sized by construction, the same
    contract as the HLL/CMS finalizers)."""
    sk = kmv_sketch(ds, group_col, value_col, k, num_parts).to_pandas()
    by_g = {g: np.sort(sub["h"].to_numpy())
            for g, sub in sk.groupby(group_col)}
    names = sorted(by_g)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ha, hb = by_g[a], by_g[b]
            kmin = np.union1d(ha, hb)[:k]
            n_union = len(kmin)
            n_inter = int((np.isin(kmin, ha) & np.isin(kmin, hb)).sum())
            rows.append((a, b, n_union, n_inter,
                         n_inter * 1_000_000 // n_union if n_union else 0))
    return pd.DataFrame(rows, columns=[
        "grp_a", "grp_b", "n_union", "n_inter", "jaccard_ppm"])


def ingest_hll_run(ds, state_dir: str, group_col: str, value_col: str,
                   p: int = 5):
    """Incremental cross-RUN approximate distinct counting — the
    sketch-store shape of the ingest family: each run commits its own
    per-(group, register) HLL max-partials (≤ groups × 2^p tiny rows)
    under ``state_dir``; the returned per-group estimate covers ALL
    committed runs plus this one. Register max-merge is exactly the HLL
    union, so N runs estimate their union without ever re-reading the
    raw data — the property that makes nightly distinct-user counts
    O(sketch) instead of O(history). ``estimator='int'`` arithmetic
    (SQL-reproducible); commit is write-to-temp + rename.

    100 TB shape: the index stores 3-int rows per (group, register) per
    run; reading N runs costs N × groups × 2^p rows regardless of how
    many raw values the history saw."""
    import os
    import uuid

    import ray.data as rd
    from ray.data.aggregate import Max

    os.makedirs(state_dir, exist_ok=True)
    runs = sorted(d for d in os.listdir(state_dir) if d.startswith("run_"))

    def partial(b: pa.Table) -> pd.DataFrame:
        df = b.select([group_col, value_col]).to_pandas()
        out = []
        for g, sub in df.groupby(group_col):
            idx, rho = hll_rows(sub[value_col].tolist(), p)
            t = pd.DataFrame({"idx": idx, "rho": rho}) \
                .groupby("idx")["rho"].max()
            for i, r in t.items():
                out.append((g, int(i), int(r)))
        return pd.DataFrame(out,
                            columns=[group_col, "register", "partial"])

    mine = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "register"]) \
        .aggregate(Max("partial", alias_name="rho")).materialize()

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    mine.write_parquet(tmp)
    final = f"{state_dir}/run_{len(runs):05d}"
    os.rename(tmp, final)

    files = [f"{state_dir}/run_{i:05d}/{f}"
             for i in range(len(runs) + 1)
             if os.path.isdir(f"{state_dir}/run_{i:05d}")
             for f in sorted(os.listdir(f"{state_dir}/run_{i:05d}"))
             if f.endswith(".parquet")]
    if not files:   # every run so far was empty
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_approx": pd.Series([], dtype="int64")})
    merged = rd.read_parquet(files) \
        .groupby([group_col, "register"]) \
        .aggregate(Max("rho", alias_name="rho")).to_pandas()
    rows = []
    for g, sub in merged.groupby(group_col):
        registers = dict(zip(sub["register"], sub["rho"]))
        rows.append((g, int(hll_estimate_int(registers, p))))
    return pd.DataFrame(rows, columns=[group_col, "n_approx"]) \
        .sort_values(group_col).reset_index(drop=True)
