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
            cols = np.array(
                [int(hashlib.md5(f"{r}:{tok}".encode())
                     .hexdigest()[:15], 16) % self.width
                 for r in range(self.depth)], dtype=np.int64)
            self._cache[tok] = cols
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
        batch_format="pyarrow", concurrency=(1, 8)) \
        .groupby(["r", "c"]).aggregate(Sum("n_part", alias_name="n"))
