"""Regression tests for the round-5 ADVICE.md fixes.

Each test pins the exact failure mode the advisor demonstrated:
int64 wraparound in arithmetic group coding, null erasure in
pseudonymize, hardcoded empty schemas, ppm truncation, and float64
weighted-bincount precision loss.
"""

import numpy as np
import pyarrow as pa
import pytest


def test_concentration_survives_60bit_keys():
    # ADVICE windows.py: k * V + sc wraps int64 for |key| >= 2^63/V —
    # exactly the keys pseudonymize() emits (60-bit md5 pseudonyms).
    from log2seq_ray.ops.windows import _concentration_partition
    big = 2 ** 60 - 7
    t = pa.table({
        "user_id": pa.array([big] * 4 + [5] * 2, type=pa.int64()),
        "event_type": pa.array(["a", "a", "b", "c", "a", "a"]),
        "n_part": pa.array([1, 1, 1, 1, 1, 1], type=pa.int64()),
    })
    out = _concentration_partition("user_id", "event_type", [t])
    rows = {r["user_id"]: r for r in out.to_pylist()}
    assert set(rows) == {big, 5}
    r = rows[big]
    # counts a=2, b=1, c=1 over n=4: coll = 2*1 = 2, conc = 2e6 // 12
    assert r["n_events"] == 4 and r["n_types"] == 3
    assert r["conc_ppm"] == 2 * 1_000_000 // (4 * 3)
    assert rows[5]["conc_ppm"] == 1_000_000  # single-behavior key


def test_pseudonymize_preserves_nulls(ray_session):
    # ADVICE normalize.py: md5('s:' || NULL) IS NULL in SQL — nulls must
    # stay null, not become the pseudonym of the literal 'None'.
    import ray.data as rd

    from log2seq_ray.ops.normalize import pseudonymize
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["u1", None, "u1", None], type=pa.string()),
        "v": pa.array([1, 2, 3, 4], type=pa.int64())}))
    out = pseudonymize(ds, ["k"]).to_pandas().sort_values("v")
    ks = out["k"].tolist()
    assert ks[1] is None or (isinstance(ks[1], float) and np.isnan(ks[1]))
    assert ks[3] is None or (isinstance(ks[3], float) and np.isnan(ks[3]))
    assert ks[0] == ks[2] and ks[0] is not None


def test_weighted_quantile_ppm_rounds_not_truncates(ray_session):
    # ADVICE stats.py: int(0.29 * 1e6) == 289999 — q_ppm and the ceil
    # target must use round().
    import ray.data as rd

    from log2seq_ray.ops.stats import weighted_quantile_disc
    ds = rd.from_arrow(pa.table({
        "v": pa.array(list(range(1, 101)), type=pa.int64()),
        "w": pa.array([1] * 100, type=pa.int64())}))
    out = weighted_quantile_disc(ds, "v", "w", qs=(0.29,))
    assert int(out["q_ppm"].iloc[0]) == 290_000
    # ceil(0.29 * 100) = 29th element of 1..100
    assert int(out["value"].iloc[0]) == 29


def test_winsorize_empty_batch_keeps_real_group_type(ray_session):
    # ADVICE stats.py: the clip() empty block hardcoded a string group
    # schema; with an int64 group column that mixes block schemas.
    import ray.data as rd

    from log2seq_ray.ops.stats import winsorize_by_group
    vals = [float(i) for i in range(1, 21)]
    t = pa.table({
        "g": pa.array([1] * 10 + [2] * 10, type=pa.int64()),
        "v": pa.array(vals + [], type=pa.float64()),
        "id": pa.array(list(range(20)), type=pa.int64())})
    # a second all-NaN block forces the empty path in at least one batch
    t2 = pa.table({
        "g": pa.array([1, 2], type=pa.int64()),
        "v": pa.array([float("nan"), float("nan")], type=pa.float64()),
        "id": pa.array([100, 101], type=pa.int64())})
    ds = rd.from_arrow([t, t2])
    out = winsorize_by_group(ds, "g", "v", "id", lo_q=0.1, hi_q=0.9)
    df = out.to_pandas()
    assert len(df) == 20  # NaN rows dropped, no schema clash
    assert df["g"].dtype == np.int64


def test_bincount_i64_exact_above_2e53():
    # ADVICE dedup.py/join.py: float64-weighted bincount loses exactness
    # above 2^53.
    from log2seq_ray.ops.exchange import bincount_i64
    idx = np.array([0, 0], dtype=np.int64)
    w = np.array([2 ** 53, 1], dtype=np.int64)
    assert bincount_i64(idx, w)[0] == 2 ** 53 + 1
    # (the old pattern demonstrably loses the +1)
    assert int(np.bincount(idx, weights=w).astype(np.int64)[0]) == 2 ** 53
    # minlength + empty input
    assert bincount_i64(np.array([], dtype=np.int64),
                        np.array([], dtype=np.int64), minlength=3).tolist() \
        == [0, 0, 0]


def test_oov_empty_batch_keeps_real_group_type():
    from log2seq_ray.ops.curation import _oov_score_batch
    b = pa.table({"g": pa.array([1], type=pa.int64()),
                  "text": pa.array([""], type=pa.string())})
    out = _oov_score_batch(np.array([], dtype=np.int64), "g", "text", b)
    assert out.schema.field("g").type == pa.int64()
    assert out.num_rows == 0


def test_group_value_stats_drops_nan(ray_session):
    # floor(NaN*1e6).astype(int64) is INT64_MIN — must be filtered, not
    # binned.
    import ray.data as rd

    from log2seq_ray.ops.stats import group_value_stats
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a"], type=pa.string()),
        "v": pa.array([1.5, float("nan"), 2.5], type=pa.float64())}))
    df = group_value_stats(ds, "k", "v").to_pandas()
    assert int(df["n"].iloc[0]) == 2
    assert int(df["min_micro"].iloc[0]) == 1_500_000
    assert int(df["sum_micro"].iloc[0]) == 4_000_000


def test_to_fixed32_zero_rows_keeps_input_type():
    """Zero-row input must pass through with its OWN type — the
    dimension is unrecoverable, and emitting variable list<float32>
    among fixed_size_list<float32, d> blocks makes concat/write fail
    on mixed schemas."""
    from log2seq_ray.ops.similarity import to_fixed32
    fixed = pa.array([], type=pa.list_(pa.float32(), 4))
    assert to_fixed32(fixed).type == pa.list_(pa.float32(), 4)
    var = pa.array([], type=pa.list_(pa.float64()))
    assert to_fixed32(var).type == pa.list_(pa.float64())
    # non-empty conversion unchanged
    full = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64()))
    out = to_fixed32(full)
    assert out.type == pa.list_(pa.float32(), 2)
