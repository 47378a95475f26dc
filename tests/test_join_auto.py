"""hash_join(strategy=...) — the auto planner, the broadcast path, and
hot-key detection (VERDICT round-4 task 5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from log2seq_ray.ops.join import (AUTO_BROADCAST_ROWS, detect_hot_keys,
                                  hash_join, plan_join_strategy)


def test_plan_small_right_broadcasts():
    assert plan_join_strategy(10**9, 50_000, "inner", 1, 64) \
        == ("broadcast", None)
    assert plan_join_strategy(10**9, 50_000, "anti", 1, 64)[0] \
        == "broadcast"
    # full outer can't broadcast
    assert plan_join_strategy(10**9, 50_000, "full", 1, 64)[0] == "bucket"


def test_plan_skew_sets_hot_threshold():
    s, ht = plan_join_strategy(10_000_000, AUTO_BROADCAST_ROWS + 1,
                               "inner", 1, 64)
    assert s == "bucket"
    assert ht == max(65536, 4 * 10_000_000 // 64)
    # a key with 1M occurrences exceeds it -> detect_hot_keys would
    # route it around the shuffle
    assert 1_000_000 > ht
    # composite key / non-inner: no hot machinery
    assert plan_join_strategy(10**7, 10**7, "inner", 2, 64) \
        == ("bucket", None)
    assert plan_join_strategy(10**7, 10**7, "left", 1, 64) \
        == ("bucket", None)


def test_detect_hot_keys_finds_the_skewed_key(ray_session):
    import ray.data as rd
    keys = np.concatenate([np.full(5000, 7, dtype=np.int64),
                           np.arange(100, dtype=np.int64)])
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)}))
    assert detect_hot_keys(ds, "k", threshold=1000) == [7]
    assert detect_hot_keys(ds, "k", threshold=10_000) == []


def test_count_and_hot_keys_fused_pass(ray_session):
    """The fused auto planner pass must return the exact left count AND
    exactly the keys above max(HOT_FLOOR, 4*l_rows/num_buckets) in one
    execution; count partials must not collide with data keys."""
    import ray.data as rd
    from log2seq_ray.ops.join import HOT_FLOOR, count_and_hot_keys
    keys = np.concatenate([np.full(HOT_FLOOR + 5, 7, dtype=np.int64),
                           np.full(HOT_FLOOR - 5, 9, dtype=np.int64),
                           np.arange(100, 200, dtype=np.int64)])
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})) \
        .repartition(8)
    n, hot = count_and_hot_keys(ds, "k", num_buckets=4096)
    # 4*n//4096 << HOT_FLOOR here, so the floor is the threshold:
    # key 7 exceeds it, key 9 does not
    assert n == len(keys)
    assert hot == [7]
    # empty left: zero count, no hot keys, no crash
    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    assert count_and_hot_keys(empty, "k", 64) == (0, [])


def _frames(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_auto_broadcast_equals_bucket(ray_session, how):
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 5, 6], type=pa.int64()),
        "lv": pa.array([10, 20, 30, 40, 50, 51, 60], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 4, 5, 9], type=pa.int64()),
        "rv": pa.array([200, 400, 500, 900], type=pa.int64())}))
    a = _frames(hash_join(left, right, "k", "k", how=how,
                          strategy="auto"))
    b = _frames(hash_join(left, right, "k", "k", how=how,
                          num_buckets=4))
    pd.testing.assert_frame_equal(a, b)


def test_broadcast_full_raises(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError):
        hash_join(ds, ds, "k", "k", how="full", strategy="broadcast")


def test_plan_byte_small_right_broadcasts():
    # above the row cap, but byte-estimated small -> broadcast
    s, ht = plan_join_strategy(10**9, 320_000, "inner", 1, 64,
                               r_bytes=320_000 * 16)
    assert s == "broadcast" and ht is None
    # above the row cap with big bytes -> bucket
    assert plan_join_strategy(10**9, 320_000, "inner", 1, 64,
                              r_bytes=10**9)[0] == "bucket"
    # beyond the absolute row ceiling: never broadcast, bytes ignored
    assert plan_join_strategy(10**9, 50_000_000, "inner", 1, 64,
                              r_bytes=1024)[0] == "bucket"
    # no byte estimate supplied -> row rule alone
    assert plan_join_strategy(10**9, 320_000, "inner", 1, 64)[0] \
        == "bucket"


def test_auto_samples_bytes_and_broadcasts(ray_session, monkeypatch):
    """A right side above AUTO_BROADCAST_ROWS but byte-narrow must take
    the broadcast path through the real sampling branch."""
    import ray.data as rd
    import log2seq_ray.ops.join as J
    chosen = {}
    real = J.plan_join_strategy

    def spy(*a, **kw):
        out = real(*a, **kw)
        chosen["strategy"], chosen["r_bytes"] = out[0], kw.get("r_bytes")
        return out

    monkeypatch.setattr(J, "plan_join_strategy", spy)
    n = J.AUTO_BROADCAST_ROWS + 20_000
    right = rd.range(n).map_batches(
        lambda b: pa.table({"k": b.column("id"),
                            "rv": b.column("id")}),
        batch_format="pyarrow")
    left = rd.from_arrow(pa.table({
        "k": pa.array([0, 1, 2, n - 1, n + 5], type=pa.int64()),
        "lv": pa.array([9, 8, 7, 6, 5], type=pa.int64())}))
    out = _frames(J.hash_join(left, right, "k", "k", strategy="auto"))
    assert chosen["strategy"] == "broadcast"
    assert chosen["r_bytes"] is not None
    assert 8 * n < chosen["r_bytes"] < 64 * n  # sane 2-col int64 estimate
    assert list(out["k"]) == [0, 1, 2, n - 1]
