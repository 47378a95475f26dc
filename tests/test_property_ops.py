"""Property-based guards for the round-3 distributed algorithms, driven
through their PURE per-partition functions (no Ray session per example):

* min-label propagation (the BSP loop of ``_lp_split`` / ``_lp_propagate``
  / ``_lp_update``) must equal union-find connected components on
  arbitrary edge sets and any partition count;
* salted embedding pair generation (``_SaltStage`` fan-out +
  ``_group_cosine_pairs`` per group) must emit EXACTLY the brute-force
  cosine pair set for any vectors, threshold and sub-bucket count.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from log2seq_ray.ops.dedup import (_SaltStage, _group_cosine_pairs,
                                   _lp_propagate, _lp_split, _lp_update)


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    nodes = sorted({x for p in pairs for x in p})
    return {n: find(n) for n in nodes}


def _bsp_label_prop(pairs, num_parts):
    """Local (in-process) replica of label_propagation_clusters' BSP loop
    over the same pure functions the Ray tasks run."""
    src = np.array([p[0] for p in pairs] + [p[1] for p in pairs],
                   dtype=np.int64)
    dst = np.array([p[1] for p in pairs] + [p[0] for p in pairs],
                   dtype=np.int64)
    edges_all = pa.table({"src": src, "dst": dst})
    edge_parts = _lp_split(edges_all, "src", num_parts)
    labels = []
    for e in edge_parts:
        ids = np.unique(e.column("src").to_numpy()) if e.num_rows \
            else np.array([], dtype=np.int64)
        labels.append(pa.table({"id": pa.array(ids, type=pa.int64()),
                                "label": pa.array(ids, type=pa.int64())}))
    for _ in range(200):
        msg_pieces = [[] for _ in range(num_parts)]
        for p in range(num_parts):
            for q, piece in enumerate(
                    _lp_propagate(edge_parts[p], labels[p], num_parts)):
                msg_pieces[q].append(piece)
        changed = 0
        for q in range(num_parts):
            labels[q], c = _lp_update(labels[q], msg_pieces[q])
            changed += c
        if changed == 0:
            break
    out = pa.concat_tables(labels)
    return dict(zip(out.column("id").to_pylist(),
                    out.column("label").to_pylist()))


_pairs = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
        lambda p: p[0] != p[1]),
    min_size=0, max_size=60)


@settings(max_examples=120, deadline=None)
@given(pairs=_pairs, num_parts=st.integers(1, 7))
def test_label_propagation_equals_union_find(pairs, num_parts):
    assert _bsp_label_prop(pairs, num_parts) == _union_find(pairs)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(2, 40),
       n_sub=st.integers(1, 6),
       threshold=st.sampled_from([0.3, 0.8, 0.95, 0.999]))
def test_salted_pair_generation_equals_brute_force(seed, n, n_sub,
                                                   threshold):
    rng = np.random.default_rng(seed)
    # clustered vectors so thresholds produce non-trivial pair sets
    X = rng.normal(size=(n, 6)) + 3.0 * rng.integers(0, 3, size=(n, 1))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": [list(map(float, v)) for v in X],
        "__centroid": pa.array(np.zeros(n, np.int32)),
    })
    fan = _SaltStage({0: n_sub} if n_sub > 1 else {}, "vec_id")(tbl)
    got = set()
    df = fan.to_pandas()
    if "__gk" not in df.columns:
        raise AssertionError("fan-out must add __gk")
    for _, g in df.groupby("__gk"):
        p = _group_cosine_pairs(threshold, "vec_id", "embedding", g)
        got |= set(zip(p["id_a"], p["id_b"]))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn.T
    ai, bi = np.nonzero(sims >= threshold)
    exp = {(int(a), int(b)) for a, b in zip(ai, bi) if a < b}
    assert got == exp


# ---------------------------------------------------------------------------
# hash_join bucket exchange: every join mode equals pandas semantics on
# arbitrary key distributions and bucket counts (pure functions, no Ray)
# ---------------------------------------------------------------------------

from log2seq_ray.ops.join import _join_bucket, _split_by_bucket


@given(st.integers(0, 2**32 - 1), st.integers(1, 7),
       st.sampled_from(["inner", "left", "full", "semi", "anti"]))
@settings(max_examples=40, deadline=None)
def test_hash_join_bucket_modes_equal_pandas(seed, num_buckets, how):
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 25))
    l = pa.table({"lk": rng.integers(0, 12, nl), "lv": np.arange(nl)})
    r = pa.table({"rk": rng.integers(0, 8, nr),
                  "rv": rng.integers(0, 99, nr)})
    if how == "inner":
        fields = [pa.field("lk", pa.int64()), pa.field("lv", pa.int64()),
                  pa.field("rk", pa.int64()), pa.field("rv", pa.int64())]
    elif how in ("left", "full"):
        fields = [pa.field("lk", pa.int64()), pa.field("lv", pa.int64()),
                  pa.field("rv", pa.int64())]
    else:
        fields = [pa.field("lk", pa.int64()), pa.field("lv", pa.int64())]
    schema = pa.schema(fields)
    lb = _split_by_bucket(l, "lk", num_buckets, ["lk", "lv"])
    rb = _split_by_bucket(r, "rk", num_buckets,
                          ["rk", "rv"] if how in ("inner", "left", "full")
                          else ["rk"])
    parts = [_join_bucket("lk", "rk", schema, [lp], [rp], how)
             for lp, rp in zip(lb, rb)]
    out = pa.concat_tables(parts).to_pandas()

    ld, rd = l.to_pandas(), r.to_pandas()
    if how == "inner":
        exp = ld.merge(rd, left_on="lk", right_on="rk")
        assert sorted(map(tuple, out[["lk", "lv", "rv"]].to_numpy())) \
            == sorted(map(tuple, exp[["lk", "lv", "rv"]].to_numpy()))
    elif how == "left":
        exp = ld.merge(rd, left_on="lk", right_on="rk", how="left")
        key = lambda df: sorted(
            (int(a), int(b), -1 if pd.isna(c) else int(c))
            for a, b, c in df[["lk", "lv", "rv"]].to_numpy())
        assert key(out) == key(exp)
    elif how == "full":
        exp = ld.merge(rd, left_on="lk", right_on="rk", how="outer")
        exp["lk"] = exp["lk"].fillna(exp["rk"])  # engine coalesces keys
        key = lambda df: sorted(
            (int(a), -1 if pd.isna(b) else int(b),
             -1 if pd.isna(c) else int(c))
            for a, b, c in df[["lk", "lv", "rv"]].to_numpy())
        assert key(out) == key(exp)
    else:
        matched = set(rd["rk"])
        keep = ld["lk"].isin(matched) if how == "semi" \
            else ~ld["lk"].isin(matched)
        assert sorted(out["lv"]) == sorted(ld.loc[keep, "lv"])


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    q=st.floats(min_value=0.0, max_value=1.0,
                allow_nan=False, allow_infinity=False),
)
def test_disc_index_matches_duckdb_quantile_disc(n, q):
    """_disc_index IS DuckDB's quantile_disc element index — pinned
    against DuckDB itself, not a re-derivation of its formula."""
    import duckdb
    from log2seq_ray.ops.stats import _disc_index
    vals = list(range(n))
    duck = duckdb.sql(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
        params=[q, vals]).fetchone()[0]
    assert int(_disc_index(n, q)) == int(duck)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(st.floats(min_value=-50, max_value=50,
                            allow_nan=False, allow_infinity=False),
                  min_size=1, max_size=200),
    q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
)
def test_histogram_bin_pick_matches_duckdb(data, q):
    """The binned counting-sort pick (numpy floor/scale + _disc_index)
    equals DuckDB quantile_disc over the same integer bins."""
    import duckdb
    from log2seq_ray.ops.stats import _disc_index
    bins = np.sort(np.floor(np.asarray(data, dtype=np.float64) * 100)
                   .astype(np.int64))
    mine = int(bins[int(_disc_index(len(bins), q))])
    duck = duckdb.sql(
        "SELECT quantile_disc(CAST(floor(x * 100) AS BIGINT), ?) "
        "FROM (SELECT unnest(?) AS x)", params=[q, list(data)]).fetchone()[0]
    assert mine == int(duck)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=120),
    num_parts=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=999),
)
def test_split_by_key_is_an_exact_partition(n, num_parts, seed):
    """Every row lands in exactly one piece, pieces concat back to the
    input multiset, and equal keys land in the same piece."""
    from log2seq_ray.ops.exchange import split_by_key
    rng = np.random.default_rng(seed)
    tbl = pa.table({
        "k": pa.array([f"k{v}" for v in rng.integers(0, 7, n)]),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int64()),
    })
    pieces = split_by_key(tbl, "k", num_parts)
    assert len(pieces) == num_parts
    assert sum(p.num_rows for p in pieces) == n
    seen = {}
    for i, p in enumerate(pieces):
        for k in set(p.column("k").to_pylist()):
            assert seen.setdefault(k, i) == i  # key -> one piece only
    got = sorted(zip(
        [x for p in pieces for x in p.column("k").to_pylist()],
        [x for p in pieces for x in p.column("v").to_pylist()]))
    exp = sorted(zip(tbl.column("k").to_pylist(),
                     tbl.column("v").to_pylist()))
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=999),
    n_new=st.integers(min_value=0, max_value=25),
    n_old=st.integers(min_value=0, max_value=25),
)
def test_ingest_pair_partition_matches_brute_force(seed, n_new, n_old):
    """Pair multiplicities from _ingest_pair_partition equal the brute
    count of shared shingles for (new, old) and (new, lower-id new)
    pairs; old-old pairs never appear."""
    from collections import Counter
    from log2seq_ray.ops.curation import _ingest_pair_partition
    rng = np.random.default_rng(seed)
    # small shingle-hash universe so collisions/shared shingles are common
    new_g = rng.integers(0, 12, n_new * 3)
    new_id = np.repeat(rng.choice(np.arange(100, 100 + max(n_new, 1)),
                                  size=max(n_new, 1), replace=False)[:n_new],
                       3) if n_new else np.empty(0, dtype=np.int64)
    old_g = rng.integers(0, 12, n_old * 3)
    old_id = np.repeat(np.arange(n_old), 3) if n_old \
        else np.empty(0, dtype=np.int64)

    def dedup(g, i):
        if len(g) == 0:
            return g.astype(np.int64), i.astype(np.int64)
        seen = sorted({(int(a), int(b)) for a, b in zip(g, i)})
        return (np.array([a for a, _ in seen], dtype=np.int64),
                np.array([b for _, b in seen], dtype=np.int64))

    ng, ni = dedup(new_g, new_id)
    og, oi = dedup(old_g, old_id)
    new_tbl = pa.table({"g": pa.array(ng), "doc_id": pa.array(ni)})
    old_tbl = pa.table({"g": pa.array(og), "doc_id": pa.array(oi)})
    out = _ingest_pair_partition("doc_id", None, [new_tbl], [old_tbl])
    got = {(int(a), int(b)): int(n) for a, b, n in zip(
        out.column("id_a").to_pylist(), out.column("id_b").to_pylist(),
        out.column("n_part").to_pylist())}

    exp = Counter()
    new_sets = {}
    for g, i in zip(ng, ni):
        new_sets.setdefault(int(i), set()).add(int(g))
    old_sets = {}
    for g, i in zip(og, oi):
        old_sets.setdefault(int(i), set()).add(int(g))
    for a, sa in new_sets.items():
        for b, sb in old_sets.items():
            inter = len(sa & sb)
            if inter:
                exp[(a, b)] = inter
        for b, sb in new_sets.items():
            if b < a:
                inter = len(sa & sb)
                if inter:
                    exp[(a, b)] = inter
    assert got == dict(exp)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), n_new=st.integers(0, 20),
       n_old=st.integers(0, 20), n_cent=st.integers(1, 4))
def test_sem_ingest_partition_matches_brute_force(seed, n_new, n_old,
                                                  n_cent):
    """Victims from _sem_ingest_partition equal the brute-force rule:
    a new id drops iff some OLD vector in a shared centroid bucket, or
    some LOWER-id NEW vector in a shared bucket, has cosine >= t.
    Old-old pairs never produce victims. t = 0.77 is unreachable exactly
    by integer vectors of these norms, so no float-tie flakes."""
    from log2seq_ray.ops.similarity import (_normalize,
                                            _sem_ingest_partition)
    t = 0.77
    rng = np.random.default_rng(seed)

    def mk(n, id_lo):
        X = rng.integers(0, 4, size=(n, 4)).astype(np.float64)
        if n:
            X[X.sum(axis=1) == 0, 0] = 1.0  # no zero vectors
        ids = np.arange(id_lo, id_lo + n, dtype=np.int64)
        cents = rng.integers(0, n_cent, size=n).astype(np.int32)
        tbl = pa.table({
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(r) for r in X],
                                  type=pa.list_(pa.float64())),
            "__centroid": pa.array(cents)})
        return X, ids, cents, tbl

    Xn, idn, cn, new_tbl = mk(n_new, 100)
    Xo, ido, co, old_tbl = mk(n_old, 0)

    out = _sem_ingest_partition(t, "vec_id", "embedding",
                                [new_tbl], [old_tbl])
    got = set(out.column("vic").to_pylist())

    Nn = _normalize(Xn) if n_new else Xn
    No = _normalize(Xo) if n_old else Xo
    exp = set()
    for i in range(n_new):
        hit = any(cn[i] == co[j] and float(Nn[i] @ No[j]) >= t
                  for j in range(n_old))
        hit = hit or any(cn[i] == cn[j] and idn[j] < idn[i]
                         and float(Nn[i] @ Nn[j]) >= t
                         for j in range(n_new))
        if hit:
            exp.add(int(idn[i]))
    assert got == exp


@given(st.integers(0, 2**32 - 1), st.integers(1, 5),
       st.sampled_from(["inner", "left", "full", "semi", "anti"]))
@settings(max_examples=40, deadline=None)
def test_hash_join_composite_key_equals_pandas(seed, num_buckets, how):
    """Two-column composite keys: bucket exchange + per-bucket join equals
    pandas merge on both columns, for every join mode."""
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 30)), int(rng.integers(0, 20))
    l = pa.table({"k1": rng.integers(0, 5, nl),
                  "k2": rng.integers(0, 4, nl).astype(str),
                  "lv": np.arange(nl)})
    r = pa.table({"r1": rng.integers(0, 4, nr),
                  "r2": rng.integers(0, 4, nr).astype(str),
                  "rv": rng.integers(0, 99, nr)})
    lks, rks = ["k1", "k2"], ["r1", "r2"]
    base = [pa.field("k1", pa.int64()), pa.field("k2", pa.string()),
            pa.field("lv", pa.int64())]
    if how == "inner":
        fields = base + [pa.field("r1", pa.int64()),
                         pa.field("r2", pa.string()),
                         pa.field("rv", pa.int64())]
        r_cols = ["r1", "r2", "rv"]
    elif how in ("left", "full"):
        fields = base + [pa.field("rv", pa.int64())]
        r_cols = ["r1", "r2", "rv"]
    else:
        fields = base
        r_cols = ["r1", "r2"]
    schema = pa.schema(fields)
    lb = _split_by_bucket(l, lks, num_buckets, ["k1", "k2", "lv"])
    rb = _split_by_bucket(r, rks, num_buckets, r_cols)
    parts = [_join_bucket(lks, rks, schema, [lp], [rp], how)
             for lp, rp in zip(lb, rb)]
    out = pa.concat_tables(parts).to_pandas()

    ld, rd = l.to_pandas(), r.to_pandas()
    if how in ("inner", "left", "full"):
        pd_how = {"inner": "inner", "left": "left", "full": "outer"}[how]
        exp = ld.merge(rd, left_on=lks, right_on=rks, how=pd_how)
        if how == "full":  # engine coalesces keys pairwise
            exp["k1"] = exp["k1"].fillna(exp["r1"])
            exp["k2"] = exp["k2"].fillna(exp["r2"])
        cols = ["k1", "k2", "lv"] + (["rv"] if how != "inner"
                                     else ["r1", "rv"])
        key = lambda df: sorted(
            tuple(-1 if pd.isna(v) else (v if isinstance(v, str)
                                         else int(v)) for v in row)
            for row in df[cols].to_numpy())
        assert key(out) == key(exp)
    else:
        matched = set(map(tuple, rd[rks].to_numpy()))
        isin = [tuple(t) in matched for t in ld[lks].to_numpy()]
        keep = pd.Series(isin) if how == "semi" else ~pd.Series(isin)
        assert sorted(out["lv"]) == sorted(ld.loc[list(keep), "lv"])


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_simhash_ingest_victims_equal_brute_force(seed):
    """The SimHash ingest victim kernel (chunked XOR+LUT with row
    pruning) equals the brute-force rule — any committed witness, or any
    lower-id new witness (victim or not), same bucket, Hamming ≤ h —
    across random bucket skew, hash collisions and CHUNK BOUNDARIES."""
    from log2seq_ray.ops.dedup import _simhash_victims_partition
    rng = np.random.default_rng(seed)
    n_new = int(rng.integers(0, 50))
    n_old = int(rng.integers(0, 30))
    mh = int(rng.integers(0, 8))
    ch = int(rng.integers(1, 7))  # tiny chunks exercise every boundary
    bk_n = rng.integers(0, 3, n_new)
    bk_o = rng.integers(0, 3, n_old)
    h_n = rng.integers(0, 2**10, n_new, dtype=np.uint64)
    h_o = rng.integers(0, 2**10, n_old, dtype=np.uint64)
    ids = rng.permutation(1000)[:n_new].astype(np.int64)
    new = pa.table({"doc_id": ids, "simhash": h_n.astype(np.int64),
                    "simhash_bucket": bk_n})
    old = pa.table({"doc_id": np.arange(10000, 10000 + n_old),
                    "simhash": h_o.astype(np.int64),
                    "simhash_bucket": bk_o})
    got = set(_simhash_victims_partition(
        mh, "doc_id", [new], [old], chunk=ch).column("doc_id").to_pylist())
    pop = lambda x: bin(int(x)).count("1")
    exp = set()
    for i in range(n_new):
        wit = any(bk_o[j] == bk_n[i] and pop(h_o[j] ^ h_n[i]) <= mh
                  for j in range(n_old)) \
            or any(bk_n[j] == bk_n[i] and ids[j] < ids[i]
                   and pop(h_n[j] ^ h_n[i]) <= mh for j in range(n_new))
        if wit:
            exp.add(int(ids[i]))
    assert got == exp


# ---------------------------------------------------------------------------
# round-4 third-session kernels (pure per-partition functions, no Ray)
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), num_parts=st.integers(1, 5),
       tau=st.sampled_from([(1, 2), (4, 5), (9, 10)]))
def test_containment_pipeline_matches_brute_force(seed, num_parts, tau):
    """The full containment join driven in-process: stage A shingle
    rows → split_by_key → _jacc_partition → _agg_stage2 → _final_stage3
    (containment mode) must equal the brute-force containment pair set
    for any corpus, partitioning, and threshold."""
    from log2seq_ray.ops.curation import (_agg_stage2, _final_stage3,
                                          _jacc_partition, _md5_60,
                                          _shingle_rows)
    from log2seq_ray.ops.exchange import split_by_key
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 12))
    alphabet = ["a", "b", "c", "d"]
    rows = [(i, " ".join(rng.choice(alphabet,
                                    size=int(rng.integers(0, 9)))))
            for i in range(n)]
    w = 3
    batch = pa.table({"doc_id": pa.array([r[0] for r in rows],
                                         type=pa.int64()),
                      "text": pa.array([r[1] for r in rows])})
    shingles = _shingle_rows(batch, w, "doc_id", "text")
    pieces = split_by_key(shingles, "g", num_parts)
    pair_parts, size_parts = zip(*[
        _jacc_partition("doc_id", None, [p]) for p in pieces])
    np2 = max(1, num_parts // 2)
    pair2 = [[] for _ in range(np2)]
    size2 = [[] for _ in range(np2)]
    for pp in pair_parts:
        for j, piece in enumerate(split_by_key(pp, "id_a", np2)):
            pair2[j].append(piece)
    for sp in size_parts:
        for j, piece in enumerate(split_by_key(sp, "doc_id", np2)):
            size2[j].append(piece)
    agg, szloc = zip(*[_agg_stage2("doc_id", pp, sp)
                       for pp, sp in zip(pair2, size2)])
    pair3 = [[] for _ in range(np2)]
    for ap in agg:
        for j, piece in enumerate(split_by_key(ap, "id_b", np2)):
            pair3[j].append(piece)
    tn, td = tau
    outs = [_final_stage3(tn, td, sz, ps, "containment")
            for sz, ps in zip(szloc, pair3)]
    got = set()
    for t in outs:
        for r in t.to_pylist():
            got.add((r["id_a"], r["id_b"], r["inter"], r["min_sz"]))

    # brute force
    def sh_set(text):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            strs = [""]
        elif len(toks) < w:
            strs = [" ".join(toks)]
        else:
            strs = [" ".join(toks[i:i + w])
                    for i in range(len(toks) - w + 1)]
        return {_md5_60(s) for s in strs}

    sets = {i: sh_set(t) for i, t in rows}
    expect = set()
    for a in range(n):
        for b in range(a + 1, n):
            inter = len(sets[a] & sets[b])
            msz = min(len(sets[a]), len(sets[b]))
            if inter * td >= tn * msz:
                expect.add((a, b, inter, msz))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_windowed_dedup_partition_matches_pandas(seed):
    """_windowed_dedup_partition equals the pandas ROW_NUMBER reference
    on random events with ties, retries, and null timestamps."""
    from log2seq_ray.ops.windows import _windowed_dedup_partition
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    base = 1_700_000_000_000_000  # us epoch
    ts_us = base + rng.integers(0, 4 * 3600, n) * 1_000_000
    ts = pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us"))
    null_mask = rng.random(n) < 0.1
    ts = pa.array([None if m else v for m, v in
                   zip(null_mask, ts.to_pylist())],
                  type=pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 4, n), type=pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "props": pa.array(rng.choice(["x", "y"], n)),
        "ts": ts})
    W = 1800
    got = _windowed_dedup_partition(
        "user_id", "event_type", "props", "ts", "event_id", W, [t]) \
        .to_pylist()
    got = {(r["event_id"], r["n_dups"]) for r in got}
    df = t.to_pandas().dropna(subset=["ts"])
    if len(df):
        us = (df["ts"] - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
        df["bucket"] = us // (W * 1_000_000)
        g = df.sort_values(["ts", "event_id"]).groupby(
            ["user_id", "event_type", "props", "bucket"])
        expect = {(int(gr["event_id"].iloc[0]), len(gr) - 1)
                  for _, gr in g}
    else:
        expect = set()
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000), num_parts=st.integers(1, 4),
       bs=st.integers(1, 7))
def test_vocab_growth_partitions_match_brute(seed, num_parts, bs):
    from log2seq_ray.ops.curation import (_md5_60, _vocab_final,
                                          _vocab_partition, _vocab_rows)
    from log2seq_ray.ops.exchange import split_by_key
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 15))
    alphabet = ["a", "b", "c", "d", "e"]
    rows = [(int(rng.integers(0, 40)),
             " ".join(rng.choice(alphabet,
                                 size=int(rng.integers(0, 6)))))
            for _ in range(n)]
    ids = {}
    rows = [(i, t) for i, t in rows if ids.setdefault(i, t) is t]
    batch = pa.table({"doc_id": pa.array([r[0] for r in rows],
                                         type=pa.int64()),
                      "text": pa.array([r[1] for r in rows])})
    a = _vocab_rows(batch, bs, "doc_id", "text")
    parts = [_vocab_partition(bs, [p])
             for p in split_by_key(a, "k", num_parts)]
    got = [tuple(int(v) for v in r.values())
           for r in _vocab_final(parts).to_pylist()]
    first, toks_per_bucket = {}, {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        if toks:
            toks_per_bucket[doc_id // bs] = \
                toks_per_bucket.get(doc_id // bs, 0) + len(toks)
        for t in toks:
            h = _md5_60(t)
            if h not in first or doc_id < first[h]:
                first[h] = doc_id
    new_types = {}
    for h, d in first.items():
        new_types[d // bs] = new_types.get(d // bs, 0) + 1
    expect, vocab, cum = [], 0, 0
    for b in sorted(toks_per_bucket):
        nt = new_types.get(b, 0)
        vocab += nt
        cum += toks_per_bucket[b]
        expect.append((b, toks_per_bucket[b], nt, vocab, cum))
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_excise_partition_matches_python(seed):
    """_excise_partition equals a per-doc Python excision for arbitrary
    docs and (possibly overlapping) spans."""
    from log2seq_ray.ops.curation import _excise_partition
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 10))
    rows = [(i, " ".join(f"t{int(v)}" for v in
                         rng.integers(0, 5, int(rng.integers(0, 10)))))
            for i in range(n)]
    spans = []
    for i, txt in rows:
        L = len([t for t in txt.split(" ") if t])
        for _ in range(int(rng.integers(0, 3))):
            if L == 0:
                continue
            s = int(rng.integers(0, L))
            ln = int(rng.integers(1, L - s + 1))
            spans.append((i, s, ln))
    docs = pa.table({"doc_id": pa.array([r[0] for r in rows],
                                        type=pa.int64()),
                     "text": pa.array([r[1] for r in rows])})
    sp = pa.table({"doc_id": pa.array([s[0] for s in spans],
                                      type=pa.int64()),
                   "span_start": pa.array([s[1] for s in spans],
                                          type=pa.int64()),
                   "span_len": pa.array([s[2] for s in spans],
                                        type=pa.int64())})
    got = {(r["doc_id"], r["text_clean"], r["n_removed"])
           for r in _excise_partition("doc_id", "text",
                                      [docs], [sp]).to_pylist()}
    expect = set()
    for i, txt in rows:
        ts = [t for t in txt.split(" ") if t]
        cov = set()
        for d, s, ln in spans:
            if d == i:
                cov.update(range(s, s + ln))
        kept = [t for p, t in enumerate(ts) if p not in cov]
        expect.add((i, " ".join(kept), len(ts) - len(kept)))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_interval_coverage_partition_matches_python(seed):
    """_coverage_partition equals a per-key Python interval-union
    reference for arbitrary (key, start, end) sets with nesting and
    ties; forcing the degenerate per-key loop path gives the same."""
    from log2seq_ray.ops.windows import _coverage_partition
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    u = rng.integers(0, 5, n).astype(np.int64)
    s = rng.integers(0, 500, n).astype(np.int64)
    e = s + rng.integers(1, 120, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(u), "s_us": pa.array(s),
                  "e_us": pa.array(e)})
    got = {(r["user_id"], r["n_intervals"], r["n_islands"],
            r["covered_us"])
           for r in _coverage_partition("user_id", "s_us", "e_us",
                                        [t]).to_pylist()}
    expect = set()
    for key in np.unique(u):
        ivs = sorted((int(a), int(b))
                     for a, b in zip(s[u == key], e[u == key]))
        islands = []
        for a, b in ivs:
            if islands and a <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], b)
            else:
                islands.append([a, b])
        expect.add((int(key), len(ivs), len(islands),
                    sum(b - a for a, b in islands)))
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), num_parts=st.integers(1, 5))
def test_join_cardinality_partition_matches_brute(seed, num_parts):
    """_card_partition over split_by_key partials equals the exact
    pandas count-product for arbitrary key distributions."""
    from log2seq_ray.ops.join import _card_partition
    from log2seq_ray.ops.exchange import split_by_key
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 40))
    kl = rng.integers(0, 10, nl).astype(np.int64)
    kr = rng.integers(0, 12, nr).astype(np.int64)

    def counts(keys):
        u, c = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(u, type=pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    L = split_by_key(counts(kl), "key", num_parts)
    R = split_by_key(counts(kr), "key", num_parts)
    rows, total = [], 0
    for lp, rp in zip(L, R):
        t, tt = _card_partition([lp], [rp])
        total += tt
        rows += t.to_pylist()
    got = {(r["key"], r["nl"], r["nr"], r["pairs"]) for r in rows}
    import collections
    cl = collections.Counter(kl.tolist())
    cr = collections.Counter(kr.tolist())
    expect = {(k, cl[k], cr[k], cl[k] * cr[k])
              for k in set(cl) & set(cr)}
    assert got == expect
    assert total == sum(p for _, _, _, p in expect)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), num_parts=st.integers(1, 4))
def test_dedup_savings_partition_matches_brute(seed, num_parts):
    """_savings_partition partials sum to the per-group python
    reference under any content-hash partitioning."""
    from log2seq_ray.ops.dedup import _savings_partition, _text_hash
    from log2seq_ray.ops.exchange import split_by_key
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 30))
    texts = [" ".join(rng.choice(["a", "b", "c"],
                                 size=int(rng.integers(0, 4))))
             for _ in range(n)]
    langs = rng.choice(["en", "de"], n).tolist()
    b = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    import pyarrow.compute as pc2
    narrow = _text_hash(b, "text").select(
        ["content_hash", "doc_id", "lang"]).append_column(
        "n_tokens", pa.array(
            [len([t for t in s.split(" ") if t]) for s in texts],
            type=pa.int64()))
    agg = {}
    for piece in split_by_key(narrow, "content_hash", num_parts):
        out = _savings_partition("lang", [piece])
        for r in out.to_pylist():
            a = agg.setdefault(r["lang"], [0, 0, 0, 0])
            a[0] += r["docs_p"]; a[1] += r["tokens_p"]
            a[2] += r["docs_kept_p"]; a[3] += r["tokens_kept_p"]
    keep = {}
    for i, s in enumerate(texts):
        keep.setdefault(s, i)
    expect = {}
    for i, (s, g) in enumerate(zip(texts, langs)):
        nt = len([t for t in s.split(" ") if t])
        e = expect.setdefault(g, [0, 0, 0, 0])
        e[0] += 1; e[1] += nt
        if keep[s] == i:
            e[2] += 1; e[3] += nt
    assert agg == expect
