"""Similarity search over an embedding column (``list<float>``).

* ``knn_brute_force`` — baseline exact top-k: the query matrix is broadcast
  once (``ray.put``), each ``map_batches`` task does one float64 matmul
  against its batch and emits only its LOCAL top-k rows per query
  (k × n_queries rows per batch, not the batch), and the driver merges the
  tiny partials. No shuffle; ships candidates, never the corpus.
* ``knn_ivf`` — scale path: coarse k-means centroids (trained on a sample),
  every vector assigned to its nearest centroid inside ``map_batches``;
  queries probe only ``n_probe`` nearest centroid partitions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def to_fixed32(col) -> pa.Array:
    """Embedding column → ``fixed_size_list<float32>`` — the storage /
    wire format for stress corpora and persistent ingest indexes: half
    the parquet + plasma bytes of ``list<double>``, offset-free decode.
    Math stays float64 (``_to_matrix`` upcasts); the ~1e-7 cosine
    perturbation is far inside every gated threshold margin. A zero-row
    input keeps its own type unchanged — dimension is unrecoverable, so
    emitting any other type would mix block schemas in one Dataset."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if (pa.types.is_fixed_size_list(arr.type)
            and arr.type.value_type == pa.float32()) or len(arr) == 0:
        return arr
    d = len(arr.flatten()) // len(arr)
    return arr.cast(pa.list_(pa.float32(), d))


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


class _TopKStage:
    """Emit per-batch local top-k (query_id, vec_id, cosine) candidates."""

    def __init__(self, queries_ref, k: int, id_col: str, col: str,
                 exclude_self: bool):
        import ray
        q = queries_ref if isinstance(queries_ref, tuple) \
            else ray.get(queries_ref)
        self.q_ids, self.Q = q  # (n_q,), (n_q, d) normalized float64
        self.k, self.id_col, self.col = k, id_col, col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.col)))
        ids = np.asarray(batch.column(self.id_col)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        sims = self.Q @ X.T  # (n_q, n_batch)
        if self.exclude_self:
            for qi, qid in enumerate(self.q_ids):
                sims[qi, ids == qid] = -np.inf
        k = min(self.k, sims.shape[1])
        # local top-k per query (argpartition then exact sort of k)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            # drop -inf fillers (the excluded self row when the batch has
            # < k candidates) — same guard as _SRPTopKStage
            cand = part[qi][np.isfinite(sims[qi, part[qi]])]
            out_q.extend([qid] * len(cand))
            out_v.extend(ids[cand])
            out_s.extend(sims[qi, cand])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "cosine": pa.array(np.array(out_s, dtype=np.float64)),
        })


def knn_brute_force(ds, queries: tuple[np.ndarray, np.ndarray], k: int = 10,
                    id_col: str = "vec_id", col: str = "embedding",
                    exclude_self: bool = True, use_ray_put: bool = True):
    """Exact cosine top-k for each query vector.

    ``queries`` = (query_ids (n_q,), query_matrix (n_q, d)). Returns a
    pandas DataFrame (query_id, vec_id, rank) with deterministic
    tie-break (cosine desc, vec_id asc).
    """
    import pandas as pd
    q_ids, Q = queries
    Q = _normalize(np.asarray(Q, dtype=np.float64))
    payload = (np.asarray(q_ids, dtype=np.int64), Q)
    if use_ray_put:
        import ray
        ref = ray.put(payload)
    else:
        ref = payload
    def topk_fn(b: pa.Table) -> pa.Table:
        # task-based: per-task state is one zero-copy plasma read of the
        # broadcast query matrix — an actor pool's spin-up dominated the
        # whole query at bench scale
        return _TopKStage(ref, k, id_col, col, exclude_self)(b)

    cands = ds.map_batches(topk_fn, batch_format="pyarrow",
                           batch_size=4096)
    pdf = cands.to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[pdf["rank"] <= k].reset_index(drop=True)
    return pdf[["query_id", "vec_id", "rank"]]


def queries_from_dataset(ds, n_queries: int, id_col="vec_id",
                         col="embedding"):
    """First n vectors (by id) as the query set."""
    import pyarrow.compute as pc
    small = ds.filter(expr=f"{id_col} < {n_queries}")
    batches = list(small.iter_batches(batch_size=4096,
                                      batch_format="pyarrow"))
    if not batches:
        raise ValueError(
            f"queries_from_dataset: no vectors with {id_col} < {n_queries}")
    tbl = pa.concat_tables(batches)
    order = pc.sort_indices(tbl.column(id_col))
    tbl = tbl.take(order)
    return (np.asarray(tbl.column(id_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64),
            _to_matrix(tbl.column(col)))


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------

def train_centroids(ds, n_centroids: int = 16, sample: int = 4096,
                    iters: int = 10, seed: int = 42,
                    col: str = "embedding",
                    id_col: Optional[str] = None) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd, fixed iters, seeded).

    With ``id_col`` the collected sample is sorted by id before the
    (seeded) init, making the centroids — and everything bucketed on them
    — DETERMINISTIC whenever the dataset has ≤ ``sample`` rows (block
    arrival order otherwise leaks into which rows are sampled)."""
    X, ids = [], []
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        X.append(_to_matrix(b.column(col)))
        if id_col is not None:
            ids.append(np.asarray(
                b.column(id_col).to_numpy(zero_copy_only=False),
                dtype=np.int64))
        if sum(len(x) for x in X) >= sample:
            break
    if not X:
        raise ValueError("train_centroids: dataset has no rows")
    X = np.concatenate(X)
    if id_col is not None:
        order = np.argsort(np.concatenate(ids), kind="stable")
        X = X[order]
    X = _normalize(X[:sample])
    rng = np.random.Generator(np.random.PCG64(seed))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


class _IVFAssignStage:
    def __init__(self, centroids_ref, col: str):
        import ray
        self.C = centroids_ref if isinstance(centroids_ref, np.ndarray) \
            else ray.get(centroids_ref)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.col)))
        assign = np.argmax(X @ self.C.T, axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(assign))


def knn_ivf(ds, queries, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, id_col: str = "vec_id",
            col: str = "embedding", exclude_self: bool = True):
    """Approximate top-k: probe only the ``n_probe`` nearest centroid
    partitions per query. Same output shape as ``knn_brute_force`` plus a
    ``cosine``-ordered rank; recall depends on n_probe/n_centroids.
    Centroid training is id-sorted (deterministic for sample-sized
    datasets), so the output is reproducible run-to-run."""
    import ray
    import pandas as pd
    q_ids, Q = queries
    Q = _normalize(np.asarray(Q, dtype=np.float64))
    C = train_centroids(ds, n_centroids=n_centroids, col=col,
                        id_col=id_col)
    cref = ray.put(C)
    def ivf_assign_fn(b: pa.Table) -> pa.Table:
        return _IVFAssignStage(cref, col)(b)

    assigned = ds.map_batches(ivf_assign_fn, batch_format="pyarrow")
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in probe for c in row})
    wanted_arr = pa.array(wanted, type=pa.int32())
    filtered = assigned.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column("centroid"),
                                            value_set=wanted_arr)),
        batch_format="pyarrow")
    # NOTE: candidates come from the UNION of all queries' probed
    # partitions (no per-query partition mask) — this can only raise
    # per-query recall relative to strict IVF, at the cost of scanning a
    # few more candidates per query.
    return knn_brute_force(filtered, (np.asarray(q_ids), Q), k=k,
                           id_col=id_col, col=col,
                           exclude_self=exclude_self)


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd over partial sums)
# ---------------------------------------------------------------------------

class _KMeansPartialStage:
    """Per-batch partial sums for one Lloyd step: assign each (normalized)
    vector — by ``vec_id % k`` on the init pass, by nearest centroid
    otherwise — and emit the k×(d+1) partial (cluster, dim, val) sums.
    Only these fixed-size partials leave the task; vectors never move."""

    def __init__(self, centroids_ref, k: int, id_col: str, col: str):
        import ray
        self.C = None
        if centroids_ref is not None:
            c = centroids_ref
            self.cids, self.C = c if isinstance(c, tuple) else ray.get(c)
        self.k, self.id_col, self.col = k, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.col)))
        col = batch.column(self.id_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        ids = col.to_numpy().astype(np.int64, copy=False)
        if self.C is None:
            a = ids % self.k          # deterministic, RNG-free init
            cid_of = np.arange(self.k, dtype=np.int64)
        else:
            a = np.argmax(X @ self.C.T, axis=1)
            cid_of = self.cids
        d = X.shape[1]
        cs, dims, vals = [], [], []
        for j in np.unique(a):
            m = a == j
            cs.append(np.full(d + 1, cid_of[j], dtype=np.int64))
            dims.append(np.arange(-1, d, dtype=np.int64))  # dim -1 = count
            vals.append(np.concatenate([[float(m.sum())], X[m].sum(axis=0)]))
        return pa.table({
            "c": pa.array(np.concatenate(cs)),
            "dim": pa.array(np.concatenate(dims)),
            "val": pa.array(np.concatenate(vals), type=pa.float64()),
        })


def _kmeans_step(ds, centroids, k: int, id_col: str, col: str):
    """One distributed Lloyd step → (cluster_ids, centroid_matrix) with
    empty clusters dropped (rows sorted by cluster id, so downstream
    argmax tie-breaks resolve to the lowest id — SQL ROW_NUMBER parity)."""
    import ray
    ref = ray.put(centroids) if centroids is not None else None

    def partial_fn(b: pa.Table) -> pa.Table:
        # task-based: stage state is one tiny centroid matrix read
        # zero-copy from plasma — an actor pool's spin-up (~2-4s at 32
        # CPUs) PER LLOYD PASS was most of kmeans_2m's wall time
        return _KMeansPartialStage(ref, k, id_col, col)(b)

    partials = ds.map_batches(partial_fn, batch_format="pyarrow",
                              batch_size=16384).to_pandas()
    agg = partials.groupby(["c", "dim"], sort=True)["val"].sum()
    counts = agg.xs(-1, level="dim")
    cids = np.asarray(counts.index[counts.to_numpy() > 0], dtype=np.int64)
    sums = agg.drop(index=-1, level="dim").unstack()  # (c, d)
    C = sums.loc[cids].to_numpy() / counts.loc[cids].to_numpy()[:, None]
    return cids, _normalize(C)


class _KMeansAssignStage:
    def __init__(self, centroids_ref, id_col: str, col: str):
        import ray
        c = centroids_ref
        self.cids, self.C = c if isinstance(c, tuple) else ray.get(c)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.col)))
        a = np.argmax(X @ self.C.T, axis=1)
        return pa.table({
            self.id_col: pc.cast(batch.column(self.id_col), pa.int64()),
            "cluster": pa.array(self.cids[a], type=pa.int64()),
        })


def kmeans_assign(ds, k: int = 8, iters: int = 1, id_col: str = "vec_id",
                  col: str = "embedding"):
    """Distributed spherical k-means (Lloyd) over an embedding column —
    the clustering pass of SemDeDup-style curation (Abbas et al.,
    arXiv:2303.09540) and of data-mixing pipelines.

    Deterministic and RNG-free: init centroid j = L2-normalized per-dim
    mean of the vectors with ``vec_id % k == j`` (SQL-reproducible),
    then ``iters`` Lloyd updates. Each update is one ``map_batches``
    pass emitting k×(d+1) partial sums per batch + a tiny driver reduce
    — vectors never shuffle, per-iteration traffic is O(k·d·n_batches).
    A cluster emptied by reassignment is dropped (it can never win a
    later argmax), exactly as its rows vanish from the SQL oracle's
    GROUP BY. Returns (vec_id, cluster) with cluster = the retained
    init-cluster id; cosine ties resolve to the lowest cluster id."""
    import ray
    ref = ray.put(kmeans_centroids(ds, k, iters, id_col, col))

    def assign_fn(b: pa.Table) -> pa.Table:
        return _KMeansAssignStage(ref, id_col, col)(b)

    return ds.map_batches(assign_fn, batch_format="pyarrow")


def kmeans_centroids(ds, k: int, iters: int, id_col: str = "vec_id",
                     col: str = "embedding"):
    """The (cluster_ids, centroid_matrix) pair `kmeans_assign` assigns
    against: one init pass (by ``id % k``) + ``iters`` Lloyd updates."""
    centroids = None
    for _ in range(iters + 1):
        centroids = _kmeans_step(ds, centroids, k, id_col, col)
    return centroids


# ---------------------------------------------------------------------------
# SemDeDup: within-cluster cosine dedup
# ---------------------------------------------------------------------------

def _semdedup_partition(threshold, id_col, pieces):
    """One exchange partition (keyed on cluster): for each cluster, a
    vector is dropped when a SMALLER-id vector in the same cluster has
    cosine >= threshold with it (keep-first-representative rule)."""
    from .exchange import resolve_all_pieces
    pieces = resolve_all_pieces(pieces)
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "cluster": pa.array([], type=pa.int64())})
    pieces = [p for p in pieces if p.num_rows]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    ids = t.column(id_col).to_numpy()
    cl = t.column("cluster").to_numpy()
    X = _normalize(_to_matrix(t.column("embedding")))
    out_i, out_c = [], []
    for c in np.unique(cl):
        m = cl == c
        cid, cx = ids[m], X[m]
        order = np.argsort(cid, kind="stable")
        cid, cx = cid[order], cx[order]
        dup = np.zeros(len(cid), dtype=bool)
        _mark_older_victims(cx, dup, threshold)
        out_i.append(cid[~dup])
        out_c.append(np.full(int((~dup).sum()), c, dtype=np.int64))
    return pa.table({
        id_col: pa.array(np.concatenate(out_i), type=pa.int64()),
        "cluster": pa.array(np.concatenate(out_c), type=pa.int64()),
    })


class _AssignKeepStage(_KMeansAssignStage):
    """Assignment that also carries the embedding (for the dedup scan).
    Vectors ship fixed_size_list<float32> — half the exchange bytes;
    the cosine math upcasts to float64 per partition (_to_matrix)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        return out.append_column("embedding",
                                 to_fixed32(batch.column(self.col)))


def semdedup(ds, k: int = 8, iters: int = 1, threshold: float = 0.9,
             id_col: str = "vec_id", col: str = "embedding",
             num_parts: int = 16):
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    embeddings, then within each cluster drop every vector that has a
    smaller-id near-twin at cosine >= ``threshold``. Returns surviving
    (vec_id, cluster).

    Scale shape: the clustering pass ships only k×(d+1) partials
    (``kmeans_assign``); the dedup pass exchanges each vector ONCE keyed
    on its cluster and runs one O(b²) cosine scan per cluster — b is
    bounded by choosing k ~ n/target_cluster_size, the same lever the
    paper uses (their clusters are ~100k vectors for 100M points)."""
    import ray
    from .exchange import hash_exchange
    ref = ray.put(kmeans_centroids(ds, k, iters, id_col, col))

    def assign_keep_fn(b: pa.Table) -> pa.Table:
        return _AssignKeepStage(ref, id_col, col)(b)

    # big batches: the exchange splits every upstream block into
    # num_parts pieces, so thousands of 1k-row blocks would mean 100k+
    # tiny objects (measured 512s → 25s on 2M vectors from this alone)
    assigned = ds.map_batches(assign_keep_fn, batch_format="pyarrow",
                              batch_size=16384)
    return hash_exchange(assigned, "cluster", _semdedup_partition,
                         num_parts, fn_args=(threshold, id_col))


# ---------------------------------------------------------------------------
# SRP-LSH ANN (signed random projections, cosine)
# ---------------------------------------------------------------------------

def srp_planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix (n_planes, dim): entry sign =
    parity of the 60-bit md5 prefix of ``"srp:{p}:{d}"`` — reproducible
    in SQL via the md5 bridge, so the LSH bucketing itself is part of
    the oracle contract (unlike float random planes)."""
    import hashlib
    W = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"srp:{p}:{d}".encode())
                    .hexdigest()[:15], 16)
            W[p, d] = 1 if h % 2 == 1 else -1
    return W


def srp_buckets(X: np.ndarray, W: np.ndarray) -> np.ndarray:
    """LSH bucket per row: bit p = (sum_d floor(x_d * 2^20) * W[p,d] >= 0).
    The fixed-point floor makes the plane sums INTEGER-exact — no float
    summation-order ambiguity between engines."""
    Q = np.floor(X * np.float64(1 << 20)).astype(np.int64)
    bits = (Q @ W.T >= 0).astype(np.int64)
    return bits @ (np.int64(1) << np.arange(W.shape[0], dtype=np.int64))


class _SRPTopKStage(_TopKStage):
    """Local top-k restricted to each query's SRP candidate set (bucket
    Hamming distance <= probe)."""

    def __init__(self, queries_ref, k, id_col, col, exclude_self,
                 planes_ref, probe):
        import ray
        super().__init__(queries_ref, k, id_col, col, exclude_self)
        self.W, self.q_buckets = ray.get(planes_ref)
        self.probe = probe
        self._lut = np.array([bin(i).count("1") for i in range(1 << 16)],
                             dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _to_matrix(batch.column(self.col))
        ids = np.asarray(batch.column(self.id_col)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        b = srp_buckets(X, self.W)          # (n_batch,)
        # candidate mask: hamming(bucket, q_bucket) <= probe. Only the
        # union of all queries' candidate columns enters the matmul —
        # at high n_planes that's the point of the LSH (each dot product
        # is an independent k-sum, so subsetting columns doesn't change
        # any pair's float value).
        ham = self._lut[(b[None, :] ^ self.q_buckets[:, None])
                        .astype(np.int64)]
        keep = ham <= self.probe            # (n_q, n_batch)
        cols = np.nonzero(keep.any(axis=0))[0]
        if len(cols) == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            })
        Xn = _normalize(X[cols])
        ids = ids[cols]
        sims = self.Q @ Xn.T                # (n_q, n_cand)
        sims[~keep[:, cols]] = -np.inf
        if self.exclude_self:
            for qi, qid in enumerate(self.q_ids):
                sims[qi, ids == qid] = -np.inf
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            cand = part[qi][np.isfinite(sims[qi, part[qi]])]
            out_q.extend([qid] * len(cand))
            out_v.extend(ids[cand])
            out_s.extend(sims[qi, cand])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "cosine": pa.array(np.array(out_s, dtype=np.float64)),
        })


def srp_knn(ds, queries, k: int = 10, n_planes: int = 8, probe: int = 1,
            id_col: str = "vec_id", col: str = "embedding",
            exclude_self: bool = True):
    """ANN cosine top-k via signed-random-projection LSH: vectors whose
    bucket is within Hamming ``probe`` of the query's bucket are the
    candidate set (multi-probe); exact cosine ranks the candidates.
    A query with fewer than k candidates returns fewer rows — the
    candidate rule, not a recall target, is the operator's contract
    (and the SQL oracle reproduces it bit-for-bit).

    Scale shape: same as ``knn_brute_force`` (broadcast queries + planes,
    per-batch local top-k, k x n_queries x n_blocks driver merge) but
    each batch's matmul feeds only the LSH-filtered columns at high
    ``n_planes``; no shuffle, no index build."""
    import pandas as pd
    import ray
    if not 1 <= n_planes <= 16:
        raise ValueError("n_planes must be in [1, 16] (16-bit popcount LUT)")
    q_ids, Q = queries
    Q = np.asarray(Q, dtype=np.float64)
    W = srp_planes(n_planes, Q.shape[1])
    q_buckets = srp_buckets(Q, W)
    payload = (np.asarray(q_ids, dtype=np.int64), _normalize(Q))
    qref, pref = ray.put(payload), ray.put((W, q_buckets))

    def srp_fn(b: pa.Table) -> pa.Table:
        return _SRPTopKStage(qref, k, id_col, col, exclude_self,
                             planes_ref=pref, probe=probe)(b)

    cands = ds.map_batches(srp_fn, batch_format="pyarrow",
                           batch_size=4096)
    pdf = cands.to_pandas()
    if pdf.empty:  # all-empty blocks lose column names in to_pandas
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("query_id", "vec_id", "rank")})
    pdf = pdf.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[pdf["rank"] <= k].reset_index(drop=True)
    return pdf[["query_id", "vec_id", "rank"]]


# ---------------------------------------------------------------------------
# incremental cross-run SEMANTIC dedup ingest (persistent vector index)
# ---------------------------------------------------------------------------

def _mark_older_victims(X, vic, threshold, rch: int = 4096,
                        cch: int = 256) -> None:
    """In-place keep-first scan over row-normalized ``X`` (rows in id
    order): set ``vic[i]`` when some j < i has ``X[i]·X[j] >= threshold``.
    Pre-marked rows are skipped as ROWS but stay COLUMNS forever (a
    dropped vector still victimizes higher ids — the EXISTS-over-all-
    lower-ids contract of semdedup and the semantic ingest).

    Columns scan in REVERSE id order with row pruning: crawl near-dups
    are id-adjacent (replica runs, recrawls), so a victim's witness is
    usually in its first column chunk and the dup-heavy regime costs
    ~O(b×cch×d) instead of O(b²d). Every GEMM is ≤rch×cch (8 MB f64) —
    the 128 MB chunk×b slabs of the first version made 32 concurrent
    tasks allocator/bandwidth-bound (32 CPUs measured SLOWER than 8)."""
    b = len(vic)
    act = np.nonzero(~vic)[0]
    for clo in range((max(b - 1, 1) - 1) // cch * cch, -1, -cch):
        act = act[~vic[act]]
        sel_all = act[np.searchsorted(act, clo, side="right"):]
        if not len(sel_all):
            continue  # lower chunks still serve lower-id rows
        chi = min(clo + cch, b)
        Ct = X[clo:chi].T
        cols = np.arange(clo, chi)
        for rlo in range(0, len(sel_all), rch):
            sel = sel_all[rlo:rlo + rch]
            hit = X[sel] @ Ct >= threshold
            inside = sel < chi  # diagonal chunk: strictly-lower only
            if inside.any():
                hit[inside] &= sel[inside, None] > cols[None, :]
            vic[sel] |= hit.any(axis=1)


def _sem_ingest_partition(threshold: float, id_col: str, col: str,
                          new_pieces, old_pieces) -> pa.Table:
    """One centroid-bucket partition of the semantic ingest join: victims
    among this run's vectors — cosine >= ``threshold`` vs ANY committed
    survivor sharing a bucket, or vs ANY lower-id new vector sharing a
    bucket. Old-old pairs — the bulk of a mature index — are never
    computed; all scans are vectorized matmuls per bucket."""
    from .exchange import resolve_mixed_pieces, resolve_pieces
    empty = pa.table({"vic": pa.array([], type=pa.int64())})
    new_pieces = resolve_pieces(new_pieces)
    if not new_pieces:
        return empty
    nt = pa.concat_tables(new_pieces)
    # old pieces may mix split-task refs with BUCKET-ALIGNED parquet
    # paths from a compacted index (read here, in the partition task)
    old_pieces = [t for t in resolve_mixed_pieces(old_pieces)
                  if t.num_rows]
    ot = pa.concat_tables(old_pieces) if old_pieces else None
    cents = nt.column("__centroid").to_numpy()
    ids_n = np.asarray(nt.column(id_col).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    Xn_all = _normalize(_to_matrix(nt.column(col)))
    if ot is not None:
        cents_o = ot.column("__centroid").to_numpy()
        Xo_all = _normalize(_to_matrix(ot.column(col)))
    out = np.zeros(len(nt), dtype=bool)
    # Slab geometry: every GEMM is (≤rch rows) × (≤cch columns), so the
    # peak float64 temporary is rch×cch = 8 MB per task regardless of
    # bucket size (the 128 MB chunk×b slabs of the first version made 32
    # concurrent tasks allocator/bandwidth-bound — 32 CPUs measured
    # SLOWER than 8). Narrow column chunks matter more than wide GEMMs:
    # a row stops scanning at its first witness chunk, so per-victim
    # work is O(cch×d), not O(b×d).
    rch, cch = 4096, 256
    for c in np.unique(cents):
        m = cents == c
        rows = np.nonzero(m)[0]
        idn, Xn = ids_n[m], Xn_all[m]
        order = np.argsort(idn, kind="stable")  # ids unique per run →
        rows, idn, Xn = rows[order], idn[order], Xn[order]
        b = len(idn)
        vic = np.zeros(b, dtype=bool)
        if ot is not None:
            mo = cents_o == c
            if mo.any():
                Xo = Xo_all[mo]
                # Column-chunked with row pruning: against a mature
                # index nearly every row hits in its first chunk, so the
                # scan is ~O(rows×cch×d) instead of O(rows×|index|×d).
                act = np.arange(b)
                for clo in range(0, Xo.shape[0], cch):
                    act = act[~vic[act]]
                    if not len(act):
                        break
                    Oc = Xo[clo:clo + cch].T
                    for rlo in range(0, len(act), rch):
                        sel = act[rlo:rlo + rch]
                        vic[sel] |= (Xn[sel] @ Oc >= threshold).any(axis=1)
        # Within-run scan: a dropped vector still victimizes higher ids,
        # matching the oracle's EXISTS over ALL lower-id vectors.
        _mark_older_victims(Xn, vic, threshold, rch=rch, cch=cch)
        out[rows[vic]] = True
    if not out.any():
        return empty
    return pa.table({"vic": pa.array(np.unique(ids_n[out]),
                                     type=pa.int64())})


def _anti_filter_partition(id_col: str, row_pieces, vic_pieces) -> pa.Table:
    """One id-hash partition of the survivor anti-filter: keep rows whose
    id is NOT in this partition's victim set (both sides arrived through
    the same ``split_by_key(id)`` exchange, so membership is decided
    locally and exactly)."""
    from .exchange import resolve_all_pieces, resolve_pieces
    # zero-COLUMN empties (a zero-row block upstream that skipped every
    # map_batches) carry no schema and break concat_tables with the
    # typed pieces — drop them, keep typed empties for their schema
    rows = [t for t in resolve_all_pieces(row_pieces) if t.num_columns]
    if not rows:
        return pa.table({})
    tbl = pa.concat_tables(rows)
    vics = resolve_pieces(vic_pieces)
    if tbl.num_rows == 0 or not vics:
        return tbl
    vic = np.unique(np.concatenate(
        [np.asarray(v.column("vic").to_numpy(zero_copy_only=False),
                    dtype=np.int64) for v in vics]))
    ids = np.asarray(tbl.column(id_col).to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    keep = ~np.isin(ids, vic)
    return tbl.filter(pa.array(keep))


def _assign_split_block(block, cref, id_col: str, col: str,
                        n_assign: int, num_parts: int):
    """Fused task: multi-assign ONE block's vectors to their nearest
    centroids and split the assignment rows by centroid — the assigned
    rows never materialize as a Dataset (see ingest_semdedup_run)."""
    import ray

    from .dedup import _MultiAssignStage
    from .exchange import split_by_key
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    if block.num_rows == 0:
        # zero-row blocks may carry the untransformed upstream schema
        # (Ray pass-through); consumers drop empty pieces
        return [block.slice(0, 0)] * num_parts
    C = cref if isinstance(cref, np.ndarray) else ray.get(cref)
    assigned = _MultiAssignStage(C, id_col, col, n_assign)(block)
    return split_by_key(assigned, "__centroid", num_parts)


def ingest_semdedup_run(ds, state_dir: str, threshold: float = 0.9,
                        n_centroids: int = 8, n_assign: int = 3,
                        id_col: str = "vec_id", col: str = "embedding",
                        num_parts=None):
    """Incremental cross-RUN SEMANTIC dedup — the continuous-crawl
    embedding-dedup shape (tonight's embeddings vs every committed crawl,
    the SemDeDup criterion made incremental): a new vector is DROPPED iff
    its cosine vs ANY committed survivor, or vs ANY lower-id vector of
    this run, reaches ``threshold``. Survivors commit their (id, vector)
    rows to the persistent index under ``state_dir``. Ids must be unique
    across runs. Returns the surviving ``id_col`` Dataset.

    100 TB shape: the index stores vectors only (no text); coarse k-means
    centroids are trained ONCE (first run, driver-side sample) and
    PERSISTED, so bucketing is identical across runs; both sides
    multi-assign to their ``n_assign`` nearest centroids and meet in ONE
    centroid-keyed co-partitioned exchange — per-bucket work is
    O(new_b x (old_b + new_b)), never old x old, and the hot-bucket
    salting lever of :func:`log2seq_ray.ops.dedup.embedding_dups` applies
    unchanged if a centroid overfills. The commit is write-to-temp +
    ``rename`` — a crashed run leaves no partial index. Recall follows
    the multi-probe LSH contract (a qualifying pair is caught when the
    two vectors share any of their top-``n_assign`` centroids — certain
    for near-identical vectors, which is the dedup regime)."""
    import os
    import uuid

    import ray
    import ray.data as rd

    from ..state.runs import live_runs, next_run_dir, run_files
    from .dedup import _MultiAssignStage, _auto_parts
    from .exchange import fan_out_pieces, split_by_key, stream_block_refs

    os.makedirs(state_dir, exist_ok=True)
    runs, manifests = live_runs(state_dir)
    # One narrow (id, vector) projection, materialized ONCE: it feeds
    # centroid training, bucket assignment AND the survivor anti-filter
    # (and is exactly the payload committed to the index), so the
    # upstream — a full parquet scan at 100 TB — executes once, not 3x.
    # Vectors are re-encoded fixed_size_list<float32> here: every
    # downstream hop (plasma split, exchange, index commit, next run's
    # index read) ships/stores half the bytes — phase tracing showed
    # list<double> parquet decode + the vector fan-out WAS the ingest
    # wall (10-16s/run).
    narrow = ds.map_batches(
        lambda b: pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            col: to_fixed32(b.column(col))}),
        batch_format="pyarrow").materialize()
    empty_ids = rd.from_arrow(
        pa.table({id_col: pa.array([], type=pa.int64())}))
    if narrow.count() == 0:
        # nothing to ingest: commit an empty run (keeps run numbering
        # monotone for resume) and return a TYPED empty id set
        os.makedirs(next_run_dir(state_dir), exist_ok=True)
        return empty_ids
    cpath = f"{state_dir}/centroids.npy"
    if os.path.exists(cpath):
        C = np.load(cpath)
    else:
        C = train_centroids(narrow, n_centroids=n_centroids, col=col,
                            id_col=id_col)
        tmpc = f"{cpath}.{uuid.uuid4().hex}"
        with open(tmpc, "wb") as f:
            np.save(f, C)
        os.replace(tmpc, cpath)
    cref = ray.put(C)
    num_parts = min(_auto_parts(num_parts), max(1, n_centroids))
    # FUSED assign+split: one task per block runs the centroid matmul
    # and the bucket split together — no intermediate assigned Dataset,
    # no actor pool, no per-run map_batches execution barrier (phase
    # tracing measured that barrier at 5-12s/run, dwarfing the actual
    # assign compute; the old per-run pool spin-up made 32 CPUs SLOWER
    # than 8). The 3x-expanded vector rows go straight from task heap
    # to their narrow per-bucket pieces.
    new_parts = fan_out_pieces(
        _assign_split_block, narrow.to_arrow_refs(), num_parts,
        args=(cref, id_col, col, n_assign, num_parts))
    # compacted runs whose buckets/ were expanded with OUR centroids,
    # n_assign and num_parts: bucket files bypass the read + assign
    # matmul + split and land directly in their partition's piece list
    aligned = [r for r in runs
               if manifests.get(r, {}).get("num_parts") == num_parts
               and manifests.get(r, {}).get("n_assign") == n_assign
               and os.path.isdir(f"{state_dir}/{r}/buckets")]
    files = run_files(state_dir, [r for r in runs if r not in aligned])
    if files:
        old_parts = fan_out_pieces(
            _assign_split_block,
            stream_block_refs(rd.read_parquet(files)), num_parts,
            args=(cref, id_col, col, n_assign, num_parts))
    else:
        old_parts = [[] for _ in range(num_parts)]
    for r in aligned:
        for p in range(num_parts):
            bpath = f"{state_dir}/{r}/buckets/bucket_{p:05d}.parquet"
            if os.path.isfile(bpath):
                old_parts[p] = list(old_parts[p]) + [bpath]
    work = ray.remote(_sem_ingest_partition)
    victim_refs = [work.remote(threshold, id_col, col, np_, op_)
                   for np_, op_ in zip(new_parts, old_parts)]
    # Survivor anti-filter: Acero joins reject nested non-key fields
    # (list<double> embedding), so route rows AND victim ids through one
    # id-hash co-partitioned exchange and mask per partition — same
    # exactness argument as hash_join(anti), list payloads never enter a
    # join kernel.
    row_parts = fan_out_pieces(split_by_key, narrow.to_arrow_refs(),
                               num_parts, args=(id_col, num_parts))
    vic_parts = fan_out_pieces(split_by_key, victim_refs, num_parts,
                               args=("vic", num_parts))
    anti = ray.remote(_anti_filter_partition)
    survivors = rd.from_arrow_refs(
        [anti.remote(id_col, rp, vp)
         for rp, vp in zip(row_parts, vic_parts)]).materialize()
    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    # write_parquet of an EMPTY dataset creates no directory — pre-create
    # tmp so the commit rename always has something to move (an empty run
    # is the normal recrawl outcome: every vector already indexed)
    os.makedirs(tmp, exist_ok=True)
    survivors.write_parquet(tmp)
    os.rename(tmp, next_run_dir(state_dir))
    if survivors.count() == 0:
        return empty_ids
    return survivors.select_columns([id_col])


def compact_semdedup_index(state_dir: str, num_parts=None,
                           n_assign: int = 3, n_centroids: int = 8,
                           id_col: str = "vec_id",
                           col: str = "embedding") -> dict:
    """Compact a cross-run SEMANTIC-dedup index (``ingest_semdedup_run``
    state): merge every live run's survivor (id, vector) rows into ONE
    run holding (a) the flat rows at the run root — the canonical
    payload, used by re-compaction and by any ingest whose bucketing
    differs — and (b) ``buckets/`` with the ``n_assign``-expanded
    centroid-assignment rows, pre-split with the SAME persisted
    centroids and partitioner ingest uses. A subsequent ingest at
    matching (num_parts, n_assign) routes each bucket file directly to
    its partition task, skipping the index-side read + assign matmul +
    split entirely (the committed index, the bulk of a mature crawl
    archive, never moves or recomputes again; disk cost is the
    documented 1 + n_assign× of the flat rows). Same crash-safe
    manifest protocol as
    :func:`~log2seq_ray.ops.curation.compact_neardup_index`.
    Returns ``{"runs_compacted", "buckets", "rows", "dir"}``."""
    import json
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from ..state.runs import live_runs, next_run_dir, run_files, sweep_stale
    from .curation import _write_bucket
    from .dedup import _auto_parts
    from .exchange import fan_out_pieces, stream_block_refs

    os.makedirs(state_dir, exist_ok=True)
    sweep_stale(state_dir)
    runs, manifests = live_runs(state_dir)
    num_parts = min(_auto_parts(num_parts), max(1, n_centroids))
    if not runs or (len(runs) == 1 and runs[0] in manifests
                    and manifests[runs[0]].get("num_parts") == num_parts
                    and manifests[runs[0]].get("n_assign") == n_assign):
        return {"runs_compacted": 0, "buckets": num_parts, "rows": 0,
                "dir": None}
    files = run_files(state_dir, runs)
    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(f"{tmp}/buckets", exist_ok=True)
    total = 0
    cpath = f"{state_dir}/centroids.npy"
    if files:
        rows = rd.read_parquet(files).materialize()  # narrow id+vector
        total = rows.count()
        rows.write_parquet(tmp)
        if os.path.exists(cpath):
            cref = ray.put(np.load(cpath))
            parts = fan_out_pieces(
                _assign_split_block, stream_block_refs(rows), num_parts,
                args=(cref, id_col, col, n_assign, num_parts))
            write = ray.remote(_write_bucket)
            ray.get([write.remote(
                f"{tmp}/buckets/bucket_{p:05d}.parquet", pieces,
                (id_col, "__centroid")) for p, pieces in
                enumerate(parts)])
    with open(f"{tmp}/MANIFEST.json", "w") as f:
        json.dump({"kind": "semdedup", "num_parts": num_parts,
                   "n_assign": n_assign, "id_col": id_col,
                   "covers": runs}, f)
    final = next_run_dir(state_dir)
    os.rename(tmp, final)
    for r in runs:
        shutil.rmtree(f"{state_dir}/{r}", ignore_errors=True)
    return {"runs_compacted": len(runs), "buckets": num_parts,
            "rows": int(total), "dir": final}


# ---------------------------------------------------------------------------
# embedding quantization (int8 codes, global per-dimension min/max)
# ---------------------------------------------------------------------------

def quantize_embeddings(ds, id_col: str = "vec_id",
                        col: str = "embedding", levels: int = 255):
    """Scalar quantization of an embedding column to integer codes:
    ``code = floor((v - min_d) * levels / (max_d - min_d))`` clamped to
    [0, levels], with the per-DIMENSION min/max taken over the whole
    corpus — the storage-shrink step before an IVF/PQ index (float32 →
    1 byte/dim at levels=255). Constant dimensions code to 0. All float
    ops are deterministic IEEE doubles with a fixed expression shape,
    so the SQL oracle matches bit-for-bit. Returns exploded
    (id, dim, code) rows (dim 1-based).

    Scale shape: pass 1 reduces per-batch (dim, min, max) partials —
    d rows per batch — through one tiny groupby; the d-row scale table
    rides into pass 2 as a closure and codes stream out per batch."""
    from ray.data.aggregate import Max, Min

    def mm_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        X = _to_matrix(b.column(col))
        d = X.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1), type=pa.int64()),
            "mn": pa.array(X.min(axis=0), type=pa.float64()),
            "mx": pa.array(X.max(axis=0), type=pa.float64())})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Min("mn", alias_name="mn"),
                                  Max("mx", alias_name="mx")) \
        .to_pandas().sort_values("dim")
    mn = mm["mn"].to_numpy(dtype=np.float64)
    mx = mm["mx"].to_numpy(dtype=np.float64)
    span = mx - mn

    def codes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "code": pa.array([], type=pa.int64())})
        X = _to_matrix(b.column(col))
        n, d = X.shape
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.floor((X - mn) * float(levels) / span)
        c = np.where(span > 0, c, 0.0)
        c = np.clip(c, 0, levels).astype(np.int64)
        ids = np.repeat(np.asarray(pc.cast(b.column(id_col), pa.int64())
                                   .to_numpy(zero_copy_only=False),
                                   dtype=np.int64), d)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1), n),
                            type=pa.int64()),
            "code": pa.array(c.ravel(), type=pa.int64())})

    return ds.map_batches(codes, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# product quantization (per-subspace Lloyd codebooks, exploded codes)
# ---------------------------------------------------------------------------

def _pq_subdims(d: int, m: int) -> np.ndarray:
    """Subspace index of each dimension: ``sub(dim) = dim * m // d`` —
    contiguous near-equal blocks, the same formula the SQL oracle uses."""
    return np.arange(d, dtype=np.int64) * m // d


class _PQPartialStage:
    """Per-batch partials of one PQ Lloyd step: for every subspace,
    assign each vector to its nearest codeword (squared L2 on the
    subspace dims; init = ``vec_id % k``) and emit (sub, c, dim, val)
    partial sums, with ``dim = -1`` carrying the member counts."""

    def __init__(self, books_ref, m: int, k: int, id_col: str, col: str):
        import ray
        self.books = None if books_ref is None else ray.get(books_ref)
        self.m, self.k = m, k
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _to_matrix(batch.column(self.col))
        n, d = X.shape
        sub_of = _pq_subdims(d, self.m)
        ids = np.asarray(pc.cast(batch.column(self.id_col), pa.int64())
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        subs, cs, dims, vals = [], [], [], []
        for s in range(self.m):
            cols = np.flatnonzero(sub_of == s)
            Xs = X[:, cols]
            if self.books is None:
                a = ids % self.k
                cids = np.arange(self.k, dtype=np.int64)
            else:
                cids, C = self.books[s]
                d2 = ((Xs[:, None, :] - C[None]) ** 2).sum(axis=2)
                a = cids[np.argmin(d2, axis=1)]
            for j, c in enumerate(cids):
                mask = a == c
                cnt = int(mask.sum())
                if cnt == 0:
                    continue
                ssum = Xs[mask].sum(axis=0)
                dloc = len(cols)
                subs.append(np.full(dloc + 1, s, dtype=np.int64))
                cs.append(np.full(dloc + 1, c, dtype=np.int64))
                dims.append(np.concatenate(
                    [np.arange(dloc, dtype=np.int64), [-1]]))
                vals.append(np.concatenate([ssum, [float(cnt)]]))
        if not subs:
            return pa.table({"sub": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "dim": pa.array([], type=pa.int64()),
                             "val": pa.array([], type=pa.float64())})
        return pa.table({
            "sub": pa.array(np.concatenate(subs), type=pa.int64()),
            "c": pa.array(np.concatenate(cs), type=pa.int64()),
            "dim": pa.array(np.concatenate(dims), type=pa.int64()),
            "val": pa.array(np.concatenate(vals), type=pa.float64())})


def _pq_step(ds, books, m: int, k: int, id_col: str, col: str):
    """One distributed PQ Lloyd step → per-subspace (cids, raw-mean
    codebook matrix); emptied codewords dropped (rows sorted by id so
    argmin ties resolve to the lowest — SQL ROW_NUMBER parity)."""
    import ray
    ref = ray.put(books) if books is not None else None
    def pq_partial_fn(b: pa.Table) -> pa.Table:
        return _PQPartialStage(ref, m, k, id_col, col)(b)

    partials = ds.map_batches(pq_partial_fn, batch_format="pyarrow",
                              batch_size=16384).to_pandas()
    out = []
    for s in range(m):
        p = partials[partials["sub"] == s]
        agg = p.groupby(["c", "dim"], sort=True)["val"].sum()
        counts = agg.xs(-1, level="dim")
        cids = np.asarray(counts.index[counts.to_numpy() > 0],
                          dtype=np.int64)
        sums = agg.drop(index=-1, level="dim").unstack()
        C = sums.loc[cids].to_numpy() / counts.loc[cids].to_numpy()[:, None]
        out.append((cids, C))
    return out


class _PQAssignStage:
    def __init__(self, books_ref, m: int, id_col: str, col: str):
        import ray
        b = books_ref
        self.books = b if isinstance(b, list) else ray.get(b)
        self.m, self.id_col, self.col = m, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _to_matrix(batch.column(self.col))
        n, d = X.shape
        sub_of = _pq_subdims(d, self.m)
        ids = pc.cast(batch.column(self.id_col), pa.int64())
        outs = []
        for s, (cids, C) in enumerate(self.books):
            Xs = X[:, np.flatnonzero(sub_of == s)]
            d2 = ((Xs[:, None, :] - C[None]) ** 2).sum(axis=2)
            code = cids[np.argmin(d2, axis=1)]
            outs.append(pa.table({
                self.id_col: ids,
                "subspace": pa.array(np.full(n, s, dtype=np.int64)),
                "code": pa.array(code, type=pa.int64())}))
        return pa.concat_tables(outs)


def pq_codes(ds, m: int = 2, k: int = 4, iters: int = 1,
             id_col: str = "vec_id", col: str = "embedding"):
    """Product quantization (Jégou et al., TPAMI 2011): split each
    vector into ``m`` contiguous subspaces (``sub(dim) = dim·m // d``)
    and Lloyd-train a ``k``-codeword codebook per subspace on the RAW
    (unnormalized) coordinates — squared-L2 assignment, ``vec_id % k``
    init, ``iters`` updates, emptied codewords dropped. Returns
    exploded (id, subspace, code) rows: the log₂k·m-bit compressed
    representation an IVF-PQ index stores per vector.

    Scale shape: identical to :func:`kmeans_assign` — every training
    step is one ``map_batches`` pass shipping m·k×(d/m+1) partial sums
    (vectors never shuffle), the trained codebooks broadcast once via
    ``ray.put``, and the code pass streams."""
    import ray
    ref = ray.put(pq_codebooks(ds, m, k, iters, id_col, col))
    def pq_assign_fn(b: pa.Table) -> pa.Table:
        return _PQAssignStage(ref, m, id_col, col)(b)

    return ds.map_batches(pq_assign_fn, batch_format="pyarrow")


def pq_codebooks(ds, m: int, k: int, iters: int,
                 id_col: str = "vec_id", col: str = "embedding"):
    """The per-subspace (cids, codebook) list :func:`pq_codes` and
    :func:`pq_knn` train against: init by ``vec_id % k`` + ``iters``
    Lloyd updates, each one distributed partials pass."""
    books = None
    for _ in range(iters + 1):
        books = _pq_step(ds, books, m, k, id_col, col)
    return books


class _PQKnnStage:
    """Asymmetric-distance top-k: assign each corpus vector's subspace
    codes, then its approximate distance to every query is ``Σ_s
    DT[s][q, code_s]`` — two table lookups and one add per (query,
    vector), never a full d-dim computation. Emits the batch-local
    top-k rows per query."""

    def __init__(self, payload_ref, m: int, kk: int, id_col: str,
                 col: str):
        import ray
        p = payload_ref if isinstance(payload_ref, tuple) \
            else ray.get(payload_ref)
        self.q_ids, self.books, self.DT = p
        self.m, self.k, self.id_col, self.col = m, kk, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _to_matrix(batch.column(self.col))
        n, d = X.shape
        if n == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             self.id_col: pa.array([], type=pa.int64()),
                             "ad": pa.array([], type=pa.float64())})
        sub_of = _pq_subdims(d, self.m)
        ids = np.asarray(pc.cast(batch.column(self.id_col), pa.int64())
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        ad = np.zeros((len(self.q_ids), n), dtype=np.float64)
        for s, (cids, C) in enumerate(self.books):
            Xs = X[:, np.flatnonzero(sub_of == s)]
            d2 = ((Xs[:, None, :] - C[None]) ** 2).sum(axis=2)
            pos = np.argmin(d2, axis=1)          # position into cids
            ad += self.DT[s][:, pos]
        out_q, out_v, out_d = [], [], []
        kk = min(self.k, n)
        for qi in range(len(self.q_ids)):
            row = ad[qi]
            part = np.lexsort((ids, row))[:kk]
            out_q.append(np.full(kk, self.q_ids[qi], dtype=np.int64))
            out_v.append(ids[part])
            out_d.append(row[part])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            self.id_col: pa.array(np.concatenate(out_v), type=pa.int64()),
            "ad": pa.array(np.concatenate(out_d), type=pa.float64())})


def pq_knn(ds, queries, m: int = 2, k_code: int = 4, iters: int = 1,
           k: int = 10, id_col: str = "vec_id", col: str = "embedding"):
    """Approximate top-``k`` by PQ asymmetric distance (ADC): train
    per-subspace codebooks, precompute each query's distance table to
    every codeword (n_q × k_code per subspace), then a corpus vector's
    approximate distance is ``Σ_s DT[s][code_s]`` — table lookups, not
    d-dim arithmetic. The compressed-domain scan an IVF-PQ index runs
    inside each probed cell. Ties break (distance asc, id asc).
    Returns pandas (query_id, vec_id, rank).

    Scale shape: codebooks + distance tables broadcast once via
    ``ray.put``; each batch assigns codes and prunes to a local top-k,
    so the driver merges k × n_q × n_blocks rows — no shuffle."""
    import pandas as pd
    import ray
    q_ids, Q = queries
    Q = np.asarray(Q, dtype=np.float64)
    books = pq_codebooks(ds, m, k_code, iters, id_col, col)
    d = Q.shape[1]
    sub_of = _pq_subdims(d, m)
    DT = [((Q[:, np.flatnonzero(sub_of == s)][:, None, :]
            - C[None]) ** 2).sum(axis=2)
          for s, (cids, C) in enumerate(books)]
    ref = ray.put((np.asarray(q_ids, dtype=np.int64), books, DT))
    def pq_knn_fn(b: pa.Table) -> pa.Table:
        return _PQKnnStage(ref, m, k, id_col, col)(b)

    cands = ds.map_batches(pq_knn_fn, batch_format="pyarrow",
                           batch_size=4096)
    pdf = cands.to_pandas()
    pdf = pdf.sort_values(["query_id", "ad", id_col],
                          ascending=[True, True, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[pdf["rank"] <= k].reset_index(drop=True)
    return pdf[["query_id", id_col, "rank"]]


def ivf_pq_knn(ds, queries, n_cells: int = 8, n_probe: int = 2,
               m: int = 2, k_code: int = 4, iters: int = 1, k: int = 10,
               id_col: str = "vec_id", col: str = "embedding"):
    """The full IVF-PQ read path (Jégou et al.): a spherical-k-means
    COARSE quantizer routes every vector to one of ``n_cells`` cells
    (the ``kmeans_assign`` contract — id%k init + ``iters`` Lloyd,
    cosine argmax, ties low); each query probes its ``n_probe`` nearest
    cells and scans ONLY those vectors by PQ asymmetric distance.
    Ties (ad asc, id asc). Returns pandas (query_id, vec_id, rank).

    Scale shape: coarse centroids + codebooks + per-query (probed
    cells, distance tables) all broadcast once; one streaming pass
    assigns cell + codes per vector and emits per-query local top-k
    among the probed subset — no shuffle, candidates only."""
    import pandas as pd
    import ray
    q_ids, Q = queries
    Q = np.asarray(Q, dtype=np.float64)
    cids, C = kmeans_centroids(ds, n_cells, iters, id_col, col)
    books = pq_codebooks(ds, m, k_code, iters, id_col, col)
    d = Q.shape[1]
    sub_of = _pq_subdims(d, m)
    DT = [((Q[:, np.flatnonzero(sub_of == s)][:, None, :]
            - Cs[None]) ** 2).sum(axis=2)
          for s, (_, Cs) in enumerate(books)]
    Qn = _normalize(Q)
    sims = Qn @ C.T                       # (n_q, n_cells)
    a = min(n_probe, sims.shape[1])
    # probed cells per query: cosine desc, cell id asc on ties
    order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims),
                       axis=1)[:, :a]
    probe = [set(cids[order[qi]].tolist()) for qi in range(len(q_ids))]
    payload = (np.asarray(q_ids, dtype=np.int64), (cids, C), books,
               DT, probe)
    ref = ray.put(payload)

    def scan(batch: pa.Table) -> pa.Table:
        import ray as _ray
        qids, (ccids, CC), bks, dts, prb = _ray.get(ref) \
            if not isinstance(ref, tuple) else ref
        X = _to_matrix(batch.column(col))
        n, dd = X.shape
        if n == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "ad": pa.array([], type=pa.float64())})
        cell = ccids[np.argmax(_normalize(X) @ CC.T, axis=1)]
        so = _pq_subdims(dd, len(bks))
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64())
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        ad = np.zeros((len(qids), n), dtype=np.float64)
        for s, (scids, Cs) in enumerate(bks):
            Xs = X[:, np.flatnonzero(so == s)]
            d2 = ((Xs[:, None, :] - Cs[None]) ** 2).sum(axis=2)
            ad += dts[s][:, np.argmin(d2, axis=1)]
        out_q, out_v, out_d = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(cell, list(prb[qi]))
            if not mask.any():
                continue
            cand_ids, cand_ad = ids[mask], ad[qi][mask]
            kk = min(k, len(cand_ids))
            part = np.lexsort((cand_ids, cand_ad))[:kk]
            out_q.append(np.full(kk, qids[qi], dtype=np.int64))
            out_v.append(cand_ids[part])
            out_d.append(cand_ad[part])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "ad": pa.array([], type=pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            id_col: pa.array(np.concatenate(out_v), type=pa.int64()),
            "ad": pa.array(np.concatenate(out_d), type=pa.float64())})

    pdf = ds.map_batches(scan, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    pdf = pdf.sort_values(["query_id", "ad", id_col],
                          ascending=[True, True, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[pdf["rank"] <= k].reset_index(drop=True)
    return pdf[["query_id", id_col, "rank"]]


def vec_dim_stats(ds, id_col: str = "vec_id", col: str = "embedding"):
    """Per-DIMENSION corpus statistics of an embedding column — n, min,
    max, sum in integer micro-units (``floor(v * 1e6)``) — the feature-
    scaling / drift-monitoring table computed before normalization or
    quantization. Integer micro-units make the sums additive and
    order-independent, so merges are engine-exact at any parallelism
    (the ``group_value_stats`` convention applied dim-wise).

    Scale shape: d rows of already-reduced partials per batch through
    one tiny groupby; vectors never shuffle. Returns a Dataset of
    (dim 1-based, n, mn_micro, mx_micro, sum_micro)."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64()),
                             "mn_p": pa.array([], type=pa.int64()),
                             "mx_p": pa.array([], type=pa.int64()),
                             "s_p": pa.array([], type=pa.int64())})
        X = np.floor(_to_matrix(b.column(col)) * 1e6).astype(np.int64)
        n, d = X.shape
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1), type=pa.int64()),
            "n_p": pa.array(np.full(d, n, dtype=np.int64)),
            "mn_p": pa.array(X.min(axis=0)),
            "mx_p": pa.array(X.max(axis=0)),
            "s_p": pa.array(X.sum(axis=0))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(
            Sum("n_p", alias_name="n"),
            Min("mn_p", alias_name="mn_micro"),
            Max("mx_p", alias_name="mx_micro"),
            Sum("s_p", alias_name="sum_micro"))


def vec_gram_sums(ds, col: str = "embedding", scale: int = 1000):
    """Exact integer gram-matrix accumulation — the distributed
    linear-algebra primitive under PCA / whitening / covariance: for
    every dim pair (a ≤ b), ``n`` and ``Σ q_a·q_b`` where ``q =
    floor(v·scale)`` (milli-units by default — products of two
    milli-quantized coordinates summed over 10^9 rows stay far inside
    int64, where micro-units would overflow). Quantize-then-multiply
    makes the sums additive and order-independent, so merges are
    engine-exact at any parallelism and SQL-reproducible.

    Scale shape: each batch ships ONE d(d+1)/2-row partial (an integer
    X^T X computed as a single matmul); vectors never shuffle; the
    final groupby merges O(d² × n_batches) tiny rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"dim_a": pa.array([], type=pa.int64()),
                             "dim_b": pa.array([], type=pa.int64()),
                             "n_p": pa.array([], type=pa.int64()),
                             "s_p": pa.array([], type=pa.int64())})
        Q = np.floor(_to_matrix(b.column(col)) * scale).astype(np.int64)
        n, d = Q.shape
        G = Q.T @ Q                       # (d, d) int64, exact
        ia, ib = np.triu_indices(d)
        return pa.table({
            "dim_a": pa.array(ia + 1, type=pa.int64()),
            "dim_b": pa.array(ib + 1, type=pa.int64()),
            "n_p": pa.array(np.full(len(ia), n, dtype=np.int64)),
            "s_p": pa.array(G[ia, ib])})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["dim_a", "dim_b"]).aggregate(
            Sum("n_p", alias_name="n"), Sum("s_p", alias_name="s"))


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (exact-integer contract)
# ---------------------------------------------------------------------------

def _jl_signs(d_in: int, d_out: int) -> np.ndarray:
    """Deterministic ±1 projection matrix: sign(i, j) from the parity
    of md5(f"{i}:{j}")'s first hex digit — reproducible by any engine,
    no RNG state to ship."""
    import hashlib
    R = np.empty((d_in, d_out), dtype=np.int64)
    for i in range(d_in):
        for j in range(d_out):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            R[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1
    return R


def jl_project(ds, d_out: int = 4, col: str = "embedding",
               id_col: str = "vec_id", scale: int = 1000):
    """Sparse-free JL random projection with the engine's exact-integer
    discipline: coordinates milli-quantize (``floor(v*scale)``, the
    vec_gram convention) and project through a deterministic ±1 matrix
    — ``out[j] = Σ_i q_i · sign(i, j)`` is an exact int64 sum, so any
    partitioning (and SQL) reproduces every output bit. The standard
    cheap dimensionality-reduction front-end before LSH / clustering
    at scale (Achlioptas-style ±1 projections preserve distances in
    expectation; the 1/√d_out rescale is left to the consumer to keep
    integers exact).

    Scale shape: embarrassingly parallel — the (d_in × d_out) sign
    matrix builds once per actor, each batch is one int64 matmul;
    no exchange. Returns exploded (id, out_dim 1-based, value) rows."""
    class _JL:
        def __init__(self):
            self.R = None

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({id_col: pa.array([], type=pa.int64()),
                              "out_dim": pa.array([], type=pa.int64()),
                              "value": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            Q = np.floor(_to_matrix(b.column(col)) * scale).astype(
                np.int64)
            if self.R is None or self.R.shape[0] != Q.shape[1]:
                self.R = _jl_signs(Q.shape[1], d_out)
            Y = Q @ self.R                      # (n, d_out) exact int64
            n = Q.shape[0]
            ids = pc.cast(b.column(id_col), pa.int64()).to_numpy()
            return pa.table({
                id_col: pa.array(np.repeat(ids, d_out)),
                "out_dim": pa.array(np.tile(
                    np.arange(1, d_out + 1, dtype=np.int64), n)),
                "value": pa.array(Y.reshape(-1))})

    from .exchange import actor_pool
    return ds.map_batches(_JL, batch_format="pyarrow",
                          concurrency=actor_pool())


# ---------------------------------------------------------------------------
# hard-negative mining (label-constrained top-k)
# ---------------------------------------------------------------------------

class _HardNegStage(_TopKStage):
    """Per-batch local top-k constrained to candidates whose label
    differs from the query's — contrastive-training hard-negative
    mining. Same broadcast/local-top-k/driver-merge shape as knn."""

    def __init__(self, queries_ref, k: int, id_col: str, col: str,
                 label_col: str):
        import ray
        q = queries_ref if isinstance(queries_ref, tuple) \
            else ray.get(queries_ref)
        self.q_ids, self.Q, self.q_labels = q
        self.k, self.id_col, self.col = k, id_col, col
        self.label_col = label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(_to_matrix(batch.column(self.col)))
        ids = np.asarray(batch.column(self.id_col)
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        labels = np.asarray(batch.column(self.label_col)
                            .to_numpy(zero_copy_only=False),
                            dtype=np.int64)
        sims = self.Q @ X.T
        # same-label candidates (and the query itself) are ineligible
        sims[self.q_labels[:, None] == labels[None, :]] = -np.inf
        for qi, qid in enumerate(self.q_ids):
            sims[qi, ids == qid] = -np.inf
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            cand = part[qi][np.isfinite(sims[qi, part[qi]])]
            out_q.extend([qid] * len(cand))
            out_v.extend(ids[cand])
            out_s.extend(sims[qi, cand])
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "cosine": pa.array(np.array(out_s, dtype=np.float64)),
        })


def labeled_queries_from_dataset(ds, n_queries: int, id_col="vec_id",
                                 col="embedding", label_col="label"):
    """First n vectors (by id) with their labels as the query set."""
    small = ds.filter(expr=f"{id_col} < {n_queries}")
    batches = list(small.iter_batches(batch_size=4096,
                                      batch_format="pyarrow"))
    if not batches:
        raise ValueError("labeled_queries_from_dataset: no vectors "
                         f"with {id_col} < {n_queries}")
    tbl = pa.concat_tables(batches)
    order = pc.sort_indices(tbl.column(id_col))
    tbl = tbl.take(order)
    return (np.asarray(tbl.column(id_col).to_numpy(
                zero_copy_only=False), dtype=np.int64),
            _to_matrix(tbl.column(col)),
            np.asarray(tbl.column(label_col).to_numpy(
                zero_copy_only=False), dtype=np.int64))


def hard_negatives(ds, queries, k: int = 5, id_col: str = "vec_id",
                   col: str = "embedding", label_col: str = "label"):
    """Exact cosine top-k HARD NEGATIVES per query: nearest candidates
    with a DIFFERENT label — the mining step of contrastive training
    (the near-but-wrong examples that carry gradient signal).
    ``queries`` = (ids, matrix, labels). Broadcast queries, per-batch
    local top-k, k × n_blocks driver merge — no shuffle (the knn
    scale shape). Returns (query_id, vec_id, rank), ties to lower id."""
    import pandas as pd
    import ray
    q_ids, Q, q_labels = queries
    payload = (np.asarray(q_ids, dtype=np.int64),
               _normalize(np.asarray(Q, dtype=np.float64)),
               np.asarray(q_labels, dtype=np.int64))
    ref = ray.put(payload)
    def hardneg_fn(b: pa.Table) -> pa.Table:
        return _HardNegStage(ref, k, id_col, col, label_col)(b)

    cands = ds.map_batches(hardneg_fn, batch_format="pyarrow",
                           batch_size=4096)
    pdf = cands.to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True])
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    pdf = pdf[pdf["rank"] <= k].reset_index(drop=True)
    return pdf[["query_id", "vec_id", "rank"]]
