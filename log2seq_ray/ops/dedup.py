"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale" / near-dup pattern):

* exact      — content-hash column per batch → ``groupby(hash).min(id)``
               (hash-partitioned; one shuffle of (hash, id) pairs only);
* minhash    — per-batch shingle→minhash signatures (numpy, vectorized
               over hashes) → explode to (band_id, band_hash, doc_id)
               rows → groupby bands → candidate pairs → exact-Jaccard
               verify → greedy keep-lowest-id survivors;
* simhash    — 64-bit simhash per doc; near-dup = equal high-k prefix
               bucket + Hamming ≤ t verify;
* embedding  — cosine ≥ τ against bucketed candidates.

At 10^12 rows the band/bucket groupbys shuffle only fixed-width key rows
(never documents); verification joins happen within groups.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    import zlib
    texts = batch.column(col).to_pylist()
    h = [hashlib.sha1(t.encode() if t else b"").hexdigest()
         for t in texts]
    return batch.append_column("content_hash",
                               pa.array(h, type=pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", col: str = "text"):
    """Survivor ids: min id per distinct content. Returns a Dataset with one
    ``doc_id`` column. Shuffle moves only (hash, id)."""
    from ray.data.aggregate import Min
    hashed = ds.map_batches(lambda b: _text_hash(b, col)
                            .select(["content_hash", id_col]),
                            batch_format="pyarrow")
    out = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_strings(text: str, k: int = 5) -> frozenset:
    """Distinct k-token shingle strings (<k tokens → the whole sequence;
    empty → {""}). The exact-Jaccard verify and the SQL oracle both work
    on these strings directly."""
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return frozenset([" ".join(toks)] if toks else [""])
    return frozenset(" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1))


def _shingles(text: str, k: int = 5) -> np.ndarray:
    grams = sorted(_shingle_strings(text, k))
    return np.unique(np.array(
        [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                        "little") for g in grams], dtype=np.uint64))


class MinHashStage:
    """Per-batch MinHash signatures (``n_hashes`` universal hashes computed
    vectorially over each doc's shingle set); emits one row per (doc, band):
    (band_id, band_hash, doc_id).

    Hot-path design: token hashes come from a per-actor blake2b cache (web
    vocabulary repeats heavily), shingle hashes are a vectorized windowed
    linear combination of token hashes (numpy sliding window) instead of
    per-shingle digests, and the (n_hashes × n_shingles) universal-hash min
    is one numpy expression. ~10x the naive per-shingle-digest version.
    """

    def __init__(self, n_hashes: int = 64, n_bands: int = 16,
                 shingle_k: int = 5, seed: int = 42,
                 id_col: str = "doc_id", col: str = "text"):
        assert n_hashes % n_bands == 0
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
        # positional mixers for the k-token shingle combination
        self.cmix = rng.integers(1, _MERSENNE, size=shingle_k,
                                 dtype=np.uint64)
        self.n_hashes, self.n_bands = n_hashes, n_bands
        self.rows_per_band = n_hashes // n_bands
        self.k, self.id_col, self.col = shingle_k, id_col, col
        self._tok_cache: dict[str, int] = {}

    def _token_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._tok_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(),
                    "little")
                cache[t] = h
            out[i] = h
        return out

    def signature(self, text: str) -> np.ndarray:
        toks = [t for t in text.split(" ") if t]
        k = self.k
        if not toks:
            sh = np.zeros(1, dtype=np.uint64)
        else:
            th = self._token_hashes(toks)
            if len(th) < k:
                sh = np.array([(th * self.cmix[:len(th)]).sum()],
                              dtype=np.uint64)
            else:
                win = np.lib.stride_tricks.sliding_window_view(th, k)
                sh = (win * self.cmix).sum(axis=1)  # uint64 wraparound mix
            sh = np.unique(sh)
        v = (self.a[:, None] * (sh[None, :] % _MERSENNE) + self.b[:, None]) \
            % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.col).to_pylist()
        buckets, doc_ids = [], []
        r = self.rows_per_band
        for did, text in zip(ids, texts):
            sig = self.signature(text or "")
            for band in range(self.n_bands):
                chunk = sig[band * r:(band + 1) * r]
                h = hashlib.blake2b(chunk.tobytes(),
                                    digest_size=8).hexdigest()
                buckets.append(f"{band}:{h}")
                doc_ids.append(did)
        return pa.table({
            "bucket": pa.array(buckets, type=pa.string()),
            self.id_col: pa.array(doc_ids, type=pa.int64()),
        })


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact Jaccard over distinct shingle STRINGS (identical to the SQL
    ``list_intersect`` oracle: same sets, same int/int IEEE division)."""
    sa, sb = _shingle_strings(a, k), _shingle_strings(b, k)
    return len(sa & sb) / len(sa | sb)


def minhash_candidate_pairs(ds, n_hashes=64, n_bands=16, shingle_k=5,
                            id_col="doc_id", col="text"):
    """LSH bucket groupby → unique candidate pairs Dataset (a < b).

    Almost every bucket holds exactly one doc; a per-group python call over
    all of them dominated the op (observed ~90% of wall). So: two-phase
    count per bucket first, broadcast the (tiny) multi-member bucket set,
    and run the pair expansion only on the filtered rows.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(n_hashes=n_hashes, n_bands=n_bands,
                                   shingle_k=shingle_k, id_col=id_col,
                                   col=col),
        batch_format="pyarrow", concurrency=(1, 8))
    # (bucket, id) rows are fixed-width and n_docs x n_bands — materialize
    # so the count pass and the filtered pass don't recompute signatures.
    # At 10^12 docs this runs per corpus shard, not globally.
    bands = bands.materialize()

    def partial_counts(b: pa.Table) -> pa.Table:
        g = b.select(["bucket"]).group_by(["bucket"]).aggregate(
            [([], "count_all")])
        return pa.table({"bucket": g.column("bucket"),
                         "partial_n": g.column("count_all")})

    counts = bands.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("partial_n", alias_name="n"))
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)).select(["bucket"]),
        batch_format="pyarrow").to_pandas()
    # an all-singleton corpus yields an empty frame with NO columns
    hot_list = hot["bucket"].tolist() if "bucket" in hot.columns else []
    hot_set = pa.array(hot_list, type=pa.string())
    if len(hot_set) == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64())}))

    filtered = bands.map_batches(
        lambda b: b.filter(pc.is_in(b.column("bucket"),
                                    value_set=hot_set)),
        batch_format="pyarrow")

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
        return pd.DataFrame(out, columns=["id_a", "id_b"]) if out else \
            pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})

    return filtered.groupby("bucket").map_groups(
        pairs_of_group, batch_format="pandas")


class _FilterByIdStage:
    """Distributed candidate-doc fetch: broadcast id set (``ray.put``
    once), vectorized ``pc.is_in`` filter per batch."""

    def __init__(self, ids_ref, id_col: str, keep_cols):
        import ray
        ids = ids_ref if isinstance(ids_ref, pa.Array) else ray.get(ids_ref)
        self.ids, self.id_col, self.keep = ids, id_col, list(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.select(self.keep).filter(
            pc.is_in(batch.column(self.id_col), value_set=self.ids))


class _VerifyJaccardStage:
    """Exact shingle-Jaccard verification of candidate pairs inside the
    actor pool. The candidate docs' text blocks stay in the object store
    (block refs); each actor resolves them ONCE in ``__init__`` (zero-copy
    plasma reads, shared per node) and pre-computes shingle sets."""

    def __init__(self, block_refs, threshold: float, shingle_k: int,
                 id_col: str, col: str):
        import ray
        self.threshold, self.k = threshold, shingle_k
        self.shingles: dict = {}
        for tbl in ray.get(list(block_refs)):
            for i, t in zip(tbl.column(id_col).to_pylist(),
                            tbl.column(col).to_pylist()):
                self.shingles[i] = _shingle_strings(t or "", shingle_k)

    def __call__(self, pairs: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        sh = self.shingles
        for a, b in zip(pairs.column("id_a").to_pylist(),
                        pairs.column("id_b").to_pylist()):
            sa, sb = sh[a], sh[b]
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64()),
                         "jaccard": pa.array(out_j, type=pa.float64())})


def minhash_dedup(ds, threshold: float = 0.8, n_hashes=64, n_bands=16,
                  shingle_k=5, id_col="doc_id", col="text"):
    """Near-dup pairs verified by exact shingle Jaccard ≥ threshold.

    Returns a pandas DataFrame (id_a, id_b, jaccard), deduplicated and
    sorted. Fully distributed verify: the (small, LSH-pruned) candidate-id
    set is broadcast into a ``pc.is_in`` corpus filter, the matching docs'
    text blocks stay in plasma, and pairs are verified batch-wise in an
    actor pool — the driver only ever holds integer id pairs. (At larger
    candidate volumes, swap the driver-side pair distinct for a
    ``groupby(id_a,id_b)`` and the broadcast for a bucketed join — the
    corpus itself is never scanned driver-side either way.)

    With ``n_bands == n_hashes`` (one row per band) LSH recall at Jaccard
    ``j`` is ``1-(1-j)^n_hashes`` — for n_hashes=128, threshold 0.5 the
    miss probability is ~3e-39, i.e. the output deterministically equals
    the exact-Jaccard pair set (how the SQL oracle gates this op).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    pairs_pdf = minhash_candidate_pairs(
        ds, n_hashes, n_bands, shingle_k, id_col, col).to_pandas()
    if len(pairs_pdf) == 0:
        return empty
    pairs_pdf = pairs_pdf.drop_duplicates().reset_index(drop=True)
    cand = np.unique(np.concatenate([pairs_pdf["id_a"].to_numpy(),
                                     pairs_pdf["id_b"].to_numpy()]))
    ids_ref = ray.put(pa.array(cand, type=pa.int64()))
    cand_docs = ds.map_batches(
        _FilterByIdStage,
        fn_constructor_kwargs=dict(ids_ref=ids_ref, id_col=id_col,
                                   keep_cols=[id_col, col]),
        batch_format="pyarrow", concurrency=(1, 8))
    block_refs = cand_docs.to_arrow_refs()
    verified = rd.from_pandas(pairs_pdf).map_batches(
        _VerifyJaccardStage,
        fn_constructor_kwargs=dict(block_refs=block_refs,
                                   threshold=threshold, shingle_k=shingle_k,
                                   id_col=id_col, col=col),
        batch_format="pyarrow", batch_size=8192,
        concurrency=(1, 8)).to_pandas()
    if len(verified) == 0:
        return empty
    return verified.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def minhash_clusters(ds, threshold: float = 0.8, **kw):
    """Near-dup clusters: verified pairs → connected components →
    (doc_id, cluster_id = min doc_id of component), survivors =
    cluster representatives.

    The component step runs driver-side union-find over the VERIFIED pair
    set only — bounded by true near-dup volume, not corpus size (the LSH
    bucching already shrank candidates; at 10^12 rows swap this step for a
    few rounds of min-label propagation: explode pairs to (id, label) rows,
    groupby(id).min, join back, repeat until fixpoint).
    """
    import pandas as pd
    pairs = minhash_dedup(ds, threshold=threshold, **kw)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _ in pairs.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for p in pairs.itertuples(index=False)
                      for x in (p.id_a, p.id_b)})
    return pd.DataFrame({
        "doc_id": pd.Series(members, dtype="int64"),
        "cluster_id": pd.Series([find(m) for m in members], dtype="int64"),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHashStage:
    """60-bit SimHash per document over token features (weights = term
    frequency). Token hash = first 15 hex chars of md5 — 60 bits so the
    value is a positive BIGINT and the whole computation is reproducible
    in SQL (the ``simhash`` oracle); hashes are cached per actor (web
    vocabulary repeats heavily)."""

    BITS = 60

    def __init__(self, id_col: str = "doc_id", col: str = "text"):
        self.id_col, self.col = id_col, col
        self._bit = np.array([1 << i for i in range(self.BITS)],
                             dtype=np.uint64)
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            self._cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return 0
        acc = np.zeros(self.BITS, dtype=np.int64)
        from collections import Counter
        for tok, w in Counter(toks).items():
            bits = (np.uint64(self._tok_hash(tok)) & self._bit) != 0
            acc += np.where(bits, w, -w)
        return int(((acc > 0).astype(np.uint64) * self._bit).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self.simhash(t or "")
                  for t in batch.column(self.col).to_pylist()]
        arr = np.array(hashes, dtype=np.int64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(arr),
            # bucket on the high 16 of the 60 bits: near-dups (Hamming
            # ≤ ~3 in the high bits) collide; verify inside buckets
            "simhash_bucket": pa.array(arr >> 44),
        })


def simhash_table(ds, id_col="doc_id", col="text"):
    return ds.map_batches(SimHashStage,
                          fn_constructor_kwargs=dict(id_col=id_col, col=col),
                          batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

class _MultiAssignStage:
    """Assign every vector to its ``n_assign`` nearest centroids (multi-
    probe: a near-dup pair whose top centroids differ still collides on
    a shared second choice). Emits one row per assignment."""

    def __init__(self, centroids_ref, id_col: str, col: str, n_assign: int):
        import ray
        self.C = centroids_ref if isinstance(centroids_ref, np.ndarray) \
            else ray.get(centroids_ref)
        self.id_col, self.col, self.n_assign = id_col, col, n_assign

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import _to_matrix, _normalize
        X = _normalize(_to_matrix(batch.column(self.col)))
        sims = X @ self.C.T
        a = min(self.n_assign, sims.shape[1])
        top = np.argsort(-sims, axis=1)[:, :a]
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), a)
        taken = batch.select([self.id_col, self.col]).take(pa.array(idx))
        return taken.append_column(
            "__centroid", pa.array(top.reshape(-1).astype(np.int32)))


def embedding_dups(ds, threshold: float = 0.95, id_col: str = "vec_id",
                   col: str = "embedding", n_centroids: int = 16,
                   n_assign: int = 3):
    """Near-dup id pairs by cosine ≥ threshold, bucketed by coarse k-means
    centroid (trained on a driver-side sample, broadcast once): each
    vector is multi-assigned to its ``n_assign`` nearest centroids, pairs
    are generated ONLY within a centroid bucket (``groupby(centroid)``
    shuffles vectors, not the O(n²) pair space), and duplicates from
    multi-assignment are dropped at the end. Partitioning assumption: a
    bucket's vectors fit one worker — salt oversized buckets into
    sub-buckets before the groupby at larger scales."""
    import pandas as pd
    import ray
    from .similarity import train_centroids, _normalize

    C = train_centroids(ds, n_centroids=n_centroids, col=col,
                        id_col=id_col)
    cref = ray.put(C)
    assigned = ds.map_batches(
        _MultiAssignStage,
        fn_constructor_kwargs=dict(centroids_ref=cref, id_col=id_col,
                                   col=col, n_assign=n_assign),
        batch_format="pyarrow", concurrency=(1, 8))

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        X = _normalize(np.asarray(list(g[col]), dtype=np.float64))
        sims = X @ X.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = ids[ai] < ids[bi]
        return pd.DataFrame({
            "id_a": pd.Series(ids[ai[keep]], dtype="int64"),
            "id_b": pd.Series(ids[bi[keep]], dtype="int64")})

    pairs = assigned.groupby("__centroid").map_groups(
        pairs_of_bucket, batch_format="pandas").to_pandas()
    return pairs.drop_duplicates().sort_values(["id_a", "id_b"]) \
        .reset_index(drop=True)
