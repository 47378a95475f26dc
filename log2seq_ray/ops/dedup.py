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

Hash-family note (ADVICE r1): the MinHash universal hash computes
``a*x+b`` in uint64 (wrapping mod 2^64) BEFORE the mod-(2^61-1)
reduction, so it is a deterministic-but-approximate member of the
``(a*x+b) mod p`` family. Min-wise uniformity degrades marginally, which
can only lower LSH *candidate recall* — precision is protected by the
exact-Jaccard verify, and the gated recall-1 configuration (one-row
bands) is insensitive to it.
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


from .exchange import bincount_i64

_MERSENNE = (1 << 61) - 1


def _text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    from .hashutil import bytes_list
    # sha1 per value is inherent (digest-bound, measured); one vectorized
    # cast-to-binary replaces the per-row str.encode
    h = [hashlib.sha1(v).hexdigest() for v in bytes_list(batch.column(col))]
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


def ingest_dedup_run(ds, state_dir: str, id_col: str = "doc_id",
                     col: str = "text"):
    """Incremental cross-RUN exact dedup — the continuous-ingestion shape
    (tonight's crawl vs every crawl before it): drop rows whose content
    hash is already in the persistent index under ``state_dir``, keep
    min-id-first within this run, then commit the survivors' hashes so
    the next run sees them. Returns the surviving (content_hash, id)
    Dataset.

    100 TB shape: the index holds 20-byte hex hashes + ids (~1/5000th of
    the corpus bytes) as partitioned parquet, one directory per committed
    run; membership against it is a hash-partitioned ANTI join
    (``hash_join(how='anti')`` — only the index's KEY column enters the
    shuffle, no text ever does); within-run dedup is the existing
    ``groupby(hash).min(id)``. The commit is write-to-temp + ``rename``,
    so a crashed run leaves no partial index and the state dir can be
    resumed. The survivor set is materialized once (it is consumed twice:
    the commit write and the caller) — it is the deduped (hash, id) pair
    set, never the documents."""
    import os
    import uuid

    import ray.data as rd
    from ray.data.aggregate import Min

    from .join import hash_join

    from ..state.runs import live_runs, next_run_dir, run_files

    os.makedirs(state_dir, exist_ok=True)
    runs, _ = live_runs(state_dir)

    hashed = ds.map_batches(lambda b: _text_hash(b, col)
                            .select(["content_hash", id_col]),
                            batch_format="pyarrow")
    survivors = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))
    # a list of paths must be files, not directories; a committed run
    # whose survivor set was empty may hold zero parquet files — skip it
    files = run_files(state_dir, runs)
    if files:
        index = rd.read_parquet(files, columns=["content_hash"])
        survivors = hash_join(survivors, index,
                              "content_hash", "content_hash", how="anti")
    survivors = survivors.materialize()

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    # write_parquet of an EMPTY dataset creates no directory — pre-create
    # tmp so the commit rename succeeds when every row was a duplicate
    os.makedirs(tmp, exist_ok=True)
    survivors.select_columns(["content_hash", id_col]).write_parquet(tmp)
    os.rename(tmp, next_run_dir(state_dir))
    if survivors.count() == 0:
        # the anti join's all-filtered output loses its schema — return
        # a TYPED empty so downstream select/schema keep working
        return rd.from_arrow(pa.table({
            "content_hash": pa.array([], type=pa.string()),
            id_col: pa.array([], type=pa.int64())}))
    return survivors


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

    Hot-path design: the whole BATCH shares one shingle-hash pass
    (:func:`_shingle_hash_lists` — blake2b once per distinct token,
    vectorized windowed mix, the same kernel the verify stage consumes),
    then each universal hash is one flat numpy affine pass + a
    ``minimum.reduceat`` over row boundaries. No per-doc Python loop, no
    per-token dict lookups — the prior per-doc ``signature()`` path was
    the residual CPU term after the verify byte diet."""

    def __init__(self, n_hashes: int = 64, n_bands: int = 16,
                 shingle_k: int = 5, seed: int = 42,
                 id_col: str = "doc_id", col: str = "text"):
        assert n_hashes % n_bands == 0
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.n_hashes, self.n_bands = n_hashes, n_bands
        self.rows_per_band = n_hashes // n_bands
        # per-row-in-band mixers for the vectorized band-hash combination
        self.bandmix = rng.integers(1, _MERSENNE, size=self.rows_per_band,
                                    dtype=np.uint64)
        # per-band offset folded into the bucket key (a rare cross-band
        # collision only MERGES two buckets, adding verified-away candidates)
        self.bandoff = rng.integers(1, _MERSENNE, size=n_bands,
                                    dtype=np.uint64)
        self.k, self.id_col, self.col = shingle_k, id_col, col

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, n_hashes) uint64 MinHash signatures for an Arrow
        string array — one shingle-hash pass, ``n_hashes`` flat affine +
        segment-min passes."""
        vals, bounds = _shingle_hash_lists(texts, self.k)
        n = len(bounds) - 1
        sm = vals % _MERSENNE
        starts = bounds[:-1]
        sigs = np.empty((self.n_hashes, n), dtype=np.uint64)
        for j in range(self.n_hashes):
            v = (self.a[j] * sm + self.b[j]) % _MERSENNE
            sigs[j] = np.minimum.reduceat(v, starts)
        return sigs.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        """One int64 bucket key per (doc, band): vectorized band-hash
        (mixed linear combination of the band's signature rows, uint64
        wraparound) + per-band offset — no per-band Python/digest loop."""
        n = len(batch)
        if n == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             self.id_col: pa.array([], type=pa.int64())})
        ids = np.asarray(pc.cast(batch.column(self.id_col), pa.int64())
                         .to_numpy(zero_copy_only=False), dtype=np.int64)
        sigs = self.signatures(batch.column(self.col))
        bands = sigs.reshape(n, self.n_bands, self.rows_per_band)
        bh = (bands * self.bandmix[None, None, :]).sum(axis=2)
        bh = bh + self.bandoff[None, :]
        return pa.table({
            "bucket": pa.array(bh.reshape(-1).view(np.int64)),
            self.id_col: pa.array(np.repeat(ids, self.n_bands)),
        })


def jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact Jaccard over distinct shingle STRINGS (identical to the SQL
    ``list_intersect`` oracle: same sets, same int/int IEEE division)."""
    sa, sb = _shingle_strings(a, k), _shingle_strings(b, k)
    return len(sa & sb) / len(sa | sb)


def _split_bands(tbl: pa.Table, num_parts: int):
    """One band-rows block → num_parts sub-tables by bucket hash."""
    b = tbl.column("bucket").to_numpy().view(np.uint64)
    part = ((b >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    s = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=num_parts)
    out, lo = [], 0
    for n in counts:
        out.append(s.slice(lo, n))
        lo += n
    return out


def _expand_pairs(id_col: str, max_bucket, pieces):
    """Vectorized within-bucket pair expansion over one bucket partition:
    sort by (bucket, id), segment, and emit every i<j pair per segment with
    index arithmetic — no per-group Python calls.

    ``max_bucket`` (optional) is the degenerate-hot-bucket escape hatch: a
    bucket with m members yields m(m-1)/2 pairs, so a pathological bucket
    (e.g. millions of empty docs sharing a band signature) is O(m²) memory
    in one task. When set, buckets are truncated to their first
    ``max_bucket`` members (id order — deterministic) and a warning names
    how many rows were dropped. Default None = exact semantics (the SQL
    oracle's contract)."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    pieces = [t for t in pieces if t.num_rows]
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64())})
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    b = t.column("bucket").to_numpy()
    ids = t.column(id_col).to_numpy()
    order = np.lexsort((ids, b))
    b, ids = b[order], ids[order]
    # drop duplicate (bucket, id) rows
    keep = np.ones(len(b), dtype=bool)
    keep[1:] = (b[1:] != b[:-1]) | (ids[1:] != ids[:-1])
    b, ids = b[keep], ids[keep]
    from .exchange import segment_pair_indices
    kept, i_row, j_row = segment_pair_indices(
        b, max_seg=max_bucket, warn_label="minhash pair expansion")
    if kept is not None:
        ids = ids[kept]
    if not len(i_row):
        return empty
    id_a, id_b = ids[i_row], ids[j_row]         # sorted → id_a < id_b
    # dedup pairs within the partition (same pair from multiple bands)
    uniq = np.unique(np.stack([id_a, id_b], axis=1), axis=0)
    return pa.table({"id_a": pa.array(uniq[:, 0], type=pa.int64()),
                     "id_b": pa.array(uniq[:, 1], type=pa.int64())})


def _unique_pairs_with_ids(pieces):
    """Pair-dedup partition (lexsort-unique on (id_a, id_b)) + the
    partition's needed-doc id set (for the co-partitioned verify):
    returns (pairs table, unique int64 id array)."""
    pairs = _unique_pairs_partition(pieces)
    if pairs.num_rows == 0 or "id_a" not in pairs.column_names:
        return (pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())}),
                pa.array([], type=pa.int64()))
    need = np.unique(np.concatenate([
        pairs.column("id_a").to_numpy(), pairs.column("id_b").to_numpy()]))
    return pairs, pa.array(need, type=pa.int64())


@functools.lru_cache(maxsize=8)
def _minhash_stage_cached(n_hashes, n_bands, shingle_k, id_col, col):
    """One MinHashStage per (params, worker process) — construction is
    trivial (a few small mixer arrays) but the cache keeps the fused
    per-block task allocation-free."""
    return MinHashStage(n_hashes=n_hashes, n_bands=n_bands,
                        shingle_k=shingle_k, id_col=id_col, col=col)


def _minhash_split_block(block, n_hashes, n_bands, shingle_k, id_col,
                         col, num_parts):
    """Fused task: minhash ONE corpus block and split its band rows by
    bucket — band rows never materialize as a separate Dataset, and no
    actor pool spins up (the stage is stateless-cheap after the batch
    vectorization; pool spin-up was a measured ~3-5s fixed term on every
    leg of the two-leg scaling run)."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    stage = _minhash_stage_cached(n_hashes, n_bands, shingle_k, id_col,
                                  col)
    return _split_bands(stage(block), num_parts)


def _band_partitions(ds, n_hashes, n_bands, shingle_k, id_col, col,
                     num_parts):
    """MinHash band rows hash-partitioned by bucket: returns
    ``per_part`` — num_parts lists of piece refs (never through the
    driver). One fused minhash+split task per input block."""
    from .exchange import fan_out_pieces, stream_block_refs
    return fan_out_pieces(_minhash_split_block, stream_block_refs(ds),
                          num_parts,
                          args=(n_hashes, n_bands, shingle_k, id_col,
                                col, num_parts))


def minhash_candidate_pairs(ds, n_hashes=64, n_bands=16, shingle_k=5,
                            id_col="doc_id", col="text",
                            num_parts: int = 16, max_bucket=None):
    """LSH candidate pairs Dataset (id_a < id_b; may contain cross-
    partition duplicates — callers dedup the small pair set).

    One exchange: band rows (fixed-width ``(bucket int64, id)``) are
    hash-partitioned by bucket in raw Ray tasks, and each partition expands
    its buckets' i<j pairs fully vectorized (``np`` index arithmetic).
    Singleton buckets cost nothing; no per-group Python, no second pass.
    ``max_bucket`` caps degenerate hot buckets (see :func:`_expand_pairs`).
    """
    import ray
    import ray.data as rd

    per_part = _band_partitions(ds, n_hashes, n_bands, shingle_k, id_col,
                                col, num_parts)
    expand = ray.remote(_expand_pairs)
    return rd.from_arrow_refs(
        [expand.remote(id_col, max_bucket, pieces) for pieces in per_part])


def _filter_by_id_fn(ids_ref, id_col: str, keep_cols):
    """Distributed candidate-doc fetch as a plain TASK function (no actor
    pool to spin up): the broadcast id set is a per-task zero-copy plasma
    get, the filter a vectorized ``pc.is_in``."""
    keep = list(keep_cols)

    def fn(batch: pa.Table) -> pa.Table:
        import ray
        ids = ids_ref if isinstance(ids_ref, pa.Array) else ray.get(ids_ref)
        return batch.select(keep).filter(
            pc.is_in(batch.column(id_col), value_set=ids))

    return fn


def _split_docs_by_need(block: pa.Table, id_refs, id_col: str, col: str):
    """Task: one candidate-doc block → num_parts pieces, one per verify
    partition (a doc replicates to every partition whose pairs reference
    it). One task per block — not num_parts × num_blocks — with one
    vectorized ``is_in`` per partition."""
    import ray
    if block.num_rows == 0 or col not in block.column_names:
        # Ray map_batches passes zero-row blocks through UNTRANSFORMED
        # (corpus schema, no hash column) — route empties anywhere; the
        # verify task drops zero-row pieces before reading columns
        return [block.slice(0, 0)] * len(id_refs)
    id_sets = ray.get(list(id_refs)) \
        if id_refs and isinstance(id_refs[0], ray.ObjectRef) else id_refs
    narrow = block.select([id_col, col])
    keys = block.column(id_col)
    return [narrow.filter(pc.is_in(keys, value_set=ids))
            for ids in id_sets]


#: fixed positional mixers for the verify-stage shingle hash (independent
#: of MinHashStage's banding mixers — banding only selects candidates, the
#: verify hash just needs to be deterministic and injective w.h.p.)
_VMIX_SEED = 0x5EED5EED
_vmix_cache: dict[int, np.ndarray] = {}


def _vmix(k: int) -> np.ndarray:
    m = _vmix_cache.get(k)
    if m is None:
        rng = np.random.Generator(np.random.PCG64(_VMIX_SEED))
        m = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
        _vmix_cache[k] = m
    return m


def _shingle_hash_lists(texts, k: int):
    """Per-row SORTED-DISTINCT 64-bit shingle hashes, fully vectorized:
    blake2b once per DISTINCT token (web vocabulary repeats heavily),
    then every shingle hash is one windowed linear combination of token
    hashes (uint64 wraparound) — no per-shingle digest or string join.
    Set conventions match :func:`_shingle_strings`: empty/null row →
    one sentinel hash, 0 < tokens < k → one hash of the whole sequence.
    Distinct shingle strings map to distinct hashes w.h.p. (collision
    flips a verify decision only if it also crosses the threshold).

    Returns ``(values uint64[], offsets int64[len(rows)+1])`` — values
    ascend in UINT64 order within each row (consumers must view the
    int64 storage back as uint64 before searchsorted)."""
    from .text import _token_lists
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) \
        else texts
    toks_arr = _token_lists(pc.fill_null(texts, ""))
    off = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(off)
    n = len(counts)
    flat = pc.list_flatten(toks_arr)
    if len(flat):
        enc = pc.dictionary_encode(flat)
        dvals = enc.dictionary.to_pylist()
        th_d = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(),
                "little") for s in dvals),
            dtype=np.uint64, count=len(dvals))
        th = th_d[np.asarray(enc.indices, dtype=np.int64)]
    else:
        th = np.empty(0, dtype=np.uint64)
    cmix = _vmix(k)
    h_parts, r_parts = [], []
    empty_rows = counts == 0
    if empty_rows.any():
        h_parts.append(np.zeros(int(empty_rows.sum()), dtype=np.uint64))
        r_parts.append(np.nonzero(empty_rows)[0].astype(np.int64))
    short = (counts > 0) & (counts < k)
    if short.any():
        row_of_flat = np.repeat(np.arange(n, dtype=np.int64), counts)
        pos = np.arange(len(th), dtype=np.int64) - off[row_of_flat]
        m = short[row_of_flat]
        acc = np.zeros(n, dtype=np.uint64)
        np.add.at(acc, row_of_flat[m], th[m] * cmix[pos[m]])
        idx = np.nonzero(short)[0]
        h_parts.append(acc[idx])
        r_parts.append(idx.astype(np.int64))
    if len(th) >= k:
        w = len(th) - k + 1
        win = np.lib.stride_tricks.sliding_window_view(th, k)
        sh = (win * cmix).sum(axis=1)  # uint64 wraparound mix
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        valid = row_of[:w] == row_of[k - 1:]  # window within one row
        if valid.any():
            vi = np.nonzero(valid)[0]
            h_parts.append(sh[vi])
            r_parts.append(row_of[vi])
    if not h_parts:
        return (np.empty(0, dtype=np.uint64),
                np.zeros(n + 1, dtype=np.int64))
    h = np.concatenate(h_parts)
    r = np.concatenate(r_parts)
    order = np.lexsort((h, r))
    hh, rr = h[order], r[order]
    first = np.ones(len(hh), dtype=bool)
    first[1:] = (rr[1:] != rr[:-1]) | (hh[1:] != hh[:-1])
    hh, rr = hh[first], rr[first]
    bounds = np.searchsorted(rr, np.arange(n + 1, dtype=np.int64))
    return hh, bounds


def _shingle_hash_table(b: pa.Table, id_col: str, col: str,
                        k: int) -> pa.Table:
    """(id, sh list<int64>) rows: each doc's sorted-distinct shingle-hash
    array — the byte-diet payload the verify partitions receive instead
    of raw text (comparable bytes, zero per-task shingling/encode)."""
    vals, bounds = _shingle_hash_lists(b.column(col), k)
    sh = pa.LargeListArray.from_arrays(
        pa.array(bounds, type=pa.int64()),
        pa.array(vals.view(np.int64), type=pa.int64()))
    return pa.table({id_col: pc.cast(b.column(id_col), pa.int64()),
                     "sh": sh})


def _hash_candidates_fn(ids_ref, id_col: str, col: str, k: int):
    """Task function: filter a corpus block to the globally-candidate
    docs, then shingle-hash them ONCE — downstream routing and verify
    never touch text again."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray
        ids = ids_ref if isinstance(ids_ref, pa.Array) else ray.get(ids_ref)
        b = batch.select([id_col, col]).filter(
            pc.is_in(batch.column(id_col), value_set=ids))
        return _shingle_hash_table(b, id_col, col, k)

    return fn


def _verify_partition(threshold: float, id_col: str, pairs: pa.Table,
                      doc_pieces) -> pa.Table:
    """Task: verify ONE bucket partition's candidate pairs against ONLY
    that partition's docs — per-task memory is bounded by the partition's
    bucket membership, never the global candidate set.

    Byte diet (the round-4 scaling fix): doc pieces carry PRECOMPUTED
    per-doc sorted-distinct shingle-hash arrays (``sh list<int64>``,
    built once per doc by :func:`_shingle_hash_table`) — not raw text.
    The per-task work is zero-copy list flatten + a searchsorted merge
    of two uint64 buffer views per pair, O(min log max) with near-zero
    allocation; no shingling, string joins, or dictionary encodes run
    here, so 32-way task concurrency no longer saturates node memory
    bandwidth re-tokenizing replicated text. Three rejected designs,
    all measured: per-partition re-shingle + dictionary_encode (the
    previous shape — 8→32 CPU efficiency 0.25, aggregate bandwidth
    bound), full inverted-index group expansion (~100 MB of index
    arrays per task), per-row Python frozensets (~500 MB of PyLongs
    per task)."""
    from .exchange import resolve_pieces
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    docs = resolve_pieces(doc_pieces)
    docs = [d for d in docs if d.num_rows]
    if pairs.num_rows == 0 or not docs:
        return empty
    t = pa.concat_tables([d.select([id_col, "sh"]) for d in docs])
    ids = t.column(id_col).to_numpy()
    sh = t.column("sh")
    sh = sh.combine_chunks() if isinstance(sh, pa.ChunkedArray) else sh
    cc = np.asarray(sh.values, dtype=np.int64).view(np.uint64)
    bounds = np.asarray(sh.offsets, dtype=np.int64)
    sizes = np.diff(bounds)
    # map pair ids → dense row indices
    sidx = np.argsort(ids, kind="stable")
    sorted_ids = ids[sidx]
    a_ids = pairs.column("id_a").to_numpy()
    b_ids = pairs.column("id_b").to_numpy()
    ra = sidx[np.searchsorted(sorted_ids, a_ids)]
    rb = sidx[np.searchsorted(sorted_ids, b_ids)]
    inter = np.empty(len(ra), dtype=np.int64)
    for i in range(len(ra)):
        va = cc[bounds[ra[i]]:bounds[ra[i] + 1]]
        vb = cc[bounds[rb[i]]:bounds[rb[i] + 1]]
        if len(va) > len(vb):
            va, vb = vb, va
        pos = np.searchsorted(vb, va)
        np.minimum(pos, len(vb) - 1, out=pos)
        inter[i] = np.count_nonzero(vb[pos] == va)
    union = sizes[ra] + sizes[rb] - inter
    j = inter / union
    keep = j >= threshold
    return pa.table({"id_a": pa.array(a_ids[keep], type=pa.int64()),
                     "id_b": pa.array(b_ids[keep], type=pa.int64()),
                     "jaccard": pa.array(j[keep], type=pa.float64())})


def _unique_pairs_partition(pieces) -> pa.Table:
    """One pair-dedup partition: lexsort-unique on (id_a, id_b), carrying
    any extra columns (duplicates of a pair are identical rows)."""
    from .exchange import resolve_all_pieces
    pieces = resolve_all_pieces(pieces)
    nonempty = [p for p in pieces if p.num_rows]
    if not nonempty:
        return pieces[0] if pieces else pa.table({})
    t = pa.concat_tables(nonempty)
    a = t.column("id_a").to_numpy()
    b = t.column("id_b").to_numpy()
    order = np.lexsort((b, a))
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (a[order][1:] != a[order][:-1]) \
        | (b[order][1:] != b[order][:-1])
    return t.take(pa.array(order[keep]))


def unique_pairs(refs, num_parts: int):
    """Pair refs/Dataset → globally (id_a, id_b)-deduplicated Dataset via
    ONE narrow hash exchange keyed on id_a (all duplicates of a pair
    share it). The distributed replacement for the former driver-side
    ``to_pandas().drop_duplicates()`` — the verified pair set on a
    dup-heavy crawl is O(dup docs × replicas) and must never be required
    to fit the driver; consumers stream it (``write_parquet``) or
    collapse it explicitly in small-data wrappers."""
    import ray
    import ray.data as rd
    from .exchange import fan_out_pieces, split_by_key
    if not isinstance(refs, list):
        refs = refs.to_arrow_refs()
    per_part = fan_out_pieces(split_by_key, refs, num_parts,
                              args=("id_a", num_parts))
    work = ray.remote(_unique_pairs_partition)
    return rd.from_arrow_refs([work.remote(p) for p in per_part])


def _auto_parts(num_parts) -> int:
    """None → 2×cluster CPUs (min 16), mirroring hash_join's bucket
    sizing, so partition count scales with the cluster."""
    if num_parts is not None:
        return num_parts
    try:
        import ray
        return max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 16


def minhash_dedup(ds, threshold: float = 0.8, n_hashes=64, n_bands=16,
                  shingle_k=5, id_col="doc_id", col="text",
                  num_parts=None, max_bucket=None):
    """Near-dup pairs verified by exact shingle Jaccard ≥ threshold.

    Returns a ``ray.data.Dataset`` of (id_a, id_b, jaccard) — the
    verified pair set NEVER passes through the driver, so a dup-heavy
    crawl whose pair set exceeds driver memory streams straight to
    ``write_parquet`` or the clustering stage.

    Shape: band rows hash-partition by LSH bucket and expand to candidate
    pairs per partition (vectorized index arithmetic); the candidates
    then DEDUPLICATE through one narrow id_a-keyed exchange BEFORE any
    document moves, so each pair is verified exactly once — without this,
    a pair whose bands land in k partitions is verified k times (≤
    n_bands) and its documents ship to all k, which measured ~10x
    redundant verify work on a replica-heavy corpus. Each pair partition
    emits its needed-doc id set; the corpus filter pulls only
    globally-candidate docs into plasma, and a per-partition ``is_in``
    routes each partition ONLY its own docs — no verify task ever
    materializes the global candidate-shingle dict. The driver holds
    integer id arrays only.

    With ``n_bands == n_hashes`` (one row per band) LSH recall at Jaccard
    ``j`` is ``1-(1-j)^n_hashes`` — for n_hashes=128, threshold 0.5 the
    miss probability is ~3e-39, i.e. the output deterministically equals
    the exact-Jaccard pair set (how the SQL oracle gates this op).
    """
    import ray
    import ray.data as rd
    from .exchange import fan_out_pieces, split_by_key

    num_parts = _auto_parts(num_parts)
    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64())}))
    per_part = _band_partitions(ds, n_hashes, n_bands, shingle_k, id_col,
                                col, num_parts)
    expand = ray.remote(_expand_pairs)
    cand_refs = [expand.remote(id_col, max_bucket, pieces)
                 for pieces in per_part]
    # candidate-pair dedup exchange (id_a-keyed): all copies of a pair
    # share id_a, so each lands in exactly one verify partition. Half the
    # band-partition count: the fan-out piece-ref count is
    # O(band_parts × pair_parts) and pairs are ~100x narrower than band
    # rows, while verify parallelism only needs ~CPU-many partitions
    np2 = max(8, num_parts // 2)
    pair2 = fan_out_pieces(split_by_key, cand_refs, np2,
                           args=("id_a", np2))
    uniq = ray.remote(num_returns=2)(_unique_pairs_with_ids)
    pair_refs, id_refs = [], []
    for pieces in pair2:
        pr, ir = uniq.remote(pieces)
        pair_refs.append(pr)
        id_refs.append(ir)
    # global candidate-id union: int64 arrays only — tiny vs the corpus
    id_arrays = ray.get(id_refs)
    nonempty = [np.asarray(a) for a in id_arrays if len(a)]
    if not nonempty:
        return empty
    cand = np.unique(np.concatenate(nonempty))
    ids_ref = ray.put(pa.array(cand, type=pa.int64()))
    # candidate fetch + shingle-hash ONCE per doc: the verify exchange
    # routes (id, sorted-distinct hash array) rows, never text — the
    # replicated re-shingle work that bandwidth-bound the old shape is
    # gone (one hash pass per doc regardless of replica count)
    cand_docs = ds.map_batches(
        _hash_candidates_fn(ids_ref, id_col, col, shingle_k),
        batch_format="pyarrow")
    from .exchange import stream_block_refs
    block_refs = stream_block_refs(cand_docs)
    per_part_docs = fan_out_pieces(_split_docs_by_need, block_refs,
                                   np2, args=(id_refs, id_col, "sh"))
    verify = ray.remote(_verify_partition)
    out_refs = []
    for p in range(np2):
        if len(id_arrays[p]) == 0:
            continue
        out_refs.append(verify.remote(threshold, id_col,
                                      pair_refs[p], per_part_docs[p]))
    if not out_refs:
        return empty
    return rd.from_arrow_refs(out_refs)  # pairs already globally unique


def _lp_split(tbl: pa.Table, key: str, num_parts: int):
    """One block → num_parts sub-tables by id hash (ids are int64)."""
    if tbl.num_rows == 0 or key not in tbl.column_names:
        # Ray map_batches passes zero-row blocks through UNTRANSFORMED
        # (input schema) — route them anywhere; consumers drop empties
        return [tbl.slice(0, 0)] * num_parts
    h = np.asarray(tbl.column(key).to_numpy(), dtype=np.uint64)
    part = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)) \
        .astype(np.int64) % num_parts
    order = np.argsort(part, kind="stable")
    s = tbl.take(pa.array(order))
    counts = np.bincount(part, minlength=num_parts)
    out, lo = [], 0
    for n in counts:
        out.append(s.slice(lo, n))
        lo += n
    return out


def _lp_edge_partition(pieces) -> pa.Table:
    """Concat one partition's symmetrized edges; attach initial labels
    (label(id) = id for every src in the partition). Empty pieces are
    dropped — they may carry the UNTRANSFORMED upstream schema (Ray
    map_batches zero-row pass-through)."""
    from .exchange import resolve_pieces
    pieces = resolve_pieces(pieces)
    if not pieces:
        return pa.table({"src": pa.array([], type=pa.int64()),
                         "dst": pa.array([], type=pa.int64())})
    return pa.concat_tables(pieces).combine_chunks()


def _lp_propagate(edges: pa.Table, labels: pa.Table,
                  num_parts: int):
    """One BSP round, sender side: label[src] flows along each edge;
    messages are pre-aggregated (min per dst) before the exchange and
    split by dst hash — returns num_parts message pieces."""
    if edges.num_rows == 0 or labels.num_rows == 0:
        empty = pa.table({"id": pa.array([], type=pa.int64()),
                          "label": pa.array([], type=pa.int64())})
        return [empty] * num_parts
    src = edges.column("src").combine_chunks() \
        if isinstance(edges.column("src"), pa.ChunkedArray) \
        else edges.column("src")
    idx = pc.index_in(src, value_set=labels.column("id").combine_chunks())
    lab = labels.column("label").combine_chunks().take(idx).to_numpy()
    dst = edges.column("dst").to_numpy()
    # pre-aggregate: min label per dst (vectorized lexsort + boundary)
    order = np.lexsort((lab, dst))
    d, l = dst[order], lab[order]
    first = np.ones(len(d), dtype=bool)
    first[1:] = d[1:] != d[:-1]
    msgs = pa.table({"id": pa.array(d[first], type=pa.int64()),
                     "label": pa.array(l[first], type=pa.int64())})
    return _lp_split(msgs, "id", num_parts)


def _lp_update(labels: pa.Table, msg_pieces):
    """One BSP round, receiver side: label(id) = min(old, incoming).
    Returns (new labels table, changed count)."""
    from .exchange import resolve_all_pieces
    pieces = [t for t in resolve_all_pieces(msg_pieces) if t.num_rows]
    if not pieces or labels.num_rows == 0:
        return labels, 0
    m = pa.concat_tables(pieces)
    ids = labels.column("id").combine_chunks()
    idx = pc.index_in(m.column("id"), value_set=ids)
    old = labels.column("label").to_numpy().copy()
    pos = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    np.minimum.at(old, pos, m.column("label").to_numpy())
    changed = int((old < labels.column("label").to_numpy()).sum())
    return pa.table({"id": ids, "label": pa.array(old, type=pa.int64())}), \
        changed


def label_propagation_clusters(pairs, num_parts: int = 8,
                               max_rounds: int = 64):
    """Distributed connected components by min-label propagation (BSP):
    symmetrized edges hash-partition by src ONCE; each round every edge
    partition sends ``min(label[src])`` per dst (pre-aggregated, narrow
    int64 rows) to the dst's label partition, which takes the element-wise
    min — fixpoint when no label changes. Rounds = component diameter;
    per-task memory = one partition's edges + labels, never the graph.

    ``pairs``: a pandas DataFrame or Ray Dataset with id_a/id_b columns.
    Returns a Dataset of (doc_id, cluster_id = min id of the component)
    for every node — label tables stay in the object store; the driver
    sees only per-round changed-counts.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "cluster_id": pa.array([], type=pa.int64())}))
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return empty
        pairs = rd.from_pandas(pairs[["id_a", "id_b"]])
    sym = pairs.map_batches(
        lambda b: pa.table({
            "src": pa.concat_arrays([
                b.column("id_a").combine_chunks().cast(pa.int64()),
                b.column("id_b").combine_chunks().cast(pa.int64())]),
            "dst": pa.concat_arrays([
                b.column("id_b").combine_chunks().cast(pa.int64()),
                b.column("id_a").combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow")
    from .exchange import fan_out_pieces, stream_block_refs
    per_part = fan_out_pieces(_lp_split, stream_block_refs(sym),
                              num_parts, args=("src", num_parts))
    edge_task = ray.remote(_lp_edge_partition)
    edge_refs = [edge_task.remote(pieces) for pieces in per_part]

    def _init_labels(edges: pa.Table) -> pa.Table:
        ids = np.unique(edges.column("src").to_numpy()) \
            if edges.num_rows else np.array([], dtype=np.int64)
        return pa.table({"id": pa.array(ids, type=pa.int64()),
                         "label": pa.array(ids, type=pa.int64())})

    init_task = ray.remote(_init_labels)
    label_refs = [init_task.remote(e) for e in edge_refs]
    prop = ray.remote(num_returns=num_parts)(_lp_propagate) \
        if num_parts > 1 else ray.remote(
            lambda e, l, n: _lp_propagate(e, l, n)[0])
    upd = ray.remote(num_returns=2)(_lp_update)
    for _ in range(max_rounds):
        msg_pieces = [[] for _ in range(num_parts)]
        for p in range(num_parts):
            out = prop.remote(edge_refs[p], label_refs[p], num_parts)
            if num_parts == 1:
                out = [out]
            for q, piece in enumerate(out):
                msg_pieces[q].append(piece)
        changed_refs = []
        new_labels = []
        for q in range(num_parts):
            lref, cref = upd.remote(label_refs[q], msg_pieces[q])
            new_labels.append(lref)
            changed_refs.append(cref)
        label_refs = new_labels
        if sum(ray.get(changed_refs)) == 0:
            break
    # rename via a plain task, NOT map_batches: Ray skips map_batches on
    # zero-row blocks (they come out zero-COLUMN), so an all-empty pair
    # set would lose the doc_id/cluster_id schema — the task always runs
    ren = ray.remote(lambda t: pa.table({
        "doc_id": pc.cast(t.column("id"), pa.int64()),
        "cluster_id": pc.cast(t.column("label"), pa.int64())}))
    return rd.from_arrow_refs([ren.remote(l) for l in label_refs])


def minhash_clusters(ds, threshold: float = 0.8, method: str = "auto",
                     **kw):
    """Near-dup clusters: verified pairs → connected components →
    (doc_id, cluster_id = min doc_id of component), survivors =
    cluster representatives.

    ``method``: 'unionfind' = driver-side union-find over the verified
    pair set (bounded by true near-dup volume — fastest when pairs fit
    the driver; the ONLY path that collects pairs to the driver, by
    contract); 'labelprop' = distributed min-label propagation
    (:func:`label_propagation_clusters` — the 10^12-row path where even
    verified pairs exceed driver memory); 'auto' picks union-find below
    1M pairs. Both produce identical output (min-id components), both
    return a Dataset."""
    return clusters_from_pairs(minhash_dedup(ds, threshold=threshold,
                                             **kw), method=method)


def clusters_from_pairs(pairs_ds, method: str = "auto"):
    """Connected components of an (id_a, id_b) pair Dataset →
    (doc_id, cluster_id = min id of component). The reusable back half
    of :func:`minhash_clusters` for callers that already hold the pair
    set (so the pair pipeline runs once, not once per consumer)."""
    import pandas as pd
    import ray.data as rd
    if method == "labelprop" \
            or (method == "auto" and pairs_ds.count() > 1_000_000):
        return label_propagation_clusters(pairs_ds)
    pairs = pairs_ds.to_pandas()  # small-pairs path, documented above
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for t in pairs.itertuples(index=False):
        a, b = t.id_a, t.id_b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for p in pairs.itertuples(index=False)
                      for x in (p.id_a, p.id_b)})
    return rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(members, dtype="int64"),
        "cluster_id": pd.Series([find(m) for m in members],
                                dtype="int64"),
    }))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

#: process-level md5-60 token-hash memo: Ray reuses worker processes
#: across tasks, so a module dict gives the cross-batch reuse the old
#: per-actor cache gave — without an actor pool to spin up per call
_simhash_tok_cache: dict[str, int] = {}


class SimHashStage:
    """60-bit SimHash per document over token features (weights = term
    frequency). Token hash = first 15 hex chars of md5 — 60 bits so the
    value is a positive BIGINT and the whole computation is reproducible
    in SQL (the ``simhash`` oracle).

    Batch-vectorized: md5 once per DISTINCT token (module-level memo),
    the per-doc ±weight bit accumulation is one lexsort + slabbed
    scatter-add over (row, token, weight) triples — no per-doc Python
    loop, no Counter."""

    BITS = 60

    def __init__(self, id_col: str = "doc_id", col: str = "text"):
        self.id_col, self.col = id_col, col
        self._bit = np.array([1 << i for i in range(self.BITS)],
                             dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Single-doc reference path (tests)."""
        t = pa.table({self.id_col: pa.array([0], type=pa.int64()),
                      self.col: pa.array([text], type=pa.string())})
        return int(self(t).column("simhash")[0].as_py())

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashutil import cache_put
        from .text import _token_lists
        col = batch.column(self.col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        toks_arr = _token_lists(pc.fill_null(col, ""))
        off = np.asarray(toks_arr.offsets, dtype=np.int64)
        counts = np.diff(off)
        n = len(batch)
        flat = pc.list_flatten(toks_arr)
        acc = np.zeros((n, self.BITS), dtype=np.int64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            uniq = enc.dictionary.to_pylist()
            cache = _simhash_tok_cache
            hu = np.fromiter(
                (cache.get(t) if t in cache else cache_put(
                    cache, t,
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16))
                 for t in uniq), dtype=np.uint64, count=len(uniq))
            idx = np.asarray(enc.indices, dtype=np.int64)
            row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            # distinct (row, token) with multiplicity = term frequency
            order = np.lexsort((idx, row_of))
            rr, cc = row_of[order], idx[order]
            first = np.ones(len(rr), dtype=bool)
            first[1:] = (rr[1:] != rr[:-1]) | (cc[1:] != cc[:-1])
            seg = np.cumsum(first) - 1
            w = np.bincount(seg).astype(np.int64)
            rows_u, toks_u = rr[first], cc[first]
            # ±1 bit matrix per distinct token (int8 keeps it small)
            pm = np.where(
                (hu[:, None] & self._bit[None, :]) != 0, 1, -1) \
                .astype(np.int8)
            # slabbed scatter-add bounds the (pairs x 60) int64 temp
            slab = 1 << 18
            for lo in range(0, len(rows_u), slab):
                hi = lo + slab
                np.add.at(acc, rows_u[lo:hi],
                          w[lo:hi, None]
                          * pm[toks_u[lo:hi]].astype(np.int64))
        arr = ((acc > 0).astype(np.uint64)
               * self._bit[None, :]).sum(axis=1).astype(np.int64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(arr),
            # bucket on the high 16 of the 60 bits: near-dups (Hamming
            # ≤ ~3 in the high bits) collide; verify inside buckets
            "simhash_bucket": pa.array(arr >> 44),
        })


def simhash_table(ds, id_col="doc_id", col="text"):
    def simhash_fn(b: pa.Table) -> pa.Table:
        return SimHashStage(id_col=id_col, col=col)(b)

    return ds.map_batches(simhash_fn, batch_format="pyarrow")


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


class _SaltStage:
    """Sub-bucket fan-out for oversized centroid buckets. A centroid with
    S sub-buckets (S = ceil(count / max_bucket)) replicates each vector
    into its S sub-bucket-PAIR groups — one within group (s, s) and S-1
    cross groups (min(s,s'), max(s,s')) — so pair generation touches at
    most ~2·max_bucket vectors per task while still emitting EVERY
    within-centroid pair exactly once (a pair with subs (sa, sb) exists
    only in group (min, max)). S=1 centroids pass through untouched."""

    _MIX = np.uint64(0x9E3779B97F4A7C15)  # deterministic id → sub-bucket

    def __init__(self, s_map_ref, id_col: str):
        import ray
        self.s_map = s_map_ref if isinstance(s_map_ref, dict) \
            else ray.get(s_map_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cent = batch.column("__centroid").to_numpy().astype(np.int64)
        n = len(batch)
        if not self.s_map:  # no hot buckets: one within group per row
            out = batch.append_column(
                "__gk", pa.array(cent << 32, type=pa.int64()))
            out = out.append_column(
                "__side", pa.array(np.zeros(n, np.int8)))
            return out.append_column(
                "__cross", pa.array(np.zeros(n, np.int8)))
        ids = batch.column(self.id_col).to_numpy().astype(np.uint64)
        s_of = np.array([self.s_map.get(int(c), 1) for c in cent],
                        dtype=np.int64)
        sub = ((ids * self._MIX) >> np.uint64(17)).astype(np.int64) % s_of
        # vectorized fan-out: row i emits S_i rows, one per sub-bucket p
        total = int(s_of.sum())
        row_for = np.repeat(np.arange(n, dtype=np.int64), s_of)
        p_idx = np.arange(total, dtype=np.int64) \
            - np.repeat(np.cumsum(s_of) - s_of, s_of)
        s_rep, S_rep = sub[row_for], s_of[row_for]
        lo = np.minimum(p_idx, s_rep)
        hi = np.maximum(p_idx, s_rep)
        k = lo * S_rep - lo * (lo - 1) // 2 + (hi - lo)
        out = batch.take(pa.array(row_for))
        out = out.append_column(
            "__gk", pa.array((cent[row_for] << 32) + k, type=pa.int64()))
        out = out.append_column(
            "__side", pa.array((p_idx < s_rep).astype(np.int8)))
        return out.append_column(
            "__cross", pa.array((p_idx != s_rep).astype(np.int8)))


def _group_cosine_pairs(threshold: float, id_col: str, col: str, g):
    """Cosine ≥ threshold pairs of one sub-bucket-pair group: within-group
    i<j pairs for a within group; side0 × side1 only for a cross group
    (within-side pairs belong to the two within groups)."""
    import pandas as pd
    from .similarity import _normalize
    ids = g[id_col].to_numpy()
    X = _normalize(np.asarray(list(g[col]), dtype=np.float64))
    if g["__cross"].iloc[0]:
        m0 = (g["__side"].to_numpy() == 0)
        ids0, ids1 = ids[m0], ids[~m0]
        if not len(ids0) or not len(ids1):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        sims = X[m0] @ X[~m0].T
        ai, bi = np.nonzero(sims >= threshold)
        ia, ib = ids0[ai], ids1[bi]
    else:
        sims = X @ X.T
        ai, bi = np.nonzero(sims >= threshold)
        keep = ids[ai] < ids[bi]
        ia, ib = ids[ai[keep]], ids[bi[keep]]
    return pd.DataFrame({
        "id_a": pd.Series(np.minimum(ia, ib), dtype="int64"),
        "id_b": pd.Series(np.maximum(ia, ib), dtype="int64")})


def embedding_dups(ds, threshold: float = 0.95, id_col: str = "vec_id",
                   col: str = "embedding", n_centroids: int = 16,
                   n_assign: int = 3, max_bucket: int = 4096):
    """Near-dup id pairs by cosine ≥ threshold, bucketed by coarse k-means
    centroid (trained on a driver-side sample, broadcast once): each
    vector is multi-assigned to its ``n_assign`` nearest centroids, pairs
    are generated ONLY within a centroid bucket (``groupby`` shuffles
    vectors, not the O(n²) pair space), and duplicates from
    multi-assignment are dropped at the end.

    Hot buckets are SALTED: a centroid owning more than ``max_bucket``
    vectors is split into S = ceil(count / max_bucket) sub-buckets by a
    deterministic id hash, and each vector fans out to its S sub-bucket-
    pair groups (one within + S-1 cross), so per-task pair work is
    bounded by ~(2·max_bucket)² regardless of embedding skew while the
    pair set stays EXACTLY the within-centroid pair set (each unordered
    pair lives in exactly one sub-bucket-pair group). Replication factor
    for a hot bucket is S — linear in its oversize, quadratic never.

    Returns a Dataset of (id_a, id_b), globally deduplicated by one
    narrow id_a-keyed exchange (multi-assignment duplicates) — pairs
    never pass through the driver."""
    import ray
    from .similarity import train_centroids, _normalize

    C = train_centroids(ds, n_centroids=n_centroids, col=col,
                        id_col=id_col)
    cref = ray.put(C)
    def massign_fn(b: pa.Table) -> pa.Table:
        return _MultiAssignStage(cref, id_col, col, n_assign)(b)

    assigned = ds.map_batches(massign_fn, batch_format="pyarrow")
    # bucket-size census: a second streaming pass over the (deterministic)
    # assignment — cheaper at scale than materializing n_assign × corpus
    # vectors in the object store just to count them
    counts = assigned.select_columns(["__centroid"]) \
        .groupby("__centroid").count().to_pandas()
    cnt_col = [c for c in counts.columns if c != "__centroid"][0]
    s_map = {int(c): int(-(-n // max_bucket))
             for c, n in zip(counts["__centroid"], counts[cnt_col])
             if n > max_bucket}
    s_ref = ray.put(s_map)

    def salt_fn(b: pa.Table) -> pa.Table:
        return _SaltStage(s_ref, id_col)(b)

    salted = assigned.map_batches(salt_fn, batch_format="pyarrow")

    import functools
    pairs = salted.groupby("__gk").map_groups(
        functools.partial(_group_cosine_pairs, threshold, id_col, col),
        batch_format="pandas")
    return unique_pairs(pairs, _auto_parts(None) // 4)


def _simhash_bucket_pairs(max_hamming: int, pieces):
    """Vectorized within-bucket Hamming pair scan for one partition."""
    from .exchange import resolve_pieces
    pieces = resolve_pieces(pieces)
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "hamming": pa.array([], type=pa.int64())})
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    b = t.column("simhash_bucket").to_numpy()
    h = t.column("simhash").to_numpy().astype(np.uint64)
    ids = t.column("doc_id").to_numpy()
    order = np.lexsort((ids, b))
    b, h, ids = b[order], h[order], ids[order]
    from .exchange import segment_pair_indices
    _, i_row, j_row = segment_pair_indices(b)
    if not len(i_row):
        return empty
    x = h[i_row] ^ h[j_row]
    # vectorized popcount via byte-view + lookup table
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
    ham = lut[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
    keep = ham <= max_hamming
    ia, ib = ids[i_row][keep], ids[j_row][keep]
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    return pa.table({"id_a": pa.array(lo, type=pa.int64()),
                     "id_b": pa.array(hi, type=pa.int64()),
                     "hamming": pa.array(ham[keep], type=pa.int64())})


def simhash_dups(ds, max_hamming: int = 8, id_col: str = "doc_id",
                 col: str = "text", num_parts: int = 16,
                 rotations: int = 1):
    """SimHash near-dup pairs WITHIN a simhash bucket (the high 16 of the
    60 bits): pairs whose Hamming distance ≤ ``max_hamming``. With
    ``rotations=1`` bucketing is part of the op's semantics (the SQL
    oracle applies the same equal-bucket constraint). ``rotations > 1``
    is the recall path: the 60-bit hash is bit-rotated ``rotations``
    times and re-bucketed per rotation, so a near-dup pair is caught
    whenever ANY rotation puts its (few) differing bits outside the
    16-bit bucket window; output may then contain the same pair from
    several rotations — dedup downstream (pairs are small).

    One hash exchange of (bucket, simhash, id) rows; all pair scans are
    vectorized (XOR + byte-LUT popcount)."""
    from .exchange import hash_exchange
    sims = simhash_table(ds, id_col=id_col, col=col)
    if rotations > 1:
        step = 60 // rotations

        def rebucket(b: pa.Table) -> pa.Table:
            h = b.column("simhash").to_numpy().astype(np.uint64)
            mask60 = np.uint64((1 << 60) - 1)
            tabs = []
            for r in range(rotations):
                s = np.uint64(r * step)
                rot = ((h << s) | (h >> np.uint64(60) - s)) & mask60 \
                    if r else h
                tabs.append(pa.table({
                    id_col: b.column(id_col),
                    "simhash": b.column("simhash"),
                    # rotation folded into the bucket key so different
                    # rotations never share a bucket
                    "simhash_bucket": pa.array(
                        ((rot >> np.uint64(44)).astype(np.int64)
                         + (1 << 20) * r)),
                }))
            return pa.concat_tables(tabs)

        sims = sims.map_batches(rebucket, batch_format="pyarrow")
    return hash_exchange(sims, "simhash_bucket", _simhash_bucket_pairs,
                         num_parts, fn_args=(max_hamming,))


def simhash_clusters(ds, max_hamming: int = 8, id_col: str = "doc_id",
                     col: str = "text", num_parts: int = 16,
                     rotations: int = 1):
    """Near-dup clusters from SimHash Hamming pairs: the pair set of
    :func:`simhash_dups` fed through distributed min-label propagation
    (:func:`label_propagation_clusters`). Returns a Dataset of
    (doc_id, cluster_id = min doc_id of the connected component) for
    every document that has at least one Hamming-ball neighbour.

    With ``rotations > 1`` the same pair can be emitted by several
    rotations; propagation is idempotent over duplicate edges, so no
    pair dedup pass is needed — the pairs stay in the object store
    end-to-end."""
    pairs = simhash_dups(ds, max_hamming=max_hamming, id_col=id_col,
                         col=col, num_parts=num_parts,
                         rotations=rotations)
    return label_propagation_clusters(pairs)


def cluster_representatives(ds, threshold: float = 0.8,
                            id_col: str = "doc_id", col: str = "text",
                            **kw):
    """Canonical document per near-dup cluster: MinHash clusters
    (:func:`minhash_clusters`) joined back to the corpus, keeping the
    HIGHEST-QUALITY member of each cluster (most whitespace tokens; ties
    break to the smallest doc_id) instead of the arbitrary min-id member
    a plain keep-first dedup retains.

    Shape at scale: the cluster table is O(near-dup docs), the token
    counts are a narrow per-batch projection of the corpus, the join is
    the partitioned :func:`~log2seq_ray.ops.join.hash_join`, and the
    per-cluster argmax is the pruned-exchange
    :func:`~log2seq_ray.ops.asof.top_k_per_group` — no stage holds a
    whole cluster's texts, only (id, count) rows. Returns a Dataset of
    (cluster_id, doc_id, n_tokens) — one row per cluster."""
    from .asof import top_k_per_group
    from .join import hash_join

    clusters = minhash_clusters(ds, threshold=threshold, **kw)

    def _tok_counts(b: pa.Table) -> pa.Table:
        from .text import _token_lists
        toks = _token_lists(b.column(col))
        return pa.table({id_col: b.column(id_col),
                         "n_tokens": pc.cast(pc.list_value_length(toks),
                                             pa.int64())})

    counts = ds.map_batches(_tok_counts, batch_format="pyarrow")
    joined = hash_join(clusters, counts, id_col, id_col,
                       left_cols=[id_col, "cluster_id"],
                       right_cols=[id_col, "n_tokens"])
    best = top_k_per_group(joined, "cluster_id", "n_tokens", k=1,
                           descending=True, tiebreak=id_col)
    return best.drop_columns(["rank"]) \
        .select_columns(["cluster_id", id_col, "n_tokens"])


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)],
                      dtype=np.uint8)


def _hamming_any(q: np.ndarray, w: np.ndarray, max_hamming: int,
                 chunk: int = 4096) -> np.ndarray:
    """For each query hash, does ANY witness hash lie within
    ``max_hamming``? Chunked XOR + byte-LUT popcount; query rows that
    find a witness are pruned from later witness chunks."""
    hit = np.zeros(len(q), dtype=bool)
    alive = np.arange(len(q))
    for j0 in range(0, len(w), chunk):
        if not len(alive):
            break
        x = q[alive, None] ^ w[None, j0:j0 + chunk]
        d = _POPCOUNT8[x.view(np.uint8).reshape(len(alive), -1, 8)] \
            .sum(axis=2, dtype=np.int64)
        found = (d <= max_hamming).any(axis=1)
        hit[alive[found]] = True
        alive = alive[~found]
    return hit


def _simhash_victims_partition(max_hamming: int, id_col: str,
                               pieces_new, pieces_old, chunk: int = 1024):
    """One bucket-hash partition of the SimHash ingest: a new doc is a
    victim iff some OLD (committed) row of its bucket, or some LOWER-ID
    new row of its bucket (victim or not — non-cascading, the same rule
    the shingle ingest uses), lies within ``max_hamming``. All Hamming
    tests are chunked XOR+LUT kernels with victim-row pruning."""
    from .exchange import (concat_typed, resolve_mixed_pieces,
                           resolve_pieces)
    empty = pa.table({id_col: pa.array([], type=pa.int64())})
    new = concat_typed(resolve_pieces(pieces_new), id_col, "simhash",
                       "simhash_bucket")
    if new is None or new.num_rows == 0:
        return empty
    # old pieces may mix split-task refs with BUCKET-ALIGNED parquet
    # paths from a compacted index (read here, in the partition task)
    old = concat_typed(resolve_mixed_pieces(pieces_old), id_col,
                       "simhash", "simhash_bucket")
    b_n = new.column("simhash_bucket").to_numpy()
    h_n = new.column("simhash").to_numpy().astype(np.uint64)
    id_n = new.column(id_col).to_numpy()
    order = np.lexsort((id_n, b_n))
    b_n, h_n, id_n = b_n[order], h_n[order], id_n[order]
    if old is not None and old.num_rows:
        b_o = old.column("simhash_bucket").to_numpy()
        h_o = old.column("simhash").to_numpy().astype(np.uint64)
        o_order = np.argsort(b_o, kind="stable")
        b_o, h_o = b_o[o_order], h_o[o_order]
    else:
        b_o = np.array([], dtype=b_n.dtype)
        h_o = np.array([], dtype=np.uint64)
    victim = np.zeros(len(b_n), dtype=bool)
    seg_starts = np.flatnonzero(
        np.concatenate([[True], b_n[1:] != b_n[:-1]]))
    seg_ends = np.append(seg_starts[1:], len(b_n))
    CH = chunk
    for s, e in zip(seg_starts, seg_ends):
        o_lo, o_hi = np.searchsorted(b_o, [b_n[s], b_n[s]], "left")[0], \
            np.searchsorted(b_o, b_n[s], "right")
        w_old = h_o[o_lo:o_hi]
        for i0 in range(s, e, CH):
            i1 = min(i0 + CH, e)
            q_idx = np.arange(i0, i1)
            if len(w_old):
                hit = _hamming_any(h_n[q_idx], w_old, max_hamming)
                victim[q_idx[hit]] = True
                q_idx = q_idx[~hit]
            if len(q_idx) and i0 > s:
                # vs every lower-index new row of earlier chunks
                hit = _hamming_any(h_n[q_idx], h_n[s:i0], max_hamming)
                victim[q_idx[hit]] = True
                q_idx = q_idx[~hit]
            if len(q_idx):
                # within-chunk triangle: witness index < query index
                x = h_n[q_idx, None] ^ h_n[None, i0:i1]
                d = _POPCOUNT8[x.view(np.uint8)
                               .reshape(len(q_idx), -1, 8)] \
                    .sum(axis=2, dtype=np.int64)
                valid = np.arange(i0, i1)[None, :] < q_idx[:, None]
                hit = ((d <= max_hamming) & valid).any(axis=1)
                victim[q_idx[hit]] = True
    return pa.table({id_col: pa.array(id_n[victim], type=pa.int64())})


def ingest_simhash_run(ds, state_dir: str, max_hamming: int = 8,
                       id_col: str = "doc_id", col: str = "text",
                       num_parts=None):
    """Incremental cross-RUN SimHash ingest — the fourth member of the
    ingest family (exact hash, shingle Jaccard, embedding cosine, and
    now SimHash Hamming): a new doc is DROPPED iff its 60-bit SimHash
    lies within ``max_hamming`` of ANY committed survivor sharing its
    16-bit bucket, or of ANY lower-id doc of this run in the bucket
    (non-cascading, like :func:`~log2seq_ray.ops.curation.ingest_neardup_run`).
    Survivors commit their (id, simhash, bucket) rows — 24 bytes/doc,
    never text — to the persistent index under ``state_dir`` via
    write-to-temp + ``rename``. Doc ids must be unique across runs.
    Returns the surviving (id, simhash, simhash_bucket) Dataset.

    100 TB shape: ONE bucket-hash exchange co-partitions tonight's run
    with the index rows; each partition scans its buckets with chunked
    XOR+popcount slabs (victims pruned from later slabs), so per-task
    memory is O(chunk × bucket-chunk), never O(bucket²); the old-old
    bulk of a mature index is never compared."""
    import os
    import uuid

    import ray
    import ray.data as rd

    from .exchange import fan_out_pieces, split_by_key
    from .join import hash_join

    from ..state.runs import live_runs, next_run_dir, run_files

    num_parts = _auto_parts(num_parts)
    os.makedirs(state_dir, exist_ok=True)
    runs, manifests = live_runs(state_dir)

    sims_new = simhash_table(ds, id_col=id_col, col=col).materialize()
    # consumed twice: the victim scan and the survivor commit

    new_parts = fan_out_pieces(split_by_key, sims_new.to_arrow_refs(),
                               num_parts, args=("simhash_bucket",
                                                num_parts))
    # compacted runs bucketed with OUR partitioner+num_parts: bucket
    # files bypass the read+split and land directly in their partition
    aligned = [r for r in runs
               if manifests.get(r, {}).get("num_parts") == num_parts
               and os.path.isdir(f"{state_dir}/{r}/sims")]
    sim_files = run_files(state_dir,
                          [r for r in runs if r not in aligned], "sims")
    if sim_files:
        old_rows = rd.read_parquet(sim_files)
        old_parts = fan_out_pieces(split_by_key, old_rows.to_arrow_refs(),
                                   num_parts, args=("simhash_bucket",
                                                    num_parts))
    else:
        old_parts = [[] for _ in range(num_parts)]
    for r in aligned:
        for p in range(num_parts):
            bpath = f"{state_dir}/{r}/sims/bucket_{p:05d}.parquet"
            if os.path.isfile(bpath):
                old_parts[p] = list(old_parts[p]) + [bpath]

    work = ray.remote(_simhash_victims_partition)
    victim_refs = [work.remote(max_hamming, id_col, np_, op_)
                   for np_, op_ in zip(new_parts, old_parts)]
    victims = rd.from_arrow_refs(victim_refs)
    survivors = hash_join(sims_new, victims, id_col, id_col,
                          how="anti").materialize()

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(f"{tmp}/sims", exist_ok=True)  # empty-run commit works
    survivors.write_parquet(f"{tmp}/sims")
    os.rename(tmp, next_run_dir(state_dir))
    if survivors.count() == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "simhash": pa.array([], type=pa.int64()),
            "simhash_bucket": pa.array([], type=pa.int64())}))
    return survivors


def compact_dedup_index(state_dir: str) -> dict:
    """Compact a cross-run EXACT-dedup index (``ingest_dedup_run``
    state): merge every live run's (content_hash, id) rows into one
    run. Bounds the file count / read amplification as nightly runs
    accumulate; rows are already distinct across runs (a hash commits
    once), so this is a pure rewrite. Same crash-safe manifest protocol
    as :func:`~log2seq_ray.ops.curation.compact_neardup_index`.
    Returns ``{"runs_compacted", "rows", "dir"}``."""
    import json
    import os
    import shutil
    import uuid

    import ray.data as rd

    from ..state.runs import live_runs, next_run_dir, run_files, sweep_stale

    os.makedirs(state_dir, exist_ok=True)
    sweep_stale(state_dir)
    runs, manifests = live_runs(state_dir)
    if not runs or (len(runs) == 1 and runs[0] in manifests):
        return {"runs_compacted": 0, "rows": 0, "dir": None}
    files = run_files(state_dir, runs)
    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(tmp, exist_ok=True)
    rows = 0
    if files:
        ds = rd.read_parquet(files)
        rows = ds.count()
        ds.write_parquet(tmp)
    with open(f"{tmp}/MANIFEST.json", "w") as f:
        json.dump({"kind": "dedup", "covers": runs}, f)
    final = next_run_dir(state_dir)
    os.rename(tmp, final)
    for r in runs:
        shutil.rmtree(f"{state_dir}/{r}", ignore_errors=True)
    return {"runs_compacted": len(runs), "rows": int(rows), "dir": final}


def compact_simhash_index(state_dir: str, num_parts=None,
                          id_col: str = "doc_id") -> dict:
    """Compact a cross-run SimHash index (``ingest_simhash_run``
    state): merge every live run's (id, simhash, bucket) rows into ONE
    run, hash-BUCKETED by ``simhash_bucket`` with the partitioner
    ingest uses — a subsequent ingest at the same ``num_parts`` routes
    each bucket file directly to its partition task (zero index-side
    exchange). Same crash-safe manifest protocol as
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
    from .exchange import fan_out_pieces, split_by_key, stream_block_refs

    num_parts = _auto_parts(num_parts)
    os.makedirs(state_dir, exist_ok=True)
    sweep_stale(state_dir)
    runs, manifests = live_runs(state_dir)
    if not runs or (len(runs) == 1 and runs[0] in manifests
                    and manifests[runs[0]].get("num_parts") == num_parts):
        return {"runs_compacted": 0, "buckets": num_parts, "rows": 0,
                "dir": None}
    files = run_files(state_dir, runs, "sims")
    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(f"{tmp}/sims", exist_ok=True)
    total = 0
    if files:
        rows = rd.read_parquet(files)
        parts = fan_out_pieces(split_by_key, stream_block_refs(rows),
                               num_parts, args=("simhash_bucket",
                                                num_parts))
        write = ray.remote(_write_bucket)
        total = int(sum(ray.get(
            [write.remote(f"{tmp}/sims/bucket_{p:05d}.parquet", pieces,
                          (id_col,))
             for p, pieces in enumerate(parts)])))
    with open(f"{tmp}/MANIFEST.json", "w") as f:
        json.dump({"kind": "simhash", "num_parts": num_parts,
                   "id_col": id_col, "covers": runs}, f)
    final = next_run_dir(state_dir)
    os.rename(tmp, final)
    for r in runs:
        shutil.rmtree(f"{state_dir}/{r}", ignore_errors=True)
    return {"runs_compacted": len(runs), "buckets": num_parts,
            "rows": total, "dir": final}


# ---------------------------------------------------------------------------
# mirror detection: clusters of sources serving identical content
# ---------------------------------------------------------------------------

def _mirror_hash_partial(id_col: str, text_col: str, b: pa.Table):
    """Per-batch DISTINCT (content-hash, source) rows — text never
    leaves the batch, only its 60-bit md5 prefix."""
    from .sketch import _hash60
    empty = pa.table({"h": pa.array([], type=pa.int64()),
                      id_col: pa.array([], type=pa.string())})
    if b.num_rows == 0:
        return empty
    t = b.select([id_col, text_col])
    valid = pc.is_valid(t.column(id_col))
    if not pc.all(valid).as_py():
        t = t.filter(valid)
    if t.num_rows == 0:
        return empty
    h = _hash60(np.asarray(
        pc.fill_null(t.column(text_col), "").to_pandas()))
    out = pa.table({"h": pa.array(h, type=pa.int64()),
                    id_col: t.column(id_col)})
    return out.group_by(["h", id_col]).aggregate([]).select(
        ["h", id_col])


def _mirror_pair_partition(id_col: str, pieces) -> pa.Table:
    """One content-hash partition: distinct (h, source) rows, sorted by
    (h, source); every i<j source pair within an equal-h segment becomes
    one shared-content observation; partial counts per pair."""
    from .exchange import concat_typed, segment_pair_indices
    empty = pa.table({"src_a": pa.array([], type=pa.string()),
                      "src_b": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, "h", id_col)
    if t is None or t.num_rows == 0:
        return empty
    t = t.group_by(["h", id_col]).aggregate([])
    h = np.asarray(t.column("h").to_numpy(zero_copy_only=False),
                   dtype=np.int64)
    src = t.column(id_col).combine_chunks() \
        if isinstance(t.column(id_col), pa.ChunkedArray) \
        else t.column(id_col)
    enc = pc.dictionary_encode(src)
    codes = np.asarray(enc.indices, dtype=np.int64)
    order = np.lexsort((codes, h))
    _, i_row, j_row = segment_pair_indices(h[order])
    if len(i_row) == 0:
        return empty
    ia, ib = codes[order][i_row], codes[order][j_row]
    # sources within a segment are sorted by dictionary CODE, not by
    # string value — normalize each pair to (min, max) by string
    a = enc.dictionary.take(pa.array(ia))
    bb = enc.dictionary.take(pa.array(ib))
    lo = pc.min_element_wise(a, bb)
    hi = pc.max_element_wise(a, bb)
    pairs = pa.table({"src_a": lo, "src_b": hi})
    g = pairs.group_by(["src_a", "src_b"]).aggregate([([], "count_all")])
    return pa.table({"src_a": g.column("src_a"),
                     "src_b": g.column("src_b"),
                     "n": pc.cast(g.column("count_all"), pa.int64())})


def mirror_clusters(ds, id_col: str = "source", text_col: str = "text",
                    min_shared: int = 2, num_parts: int = 8):
    """Mirror detection over a (source, text) corpus: connect two
    sources when they serve >= ``min_shared`` byte-identical documents,
    then return the connected components as ``(source, cluster)`` with
    ``cluster`` = lexicographically-smallest member — the crawl-ops
    report that collapses mirror farms before per-source quotas.

    Scale shape: the corpus-sized work is one narrow (hash, source)
    exchange keyed by content hash (text itself never shuffles) with
    per-batch AND per-partition distinct pre-aggregation; pair
    expansion uses the shared segment kernel, so a hash served by m
    sources costs m(m-1)/2 narrow rows, bounded by the source count,
    not the replica count. The edge list aggregates to O(|sources|^2)
    rows and the final union-find runs driver-side over that bounded
    table (the sketch-finalizer contract; |sources| is a catalog-sized
    dimension, not a corpus-sized one)."""
    from functools import partial as _p

    from ray.data.aggregate import Sum

    from .exchange import hash_exchange

    partials = ds.map_batches(_p(_mirror_hash_partial, id_col, text_col),
                              batch_format="pyarrow")
    pair_counts = hash_exchange(partials, "h", _mirror_pair_partition,
                                num_parts, fn_args=(id_col,)) \
        .groupby(["src_a", "src_b"]).aggregate(Sum("n", alias_name="n"))
    edges = pair_counts.filter(
        expr=f"n >= {int(min_shared)}").to_pandas()

    # all sources (tiny distinct), so singletons appear as their own
    # cluster
    sources = sorted(ds.map_batches(
        lambda b: b.select([id_col]).group_by([id_col]).aggregate([]),
        batch_format="pyarrow").unique(id_col))

    parent = {s: s for s in sources}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["src_a"], edges["src_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return pa.table({
        id_col: pa.array(sources, type=pa.string()),
        "cluster": pa.array([find(s) for s in sources],
                            type=pa.string())})


def _savings_partition(group_col: str, pieces) -> pa.Table:
    """One content-hash partition of :func:`dedup_savings`: min-id per
    hash marks the survivor; per-group (docs, tokens, kept) partials."""
    from .exchange import concat_typed
    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "docs_p": pa.array([], type=pa.int64()),
                      "tokens_p": pa.array([], type=pa.int64()),
                      "docs_kept_p": pa.array([], type=pa.int64()),
                      "tokens_kept_p": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, "content_hash", "doc_id", group_col,
                     "n_tokens")
    if t is None or t.num_rows == 0:
        return empty
    h = t.column("content_hash")
    h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    hc = np.asarray(pc.dictionary_encode(h).indices, dtype=np.int64)
    ids = t.column("doc_id").to_numpy()
    nt = t.column("n_tokens").to_numpy()
    order = np.lexsort((ids, hc))
    kept = np.zeros(len(hc), dtype=bool)
    first = np.ones(len(hc), dtype=bool)
    first[1:] = hc[order][1:] != hc[order][:-1]
    kept[order[first]] = True
    g = t.column(group_col)
    g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
    enc = pc.dictionary_encode(g)
    gc = np.asarray(enc.indices, dtype=np.int64)
    k = int(gc.max()) + 1
    return pa.table({
        group_col: enc.dictionary.take(
            pa.array(np.arange(k), type=pa.int64())),
        "docs_p": pa.array(np.bincount(gc, minlength=k)
                           .astype(np.int64)),
        "tokens_p": pa.array(bincount_i64(gc, nt, minlength=k)),
        "docs_kept_p": pa.array(bincount_i64(gc, kept, minlength=k)),
        "tokens_kept_p": pa.array(
            bincount_i64(gc, nt * kept, minlength=k))})


def dedup_savings(ds, group_col: str = "lang", id_col: str = "doc_id",
                  col: str = "text", num_parts=None):
    """What exact dedup buys, per group: documents and tokens before vs
    after min-id-per-content dedup, plus the integer token-savings ppm
    — the corpus-datasheet line that justifies (or kills) the dedup
    stage for each slice of the mix.

    Scale shape: one narrow (hash, id, group, n_tokens) exchange keyed
    by content hash (all copies of a text meet in one partition, so
    the survivor decision is local); only per-group partials leave.
    Text never shuffles."""
    from ray.data.aggregate import Sum
    from .exchange import hash_exchange
    from .text import _token_lists

    num_parts = _auto_parts(num_parts)

    def narrow(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        return _text_hash(b, col).select(
            ["content_hash", id_col, group_col]).append_column(
            "n_tokens", pc.cast(pc.list_value_length(toks), pa.int64()))

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    parts = hash_exchange(rows, "content_hash", _savings_partition,
                          num_parts, fn_args=(group_col,))
    agg = parts.groupby(group_col).aggregate(
        Sum("docs_p", alias_name="docs"),
        Sum("tokens_p", alias_name="tokens"),
        Sum("docs_kept_p", alias_name="docs_kept"),
        Sum("tokens_kept_p", alias_name="tokens_kept"))

    def ppm(b: pa.Table) -> pa.Table:
        tok = b.column("tokens").to_numpy()
        kept = b.column("tokens_kept").to_numpy()
        return b.append_column("savings_ppm", pa.array(
            (tok - kept) * 1_000_000 // np.maximum(tok, 1),
            type=pa.int64()))

    return agg.map_batches(ppm, batch_format="pyarrow")
