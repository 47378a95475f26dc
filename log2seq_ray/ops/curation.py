"""Corpus-curation operators for training-data pipelines: exact n-gram
Jaccard near-dup pairs (capped shingle inverted index), benchmark
decontamination, cross-document paragraph dedup (CCNet-style), unigram-LM
quality scoring, and per-document TF-IDF top terms.

Scale shapes:

* ngram_jaccard_dups — three hash exchanges of narrow rows: by shingle
  hash (pair expansion; |A∩B| = pair multiplicity — document text is
  never re-read), by id_a (vectorized lexsort/reduceat aggregation +
  size attach), by id_b (sizes already co-located by hash equality).
  No Ray groupby / Acero join on the hot path — measured ~20x faster
  than the aggregate+join formulation at 40k docs. A ``max_df``
  stop-shingle cap bounds the O(m²) pair expansion of hot shingles —
  the capped universe is the operator's (SQL-reproducible) contract,
  the standard prefix-filtering trade from set-similarity joins.
* decontaminate — the benchmark side is tiny by nature (benchmarks are
  MBs against a 100 TB corpus): its distinct gram hashes are reduced
  distributedly, broadcast ONCE via ``ray.put``, and the corpus streams
  through a ``searchsorted`` membership filter per batch. A Bloom filter
  over the gram set is a drop-in shrink if the broadcast ever matters.
* paragraph_dedup — explode to (para-hash, doc⊕pos) rows, one hash
  exchange co-locates every instance of a paragraph, the first
  occurrence (lexicographic (doc, pos)) survives; only per-doc count
  partials leave the partitions.
* doc_lm_score / tfidf_top_terms — the model side (top-V vocabulary /
  per-token doc frequency) is a bounded vocabulary-sized table: reduced
  with per-batch partials + one narrow groupby, broadcast once, scored
  per batch fully vectorized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import actor_pool

from .hashutil import bytes_list
from .text import _token_lists

from .exchange import bincount_i64


def _md5_60(s: str) -> int:
    """60-bit md5 prefix — positive BIGINT in SQL:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def shingle_hash_rows(batch: pa.Table, col: str = "text",
                      window: int = 4):
    """All ``window``-token shingle hashes per row (vectorized window
    construction, md5-60bit per distinct string). Conventions match the
    minhash/fingerprint oracles: rows with 0 < tokens < window hash the
    whole joined sequence, empty rows hash ``""``.

    Returns ``(hashes int64[], row_of int64[])`` — NOT deduplicated per
    row; callers needing set semantics dedup on (row, hash)."""
    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pc.list_flatten(toks_arr)
    n_flat, n = len(flat), len(batch)
    h_parts, r_parts = [], []
    empty = counts == 0
    if empty.any():
        h_parts.append(np.full(int(empty.sum()), _md5_60(""),
                               dtype=np.int64))
        r_parts.append(np.nonzero(empty)[0].astype(np.int64))
    short = (counts > 0) & (counts < window)
    if short.any():
        joined = pc.binary_join(toks_arr, " ").to_pylist()
        idx = np.nonzero(short)[0]
        h_parts.append(np.fromiter((_md5_60(joined[i]) for i in idx),
                                   dtype=np.int64, count=len(idx)))
        r_parts.append(idx.astype(np.int64))
    if n_flat >= window:
        w = n_flat - window + 1
        cols = [flat.slice(j, w) for j in range(window)]
        shingles = pc.binary_join_element_wise(*cols, " ")
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        valid = row_of[:w] == row_of[window - 1:]
        if valid.any():
            vi = np.nonzero(valid)[0]
            # md5 once per DISTINCT shingle (the digest must stay md5-60
            # — the SQL oracle recomputes it — but web shingles repeat
            # heavily, so dictionary-encode first and hash the dictionary)
            enc = pc.dictionary_encode(
                shingles.take(pa.array(vi, type=pa.int64())))
            uniq = enc.dictionary.to_pylist()
            hu = np.fromiter((_md5_60(s) for s in uniq),
                             dtype=np.int64, count=len(uniq))
            h_parts.append(hu[np.asarray(enc.indices, dtype=np.int64)])
            r_parts.append(row_of[vi])
    if not h_parts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(h_parts), np.concatenate(r_parts)


def _distinct_per_row(h: np.ndarray, row_of: np.ndarray):
    """(row, hash) pairs with duplicates dropped (set semantics)."""
    order = np.lexsort((h, row_of))
    hh, rr = h[order], row_of[order]
    first = np.ones(len(hh), dtype=bool)
    first[1:] = (rr[1:] != rr[:-1]) | (hh[1:] != hh[:-1])
    return hh[first], rr[first]


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

def _shingle_rows(batch: pa.Table, window: int, id_col: str,
                  col: str) -> pa.Table:
    """map_batches stage A: (g = shingle hash, id) rows, distinct per doc."""
    h, row_of = shingle_hash_rows(batch, col, window)
    hh, rr = _distinct_per_row(h, row_of)
    ids = batch.column(id_col).to_numpy()
    return pa.table({"g": pa.array(hh, type=pa.int64()),
                     id_col: pa.array(ids[rr], type=pa.int64())})


def _jacc_partition(id_col: str, max_df, pieces):
    """One exchange partition: drop shingles with df > max_df (every row
    of a shingle lives in this partition, so the local group size IS the
    global df), emit per-doc capped set-size partials and vectorized i<j
    pair partials whose multiplicity = the pair's |A∩B| contribution."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    pairs_empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                            "id_b": pa.array([], type=pa.int64()),
                            "n_part": pa.array([], type=pa.int64())})
    sizes_empty = pa.table({id_col: pa.array([], type=pa.int64()),
                            "sz_part": pa.array([], type=pa.int64())})
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return pairs_empty, sizes_empty
    t = pa.concat_tables(pieces)
    g = t.column("g").to_numpy()
    ids = t.column(id_col).to_numpy()
    order = np.lexsort((ids, g))
    g, ids = g[order], ids[order]
    keep = np.ones(len(g), dtype=bool)  # stage A is distinct per doc;
    keep[1:] = (g[1:] != g[:-1]) | (ids[1:] != ids[:-1])  # belt+braces
    g, ids = g[keep], ids[keep]
    starts = np.ones(len(g), dtype=bool)
    starts[1:] = g[1:] != g[:-1]
    seg_id = np.cumsum(starts) - 1
    if max_df is not None:
        seg_sizes = np.bincount(seg_id)
        hot = seg_sizes > max_df
        if hot.any():
            keep = ~hot[seg_id]
            g, ids = g[keep], ids[keep]
    if len(g) == 0:
        return pairs_empty, sizes_empty
    uid, sz = np.unique(ids, return_counts=True)
    sizes = pa.table({id_col: pa.array(uid, type=pa.int64()),
                      "sz_part": pa.array(sz.astype(np.int64))})
    # i<j pair expansion — the shared bucketed-expansion kernel
    from .exchange import segment_pair_indices
    _, i_row, j_row = segment_pair_indices(g)
    if not len(i_row):
        return pairs_empty, sizes
    id_a, id_b = ids[i_row], ids[j_row]  # id-sorted → a < b
    # partial |A∩B|: multiplicity of each pair across this partition's
    # shingle groups
    po = np.lexsort((id_b, id_a))
    pa_, pb_ = id_a[po], id_b[po]
    first = np.ones(len(pa_), dtype=bool)
    first[1:] = (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
    sidx = np.nonzero(first)[0]
    n_part = np.diff(np.append(sidx, len(pa_)))
    return pa.table({"id_a": pa.array(pa_[sidx], type=pa.int64()),
                     "id_b": pa.array(pb_[sidx], type=pa.int64()),
                     "n_part": pa.array(n_part.astype(np.int64))}), sizes


def _agg_stage2(id_col: str, pair_pieces, size_pieces):
    """Exchange-2 partition (keyed by hash(id_a) == hash(id)): finalize
    per-pair |A∩B| (all of a pair's partials land here) and per-doc
    capped sizes, attach sz_a via one searchsorted. Returns
    ((id_a, id_b, inter, sz_a), (id, sz)) — the sizes table is returned
    too because exchange-3 partitions by id_b with the SAME hash, so
    partition p's sizes are exactly the ones its stage-3 task needs."""
    import ray
    if pair_pieces and isinstance(pair_pieces[0], ray.ObjectRef):
        pair_pieces = ray.get(list(pair_pieces))
    if size_pieces and isinstance(size_pieces[0], ray.ObjectRef):
        size_pieces = ray.get(list(size_pieces))
    pairs_empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                            "id_b": pa.array([], type=pa.int64()),
                            "inter": pa.array([], type=pa.int64()),
                            "sz_a": pa.array([], type=pa.int64())})
    sizes_empty = pa.table({id_col: pa.array([], type=pa.int64()),
                            "sz": pa.array([], type=pa.int64())})
    size_pieces = [t for t in size_pieces if t.num_rows]
    if size_pieces:
        st = pa.concat_tables(size_pieces)
        sid = st.column(id_col).to_numpy()
        ssz = st.column("sz_part").to_numpy()
        order = np.argsort(sid, kind="stable")
        sid, ssz = sid[order], ssz[order]
        first = np.ones(len(sid), dtype=bool)
        first[1:] = sid[1:] != sid[:-1]
        uid = sid[first]
        usz = np.add.reduceat(ssz, np.nonzero(first)[0]).astype(np.int64)
    else:
        uid = np.empty(0, dtype=np.int64)
        usz = np.empty(0, dtype=np.int64)
    sizes_out = pa.table({id_col: pa.array(uid, type=pa.int64()),
                          "sz": pa.array(usz)}) if len(uid) \
        else sizes_empty
    pair_pieces = [t for t in pair_pieces if t.num_rows]
    if not pair_pieces:
        return pairs_empty, sizes_out
    pt = pa.concat_tables(pair_pieces)
    a = pt.column("id_a").to_numpy()
    b = pt.column("id_b").to_numpy()
    n = pt.column("n_part").to_numpy()
    order = np.lexsort((b, a))
    a, b, n = a[order], b[order], n[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    sidx = np.nonzero(first)[0]
    inter = np.add.reduceat(n, sidx).astype(np.int64)
    ua, ub = a[sidx], b[sidx]
    sz_a = usz[np.searchsorted(uid, ua)]
    return pa.table({"id_a": pa.array(ua, type=pa.int64()),
                     "id_b": pa.array(ub, type=pa.int64()),
                     "inter": pa.array(inter),
                     "sz_a": pa.array(sz_a.astype(np.int64))}), sizes_out


def _final_stage3(tau_num: int, tau_den: int, sizes: pa.Table, pieces,
                  mode: str = "jaccard"):
    """Exchange-3 partition (keyed by hash(id_b)): attach sz_b from the
    co-located sizes table and apply the exact integer threshold.

    ``mode="jaccard"``: keep ``inter/(sz_a+sz_b-inter) >= tau`` →
    ``inter*(tau_den+tau_num) >= tau_num*(sz_a+sz_b)``; output
    (id_a, id_b, inter, union_n). ``mode="containment"``: keep
    ``inter/min(sz_a, sz_b) >= tau`` → ``inter*tau_den >=
    tau_num*min(sz_a, sz_b)``; output (id_a, id_b, inter, min_sz) —
    the set-containment self-join (a short doc whose shingles are a
    subset of a long doc's has containment 1 but Jaccard |A|/|B|)."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    last = "min_sz" if mode == "containment" else "union_n"
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "inter": pa.array([], type=pa.int64()),
                      last: pa.array([], type=pa.int64())})
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    uid = sizes.column(0).to_numpy()
    usz = sizes.column("sz").to_numpy()
    b = t.column("id_b").to_numpy()
    sz_b = usz[np.searchsorted(uid, b)]
    inter = t.column("inter").to_numpy()
    sz_a = t.column("sz_a").to_numpy()
    if mode == "containment":
        msz = np.minimum(sz_a, sz_b)
        keep = inter * tau_den >= tau_num * msz
        extra = msz.astype(np.int64)
    else:
        s = sz_a + sz_b
        keep = inter * (tau_den + tau_num) >= tau_num * s
        extra = (s - inter).astype(np.int64)
    out = pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                    "inter": pa.array(inter, type=pa.int64()),
                    last: pa.array(extra)})
    return out.filter(pa.array(keep))


def ngram_jaccard_dups(ds, window: int = 4, tau_num: int = 1,
                       tau_den: int = 2, max_df=None, num_parts=None,
                       id_col: str = "doc_id", col: str = "text"):
    """Exact n-gram Jaccard near-dup pairs over the (optionally
    df-capped) shingle universe: pairs with
    ``|A∩B| / |A∪B| >= tau_num/tau_den`` where A, B are each document's
    distinct ``window``-token shingle-hash sets restricted to shingles
    with document frequency ≤ ``max_df``. The threshold is evaluated in
    exact integer arithmetic — ``inter*(tau_den+tau_num) >=
    tau_num*(sz_a+sz_b)`` — so SQL reproduces every decision bit-for-bit.

    Unlike :func:`minhash_dedup` (probabilistic candidate generation +
    verify) this is the EXACT inverted-index set-similarity self-join:
    |A∩B| is the multiplicity of the pair across shared shingle groups,
    counted inside the exchange partitions and finalized by a second
    narrow exchange keyed on id_a. ``max_df`` is the standard
    stop-shingle cap bounding hot-shingle O(m²) pair expansion at web
    scale; it changes the operator's universe (documented contract), not
    its exactness.

    Returns a Dataset of (id_a, id_b, inter, union_n)."""
    import ray
    import ray.data as rd
    from .dedup import _auto_parts
    from .exchange import split_by_key

    num_parts = _auto_parts(num_parts)
    shingles = ds.map_batches(
        lambda b: _shingle_rows(b, window, id_col, col),
        batch_format="pyarrow")
    from .exchange import fan_out_pieces
    work = ray.remote(num_returns=2)(_jacc_partition)
    from .exchange import stream_block_refs
    per_part = fan_out_pieces(split_by_key, stream_block_refs(shingles),
                              num_parts, args=("g", num_parts))
    pair_refs, size_refs = [], []
    for pieces in per_part:
        pr, sr = work.remote(id_col, max_df, pieces)
        pair_refs.append(pr)
        size_refs.append(sr)
    return _pairs_finalize(pair_refs, size_refs, tau_num, tau_den,
                           id_col, num_parts)


def _pairs_finalize(pair_refs, size_refs, tau_num, tau_den, id_col,
                    num_parts, mode: str = "jaccard"):
    """Exchanges 2+3 of the set-similarity join, shared by
    :func:`ngram_jaccard_dups` and :func:`ingest_neardup_run`.

    Exchange 2: pair partials by hash(id_a) + size partials by hash(id)
    (one pair's partials all share id_a → its |A∩B| finalizes in one
    partition; pd.util.hash_array depends on values, not column names,
    so id and id_a route identically). No Ray groupby / Acero join:
    per-partition lexsort + reduceat, measured ~20x faster here.
    Pair/size partials are ~100x narrower than shingle rows, so the
    follow-up exchanges use P/4 partitions — the P×P split-piece
    explosion, not data volume, dominates them otherwise.

    Exchange 3: aggregated pairs by hash(id_b); partition p's sizes are
    exactly stage-2 task p's local sizes table (same hash) — passed as a
    direct arg ref, no extra shuffle of the sizes side."""
    import ray
    import ray.data as rd
    from .exchange import fan_out_pieces, split_by_key
    np2 = max(8, num_parts // 4) if num_parts > 1 else 1
    pair2 = fan_out_pieces(split_by_key, pair_refs, np2,
                           args=("id_a", np2))
    size2 = fan_out_pieces(split_by_key, size_refs, np2,
                           args=(id_col, np2))
    stage2 = ray.remote(num_returns=2)(_agg_stage2)
    agg_refs, szloc_refs = [], []
    for pp, sp in zip(pair2, size2):
        ar, sr = stage2.remote(id_col, pp, sp)
        agg_refs.append(ar)
        szloc_refs.append(sr)
    pair3 = fan_out_pieces(split_by_key, agg_refs, np2,
                           args=("id_b", np2))
    stage3 = ray.remote(_final_stage3)
    out = [stage3.remote(tau_num, tau_den, szloc, pieces, mode)
           for szloc, pieces in zip(szloc_refs, pair3)]
    return rd.from_arrow_refs(out)


def containment_dups(ds, window: int = 4, tau_num: int = 9,
                     tau_den: int = 10, max_df=None, num_parts=None,
                     id_col: str = "doc_id", col: str = "text"):
    """Exact n-gram set-CONTAINMENT near-dup pairs: pairs with
    ``|A∩B| / min(|A|, |B|) >= tau_num/tau_den`` over the (optionally
    df-capped) distinct ``window``-token shingle-hash sets. Catches the
    short-doc-inside-long-doc duplicates that a Jaccard threshold
    structurally misses: a prefix/excerpt of a large page has
    containment 1.0 but Jaccard |A|/|B| → 0 as the host page grows.
    Threshold decided in exact integer arithmetic (``inter*tau_den >=
    tau_num*min(sz_a, sz_b)``) so SQL reproduces every decision.

    Same three-exchange inverted-index plan as
    :func:`ngram_jaccard_dups` (stage A shingle rows → df-cap + i<j
    multiplicity partials → per-pair finalize keyed on id_a → threshold
    keyed on id_b); only the stage-3 predicate differs.

    Returns a Dataset of (id_a, id_b, inter, min_sz)."""
    import ray
    from .dedup import _auto_parts
    from .exchange import (fan_out_pieces, split_by_key,
                           stream_block_refs)

    num_parts = _auto_parts(num_parts)
    shingles = ds.map_batches(
        lambda b: _shingle_rows(b, window, id_col, col),
        batch_format="pyarrow")
    work = ray.remote(num_returns=2)(_jacc_partition)
    per_part = fan_out_pieces(split_by_key, stream_block_refs(shingles),
                              num_parts, args=("g", num_parts))
    pair_refs, size_refs = [], []
    for pieces in per_part:
        pr, sr = work.remote(id_col, max_df, pieces)
        pair_refs.append(pr)
        size_refs.append(sr)
    return _pairs_finalize(pair_refs, size_refs, tau_num, tau_den,
                           id_col, num_parts, mode="containment")


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law curve)
# ---------------------------------------------------------------------------

def _vocab_rows(batch: pa.Table, bucket_size: int, id_col: str,
                col: str) -> pa.Table:
    """Stage A: two partial kinds stacked in one (k, v, kind) table —
    kind 0 rows are (token md5-60 hash, batch-local min doc_id), kind 1
    rows are (doc_id bucket, token-count partial). Both route by ``k``
    in the same exchange: a token's rows share its hash, a bucket's
    count partials share the bucket int, so each key finalizes in
    exactly one partition."""
    toks = _token_lists(batch.column(col))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    ids = batch.column(id_col).to_numpy()
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.int64()),
                      "kind": pa.array([], type=pa.int8())})
    if not len(ids) or not counts.sum():
        return empty
    svals = pc.list_flatten(toks).to_pylist()
    uniq, inv = np.unique(np.array(svals, dtype=object),
                          return_inverse=True)
    h_uniq = np.fromiter((_md5_60(s) for s in uniq), dtype=np.int64,
                         count=len(uniq))
    h = h_uniq[inv]
    doc_of = ids[np.repeat(np.arange(len(ids), dtype=np.int64), counts)]
    order = np.lexsort((doc_of, h))
    hh, dd = h[order], doc_of[order]
    first = np.ones(len(hh), dtype=bool)
    first[1:] = hh[1:] != hh[:-1]
    k0, v0 = hh[first], dd[first]
    ub, binv = np.unique(ids // bucket_size, return_inverse=True)
    tok = bincount_i64(binv, counts)
    nz = tok > 0  # a bucket whose docs are all empty has no SQL rows
    k = np.concatenate([k0, ub[nz]])
    v = np.concatenate([v0, tok[nz]])
    kind = np.concatenate([np.zeros(len(k0), dtype=np.int8),
                           np.ones(int(nz.sum()), dtype=np.int8)])
    return pa.table({"k": pa.array(k, type=pa.int64()),
                     "v": pa.array(v, type=pa.int64()),
                     "kind": pa.array(kind, type=pa.int8())})


def _vocab_partition(bucket_size: int, pieces):
    """One exchange partition: finalize min-doc per token hash, bucket
    the first occurrences, and sum this partition's complete bucket
    token counts. Output is tiny — O(buckets) rows."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "new_types": pa.array([], type=pa.int64()),
                      "bucket_tokens": pa.array([], type=pa.int64())})
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    kind = t.column("kind").to_numpy()
    k = t.column("k").to_numpy()
    v = t.column("v").to_numpy()
    k0, v0 = k[kind == 0], v[kind == 0]
    rows = {}
    if len(k0):
        order = np.lexsort((v0, k0))
        hh, dd = k0[order], v0[order]
        first = np.ones(len(hh), dtype=bool)
        first[1:] = hh[1:] != hh[:-1]
        fb = dd[first] // bucket_size
        ub, cnt = np.unique(fb, return_counts=True)
        for b, c in zip(ub.tolist(), cnt.tolist()):
            rows.setdefault(b, [0, 0])[0] += c
    k1, v1 = k[kind == 1], v[kind == 1]
    if len(k1):
        ub, binv = np.unique(k1, return_inverse=True)
        tok = bincount_i64(binv, v1)
        for b, c in zip(ub.tolist(), tok.tolist()):
            rows.setdefault(b, [0, 0])[1] += c
    bs = sorted(rows)
    return pa.table({
        "bucket": pa.array(bs, type=pa.int64()),
        "new_types": pa.array([rows[b][0] for b in bs], type=pa.int64()),
        "bucket_tokens": pa.array([rows[b][1] for b in bs],
                                  type=pa.int64())})


def _vocab_final(parts):
    """Last reduce (one task, O(buckets) rows in): merge the partition
    partials and attach the running vocabulary / token cumsums."""
    import ray
    if parts and isinstance(parts[0], ray.ObjectRef):
        parts = ray.get(list(parts))
    parts = [t for t in parts if t.num_rows]
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "bucket_tokens": pa.array([], type=pa.int64()),
                      "new_types": pa.array([], type=pa.int64()),
                      "vocab": pa.array([], type=pa.int64()),
                      "tokens_cum": pa.array([], type=pa.int64())})
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    b = t.column("bucket").to_numpy()
    nt = t.column("new_types").to_numpy()
    tok = t.column("bucket_tokens").to_numpy()
    ub, binv = np.unique(b, return_inverse=True)
    nts = bincount_i64(binv, nt)
    toks = bincount_i64(binv, tok)
    return pa.table({"bucket": pa.array(ub, type=pa.int64()),
                     "bucket_tokens": pa.array(toks),
                     "new_types": pa.array(nts),
                     "vocab": pa.array(np.cumsum(nts).astype(np.int64)),
                     "tokens_cum": pa.array(
                         np.cumsum(toks).astype(np.int64))})


def vocab_growth(ds, bucket_size: int = 100, num_parts=None,
                 id_col: str = "doc_id", col: str = "text"):
    """Heaps-law vocabulary-growth curve: for each ``bucket_size``-doc
    id range, the bucket's token count, the number of token types whose
    corpus-first occurrence (min doc_id) falls in the bucket, and the
    running totals (``vocab`` = distinct types seen so far,
    ``tokens_cum`` = tokens seen so far). The standard corpus-scaling
    diagnostic: V(n) ≈ K·nᵝ says how fast new vocabulary arrives as the
    crawl grows — a flattening curve means marginal data is mostly
    repeats. Type identity is the shared md5-60 token hash, so DuckDB
    reproduces every count.

    One narrow (hash, doc_id) exchange; per-batch partial min per type
    collapses in-batch repeats before the shuffle, first occurrences
    finalize per-partition, and only O(buckets) rows reach the final
    single-task cumsum. Rows for empty-token docs are dropped (no token
    evidence), matching the SQL's unnest semantics.

    Returns a Dataset of
    (bucket, bucket_tokens, new_types, vocab, tokens_cum)."""
    import ray
    import ray.data as rd
    from .dedup import _auto_parts
    from .exchange import (fan_out_pieces, split_by_key,
                           stream_block_refs)

    num_parts = _auto_parts(num_parts)
    rows = ds.map_batches(
        lambda t: _vocab_rows(t, bucket_size, id_col, col),
        batch_format="pyarrow")
    per_part = fan_out_pieces(split_by_key, stream_block_refs(rows),
                              num_parts, args=("k", num_parts))
    work = ray.remote(_vocab_partition)
    part_refs = [work.remote(bucket_size, pieces)
                 for pieces in per_part]
    final = ray.remote(_vocab_final)
    return rd.from_arrow_refs([final.remote(part_refs)])


# ---------------------------------------------------------------------------
# vocabulary coverage curve (top-K type coverage / OOV budget)
# ---------------------------------------------------------------------------

def _tok_count_rows(batch: pa.Table, col: str) -> pa.Table:
    """Per-batch (token md5-60 hash, occurrence count) partials."""
    toks = _token_lists(batch.column(col))
    svals = pc.list_flatten(toks).to_pylist()
    if not svals:
        return pa.table({"h": pa.array([], type=pa.int64()),
                         "n": pa.array([], type=pa.int64())})
    uniq, cnt = np.unique(np.array(svals, dtype=object),
                          return_counts=True)
    h = np.fromiter((_md5_60(s) for s in uniq), dtype=np.int64,
                    count=len(uniq))
    return pa.table({"h": pa.array(h, type=pa.int64()),
                     "n": pa.array(cnt.astype(np.int64))})


def _coverage_block(bucket_size: int, rank_off: int, occ_off: int,
                    tbl: pa.Table) -> pa.Table:
    """Per sorted block: global ranks from the scan offsets, bucket the
    types, emit (bucket, types, occ, occ_cum_at_bucket_end) partials —
    occ_cum is exact because the bucket's running total is this block's
    local cumsum plus the block's exclusive occurrence offset."""
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "types": pa.array([], type=pa.int64()),
                      "occ": pa.array([], type=pa.int64()),
                      "occ_cum": pa.array([], type=pa.int64())})
    if "cnt" not in tbl.column_names:  # empty upstream loses the schema
        return empty
    cnt = tbl.column("cnt").to_numpy()
    if not len(cnt):
        return empty
    rank = rank_off + np.arange(len(cnt), dtype=np.int64)  # 0-based
    bucket = rank // bucket_size
    run = occ_off + np.cumsum(cnt).astype(np.int64)
    ub, binv = np.unique(bucket, return_inverse=True)
    types = np.bincount(binv).astype(np.int64)
    occ = bincount_i64(binv, cnt)
    # last running total inside each bucket segment (ranks are sorted,
    # so a bucket's rows are contiguous)
    last = np.cumsum(types) - 1
    return pa.table({"bucket": pa.array(ub, type=pa.int64()),
                     "types": pa.array(types),
                     "occ": pa.array(occ),
                     "occ_cum": pa.array(run[last])})


def _coverage_final(total_occ: int, parts):
    """Merge block partials: a bucket split across two blocks keeps the
    LATER block's occ_cum (the true running total at bucket end)."""
    import ray
    if parts and isinstance(parts[0], ray.ObjectRef):
        parts = ray.get(list(parts))
    parts = [t for t in parts if t.num_rows]
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      "types": pa.array([], type=pa.int64()),
                      "occ": pa.array([], type=pa.int64()),
                      "occ_cum": pa.array([], type=pa.int64()),
                      "coverage_ppm": pa.array([], type=pa.int64())})
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    b = t.column("bucket").to_numpy()
    ty = t.column("types").to_numpy()
    oc = t.column("occ").to_numpy()
    cum = t.column("occ_cum").to_numpy()
    ub, binv = np.unique(b, return_inverse=True)
    types = bincount_i64(binv, ty)
    occ = bincount_i64(binv, oc)
    occ_cum = np.zeros(len(ub), dtype=np.int64)
    np.maximum.at(occ_cum, binv, cum)
    ppm = occ_cum * 1_000_000 // max(total_occ, 1)
    return pa.table({"bucket": pa.array(ub, type=pa.int64()),
                     "types": pa.array(types),
                     "occ": pa.array(occ),
                     "occ_cum": pa.array(occ_cum),
                     "coverage_ppm": pa.array(ppm)})


def token_coverage(ds, bucket_size: int = 1000, col: str = "text"):
    """Vocabulary coverage curve: token types ranked by corpus frequency
    (count desc, hash asc — deterministic), grouped into
    ``bucket_size``-type rank buckets, with each bucket's type count,
    occurrence mass, running occurrence total, and integer coverage
    ppm (``occ_cum * 1e6 // total``). Answers the tokenizer/vocab-budget
    question directly: "how much of the corpus do the top K types
    cover, and where does OOV mass start?".

    Scale shape: per-batch (hash, count) partials → one Ray groupby sum
    over V type rows (≪ corpus) → range-partitioned sort by (cnt desc,
    h) → the O(n_blocks) scan-offset pattern from ops/scan.py for both
    global ranks and running occurrence totals; only O(buckets) rows
    reach the final merge task. Type identity is the shared md5-60
    hash, so DuckDB reproduces every rank tie-break and count.

    Returns a Dataset of (bucket, types, occ, occ_cum, coverage_ppm)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        lambda t: _tok_count_rows(t, col),
        batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="cnt")) \
        .sort(["cnt", "h"], descending=[True, False])
    refs = counts.to_arrow_refs()

    def _block_stats(tbl: pa.Table):
        if "cnt" not in tbl.column_names:  # empty-upstream schema loss
            return 0, 0
        s = pc.sum(tbl.column("cnt")).as_py()
        return tbl.num_rows, int(s) if s is not None else 0

    stats = ray.get([ray.remote(_block_stats).remote(r) for r in refs])
    rows = np.array([s[0] for s in stats], dtype=np.int64)
    occs = np.array([s[1] for s in stats], dtype=np.int64)
    rank_offs = np.concatenate([[0], np.cumsum(rows)[:-1]])
    occ_offs = np.concatenate([[0], np.cumsum(occs)[:-1]])
    total_occ = int(occs.sum())
    work = ray.remote(_coverage_block)
    parts = [work.remote(bucket_size, int(ro), int(oo), r)
             for ro, oo, r in zip(rank_offs, occ_offs, refs)]
    final = ray.remote(_coverage_final)
    return rd.from_arrow_refs([final.remote(total_occ, parts)])


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def _gram_set_partials(window: int, col: str, batch: pa.Table) -> pa.Table:
    h, _ = shingle_hash_rows(batch, col, window)
    return pa.table({"g": pa.array(np.unique(h), type=pa.int64())})


class _DecontamStage:
    """Actor-pool membership filter: the sorted blocklist array is read
    from plasma once per actor; each batch's gram hashes are checked with
    one vectorized ``searchsorted``."""

    def __init__(self, block_ref, window: int, id_col: str, col: str):
        import ray
        self.block = ray.get(block_ref)
        self.window, self.id_col, self.col = window, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, row_of = shingle_hash_rows(batch, self.col, self.window)
        mask = np.ones(len(batch), dtype=bool)
        if len(self.block) and len(h):
            pos = np.searchsorted(self.block, h)
            pos_c = np.minimum(pos, len(self.block) - 1)
            hit = self.block[pos_c] == h
            if hit.any():
                mask[np.unique(row_of[hit])] = False
        return batch.select([self.id_col]).filter(pa.array(mask))


class _DecontamFracStage:
    """Actor-pool overlap-fraction scorer: per doc, the DISTINCT gram
    count and how many of those grams are in the benchmark set; the keep
    decision ``hits * den <= num * n_grams`` is integer-exact."""

    def __init__(self, block_ref, window: int, num: int, den: int,
                 id_col: str, col: str):
        import ray
        self.block = ray.get(block_ref)
        self.window, self.num, self.den = window, num, den
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, row_of = shingle_hash_rows(batch, self.col, self.window)
        hh, rr = _distinct_per_row(h, row_of)
        n = len(batch)
        sz = np.bincount(rr, minlength=n).astype(np.int64)
        hits = np.zeros(n, dtype=np.int64)
        if len(self.block) and len(hh):
            pos = np.searchsorted(self.block, hh)
            pos_c = np.minimum(pos, len(self.block) - 1)
            hit = self.block[pos_c] == hh
            if hit.any():
                hits = np.bincount(rr[hit], minlength=n).astype(np.int64)
        keep = hits * self.den <= self.num * sz
        out = pa.table({
            self.id_col: pc.cast(batch.column(self.id_col), pa.int64()),
            "n_grams": pa.array(sz),
            "n_hits": pa.array(hits),
        })
        return out.filter(pa.array(keep))


def _bench_gram_broadcast(bench, window: int, col: str):
    """Distributed distinct of the benchmark's ``window``-token gram
    hashes (per-batch distinct → groupby), collected as ONE sorted int64
    array and broadcast via ``ray.put`` — the shared front half of both
    decontamination variants. Bounded by the benchmark size (MBs); if it
    ever outgrows worker heaps, swap the sorted array for a Bloom filter
    here (false positives drop extra docs — conservative)."""
    import ray
    from ray.data.aggregate import Count

    grams = bench.map_batches(
        lambda b: _gram_set_partials(window, col, b),
        batch_format="pyarrow").groupby("g").aggregate(Count())
    parts = [p for p in ray.get(grams.to_arrow_refs()) if p.num_rows]
    gset = (np.unique(np.concatenate(
        [p.column("g").to_numpy() for p in parts]))
        if parts else np.empty(0, dtype=np.int64))
    return ray.put(gset)


def decontaminate_frac(corpus, bench, window: int = 6,
                       max_frac_num: int = 1, max_frac_den: int = 10,
                       id_col: str = "doc_id", col: str = "text"):
    """Fraction-based decontamination: keep a corpus doc iff AT MOST
    ``max_frac_num/max_frac_den`` of its DISTINCT ``window``-token grams
    appear in the benchmark set (``hits * den <= num * n_grams``,
    integer-exact) — the tolerance variant of :func:`decontaminate` for
    benchmarks whose boilerplate overlaps organically with web text.
    Same scale shape: bounded benchmark gram broadcast, streaming
    vectorized scorer, no corpus shuffle. Returns surviving
    (id, n_grams, n_hits)."""
    ref = _bench_gram_broadcast(bench, window, col)
    def frac_fn(b: pa.Table) -> pa.Table:
        return _DecontamFracStage(ref, window, max_frac_num,
                                  max_frac_den, id_col, col)(b)

    return corpus.map_batches(frac_fn, batch_format="pyarrow")


def decontaminate(corpus, bench, window: int = 6,
                  id_col: str = "doc_id", col: str = "text"):
    """Drop every corpus document sharing ANY ``window``-token n-gram
    with the benchmark set (training-data decontamination). The benchmark
    gram set is reduced distributedly (per-batch distinct → groupby),
    broadcast once with ``ray.put``, and the corpus streams through a
    vectorized membership filter — no shuffle of the corpus. Returns the
    surviving ``id_col`` Dataset.

    At 100 TB the corpus side stays a stream; the broadcast is bounded by
    the benchmark size (MBs) — see :func:`_bench_gram_broadcast` for the
    Bloom-filter upgrade path if it ever outgrows worker heaps."""
    ref = _bench_gram_broadcast(bench, window, col)
    def decontam_fn(b: pa.Table) -> pa.Table:
        return _DecontamStage(ref, window, id_col, col)(b)

    return corpus.map_batches(decontam_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-document paragraph dedup (CCNet-style)
# ---------------------------------------------------------------------------

_POS_BITS = 20  # ckey = doc_id << 20 | pos → lexicographic (doc, pos) min


def _para_rows(batch: pa.Table, para_tokens: int, id_col: str,
               col: str) -> pa.Table:
    """(h = md5-60bit of the paragraph string, ckey = doc⊕pos) rows.
    Paragraph = each consecutive run of ``para_tokens`` tokens (the final
    short run included); empty documents have zero paragraphs. Real
    webtext would split on blank lines instead — the chunker is the only
    thing that changes."""
    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pc.list_flatten(toks_arr)
    n = len(batch)
    n_paras = -(-counts // para_tokens)  # ceil
    ids = batch.column(id_col).to_numpy()
    if ids.size:
        assert int(ids.max()) < (1 << (63 - _POS_BITS)), \
            "doc_id too large for the packed (doc,pos) key"
    if n_paras.sum() == 0:
        return pa.table({"h": pa.array([], type=pa.int64()),
                         "ckey": pa.array([], type=pa.int64())})
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_paras)
    pos = np.arange(len(row_of), dtype=np.int64) - np.repeat(
        np.cumsum(n_paras) - n_paras, n_paras)
    para_starts = offsets[:-1][row_of] + pos * para_tokens
    assert int(pos.max()) < (1 << _POS_BITS)
    bounds = np.append(para_starts, offsets[-1]).astype(np.int32)
    paras = pa.ListArray.from_arrays(pa.array(bounds, type=pa.int32()),
                                     flat)
    strs = pc.binary_join(paras, " ").to_pylist()
    h = np.fromiter((_md5_60(s) for s in strs), dtype=np.int64,
                    count=len(strs))
    ckey = (ids[row_of] << _POS_BITS) | pos
    return pa.table({"h": pa.array(h, type=pa.int64()),
                     "ckey": pa.array(ckey, type=pa.int64())})


def _para_partition(pieces) -> pa.Table:
    """One exchange partition: all instances of a paragraph hash are
    local; the lexicographically-first (doc, pos) instance is kept.
    Emits per-doc (n_paras, n_kept) partials."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_paras_part": pa.array([], type=pa.int64()),
                      "n_kept_part": pa.array([], type=pa.int64())})
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    h = t.column("h").to_numpy()
    c = t.column("ckey").to_numpy()
    order = np.lexsort((c, h))
    h, c = h[order], c[order]
    starts = np.ones(len(h), dtype=bool)
    starts[1:] = h[1:] != h[:-1]
    seg_start = np.maximum.accumulate(
        np.where(starts, np.arange(len(h)), 0))
    kept = (c == c[seg_start]).astype(np.int64)  # first (doc,pos) = min
    doc = c >> _POS_BITS
    ud, inv = np.unique(doc, return_inverse=True)
    n_paras = np.bincount(inv).astype(np.int64)
    n_kept = bincount_i64(inv, kept)
    return pa.table({"doc_id": pa.array(ud, type=pa.int64()),
                     "n_paras_part": pa.array(n_paras),
                     "n_kept_part": pa.array(n_kept)})


def paragraph_dedup(ds, para_tokens: int = 20, num_parts=None,
                    id_col: str = "doc_id", col: str = "text"):
    """CCNet-style corpus-level paragraph dedup: across ALL documents,
    only the first occurrence (min (doc_id, position)) of each distinct
    paragraph survives. Returns per-document (doc_id, n_paras, n_kept) —
    ``n_kept < n_paras`` flags boilerplate-heavy documents, and the kept
    flags are exactly the rows a rewrite stage would retain.

    One hash exchange of (hash, packed-key) rows; documents never move."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum
    from .dedup import _auto_parts
    from .exchange import split_by_key

    num_parts = _auto_parts(num_parts)
    rows = ds.map_batches(
        lambda b: _para_rows(b, para_tokens, id_col, col),
        batch_format="pyarrow")
    from .exchange import fan_out_pieces
    work = ray.remote(_para_partition)
    from .exchange import stream_block_refs
    per_part = fan_out_pieces(split_by_key, stream_block_refs(rows),
                              num_parts, args=("h", num_parts))
    partials = rd.from_arrow_refs(
        [work.remote(pieces) for pieces in per_part])
    zeros = ds.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b.column(id_col), pa.int64()),
            "n_paras_part": pa.array(
                np.zeros(len(b), dtype=np.int64)),
            "n_kept_part": pa.array(np.zeros(len(b), dtype=np.int64)),
        }), batch_format="pyarrow")
    return partials.union(zeros).groupby("doc_id").aggregate(
        Sum("n_paras_part", alias_name="n_paras"),
        Sum("n_kept_part", alias_name="n_kept"))


# ---------------------------------------------------------------------------
# unigram-LM quality score
# ---------------------------------------------------------------------------

class _LMScoreStage:
    """Scores each document by its mean corpus frequency over the
    broadcast top-V vocabulary (out-of-vocabulary tokens count 0): a
    cheap stand-in for LM-perplexity quality filters, integer sums with
    one final IEEE division so SQL reproduces it exactly."""

    def __init__(self, vocab_ref, id_col: str, col: str):
        import ray
        self.tokens, self.counts = ray.get(vocab_ref)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch.column(self.col))
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        flat = pc.list_flatten(toks)
        idx = pc.index_in(flat, value_set=self.tokens)
        hit = np.zeros(len(flat), dtype=np.int64)
        if len(flat):
            valid = np.asarray(pc.is_valid(idx))
            ii = np.asarray(pc.fill_null(idx, 0), dtype=np.int64)
            hit[valid] = self.counts[ii[valid]]
        hits = np.add.reduceat(np.concatenate([hit, [0]]),
                               offsets[:-1]).astype(np.int64) \
            if len(offsets) > 1 else np.zeros(0, dtype=np.int64)
        hits[counts == 0] = 0
        score = np.zeros(len(batch), dtype=np.float64)
        nz = counts > 0
        score[nz] = hits[nz] / counts[nz]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "lm_hits": pa.array(hits, type=pa.int64()),
            "n_tokens": pa.array(counts.astype(np.int64)),
            "score": pa.array(score, type=pa.float64()),
        })


def doc_lm_score(ds, model_ds, vocab_k: int = 32,
                 id_col: str = "doc_id", col: str = "text"):
    """Two-pass unigram-LM scoring: pass 1 fits the 'model' (top-V token
    counts over ``model_ds``, deterministic n-desc/token-asc tie-break),
    pass 2 streams ``ds`` through a broadcast vectorized scorer. The
    vocabulary is capped at V, so the broadcast stays bounded regardless
    of corpus size (the heavy-tail tokens an LM filter keys on)."""
    import ray
    from .text import top_tokens

    vocab = top_tokens(model_ds, k=vocab_k)  # small pandas (token, n)
    ref = ray.put((pa.array(vocab["token"].tolist(), type=pa.string()),
                   vocab["n"].to_numpy().astype(np.int64)))
    def lm_fn(b: pa.Table) -> pa.Table:
        return _LMScoreStage(ref, id_col, col)(b)

    return ds.map_batches(lm_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def _df_partials(col: str, batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies: distinct (row, token)
    pairs via the dictionary-encode + lexsort boundary trick."""
    toks = _token_lists(batch.column(col))
    flat = pc.list_flatten(toks)
    counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    if len(flat) == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "df_part": pa.array([], type=pa.int64())})
    row_ids = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    codes = np.asarray(pc.dictionary_encode(flat).indices, dtype=np.int64)
    order = np.lexsort((codes, row_ids))
    rc, cc = row_ids[order], codes[order]
    first = np.ones(len(cc), dtype=bool)
    first[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
    uniq_toks = flat.take(pa.array(order[first]))
    g = pa.table({"token": uniq_toks}).group_by(["token"]).aggregate(
        [([], "count_all")])
    return pa.table({"token": g.column("token"),
                     "df_part": g.column("count_all")})


class _TfidfStage:
    """Per-document top-k terms by (tf desc, df asc, token asc): an
    ordinal TF-IDF (rarer-but-frequent-here terms first) with no float
    logarithms, so the ranking is SQL-exact. df arrives as a broadcast
    vocabulary-sized table; each batch computes tf runs vectorized and
    ranks with one pandas sort."""

    def __init__(self, df_ref, k: int, id_col: str, col: str):
        import ray
        self.tokens, self.df = ray.get(df_ref)
        self.k, self.id_col, self.col = k, id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        toks = _token_lists(batch.column(self.col))
        flat = pc.list_flatten(toks)
        counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        empty = pa.table({
            self.id_col: pa.array([], type=pa.int64()),
            "token": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "df": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64())})
        if len(flat) == 0:
            return empty
        row_ids = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        codes = np.asarray(pc.dictionary_encode(flat).indices,
                           dtype=np.int64)
        order = np.lexsort((codes, row_ids))
        rc, cc = row_ids[order], codes[order]
        first = np.ones(len(cc), dtype=bool)
        first[1:] = (rc[1:] != rc[:-1]) | (cc[1:] != cc[:-1])
        sidx = np.nonzero(first)[0]
        tf = np.diff(np.append(sidx, len(cc))).astype(np.int64)
        run_tok = flat.take(pa.array(order[sidx]))
        dfi = pc.index_in(run_tok, value_set=self.tokens)
        dfv = np.zeros(len(run_tok), dtype=np.int64)
        if len(self.tokens):
            valid = np.asarray(pc.is_valid(dfi))
            ii = np.asarray(pc.fill_null(dfi, 0), dtype=np.int64)
            dfv[valid] = self.df[ii[valid]]
        ids = batch.column(self.id_col).to_numpy()
        frame = pd.DataFrame({
            self.id_col: ids[rc[sidx]],
            "token": run_tok.to_pandas(),
            "tf": tf, "df": dfv})
        frame = frame.sort_values(
            [self.id_col, "tf", "df", "token"],
            ascending=[True, False, True, True], kind="mergesort")
        frame["rank"] = frame.groupby(self.id_col).cumcount() + 1
        frame = frame[frame["rank"] <= self.k]
        return pa.Table.from_pandas(frame, preserve_index=False).cast(
            empty.schema)


def tfidf_top_terms(ds, df_ds, k: int = 3,
                    id_col: str = "doc_id", col: str = "text"):
    """Per-document top-k TF-IDF terms (ordinal form: tf desc, corpus df
    asc, token asc — no float idf, SQL-exact). Document frequencies are
    reduced with per-batch partials + one narrow groupby and broadcast
    once (the df table is vocabulary-sized, not corpus-sized)."""
    import ray
    from ray.data.aggregate import Sum

    df = df_ds.map_batches(lambda b: _df_partials(col, b),
                           batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df_part", alias_name="df"))
    parts = [p for p in ray.get(df.to_arrow_refs()) if p.num_rows]
    if parts:
        t = pa.concat_tables(parts).combine_chunks()
        tokens = t.column("token").combine_chunks()
        dfv = t.column("df").to_numpy().astype(np.int64)
    else:
        tokens = pa.array([], type=pa.string())
        dfv = np.empty(0, dtype=np.int64)
    ref = ray.put((tokens, dfv))
    def tfidf_fn(b: pa.Table) -> pa.Table:
        return _TfidfStage(ref, k, id_col, col)(b)

    return ds.map_batches(tfidf_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicated-substring spans (exact substring dedup, k-gram formulation)
# ---------------------------------------------------------------------------

_WIN_EMPTY = pa.table({"g": pa.array([], type=pa.int64()),
                       "doc_id": pa.array([], type=pa.int64()),
                       "pos": pa.array([], type=pa.int64())})


def _window_rows(batch: pa.Table, window: int, id_col: str,
                 col: str) -> pa.Table:
    """map_batches stage A: (g = md5-60bit window hash, doc_id, pos) for
    EVERY ``window``-token position (0-based; docs shorter than the
    window emit no rows — a short doc cannot contain a duplicated
    ``window``-token substring)."""
    toks_arr = _token_lists(batch.column(col))
    offsets = np.asarray(toks_arr.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    flat = pc.list_flatten(toks_arr)
    n_flat, n = len(flat), len(batch)
    if n_flat < window:
        return _WIN_EMPTY
    w = n_flat - window + 1
    cols = [flat.slice(j, w) for j in range(window)]
    strs = pc.binary_join_element_wise(*cols, " ")
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    valid = row_of[:w] == row_of[window - 1:]
    vi = np.nonzero(valid)[0]
    if not len(vi):
        return _WIN_EMPTY
    svals = bytes_list(strs)
    h = np.fromiter(
        (int(hashlib.md5(svals[i]).hexdigest()[:15], 16) for i in vi),
        dtype=np.int64, count=len(vi))
    ids = batch.column(id_col).to_numpy()
    return pa.table({
        "g": pa.array(h, type=pa.int64()),
        "doc_id": pa.array(ids[row_of[vi]], type=pa.int64()),
        "pos": pa.array(vi - offsets[:-1][row_of[vi]], type=pa.int64()),
    })


def _dupwin_partition(pieces) -> pa.Table:
    """Exchange-1 partition (keyed on g): every instance of a window
    hash is local, so local multiplicity IS global multiplicity; only
    (doc_id, pos) of duplicated windows (multiplicity >= 2) survive."""
    from .exchange import resolve_all_pieces
    # rows only: zero-row pieces can carry the untransformed upstream
    # schema (Ray map_batches pass-through) and break a plain concat
    pieces = [p for p in resolve_all_pieces(pieces) if p.num_rows]
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "pos": pa.array([], type=pa.int64())})
    t = pa.concat_tables(pieces) if pieces else _WIN_EMPTY
    if not t.num_rows:
        return empty
    g = t.column("g").to_numpy()
    order = np.argsort(g, kind="stable")
    gs = g[order]
    starts = np.ones(len(gs), dtype=bool)
    starts[1:] = gs[1:] != gs[:-1]
    seg = np.cumsum(starts) - 1
    mult = np.bincount(seg)
    keep = order[mult[seg] >= 2]
    return pa.table({
        "doc_id": pc.take(t.column("doc_id"), pa.array(keep)),
        "pos": pc.take(t.column("pos"), pa.array(keep)),
    })


def _span_partition(window: int, pieces) -> pa.Table:
    """Exchange-2 partition (keyed on doc_id): merge each document's
    sorted duplicated positions into maximal spans — a new span starts
    when the gap to the previous position exceeds the window length
    (adjacent/overlapping windows coalesce)."""
    from .exchange import resolve_all_pieces
    pieces = resolve_all_pieces(pieces)
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "span_start": pa.array([], type=pa.int64()),
                      "span_len": pa.array([], type=pa.int64())})
    pieces = [p for p in pieces if p.num_rows]
    if not pieces:
        return empty
    t = pa.concat_tables(pieces)
    d = t.column("doc_id").to_numpy()
    p = t.column("pos").to_numpy()
    order = np.lexsort((p, d))
    d, p = d[order], p[order]
    brk = np.ones(len(d), dtype=bool)
    brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + window)
    si = np.nonzero(brk)[0]
    ei = np.append(si[1:], len(d)) - 1
    return pa.table({
        "doc_id": pa.array(d[si], type=pa.int64()),
        "span_start": pa.array(p[si], type=pa.int64()),
        "span_len": pa.array(p[ei] + window - p[si], type=pa.int64()),
    })


def dup_spans(ds, window: int = 8, num_parts=None,
              id_col: str = "doc_id", col: str = "text"):
    """Exact duplicated-substring spans — the k-gram formulation of
    suffix-array training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): a
    token position is *duplicated* when its ``window``-token sequence
    occurs at >= 2 (doc, pos) sites corpus-wide (within-doc repeats
    count, matching suffix-array semantics), and overlapping or adjacent
    duplicated windows merge into maximal spans. Returns (doc_id,
    span_start, span_len) token spans — exactly the ranges a rewrite
    stage would cut from the training corpus.

    Scale shape: two narrow exchanges of int64 rows — by window hash
    (multiplicity filter: only duplicated (doc, pos) rows survive, so
    the second exchange carries the DUPLICATED subset, not the corpus),
    then by doc_id (one vectorized lexsort + run-length span merge per
    partition). Document text never moves after stage A."""
    from .dedup import _auto_parts
    from .exchange import hash_exchange

    num_parts = _auto_parts(num_parts)
    rows = ds.map_batches(
        lambda b: _window_rows(b, window, id_col, col),
        batch_format="pyarrow")
    dups = hash_exchange(rows, "g", _dupwin_partition, num_parts)
    return hash_exchange(dups, "doc_id", _span_partition, num_parts,
                         fn_args=(window,))


def _excise_partition(id_col: str, col: str, l_pieces, r_pieces):
    """Co-partitioned (docs, spans) rewrite: excise every duplicated
    token span with one diff-array pass over the partition's flattened
    tokens — O(tokens + spans), no per-doc Python loop."""
    from .exchange import resolve_pieces
    docs = resolve_pieces(l_pieces)
    spans = resolve_pieces(r_pieces)
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "text_clean": pa.array([], type=pa.string()),
                      "n_removed": pa.array([], type=pa.int64())})
    if not docs:
        return empty
    d = pa.concat_tables(docs)
    ids = d.column(id_col).to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    text = d.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = _token_lists(text.take(pa.array(order, type=pa.int64())))
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    counts = np.diff(offsets)
    total = int(counts.sum())
    covered = np.zeros(total, dtype=bool)
    if spans and total:
        s = pa.concat_tables(spans)
        srow = np.searchsorted(ids, s.column(id_col).to_numpy())
        start = s.column("span_start").to_numpy()
        ln = s.column("span_len").to_numpy()
        lo = offsets[srow] + start
        hi = np.minimum(offsets[srow] + start + ln, offsets[srow + 1])
        diff = np.zeros(total + 1, dtype=np.int64)
        np.add.at(diff, lo, 1)
        np.add.at(diff, hi, -1)
        covered = np.cumsum(diff[:-1]) > 0
    keep = ~covered
    flat = pc.list_flatten(toks)
    kept_counts = np.bincount(
        np.repeat(np.arange(len(ids), dtype=np.int64), counts)[keep],
        minlength=len(ids)).astype(np.int64) if total else \
        np.zeros(len(ids), dtype=np.int64)
    new_off = np.concatenate([[0], np.cumsum(kept_counts)])
    la = pa.ListArray.from_arrays(
        pa.array(new_off, type=pa.int32()),
        flat.filter(pa.array(keep)) if total else flat)
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "text_clean": pc.binary_join(la, " "),
        "n_removed": pa.array((counts - kept_counts).astype(np.int64))})


def remove_dup_spans(ds, window: int = 8, num_parts=None,
                     id_col: str = "doc_id", col: str = "text"):
    """The rewrite half of suffix-array-style substring dedup (Lee et
    al., arXiv:2107.06499 §4): detect maximal duplicated token spans
    with :func:`dup_spans`, then EXCISE them from the corpus — output
    (doc_id, text_clean, n_removed) for every document, with text
    rebuilt from the kept tokens (single-space joined, the engine's
    token normal form). Removes every occurrence of a duplicated span,
    the conservative memorization-scrubbing contract.

    Scale shape: the span-detection passes ship only int64 hash rows;
    the rewrite is a second streaming scan of the text co-partitioned
    with its (tiny) span set by doc_id — document text crosses the
    exchange once, and the excision is one diff-array cumsum over the
    partition's flattened tokens, no per-doc loop."""
    from .dedup import _auto_parts
    from .exchange import hash_exchange2

    num_parts = _auto_parts(num_parts)
    spans = dup_spans(ds, window=window, num_parts=num_parts,
                      id_col=id_col, col=col)
    return hash_exchange2(ds, spans, id_col, id_col, _excise_partition,
                          num_parts, fn_args=(id_col, col))


# ---------------------------------------------------------------------------
# DSIR-style hashed importance weights
# ---------------------------------------------------------------------------

def _dsir_count_partial(buckets: int, lang_col, target_langs, id_col,
                        col, batch: pa.Table) -> pa.Table:
    """Per-batch hashed-unigram bucket counts for the raw corpus AND the
    target slice in one pass: (bucket, raw_n, tgt_n) rows — at most
    ``buckets`` per batch, the fixed-size partial that makes the model
    fit shuffle-free at any corpus size."""
    toks = _token_lists(batch.column(col))
    flat = pc.list_flatten(toks)
    counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
    is_tgt = np.repeat(
        np.asarray(pc.is_in(batch.column(lang_col),
                            value_set=pa.array(sorted(target_langs)))),
        counts)
    vc = pc.value_counts(flat)
    uniq = vc.field("values").to_pylist()
    b_of = np.fromiter((_md5_60(t) % buckets for t in uniq),
                       dtype=np.int64, count=len(uniq))
    # map every flat token to its distinct index -> bucket
    idx = pc.index_in(flat, value_set=vc.field("values"))
    tok_b = b_of[np.asarray(idx)]
    raw = np.bincount(tok_b, minlength=buckets)
    tgt = np.bincount(tok_b[is_tgt], minlength=buckets)
    nz = (raw > 0).nonzero()[0]
    return pa.table({
        "bucket": pa.array(nz.astype(np.int64)),
        "raw_n": pa.array(raw[nz].astype(np.int64)),
        "tgt_n": pa.array(tgt[nz].astype(np.int64)),
    })


class _DSIRScoreStage:
    """Broadcast the <= ``buckets`` ratio table once per actor; per batch
    the doc weight is a reduceat sum over its tokens' bucket ratios."""

    def __init__(self, ratio_ref, buckets, id_col, col):
        import ray
        self.ratios = ray.get(ratio_ref)   # int64[buckets]
        self.buckets, self.id_col, self.col = buckets, id_col, col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch.column(self.col))
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        vc = pc.value_counts(flat)
        uniq = vc.field("values").to_pylist()
        b_of = np.empty(len(uniq), dtype=np.int64)
        from .hashutil import cache_put
        for j, t in enumerate(uniq):
            b = self._cache.get(t)
            if b is None:
                b = cache_put(self._cache, t, _md5_60(t) % self.buckets)
            b_of[j] = b
        idx = pc.index_in(flat, value_set=vc.field("values"))
        per_tok = self.ratios[b_of[np.asarray(idx)]] \
            if len(flat) else np.array([], dtype=np.int64)
        cs = np.concatenate([[0], np.cumsum(per_tok)])
        w = cs[offsets[1:]] - cs[offsets[:-1]]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "weight": pa.array(w.astype(np.int64)),
        })


def dsir_weights(ds, target_langs=("en",), buckets: int = 256,
                 scale: int = 1_000_000, lang_col: str = "lang",
                 id_col: str = "doc_id", col: str = "text"):
    """DSIR-style (Xie et al., arXiv:2302.03169) importance weights via
    hashed unigram features: bucket b's importance ratio is the
    INTEGER-EXACT ``(tgt_b + 1) * scale // (raw_b + 1)`` (add-one
    smoothed target-vs-raw frequency ratio; integer arithmetic so the
    SQL oracle matches bit-for-bit — the paper's log-ratio is monotone
    in this for fixed token count), and a document's weight is the sum
    of its tokens' bucket ratios. Two passes: a fixed-``buckets``-size
    count partial + one tiny groupby fits the model; scoring streams
    with the ratio table broadcast once per actor. Returns (id, weight).
    """
    import ray
    from functools import partial as _p
    from ray.data.aggregate import Sum

    merged = ds.map_batches(
        _p(_dsir_count_partial, buckets, lang_col, set(target_langs),
           id_col, col),
        batch_format="pyarrow").repartition(4) \
        .groupby("bucket") \
        .aggregate(Sum("raw_n", alias_name="raw"),
                   Sum("tgt_n", alias_name="tgt")).take_all()
    ratios = np.full(buckets, scale, dtype=np.int64)   # empty: (0+1)/(0+1)
    for r in merged:
        ratios[r["bucket"]] = (r["tgt"] + 1) * scale // (r["raw"] + 1)
    ref = ray.put(ratios)
    return ds.map_batches(
        _DSIRScoreStage,
        fn_constructor_kwargs=dict(ratio_ref=ref, buckets=buckets,
                                   id_col=id_col, col=col),
        batch_format="pyarrow", concurrency=actor_pool())


class _MixFilterStage:
    """Actor: keep a row iff ``md5_60(str(key)) % n_group < target_group``
    — the deterministic per-group downsample shared by :func:`mix_sample`
    (equal-mass target) and :func:`mix_sample_sqrt` (sqrt-temperature
    target). Broadcast lookup tables read once per actor."""

    def __init__(self, counts_ref, group_col: str, key_col: str):
        import ray
        counts, targets = ray.get(counts_ref) \
            if not isinstance(counts_ref, tuple) else counts_ref
        # empty model (empty input dataset): every row drops; skip the
        # lookup tables entirely — pa.array([]) would be null-typed and
        # make index_in raise on any non-empty batch
        self.empty_model = not counts
        if self.empty_model:
            self.group_col, self.key_col = group_col, key_col
            return
        # vectorized lookup tables (once per actor): group -> (count,
        # target) via index_in; unseen groups default to (1, 0) — dropped
        self.group_keys = pa.array(list(counts.keys()))
        self.group_n = np.concatenate(
            [np.fromiter(counts.values(), dtype=np.int64,
                         count=len(counts)), [1]])
        self.group_t = np.concatenate(
            [np.fromiter((targets[g] for g in counts), dtype=np.int64,
                         count=len(counts)), [0]])
        self.group_col, self.key_col = group_col, key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .hashutil import value_bytes
        if self.empty_model:
            return batch.slice(0, 0)
        keys = value_bytes(np.asarray(
            batch.column(self.key_col).to_numpy(zero_copy_only=False)))
        idx = np.asarray(
            pc.cast(pc.fill_null(
                pc.index_in(batch.column(self.group_col),
                            value_set=self.group_keys),
                len(self.group_n) - 1), pa.int64())
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        n = self.group_n[idx]
        t = self.group_t[idx]
        h = np.fromiter(
            (int(hashlib.md5(b).hexdigest()[:15], 16) for b in keys),
            dtype=np.int64, count=len(keys))
        return batch.filter(pa.array(h % n < t))


def mix_sample(ds, group_col: str = "lang", key_col: str = "doc_id"):
    """Domain-mixing downsample: rebalance groups toward EQUAL mass by
    keeping each row iff ``md5_60(key) % count(group) < min_count`` —
    every group's expected surviving mass is the smallest group's count,
    the smallest group survives whole, and the keep decision is a pure
    function of (key, group counts): partition-independent, resumable,
    and reproducible in SQL.

    Scale shape: the per-group counts are a tiny groupby (one row per
    domain/lang) broadcast once via ``ray.put``; the filter itself is
    embarrassingly parallel — no shuffle of the corpus."""
    import ray

    counts_tbl = ds.groupby(group_col).count().to_pandas()
    counts = dict(zip(counts_tbl[group_col],
                      counts_tbl["count()"].astype(int)))
    target = int(min(counts.values())) if counts else 0
    targets = {g: target for g in counts}
    ref = ray.put((counts, targets))
    return ds.map_batches(
        _MixFilterStage,
        fn_constructor_kwargs=dict(counts_ref=ref, group_col=group_col,
                                   key_col=key_col),
        batch_format="pyarrow", concurrency=actor_pool())


def mix_sample_sqrt(ds, group_col: str = "lang", key_col: str = "doc_id"):
    """Sqrt-temperature domain mixing: keep a row of group ``g`` with
    probability ``sqrt(n_min / n_g)`` — surviving mass ∝ ``sqrt(n_g)``,
    the standard temperature rebalance that flattens a skewed domain/
    language distribution WITHOUT collapsing it to equal mass (big
    domains keep more absolute data, small domains keep everything).
    Decision: ``md5_60(key) % n_g < floor(sqrt(n_min * n_g))`` — a pure
    function of (key, counts): partition-independent, resumable. The
    ``floor(sqrt(double))`` is IEEE and correctly rounded, so numpy and
    SQL reproduce the same target bit-for-bit (exact only while
    ``n_min * n_g`` < 2^53 — beyond that the decision is still
    deterministic and SQL-reproducible, just computed on the rounded
    double product). Same scale shape as :func:`mix_sample`."""
    import ray

    counts_tbl = ds.groupby(group_col).count().to_pandas()
    counts = dict(zip(counts_tbl[group_col],
                      counts_tbl["count()"].astype(int)))
    n_min = int(min(counts.values())) if counts else 0
    targets = {g: int(np.floor(np.sqrt(np.float64(n_min * n))))
               for g, n in counts.items()}
    ref = ray.put((counts, targets))
    return ds.map_batches(
        _MixFilterStage,
        fn_constructor_kwargs=dict(counts_ref=ref, group_col=group_col,
                                   key_col=key_col),
        batch_format="pyarrow", concurrency=actor_pool())


# ---------------------------------------------------------------------------
# incremental cross-run NEAR-dup ingest (persistent shingle index)
# ---------------------------------------------------------------------------

def _ingest_pair_partition(id_col: str, max_df, new_pieces, old_pieces):
    """One shingle-hash partition of the ingest join: pair partials
    between this run's docs and (committed docs ∪ this run's lower-id
    docs). Emits (id_a = the CANDIDATE-DROP new doc, id_b = the other
    doc, n_part = shared-shingle multiplicity partial). Old-old pairs —
    the bulk of a mature index — are never expanded.

    ``max_df`` bounds the pair blow-up of a boilerplate shingle (page
    footer / nav chrome shared by the whole crawl AND the whole index):
    a shingle whose combined new+old df exceeds it is skipped entirely —
    every row of a shingle lands in this partition, so the local count
    IS the global df. The trade is conservative (set sizes stay
    uncapped, so estimated intersections only shrink → strictly fewer
    drops), the same stop-shingle trade :func:`ngram_jaccard_dups`
    documents for ``max_df``."""
    import ray
    from .exchange import resolve_mixed_pieces
    if new_pieces and isinstance(new_pieces[0], ray.ObjectRef):
        new_pieces = ray.get(list(new_pieces))
    # old pieces may mix split-task refs with BUCKET-ALIGNED parquet
    # paths from a compacted index (read here, inside the partition
    # task — the index side never enters an exchange)
    old_pieces = resolve_mixed_pieces(old_pieces)
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "n_part": pa.array([], type=pa.int64())})
    new_pieces = [t for t in new_pieces if t.num_rows]
    if not new_pieces:
        return empty
    nt = pa.concat_tables(new_pieces)
    g_n = nt.column("g").to_numpy()
    id_n = nt.column(id_col).to_numpy()
    order = np.lexsort((id_n, g_n))
    g_n, id_n = g_n[order], id_n[order]
    old_pieces = [t for t in old_pieces if t.num_rows]
    g_o = id_o = None
    if old_pieces:
        ot = pa.concat_tables(old_pieces)
        g_o = ot.column("g").to_numpy()
        id_o = ot.column(id_col).to_numpy()
        oorder = np.argsort(g_o, kind="stable")
        g_o, id_o = g_o[oorder], id_o[oorder]
    if max_df is not None:
        ug = np.unique(np.concatenate(
            [g_n] + ([g_o] if g_o is not None else [])))
        cnt = np.searchsorted(g_n, ug, "right") \
            - np.searchsorted(g_n, ug, "left")
        if g_o is not None:
            cnt += np.searchsorted(g_o, ug, "right") \
                - np.searchsorted(g_o, ug, "left")
        hot = ug[cnt > max_df]
        if len(hot):
            kn = ~np.isin(g_n, hot)
            g_n, id_n = g_n[kn], id_n[kn]
            if g_o is not None:
                ko = ~np.isin(g_o, hot)
                g_o, id_o = g_o[ko], id_o[ko]
            if not len(g_n):
                return empty
    out_a, out_b = [], []
    # new-new pairs: i<j within each shingle group, victim = larger id
    from .exchange import segment_pair_indices
    _, i_row, j_row = segment_pair_indices(g_n)
    if len(i_row):
        out_a.append(id_n[j_row])   # later (larger) id = victim
        out_b.append(id_n[i_row])
    # new-old pairs: full cross product per shared shingle group
    if g_o is not None and len(g_o):
        lo = np.searchsorted(g_o, g_n, side="left")
        hi = np.searchsorted(g_o, g_n, side="right")
        cnt = hi - lo
        tot_o = int(cnt.sum())
        if tot_o:
            block_start = np.cumsum(cnt) - cnt
            within_o = np.arange(tot_o) - np.repeat(block_start, cnt)
            o_idx = np.repeat(lo, cnt) + within_o
            out_a.append(np.repeat(id_n, cnt))
            out_b.append(id_o[o_idx])
    if not out_a:
        return empty
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    # pre-reduce multiplicities before the id_a exchange
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    sidx = np.nonzero(first)[0]
    n = np.diff(np.append(sidx, len(a))).astype(np.int64)
    return pa.table({"id_a": pa.array(a[sidx], type=pa.int64()),
                     "id_b": pa.array(b[sidx], type=pa.int64()),
                     "n_part": pa.array(n)})


#: run-dir lifecycle shared with the other ingest indexes — see
#: log2seq_ray/state/runs.py for the manifest / crash-recovery contract
from ..state.runs import live_runs as _live_index_runs  # noqa: E402
from ..state.runs import next_run_dir as _next_run_dir  # noqa: E402


def _write_bucket(path: str, pieces, dedup_cols=("g",)) -> int:
    """Compaction task: concat one bucket's pieces, dedup to rows
    distinct on ``dedup_cols`` (heals any crash-duplicate rows), write
    one parquet file. Returns the row count; writes nothing for an
    empty bucket."""
    import pyarrow.parquet as pq
    from .exchange import resolve_mixed_pieces
    pieces = [t for t in resolve_mixed_pieces(pieces) if t.num_rows]
    if not pieces:
        return 0
    t = pa.concat_tables(pieces)
    cols = [t.column(c).to_numpy(zero_copy_only=False)
            for c in dedup_cols]
    order = np.lexsort(cols[::-1])
    keep = np.ones(t.num_rows, dtype=bool)
    if t.num_rows > 1:
        diff = np.zeros(t.num_rows - 1, dtype=bool)
        for c in cols:
            diff |= c[order][1:] != c[order][:-1]
        keep[1:] = diff
    t = t.take(pa.array(order[keep]))
    pq.write_table(t, path)
    return t.num_rows


def compact_neardup_index(state_dir: str, num_parts=None,
                          id_col: str = "doc_id") -> dict:
    """Compact a cross-run near-dup index (``ingest_neardup_run``
    state): merge every live run's shingle rows and sizes into ONE run,
    hash-BUCKETED by shingle hash with the same partitioner ingest
    uses. Returns ``{"runs_compacted", "buckets", "rows", "dir"}``.

    Why: a continuous crawl accumulates one run dir per night; without
    compaction every ingest re-reads and re-splits N runs' files (read
    amplification grows with run count). After compaction the index is
    ``num_parts`` pre-bucketed files — a subsequent ingest with the
    same ``num_parts`` routes each bucket file DIRECTLY to its
    partition task (zero index-side exchange; the mature index, the
    bulk of the data, never moves again).

    Crash-safe: the compacted run commits via write-to-temp + atomic
    ``rename`` with a ``MANIFEST.json`` naming the covered runs;
    covered dirs are deleted after the commit, and a crash in between
    is healed by :func:`_live_index_runs` (covered runs are ignored
    wherever the manifest survives). Stale ``_tmp_*`` dirs from crashed
    attempts are swept here."""
    import json
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from .dedup import _auto_parts
    from .exchange import fan_out_pieces, split_by_key, stream_block_refs

    from ..state.runs import run_files, sweep_stale

    num_parts = _auto_parts(num_parts)
    os.makedirs(state_dir, exist_ok=True)
    sweep_stale(state_dir)
    runs, manifests = _live_index_runs(state_dir)
    if not runs or (len(runs) == 1 and runs[0] in manifests
                    and manifests[runs[0]].get("num_parts") == num_parts):
        return {"runs_compacted": 0, "buckets": num_parts, "rows": 0,
                "dir": None}

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    os.makedirs(f"{tmp}/pairs", exist_ok=True)
    os.makedirs(f"{tmp}/sizes", exist_ok=True)
    pair_files = run_files(state_dir, runs, "pairs")
    size_files = run_files(state_dir, runs, "sizes")
    total = 0
    if pair_files:
        rows = rd.read_parquet(pair_files)
        parts = fan_out_pieces(split_by_key, stream_block_refs(rows),
                               num_parts, args=("g", num_parts))
        write = ray.remote(_write_bucket)
        total = int(sum(ray.get(
            [write.remote(f"{tmp}/pairs/bucket_{p:05d}.parquet", pieces,
                          ("g", id_col))
             for p, pieces in enumerate(parts)])))
    if size_files:
        rd.read_parquet(size_files).write_parquet(f"{tmp}/sizes")
    with open(f"{tmp}/MANIFEST.json", "w") as f:
        json.dump({"kind": "neardup", "num_parts": num_parts,
                   "id_col": id_col, "covers": runs}, f)
    final = _next_run_dir(state_dir)
    os.rename(tmp, final)
    for r in runs:
        shutil.rmtree(f"{state_dir}/{r}", ignore_errors=True)
    return {"runs_compacted": len(runs), "buckets": num_parts,
            "rows": total, "dir": final}


def ingest_neardup_run(ds, state_dir: str, window: int = 4,
                       tau_num: int = 1, tau_den: int = 2,
                       id_col: str = "doc_id", col: str = "text",
                       num_parts=None, max_df=None):
    """Incremental cross-RUN near-dup ingest — the continuous-crawl
    near-dedup shape (tonight's crawl vs every committed crawl): a new
    doc is DROPPED iff its exact ``window``-token shingle Jaccard vs ANY
    committed survivor, or vs ANY lower-id doc of this run, reaches
    ``tau_num/tau_den`` (integer-exact decision, same arithmetic as
    :func:`ngram_jaccard_dups`). Survivors commit their (shingle-hash,
    id) rows and set sizes to the persistent index under ``state_dir``.
    Doc ids must be unique across runs. Returns the surviving
    (id, n_shingles) Dataset. ``max_df`` caps the per-shingle pair
    blow-up (boilerplate footers shared by crawl AND index) — the
    stop-shingle trade of :func:`ngram_jaccard_dups`, evaluated on the
    combined new+old document frequency.

    100 TB shape: the index stores 8-byte shingle hashes + ids — never
    text; a new run streams the index's rows through ONE shingle-hash
    co-partitioned exchange against the new docs' rows, expanding
    new-new and new-old pairs only (the old-old bulk of a mature index
    is never touched); threshold evaluation reuses the narrow
    ``_pairs_finalize`` exchanges; survivor filtering and the commit are
    hash-partitioned semi/anti joins. The commit is write-to-temp +
    ``rename`` — a crashed run leaves no partial index."""
    import os
    import uuid

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import _auto_parts
    from .exchange import fan_out_pieces, split_by_key
    from .join import hash_join

    num_parts = _auto_parts(num_parts)
    os.makedirs(state_dir, exist_ok=True)
    runs, manifests = _live_index_runs(state_dir)

    new_rows = ds.map_batches(
        lambda b: _shingle_rows(b, window, id_col, col),
        batch_format="pyarrow").materialize()  # consumed 3x: pairs,
    # sizes, and the survivor commit — narrow (g, id) rows only

    def _size_partial(b: pa.Table) -> pa.Table:
        uid, sz = np.unique(b.column(id_col).to_numpy(),
                            return_counts=True)
        return pa.table({id_col: pa.array(uid, type=pa.int64()),
                         "sz_part": pa.array(sz.astype(np.int64))})

    sizes_new = new_rows.map_batches(_size_partial,
                                     batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("sz_part", alias_name="sz_part")) \
        .materialize()

    # runs whose pairs are pre-bucketed with OUR partitioner+num_parts:
    # their bucket files bypass the read+split below and land directly
    # in the matching partition's piece list (zero index-side exchange)
    aligned = [r for r in runs
               if manifests.get(r, {}).get("num_parts") == num_parts
               and os.path.isdir(f"{state_dir}/{r}/pairs")]
    split_runs = [r for r in runs if r not in aligned]

    def _index_files(sub: str, of_runs):
        # a committed run with an empty survivor set may have written no
        # parquet files (or no subdir at all) — skip those; an all-empty
        # index degrades to the no-committed-runs branch
        return [f"{state_dir}/{r}/{sub}/{f}" for r in of_runs
                if os.path.isdir(f"{state_dir}/{r}/{sub}")
                for f in sorted(os.listdir(f"{state_dir}/{r}/{sub}"))
                if f.endswith(".parquet")]

    new_parts = fan_out_pieces(split_by_key, new_rows.to_arrow_refs(),
                               num_parts, args=("g", num_parts))
    pair_files = _index_files("pairs", split_runs)
    size_files = _index_files("sizes", runs)
    if pair_files:
        old_rows = rd.read_parquet(pair_files)
        old_parts = fan_out_pieces(split_by_key, old_rows.to_arrow_refs(),
                                   num_parts, args=("g", num_parts))
    else:
        old_parts = [[] for _ in range(num_parts)]
    for r in aligned:
        for p in range(num_parts):
            bpath = f"{state_dir}/{r}/pairs/bucket_{p:05d}.parquet"
            if os.path.isfile(bpath):
                old_parts[p] = list(old_parts[p]) + [bpath]
    size_refs = list(sizes_new.to_arrow_refs())
    if size_files:
        old_sizes = rd.read_parquet(size_files)
        size_refs += list(old_sizes.to_arrow_refs())

    work = ray.remote(_ingest_pair_partition)
    pair_refs = [work.remote(id_col, max_df, np_, op_)
                 for np_, op_ in zip(new_parts, old_parts)]
    qualifying = _pairs_finalize(pair_refs, size_refs, tau_num, tau_den,
                                 id_col, num_parts)
    victims = qualifying.map_batches(
        lambda b: pa.table({"id_a": pc.unique(
            b.column("id_a").combine_chunks())}),
        batch_format="pyarrow")

    survivors = hash_join(sizes_new, victims, id_col, "id_a",
                          how="anti").materialize()
    surv_rows = hash_join(new_rows, survivors.select_columns([id_col]),
                          id_col, id_col, how="semi")

    tmp = f"{state_dir}/_tmp_{uuid.uuid4().hex}"
    # write_parquet of an EMPTY dataset creates no directory — pre-create
    # both payload dirs so the commit rename succeeds when every row of
    # the run was a near-duplicate of the committed index
    os.makedirs(f"{tmp}/pairs", exist_ok=True)
    os.makedirs(f"{tmp}/sizes", exist_ok=True)
    surv_rows.write_parquet(f"{tmp}/pairs")
    survivors.write_parquet(f"{tmp}/sizes")
    final = _next_run_dir(state_dir)
    os.rename(tmp, final)
    if survivors.count() == 0:
        # the anti join's all-filtered output loses its schema — return
        # a TYPED empty so downstream select/schema keep working
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "sz_part": pa.array([], type=pa.int64())}))
    return survivors


# ---------------------------------------------------------------------------
# cross-corpus exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------

def _cross_expand_partition(max_df, pieces):
    """One g-partition of the CROSS set-similarity join: pieces carry
    (g, tid) rows of both corpora (tid = doc_id*2 + side; side 1 =
    right). Per shingle group, emit every (left, right) cross pair with
    its local multiplicity partial (= the pair's |A∩B| contribution from
    this partition's shingles) plus per-tid capped size partials —
    left-left and right-right pairs are never expanded."""
    import ray
    if pieces and isinstance(pieces[0], ray.ObjectRef):
        pieces = ray.get(list(pieces))
    pairs_empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                            "id_b": pa.array([], type=pa.int64()),
                            "n_part": pa.array([], type=pa.int64())})
    sizes_empty = pa.table({"tid": pa.array([], type=pa.int64()),
                            "sz_part": pa.array([], type=pa.int64())})
    pieces = [t for t in pieces if t.num_rows]
    if not pieces:
        return pairs_empty, sizes_empty
    t = pa.concat_tables(pieces)
    g = t.column("g").to_numpy()
    tid = t.column("tid").to_numpy()
    side = tid & 1
    order = np.lexsort((tid, side, g))
    g, tid, side = g[order], tid[order], side[order]
    keep = np.ones(len(g), dtype=bool)        # cross-batch (g, tid) dedup
    keep[1:] = (g[1:] != g[:-1]) | (tid[1:] != tid[:-1])
    g, tid, side = g[keep], tid[keep], side[keep]
    starts_mask = np.ones(len(g), dtype=bool)
    starts_mask[1:] = g[1:] != g[:-1]
    seg_id = np.cumsum(starts_mask) - 1
    if max_df is not None:
        # df = the shingle's TOTAL document frequency across both
        # corpora (every row of a shingle lives in this partition)
        seg_sizes = np.bincount(seg_id)
        hot = seg_sizes > max_df
        if hot.any():
            keep = ~hot[seg_id]
            g, tid, side = g[keep], tid[keep], side[keep]
            starts_mask = np.ones(len(g), dtype=bool)
            starts_mask[1:] = g[1:] != g[:-1]
    if len(g) == 0:
        return pairs_empty, sizes_empty
    uid, sz = np.unique(tid, return_counts=True)
    sizes = pa.table({"tid": pa.array(uid, type=pa.int64()),
                      "sz_part": pa.array(sz.astype(np.int64))})
    starts = np.flatnonzero(starts_mask)
    seg_len = np.diff(np.append(starts, len(g)))
    # reduceat keeps the input dtype — bool would saturate at 1
    l_cnt = np.add.reduceat((side == 0).astype(np.int64), starts)
    r_cnt = seg_len - l_cnt
    tot = l_cnt * r_cnt
    total = int(tot.sum())
    if total == 0:
        return pairs_empty, sizes
    seg_of = np.repeat(np.arange(len(starts), dtype=np.int64), tot)
    within = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(tot) - tot, tot)
    li = within // r_cnt[seg_of]
    ri = within % r_cnt[seg_of]
    id_a = tid[starts[seg_of] + li]                       # left (even)
    id_b = tid[starts[seg_of] + l_cnt[seg_of] + ri]       # right (odd)
    po = np.lexsort((id_b, id_a))
    pa_, pb_ = id_a[po], id_b[po]
    first = np.ones(len(pa_), dtype=bool)
    first[1:] = (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
    sidx = np.flatnonzero(first)
    n_part = np.diff(np.append(sidx, len(pa_)))
    return pa.table({"id_a": pa.array(pa_[sidx], type=pa.int64()),
                     "id_b": pa.array(pb_[sidx], type=pa.int64()),
                     "n_part": pa.array(n_part.astype(np.int64))}), sizes


def cross_jaccard_pairs(left, right, window: int = 4, tau_num: int = 1,
                        tau_den: int = 2, max_df=None, num_parts=None,
                        id_col: str = "doc_id", col: str = "text"):
    """Cross-corpus exact n-gram Jaccard similarity JOIN: every
    (left doc, right doc) pair whose distinct ``window``-token
    shingle-hash Jaccard meets ``tau_num/tau_den`` — the pairwise
    contamination/overlap REPORT between a training corpus and a
    benchmark set (:func:`decontaminate_frac` answers "how contaminated
    is this doc"; this answers "against WHICH benchmark doc, and how
    much"). Integer-exact threshold, same contract as
    :func:`ngram_jaccard_dups`.

    Scale shape: both corpora's (g, tagged-id) shingle rows meet in ONE
    g-co-partitioned exchange; per shingle group only left × right
    pairs expand (never within-corpus pairs — against a small benchmark
    the blowup is bounded by the benchmark's per-shingle df); ``max_df``
    caps hot shingles by their TOTAL cross-corpus df; |A∩B| finalizes
    through the same two narrow pair exchanges as the self-join
    (:func:`_pairs_finalize` — tagged ids keep the two id spaces
    collision-free through the shared sizes table). Returns a Dataset of
    (left_id, right_id, inter, union_n); doc ids must be non-negative.
    """
    from .dedup import _auto_parts
    from .exchange import fan_out_pieces, split_by_key
    import ray

    num_parts = _auto_parts(num_parts)

    def tagged(side: int):
        def fn(b: pa.Table) -> pa.Table:
            sh = _shingle_rows(b, window, id_col, col)
            tid = pc.add(pc.multiply(sh.column(id_col),
                                     pa.scalar(2, pa.int64())),
                         pa.scalar(side, pa.int64()))
            return pa.table({"g": sh.column("g"), "tid": tid})
        return fn

    shingles = left.map_batches(tagged(0), batch_format="pyarrow") \
        .union(right.map_batches(tagged(1), batch_format="pyarrow"))
    work = ray.remote(num_returns=2)(_cross_expand_partition)
    from .exchange import stream_block_refs
    per_part = fan_out_pieces(split_by_key, stream_block_refs(shingles),
                              num_parts, args=("g", num_parts))
    pair_refs, size_refs = [], []
    for pieces in per_part:
        pr, sr = work.remote(max_df, pieces)
        pair_refs.append(pr)
        size_refs.append(sr)
    out = _pairs_finalize(pair_refs, size_refs, tau_num, tau_den,
                          "tid", num_parts)

    def untag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 and "id_a" not in b.column_names:
            return pa.table({"left_id": pa.array([], type=pa.int64()),
                             "right_id": pa.array([], type=pa.int64()),
                             "inter": pa.array([], type=pa.int64()),
                             "union_n": pa.array([], type=pa.int64())})
        half = pa.scalar(2, pa.int64())
        return pa.table({
            "left_id": pc.divide(b.column("id_a"), half),
            "right_id": pc.divide(b.column("id_b"), half),
            "inter": b.column("inter"),
            "union_n": b.column("union_n")})

    import ray as _ray
    import ray.data as rd
    ut = _ray.remote(untag)
    return rd.from_arrow_refs([ut.remote(r) for r in out.to_arrow_refs()])


# ---------------------------------------------------------------------------
# n-gram novelty: how much of a doc is unique to it corpus-wide
# ---------------------------------------------------------------------------

def _novelty_partition(id_col: str, pieces) -> pa.Table:
    """One shingle-hash partition: every (g, doc) row of a shingle
    lives here, so the local segment size IS the global df; emit
    per-doc (n_grams, n_novel) partials."""
    from .exchange import concat_typed
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      "ng_part": pa.array([], type=pa.int64()),
                      "nv_part": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, "g", id_col)
    if t is None or t.num_rows == 0:
        return empty
    g = t.column("g").to_numpy()
    ids = t.column(id_col).to_numpy()
    order = np.lexsort((ids, g))
    gg, ii = g[order], ids[order]
    starts = np.flatnonzero(np.concatenate([[True], gg[1:] != gg[:-1]]))
    seg = np.diff(np.append(starts, len(gg)))
    novel = (np.repeat(seg, seg) == 1).astype(np.int64)
    uid = np.unique(ii)
    pos = np.searchsorted(uid, ii)
    ng = np.zeros(len(uid), dtype=np.int64)
    nv = np.zeros(len(uid), dtype=np.int64)
    np.add.at(ng, pos, 1)
    np.add.at(nv, pos, novel)
    return pa.table({id_col: pa.array(uid, type=pa.int64()),
                     "ng_part": pa.array(ng, type=pa.int64()),
                     "nv_part": pa.array(nv, type=pa.int64())})


def novelty_scores(ds, window: int = 4, id_col: str = "doc_id",
                   col: str = "text", num_parts: int = 16):
    """Per-document n-gram novelty: of the doc's DISTINCT
    ``window``-token shingles, how many appear in NO other document
    (corpus-wide df == 1) — high novelty flags original content,
    low novelty flags boilerplate/template text, and the complement
    (n_grams - n_novel) is the memorization-risk mass shared with the
    rest of the corpus. Returns (id, n_grams, n_novel).

    Scale shape: the one corpus-sized exchange carries distinct
    (shingle-hash, doc) int64 rows keyed by hash — text never
    shuffles; df and the per-doc partials are computed inside each
    partition (a shingle's rows are co-located by construction) and
    only O(docs) partial rows reach the final small groupby."""
    from ray.data.aggregate import Sum

    from .exchange import hash_exchange
    rows = ds.map_batches(
        lambda b: _shingle_rows(b, window, id_col, col),
        batch_format="pyarrow")
    partials = hash_exchange(rows, "g", _novelty_partition, num_parts,
                             fn_args=(id_col,))
    return partials.groupby(id_col).aggregate(
        Sum("ng_part", alias_name="n_grams"),
        Sum("nv_part", alias_name="n_novel"))


def _budget_partition(group_col: str, id_col: str, budget: int,
                      pieces) -> pa.Table:
    """One group partition of :func:`token_budget_sample`: lexsort by
    (group, md5, id), exclusive segmented cumsum of token counts, keep
    iff the budget was not exhausted before the doc."""
    import hashlib
    from .exchange import concat_typed
    empty = pa.table({id_col: pa.array([], type=pa.int64()),
                      group_col: pa.array([], type=pa.string()),
                      "n_tokens": pa.array([], type=pa.int64()),
                      "cum_before": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, group_col, id_col, "n_tokens")
    if t is None or t.num_rows == 0:
        return empty
    ids = np.asarray(pc.cast(t.column(id_col), pa.int64())
                     .to_numpy(zero_copy_only=False), dtype=np.int64)
    h = np.array([hashlib.md5(str(v).encode()).hexdigest()
                  for v in ids.tolist()])
    gcol = t.column(group_col)
    if isinstance(gcol, pa.ChunkedArray):
        gcol = gcol.combine_chunks()
    codes = np.asarray(pc.dictionary_encode(gcol).indices, dtype=np.int64)
    n_tok = np.asarray(pc.cast(t.column("n_tokens"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.lexsort((ids, h, codes))
    g, v = codes[order], n_tok[order]
    cum = np.cumsum(v)
    new_g = np.ones(len(g), dtype=bool)
    new_g[1:] = g[1:] != g[:-1]
    start = np.maximum.accumulate(np.where(new_g, np.arange(len(g)), 0))
    before = cum - v - np.where(new_g, 0, (cum - v)[start])
    before[new_g] = 0
    keep = before < budget
    sel = pa.array(order[keep])
    return pa.table({
        id_col: t.column(id_col).take(sel),
        group_col: t.column(group_col).take(sel),
        "n_tokens": t.column("n_tokens").take(sel),
        "cum_before": pa.array(before[keep], type=pa.int64())})


def token_budget_sample(ds, budget: int, group_col: str = "lang",
                        id_col: str = "doc_id", col: str = "text",
                        num_parts: int = 16):
    """Deterministic per-group token-budget sampling: within each group,
    documents are taken in md5(id) order (tie id) until the group's
    cumulative token count reaches ``budget`` — a doc is kept iff the
    budget was not already exhausted BEFORE it (so the crossing doc is
    kept and each nonempty group keeps at least one). The "give me N
    training tokens per domain" primitive: reproducible across runs and
    partitionings, unlike seeded sampling.

    Scale shape: one streaming pass reduces each doc to a narrow
    (group, id, n_tokens) row; ONE group-keyed exchange; per-partition
    lexsort + segmented exclusive cumsum. Only sampled rows return, as
    a Dataset of (id, group, n_tokens, cum_before)."""
    from .exchange import hash_exchange
    from .text import _token_lists

    def narrow(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        return pa.table({
            id_col: pc.cast(b.column(id_col), pa.int64()),
            group_col: b.column(group_col),
            "n_tokens": pa.array(
                np.diff(np.asarray(toks.offsets, dtype=np.int64)),
                type=pa.int64())})

    rows = ds.map_batches(narrow, batch_format="pyarrow")
    return hash_exchange(rows, group_col, _budget_partition, num_parts,
                         fn_args=(group_col, id_col, int(budget)))


# ---------------------------------------------------------------------------
# OOV rates under a top-K vocabulary budget
# ---------------------------------------------------------------------------

def _oov_score_batch(top_ref, group_col: str, col: str,
                     batch: pa.Table) -> pa.Table:
    """Per-batch (group, tokens, oov) partials against the broadcast
    sorted top-K hash array."""
    import ray
    top = ray.get(top_ref) if isinstance(top_ref, ray.ObjectRef) \
        else top_ref
    toks = _token_lists(batch.column(col))
    svals = pc.list_flatten(toks).to_pylist()
    if not svals:
        # empty block carries the REAL group type — hardcoding string
        # mixes block schemas when group_col is non-string
        return pa.table({
            group_col: pa.array(
                [], type=batch.schema.field(group_col).type),
            "tokens": pa.array([], type=pa.int64()),
            "oov": pa.array([], type=pa.int64())})
    uniq, inv = np.unique(np.array(svals, dtype=object),
                          return_inverse=True)
    h_uniq = np.fromiter((_md5_60(s) for s in uniq), dtype=np.int64,
                         count=len(uniq))
    h = h_uniq[inv]
    if len(top):
        pos = np.searchsorted(top, h)
        pos_c = np.minimum(pos, len(top) - 1)
        oov = top[pos_c] != h
    else:
        oov = np.ones(len(h), dtype=bool)
    counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
    row_of = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    g = batch.column(group_col)
    g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
    codes_arr = pc.dictionary_encode(g)
    gc = np.asarray(codes_arr.indices, dtype=np.int64)[row_of]
    k = int(gc.max()) + 1 if len(gc) else 0
    tok_per_g = np.bincount(gc, minlength=k).astype(np.int64)
    oov_per_g = bincount_i64(gc, oov, minlength=k)
    names = np.asarray(codes_arr.dictionary)
    nz = tok_per_g > 0
    return pa.table({group_col: pa.array(names[:k][nz].tolist(),
                                         type=pa.string()),
                     "tokens": pa.array(tok_per_g[nz]),
                     "oov": pa.array(oov_per_g[nz])})


def oov_rates(ds, vocab_k: int = 16, group_col: str = "lang",
              col: str = "text"):
    """Per-group OOV mass under a top-``vocab_k`` vocabulary budget:
    rank token types by (count desc, hash asc), keep the top K as the
    vocabulary, and report each group's token count, OOV occurrence
    count, and integer ``oov_ppm`` — the "what breaks if we cap the
    tokenizer here, and for whom" diagnostic that pairs with
    :func:`token_coverage`.

    Two streaming passes (the model-then-apply shape shared with DSIR /
    decontaminate): pass 1 builds type counts with per-batch partials +
    one groupby over V type rows, the top-K table (K rows) broadcasts
    via plasma; pass 2 scores per batch vectorized (searchsorted
    membership) and pre-aggregates per group before a tiny final
    groupby. Returns (group, tokens, oov, oov_ppm)."""
    import ray
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        lambda t: _tok_count_rows(t, col), batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n", alias_name="cnt")) \
        .sort(["cnt", "h"], descending=[True, False]).limit(vocab_k)
    tp = counts.to_pandas()
    top = np.sort(tp["h"].to_numpy().astype(np.int64)) if len(tp) \
        else np.empty(0, dtype=np.int64)
    top_ref = ray.put(top)

    partials = ds.map_batches(
        lambda b: _oov_score_batch(top_ref, group_col, col, b),
        batch_format="pyarrow")
    agg = partials.groupby(group_col).aggregate(
        Sum("tokens", alias_name="tokens"),
        Sum("oov", alias_name="oov"))

    def ppm(b: pa.Table) -> pa.Table:
        t = b.column("tokens").to_numpy()
        o = b.column("oov").to_numpy()
        return b.append_column(
            "oov_ppm", pa.array(o * 1_000_000 // np.maximum(t, 1),
                                type=pa.int64()))

    return agg.map_batches(ppm, batch_format="pyarrow")
