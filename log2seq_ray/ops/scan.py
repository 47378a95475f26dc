"""Distributed prefix-scan operators: deterministic sequence packing and
global shuffle ranks for training-data layout.

The scan pattern (the one all-to-all here is Ray's range-partitioned
``Dataset.sort``): sort by the order key, then ONE tiny task per block
computes its local sum, the driver exclusive-scans the per-block totals
(a vector of ``n_blocks`` ints — KBs at any corpus size), and one final
task per block adds its offset to a local vectorized cumsum. Rows never
pass through the driver; the scan term is O(n_blocks), independent of
row count."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _block_sum(col: str, tbl: pa.Table) -> int:
    v = pc.sum(tbl.column(col)).as_py()
    return int(v) if v is not None else 0


def _sorted_refs(ds):
    """Block refs of a sorted Dataset, in global sort order."""
    return ds.to_arrow_refs()


def scan_offsets(refs, col: str):
    """Exclusive prefix offsets per block of ``col`` sums (driver holds
    only the n_blocks-long totals vector)."""
    import ray
    bsum = ray.remote(_block_sum)
    totals = ray.get([bsum.remote(col, r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    return offsets


def _pack_block(chunk_tokens: int, id_col: str, offset: int,
                tbl: pa.Table) -> pa.Table:
    n = tbl.column("n_tokens").to_numpy()
    start = offset + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(
        np.int64)
    last = np.where(n == 0, start, start + n - 1)
    return pa.table({
        id_col: tbl.column(id_col),
        "n_tokens": pa.array(n, type=pa.int64()),
        "start_tok": pa.array(start, type=pa.int64()),
        "chunk_first": pa.array(start // chunk_tokens, type=pa.int64()),
        "chunk_last": pa.array(last // chunk_tokens, type=pa.int64()),
    })


def pack_chunks(ds, chunk_tokens: int = 1024, id_col: str = "doc_id",
                col: str = "text"):
    """Deterministic sequence packing: documents concatenated in id order
    and cut every ``chunk_tokens`` tokens; per document emits
    (id, n_tokens, start_tok, chunk_first, chunk_last) — the chunk-range
    a training loader reads for that document. Zero-token documents pin
    both chunk ids to the chunk their start position falls in.

    Scale shape: one narrow (id, n_tokens) Dataset → Ray range-
    partitioned sort → the O(n_blocks) offset scan above. All chunk
    arithmetic is integer floor division — SQL-exact."""
    import ray
    import ray.data as rd
    from .text import _token_lists

    def counts(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    narrow = ds.map_batches(counts, batch_format="pyarrow").sort(id_col)
    refs = _sorted_refs(narrow)
    offsets = scan_offsets(refs, "n_tokens")
    pack = ray.remote(_pack_block)
    out = [pack.remote(chunk_tokens, id_col, int(off), r)
           for off, r in zip(offsets, refs)]
    return rd.from_arrow_refs(out)


def _rank_block(id_col: str, offset: int, tbl: pa.Table) -> pa.Table:
    return pa.table({
        id_col: tbl.column(id_col),
        "rank": pa.array(offset + 1 + np.arange(tbl.num_rows,
                                                dtype=np.int64)),
    })


def _count_block(tbl: pa.Table) -> int:
    return tbl.num_rows


def shuffle_rank(ds, id_col: str = "doc_id"):
    """Deterministic global training-shuffle order: rank 1..N by
    ``(md5(id), id)``. Unlike ``random_shuffle`` this is reproducible
    across runs and partitionings, resumable mid-epoch, and computable
    identically in SQL — the property a training-data layout needs.

    One Ray sort of narrow (hash, id) rows + the O(n_blocks) offset
    scan; the md5 loop is C-speed digest-bound (hashutil measurements)."""
    import ray
    import ray.data as rd
    from .hashutil import value_bytes

    def hashed(b: pa.Table) -> pa.Table:
        keys = value_bytes(b.column(id_col).to_numpy(zero_copy_only=False))
        h = [hashlib.md5(k).hexdigest() for k in keys]
        return pa.table({id_col: b.column(id_col),
                         "__h": pa.array(h, type=pa.string())})

    srt = ds.map_batches(hashed, batch_format="pyarrow") \
        .sort(["__h", id_col])
    refs = _sorted_refs(srt)
    count = ray.remote(_count_block)
    totals = ray.get([count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)
    rank = ray.remote(_rank_block)
    out = [rank.remote(id_col, int(off), r)
           for off, r in zip(offsets, refs)]
    return rd.from_arrow_refs(out)


def _shard_block(k_shards: int, id_col: str, offset: int,
                 tbl: pa.Table) -> pa.Table:
    n = tbl.num_rows
    rank = offset + np.arange(n, dtype=np.int64)
    return pa.table({
        id_col: tbl.column(id_col),
        "n_tokens": tbl.column("n_tokens"),
        "shard": pa.array(rank % k_shards, type=pa.int64()),
    })


def balanced_shards(ds, k_shards: int = 16, id_col: str = "doc_id",
                    col: str = "text"):
    """Token-balanced output sharding: documents ranked by
    (n_tokens desc, id asc) and dealt round-robin over ``k_shards`` —
    the longest-processing-time heuristic's sorted round-robin, which
    bounds any shard's token excess by one max-doc. Deterministic
    across runs and partitionings (the resumable-output property), and
    computable identically in SQL (ROW_NUMBER % k).

    Same scale shape as :func:`shuffle_rank`: one narrow
    (id, n_tokens) Ray range-partitioned sort + the O(n_blocks) offset
    scan; rows never pass the driver. Returns
    (id, n_tokens, shard)."""
    import ray
    import ray.data as rd
    from .text import _token_lists

    def counts(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column(col))
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    srt = ds.map_batches(counts, batch_format="pyarrow") \
        .sort(["n_tokens", id_col], descending=[True, False])
    refs = _sorted_refs(srt)
    count = ray.remote(_count_block)
    totals = ray.get([count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(
        np.int64)
    shard = ray.remote(_shard_block)
    out = [shard.remote(k_shards, id_col, int(off), r)
           for off, r in zip(offsets, refs)]
    return rd.from_arrow_refs(out)
