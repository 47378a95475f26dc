"""Distributed graph analytics over pair/edge Datasets.

The dedup family already produces graphs — MinHash/SimHash near-dup
pairs, embedding neighbour pairs — and `label_propagation_clusters`
(ops/dedup.py) walks them for connected components. This module adds
iterative *value* propagation over the same BSP skeleton: edges are
hash-partitioned by ``src`` ONCE, per-node state lives co-partitioned
(node id hashes to its partition), and each superstep ships only
pre-aggregated ``(dst, partial)`` rows between partitions — per-task
memory is one partition's edges + state, never the graph, and the
driver sees only O(num_parts) scalars per round.

All arithmetic is int64 fixed point (``scale`` units = rank mass 1.0,
floor division everywhere), so results are exactly reproducible by the
DuckDB oracles — no float summation-order drift.

No reference counterpart (beyond-reference operator; the reference
engine is a single-process log parser, /root/reference/log2seq).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pr_edge_partition(pieces) -> pa.Table:
    """Concat one src-hash partition's edges and attach each edge's
    src outdegree (all edges of a src are co-located, so the count is
    exact). Returns (src, dst, outdeg) sorted by src."""
    from .exchange import concat_typed
    empty = pa.table({"src": pa.array([], type=pa.int64()),
                      "dst": pa.array([], type=pa.int64()),
                      "outdeg": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, "src", "dst")
    if t is None or t.num_rows == 0:
        return empty
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    uniq, counts = np.unique(src, return_counts=True)
    outdeg = counts[np.searchsorted(uniq, src)]
    return pa.table({"src": pa.array(src, type=pa.int64()),
                     "dst": pa.array(dst, type=pa.int64()),
                     "outdeg": pa.array(outdeg, type=pa.int64())})


def _pr_node_ids(edges: pa.Table, dst_pieces, node_pieces) -> pa.Table:
    """One partition's vertex set: local edge srcs (they hash here by
    construction) ∪ routed dsts ∪ routed explicit node ids."""
    from .exchange import resolve_pieces
    ids = []
    if edges.num_rows:
        ids.append(edges.column("src").to_numpy())
    for p in resolve_pieces(dst_pieces):
        ids.append(p.column("dst").to_numpy())
    for p in resolve_pieces(node_pieces):
        ids.append(p.column("id").to_numpy())
    if not ids:
        return pa.table({"id": pa.array([], type=pa.int64())})
    u = np.unique(np.concatenate(ids))
    return pa.table({"id": pa.array(u, type=pa.int64())})


def _pr_init(ids: pa.Table, r0: int) -> pa.Table:
    return pa.table({
        "id": ids.column("id"),
        "rank": pa.array(np.full(ids.num_rows, r0, dtype=np.int64),
                         type=pa.int64())})


def _pr_propagate(edges: pa.Table, ranks: pa.Table, num_parts: int):
    """Superstep, sender side: each edge ships ``rank[src] // outdeg``
    to its dst; partials are pre-summed per dst BEFORE the exchange and
    split by dst hash. Returns num_parts (id, s) pieces."""
    from .exchange import split_by_key
    empty = pa.table({"id": pa.array([], type=pa.int64()),
                      "s": pa.array([], type=pa.int64())})
    if edges.num_rows == 0 or ranks.num_rows == 0:
        return [empty] * num_parts
    idx = pc.index_in(edges.column("src").combine_chunks(),
                      value_set=ranks.column("id").combine_chunks())
    r_src = ranks.column("rank").combine_chunks() \
        .take(idx).to_numpy(zero_copy_only=False).astype(np.int64)
    contrib = r_src // edges.column("outdeg").to_numpy()
    dst = edges.column("dst").to_numpy()
    order = np.argsort(dst, kind="stable")
    d, c = dst[order], contrib[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    sums = np.add.reduceat(c, starts)
    msgs = pa.table({"id": pa.array(d[starts], type=pa.int64()),
                     "s": pa.array(sums, type=pa.int64())})
    return split_by_key(msgs, "id", num_parts)


def _pr_update(ids: pa.Table, msg_pieces, base: int,
               damping_num: int, damping_den: int) -> pa.Table:
    """Superstep, receiver side:
    rank'(v) = base + (damping_num * Σ incoming) // damping_den —
    nodes with no incoming mass get exactly ``base``."""
    from .exchange import resolve_pieces
    sums = np.zeros(ids.num_rows, dtype=np.int64)
    id_col = ids.column("id").combine_chunks()
    for p in resolve_pieces(msg_pieces):
        pos = pc.index_in(p.column("id").combine_chunks(),
                          value_set=id_col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(sums, pos, p.column("s").to_numpy())
    rank = base + (damping_num * sums) // damping_den
    return pa.table({"id": id_col,
                     "rank": pa.array(rank, type=pa.int64())})


def pagerank(edges, num_iters: int = 5, damping_num: int = 85,
             damping_den: int = 100, scale: int = 10**12,
             nodes=None, num_parts=None):
    """Distributed PageRank by BSP power iteration, int64 fixed point.

    ``edges``: Dataset with int64 ``src``/``dst`` columns (directed;
    symmetrize upstream for an undirected graph). ``nodes``: optional
    Dataset with an int64 ``id`` column fixing the vertex set V
    (isolated vertices hold base rank and count toward N); default
    V = union(src, dst). Exactly ``num_iters`` supersteps:

        r0(v)   = scale // N
        r_{t+1} = base + (damping_num * Σ_{(u,v)∈E} r_t(u) // outdeg(u))
                         // damping_den,   base = (scale
                         * (damping_den - damping_num) // damping_den)
                         // N

    Floor division throughout — results are integer-exact and
    summation-order independent, hence DuckDB-reproducible. Mass at
    dangling vertices (outdeg 0) is dropped, the simplest deterministic
    contract. Returns a Dataset of (node_id, rank).

    100 TB shape: edges hash-partition by src ONCE and never move
    again; rank state is co-partitioned (a vertex's rank lives where
    its out-edges live); each superstep exchanges only per-partition
    pre-summed (dst, partial) int64 rows — O(distinct dsts per
    partition), not O(edges) — and the driver handles only N (one
    scalar). Rounds are a fixed constant, not data-dependent.
    """
    import ray
    import ray.data as rd

    from .dedup import _auto_parts
    from .exchange import fan_out_pieces, split_by_key

    num_parts = _auto_parts(num_parts)
    edge_blocks = edges.select_columns(["src", "dst"]).to_arrow_refs()
    per_part = fan_out_pieces(split_by_key, edge_blocks, num_parts,
                              args=("src", num_parts))
    edge_task = ray.remote(_pr_edge_partition)
    edge_refs = [edge_task.remote(p) for p in per_part]

    dst_parts = fan_out_pieces(
        lambda t, n: split_by_key(
            t.select(["dst"]) if t.num_rows else t, "dst", n),
        edge_blocks, num_parts, args=(num_parts,))
    if nodes is not None:
        node_parts = fan_out_pieces(
            split_by_key, nodes.select_columns(["id"]).to_arrow_refs(),
            num_parts, args=("id", num_parts))
    else:
        node_parts = [[] for _ in range(num_parts)]

    ids_task = ray.remote(_pr_node_ids)
    id_refs = [ids_task.remote(edge_refs[p], dst_parts[p], node_parts[p])
               for p in range(num_parts)]
    counts = ray.get([ray.remote(lambda t: t.num_rows).remote(r)
                      for r in id_refs])
    n_nodes = int(sum(counts))
    empty = rd.from_arrow(pa.table({
        "node_id": pa.array([], type=pa.int64()),
        "rank": pa.array([], type=pa.int64())}))
    if n_nodes == 0:
        return empty
    r0 = scale // n_nodes
    base = (scale * (damping_den - damping_num) // damping_den) // n_nodes

    init = ray.remote(_pr_init)
    rank_refs = [init.remote(r, r0) for r in id_refs]
    prop = ray.remote(num_returns=num_parts)(_pr_propagate) \
        if num_parts > 1 else ray.remote(
            lambda e, r, n: _pr_propagate(e, r, n)[0])
    upd = ray.remote(_pr_update)
    for _ in range(num_iters):
        msg_pieces = [[] for _ in range(num_parts)]
        for p in range(num_parts):
            out = prop.remote(edge_refs[p], rank_refs[p], num_parts)
            if num_parts == 1:
                out = [out]
            for q, piece in enumerate(out):
                msg_pieces[q].append(piece)
        rank_refs = [upd.remote(id_refs[q], msg_pieces[q], base,
                                damping_num, damping_den)
                     for q in range(num_parts)]
    ren = ray.remote(lambda t: pa.table({
        "node_id": pc.cast(t.column("id"), pa.int64()),
        "rank": pc.cast(t.column("rank"), pa.int64())}))
    return rd.from_arrow_refs([ren.remote(r) for r in rank_refs])


def symmetrize_pairs(pairs, a_col: str = "id_a", b_col: str = "id_b"):
    """(id_a, id_b) pair Dataset → symmetrized (src, dst) edge Dataset
    (both directions per pair), the edge form `pagerank` consumes."""
    def sym(b: pa.Table) -> pa.Table:
        ia = b.column(a_col).combine_chunks().cast(pa.int64())
        ib = b.column(b_col).combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([ia, ib]),
                         "dst": pa.concat_arrays([ib, ia])})
    return pairs.map_batches(sym, batch_format="pyarrow")
