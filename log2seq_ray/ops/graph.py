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


def _graph_parts(ds, num_parts, rows_per_part: int = 250_000):
    """Partition count sized to the EDGE COUNT, not the cluster.

    The iterative graph stages here are num_parts² in task/object
    count (orient → wedge → close, propagate rounds), so
    over-partitioning a SPARSE graph — the common near-dup-pair case —
    costs far more in orchestration than the compute itself (measured:
    triangle_counts over a ~100k-pair SimHash graph spent ~20 s in
    ~12k near-empty tasks at num_parts=64, ~1 s at the adaptive
    count). An explicit ``num_parts`` is honored unchanged; otherwise
    the narrow input (16 B/row pairs) is materialized — so the count
    is free metadata and every downstream fan-out reuses the same
    blocks instead of re-executing the upstream pipeline — and one
    partition is allotted per ``rows_per_part`` rows, capped by the
    cluster default. Returns ``(ds, num_parts)``."""
    from .dedup import _auto_parts
    if num_parts is not None:
        return ds, num_parts
    ds = ds.materialize()
    n = ds.count()
    return ds, max(1, min(_auto_parts(None),
                          -(-n // max(1, rows_per_part))))


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

    from .exchange import fan_out_pieces, split_by_key

    edges, num_parts = _graph_parts(
        edges.select_columns(["src", "dst"]), num_parts)
    edge_blocks = edges.to_arrow_refs()
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


def _tc_deg_partition(pieces):
    """Stage A, one src-hash partition of the symmetrized edges:
    (node, deg) for every local node (all edges of a node are
    co-located, so counts are exact) + edge rows carrying deg_src,
    pre-split by dst hash for stage B. Returns [deg_table, *pieces]."""
    from .exchange import concat_typed, split_by_key
    t = concat_typed(pieces, "src", "dst")
    deg_empty = pa.table({"id": pa.array([], type=pa.int64()),
                          "deg": pa.array([], type=pa.int64())})
    if t is None or t.num_rows == 0:
        return deg_empty, pa.table(
            {"src": pa.array([], type=pa.int64()),
             "dst": pa.array([], type=pa.int64()),
             "deg_src": pa.array([], type=pa.int64())})
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    uniq, counts = np.unique(src, return_counts=True)
    deg = pa.table({"id": pa.array(uniq, type=pa.int64()),
                    "deg": pa.array(counts, type=pa.int64())})
    edges = pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "deg_src": pa.array(counts[np.searchsorted(uniq, src)],
                            type=pa.int64())})
    return deg, edges


def _tc_orient(deg: pa.Table, pieces, num_parts: int):
    """Stage B, one dst-hash partition: attach deg_dst from the local
    degree table, keep each undirected edge ONCE in low→high
    (deg, id) orientation (u→v iff (deg_u,u) < (deg_v,v)); split the
    oriented (u, v, deg_v) rows by u hash for stage C."""
    from .exchange import resolve_pieces, split_by_key
    empty = pa.table({"u": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.int64()),
                      "deg_v": pa.array([], type=pa.int64())})
    rows = [p for p in resolve_pieces(pieces) if p.num_rows]
    if not rows:
        return [empty] * num_parts
    t = pa.concat_tables(rows)
    idx = pc.index_in(t.column("dst").combine_chunks(),
                      value_set=deg.column("id").combine_chunks())
    deg_dst = deg.column("deg").combine_chunks().take(idx) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    deg_src = t.column("deg_src").to_numpy()
    fwd = (deg_src < deg_dst) | ((deg_src == deg_dst) & (src < dst))
    ori = pa.table({"u": pa.array(src[fwd], type=pa.int64()),
                    "v": pa.array(dst[fwd], type=pa.int64()),
                    "deg_v": pa.array(deg_dst[fwd], type=pa.int64())})
    return split_by_key(ori, "u", num_parts)


def _tc_adjacency(pieces):
    """Stage C, one u-hash partition: the oriented adjacency, sorted by
    (u, v) — doubles as the membership index for stage D."""
    from .exchange import resolve_pieces
    rows = [p for p in resolve_pieces(pieces) if p.num_rows]
    if not rows:
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64()),
                         "deg_v": pa.array([], type=pa.int64())})
    t = pa.concat_tables(rows)
    u = t.column("u").to_numpy()
    v = t.column("v").to_numpy()
    order = np.lexsort((v, u))
    return pa.table({
        "u": pa.array(u[order], type=pa.int64()),
        "v": pa.array(v[order], type=pa.int64()),
        "deg_v": pa.array(t.column("deg_v").to_numpy()[order],
                          type=pa.int64())})


def _tc_wedges(adj: pa.Table, num_parts: int):
    """Stage C': wedges from one partition's oriented adjacency — for
    every neighbour pair {a, b} of a u, the closing edge (if any) is
    x→y with x the (deg, id)-smaller endpoint; rows (x, y, u) split by
    x hash. Σ|N+(u)|² is O(m^1.5) by the orientation."""
    from .exchange import segment_pair_indices, split_by_key
    empty = pa.table({"x": pa.array([], type=pa.int64()),
                      "y": pa.array([], type=pa.int64()),
                      "u": pa.array([], type=pa.int64())})
    if adj.num_rows == 0:
        return [empty] * num_parts
    u = adj.column("u").to_numpy()
    v = adj.column("v").to_numpy()
    dv = adj.column("deg_v").to_numpy()
    _, i_row, j_row = segment_pair_indices(u)
    if not len(i_row):
        return [empty] * num_parts
    a, b = v[i_row], v[j_row]
    da, db = dv[i_row], dv[j_row]
    a_first = (da < db) | ((da == db) & (a < b))
    x = np.where(a_first, a, b)
    y = np.where(a_first, b, a)
    w = pa.table({"x": pa.array(x, type=pa.int64()),
                  "y": pa.array(y, type=pa.int64()),
                  "u": pa.array(u[i_row], type=pa.int64())})
    return split_by_key(w, "x", num_parts)


def _tc_close(adj: pa.Table, wedge_pieces, num_parts: int):
    """Stage D, one x-hash partition: a wedge (x, y, u) closes iff the
    oriented edge x→y exists locally. Sorted-merge membership (lexsort
    with edges tagged before wedges, then group-leader test) — no
    per-row Python. Matched wedges emit per-corner counts, pre-summed,
    split by node hash."""
    from .exchange import resolve_pieces, split_by_key
    empty = pa.table({"id": pa.array([], type=pa.int64()),
                      "n": pa.array([], type=pa.int64())})
    rows = [p for p in resolve_pieces(wedge_pieces) if p.num_rows]
    if not rows or adj.num_rows == 0:
        return [empty] * num_parts
    w = pa.concat_tables(rows)
    qx = w.column("x").to_numpy()
    qy = w.column("y").to_numpy()
    qu = w.column("u").to_numpy()
    eu = adj.column("u").to_numpy()
    ev = adj.column("v").to_numpy()
    k1 = np.concatenate([eu, qx])
    k2 = np.concatenate([ev, qy])
    tag = np.concatenate([np.zeros(len(eu), dtype=np.int8),
                          np.ones(len(qx), dtype=np.int8)])
    order = np.lexsort((tag, k2, k1))
    k1s, k2s, tags = k1[order], k2[order], tag[order]
    new = np.ones(len(k1s), dtype=bool)
    new[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
    leader = np.maximum.accumulate(
        np.where(new, np.arange(len(k1s)), 0))
    closed_sorted = (tags == 1) & (tags[leader] == 0)
    hit = np.zeros(len(k1), dtype=bool)
    hit[order] = closed_sorted
    hit = hit[len(eu):]
    if not hit.any():
        return [empty] * num_parts
    corners = np.concatenate([qx[hit], qy[hit], qu[hit]])
    ids, counts = np.unique(corners, return_counts=True)
    out = pa.table({"id": pa.array(ids, type=pa.int64()),
                    "n": pa.array(counts, type=pa.int64())})
    return split_by_key(out, "id", num_parts)


def _tc_total(pieces) -> pa.Table:
    """Final partition: sum the routed per-corner partials."""
    from .exchange import resolve_pieces
    rows = [p for p in resolve_pieces(pieces) if p.num_rows]
    if not rows:
        return pa.table({"node_id": pa.array([], type=pa.int64()),
                         "n_triangles": pa.array([], type=pa.int64())})
    t = pa.concat_tables(rows)
    ids = t.column("id").to_numpy()
    n = t.column("n").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids, n = ids[order], n[order]
    starts = np.flatnonzero(
        np.concatenate([[True], ids[1:] != ids[:-1]]))
    sums = np.add.reduceat(n, starts)
    return pa.table({
        "node_id": pa.array(ids[starts], type=pa.int64()),
        "n_triangles": pa.array(sums, type=pa.int64())})


def triangle_counts(pairs, a_col: str = "id_a", b_col: str = "id_b",
                    num_parts=None):
    """Per-node triangle counts over an undirected pair graph — the
    clustering-coefficient numerator (dense triangle neighbourhoods in
    a near-dup graph flag template farms / mirror rings that pairwise
    scores miss). ``pairs``: Dataset of unique undirected (id_a, id_b)
    pairs. Returns (node_id, n_triangles) for nodes in ≥1 triangle.

    Degree-oriented "forward" algorithm: every undirected edge is kept
    once, oriented low→high by (degree, id); wedges expand only from a
    node's ORIENTED neighbour list, so total wedge work is O(m^1.5)
    regardless of skew (a hot node of degree d generates no wedges
    unless its neighbours are hotter still). Five narrow int64
    exchanges (symmetrize/degree, orient, adjacency, wedge-check,
    count merge); membership tests are sorted-merge kernels; the
    driver never sees edges, wedges, or counts.
    """
    import ray
    import ray.data as rd

    from .exchange import fan_out_pieces, split_by_key

    pairs, num_parts = _graph_parts(pairs, num_parts)
    edges = symmetrize_pairs(pairs, a_col, b_col)
    from .exchange import stream_block_refs
    per_part = fan_out_pieces(split_by_key, stream_block_refs(edges),
                              num_parts, args=("src", num_parts))
    dega = ray.remote(num_returns=2)(_tc_deg_partition)
    deg_refs, edge_refs = zip(*[dega.remote(p) for p in per_part])

    by_dst = fan_out_pieces(split_by_key, list(edge_refs), num_parts,
                            args=("dst", num_parts))
    orient = ray.remote(num_returns=num_parts)(_tc_orient) \
        if num_parts > 1 else ray.remote(
            lambda d, p, n: _tc_orient(d, p, n)[0])

    def _mrun(fn, *a):
        out = fn.remote(*a)
        return [out] if num_parts == 1 else list(out)

    ori_pieces = [[] for _ in range(num_parts)]
    for q in range(num_parts):
        for r, piece in enumerate(_mrun(orient, deg_refs[q],
                                        by_dst[q], num_parts)):
            ori_pieces[r].append(piece)
    adj_task = ray.remote(_tc_adjacency)
    adj_refs = [adj_task.remote(p) for p in ori_pieces]

    wedge = ray.remote(num_returns=num_parts)(_tc_wedges) \
        if num_parts > 1 else ray.remote(
            lambda a, n: _tc_wedges(a, n)[0])
    wedge_pieces = [[] for _ in range(num_parts)]
    for r in range(num_parts):
        for s, piece in enumerate(_mrun(wedge, adj_refs[r], num_parts)):
            wedge_pieces[s].append(piece)

    close = ray.remote(num_returns=num_parts)(_tc_close) \
        if num_parts > 1 else ray.remote(
            lambda a, p, n: _tc_close(a, p, n)[0])
    cnt_pieces = [[] for _ in range(num_parts)]
    for s in range(num_parts):
        for t, piece in enumerate(_mrun(close, adj_refs[s],
                                        wedge_pieces[s], num_parts)):
            cnt_pieces[t].append(piece)
    total = ray.remote(_tc_total)
    return rd.from_arrow_refs([total.remote(p) for p in cnt_pieces])


# ---------------------------------------------------------------------------
# k-core decomposition (bounded-round BSP peel)
# ---------------------------------------------------------------------------

def _kc_edge_partition(pieces) -> pa.Table:
    """Concat + DISTINCT one src-hash partition's symmetric edges,
    sorted by src (duplicate edges would double-count degrees)."""
    from .exchange import concat_typed
    empty = pa.table({"src": pa.array([], type=pa.int64()),
                      "dst": pa.array([], type=pa.int64())})
    t = concat_typed(pieces, "src", "dst")
    if t is None or t.num_rows == 0:
        return empty
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.ones(len(src), dtype=bool)
    keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    return pa.table({"src": pa.array(src[keep], type=pa.int64()),
                     "dst": pa.array(dst[keep], type=pa.int64())})


def _kc_init(edges: pa.Table) -> pa.Table:
    ids = np.unique(edges.column("src").to_numpy()) if edges.num_rows \
        else np.array([], dtype=np.int64)
    return pa.table({"id": pa.array(ids, type=pa.int64()),
                     "alive": pa.array(np.ones(len(ids), dtype=np.int64),
                                       type=pa.int64())})


def _kc_propagate(edges: pa.Table, state: pa.Table, num_parts: int):
    """Sender side: every edge whose src is alive ships one unit to its
    dst, pre-summed per dst before the exchange."""
    from .exchange import split_by_key
    empty = pa.table({"id": pa.array([], type=pa.int64()),
                      "c": pa.array([], type=pa.int64())})
    if edges.num_rows == 0 or state.num_rows == 0:
        return [empty] * num_parts
    idx = pc.index_in(edges.column("src").combine_chunks(),
                      value_set=state.column("id").combine_chunks())
    alive = state.column("alive").combine_chunks().take(idx) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges.column("dst").to_numpy()[alive == 1]
    if len(dst) == 0:
        return [empty] * num_parts
    d = np.sort(dst)
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    cnt = np.diff(np.append(starts, len(d)))
    msgs = pa.table({"id": pa.array(d[starts], type=pa.int64()),
                     "c": pa.array(cnt, type=pa.int64())})
    return split_by_key(msgs, "id", num_parts)


def _kc_update(state: pa.Table, msg_pieces, k: int) -> pa.Table:
    """Receiver side: alive'(v) = alive(v) AND (alive-neighbor count
    >= k)."""
    from .exchange import resolve_pieces
    cnt = np.zeros(state.num_rows, dtype=np.int64)
    id_col = state.column("id").combine_chunks()
    for p in resolve_pieces(msg_pieces):
        pos = pc.index_in(p.column("id").combine_chunks(),
                          value_set=id_col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(cnt, pos, p.column("c").to_numpy())
    alive = state.column("alive").to_numpy() & (cnt >= k)
    return pa.table({"id": id_col,
                     "alive": pa.array(alive.astype(np.int64),
                                       type=pa.int64())})


def _kc_final(edges: pa.Table, state: pa.Table, msg_pieces) -> pa.Table:
    """(node_id, core_deg) for surviving nodes: degree restricted to the
    final core, from one extra message pass over the final alive set."""
    from .exchange import resolve_pieces
    cnt = np.zeros(state.num_rows, dtype=np.int64)
    id_col = state.column("id").combine_chunks()
    for p in resolve_pieces(msg_pieces):
        pos = pc.index_in(p.column("id").combine_chunks(),
                          value_set=id_col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(cnt, pos, p.column("c").to_numpy())
    alive = state.column("alive").to_numpy() == 1
    ids = id_col.to_numpy()[alive]
    return pa.table({"node_id": pa.array(ids, type=pa.int64()),
                     "core_deg": pa.array(cnt[alive], type=pa.int64())})


def kcore(pairs, k: int = 2, rounds: int = 4,
          a_col: str = "id_a", b_col: str = "id_b", num_parts=None):
    """k-core membership by bounded-round BSP peeling: starting from
    all vertices, each round drops every vertex with fewer than ``k``
    surviving neighbors; after exactly ``rounds`` rounds (early-stopped
    once a round changes nothing — the remaining rounds are no-ops, so
    the result equals the fixed-round contract whenever the peel has
    converged) the survivors and their within-core degrees are
    returned as ``(node_id, core_deg)``. The dense-subgraph filter that
    separates template farms / mirror rings (cliquish cores) from
    incidental pairwise similarity (trees and chains peel away).

    100 TB shape: the pair list symmetrizes and hash-partitions by src
    ONCE (deduplicated per partition) and never moves again; vertex
    aliveness is co-partitioned with the out-edges; each round
    exchanges per-partition pre-summed (dst, count) int64 rows —
    O(distinct dsts), not O(edges) — and the driver sees one scalar
    (the alive total) per round. Rounds are a fixed constant, not
    data-dependent, so the job's critical path is bounded."""
    import ray
    import ray.data as rd

    from .exchange import fan_out_pieces, split_by_key

    pairs, num_parts = _graph_parts(pairs, num_parts)
    edges = symmetrize_pairs(pairs, a_col, b_col)
    from .exchange import stream_block_refs
    per_part = fan_out_pieces(split_by_key, stream_block_refs(edges),
                              num_parts, args=("src", num_parts))
    edge_task = ray.remote(_kc_edge_partition)
    edge_refs = [edge_task.remote(p) for p in per_part]
    init = ray.remote(_kc_init)
    state_refs = [init.remote(e) for e in edge_refs]

    prop = ray.remote(num_returns=num_parts)(_kc_propagate) \
        if num_parts > 1 else ray.remote(
            lambda e, s, n: _kc_propagate(e, s, n)[0])

    def _exchange():
        msg_pieces = [[] for _ in range(num_parts)]
        for p in range(num_parts):
            out = prop.remote(edge_refs[p], state_refs[p], num_parts)
            if num_parts == 1:
                out = [out]
            for q, piece in enumerate(out):
                msg_pieces[q].append(piece)
        return msg_pieces

    upd = ray.remote(_kc_update)
    n_alive = ray.remote(lambda s: int(s.column("alive").to_numpy().sum()))
    # aliveness only shrinks, so an unchanged total means an unchanged
    # SET — further rounds are no-ops and early stop preserves the
    # fixed-round contract
    prev = sum(ray.get([n_alive.remote(s) for s in state_refs]))
    for _ in range(rounds):
        msg_pieces = _exchange()
        state_refs = [upd.remote(state_refs[q], msg_pieces[q], k)
                      for q in range(num_parts)]
        cur = sum(ray.get([n_alive.remote(s) for s in state_refs]))
        if cur == prev:
            break
        prev = cur

    fin = ray.remote(_kc_final)
    msg_pieces = _exchange()
    out_refs = [fin.remote(edge_refs[q], state_refs[q], msg_pieces[q])
                for q in range(num_parts)]
    return rd.from_arrow_refs(out_refs)
