"""Pack host mesh-graph samples into static-shape padded GraphBatches.

Replaces the PyG DataLoader disjoint-union batching (`gnn_train.py:387-394`)
with bucketed padding: capacities are rounded up to hardware-friendly
multiples so XLA compiles one program per bucket, and padding waste stays
bounded. Padding must never perturb model statistics — every op downstream
is mask-aware (SURVEY.md §7.10).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from p_div_gnn_tpu.graphs.build import MeshGraph
from p_div_gnn_tpu.graphs.container import GraphBatch


@dataclasses.dataclass
class GraphSample:
    """One mesh sample on the host (reference dataset row, C6)."""

    graph: MeshGraph
    mean_stress: np.ndarray  # (3,)
    local_stress: np.ndarray  # (N, 3)
    node_labels: np.ndarray  # (N,) int in {-1, 0, 1}
    div_data: np.ndarray  # (nnz,) f32
    div_row: np.ndarray  # (nnz,) int
    div_col: np.ndarray  # (nnz,) int, in [0, 2N) component-major
    von_mises: float = 0.0
    mesh_id: int = -1

    @property
    def num_nodes(self) -> int:
        return self.graph.num_nodes

    @property
    def num_edges(self) -> int:
        return self.graph.num_edges

    @property
    def num_div_entries(self) -> int:
        return int(self.div_data.shape[0])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Layout constants: re-exported from graphs/container.py (moved there so
# GraphBatch.tile defaults to the active NODE_TILE — advisor round-4).
# Existing importers (`from p_div_gnn_tpu.graphs.batching import
# EDGE_BLOCK, NODE_TILE`) keep working.
from p_div_gnn_tpu.graphs.container import (  # noqa: E402
    EDGE_BLOCK,
    NODE_TILE,
    SND_BLOCK,
)
# Sender-view padding: snd_perm padding slots point at edge slot 0 (a VALID
# index, so the cotangent permutation runs as an UNGUARDED gather — XLA's
# guarded mode="fill" gather measured ~15% slower on the flagship workload),
# and snd_sorted padding slots carry -1, whose local tile id falls outside
# [0, 128) so the scatter kernel's one-hot row is all-zero — padding
# contributes exactly nothing regardless of the gathered values.
PAD_SLOT = np.int32(0)
PAD_NODE = np.int32(-1)


def blockify_edges(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_weight: np.ndarray,
    edge_gid: np.ndarray,
    num_nodes: int,
    n_graphs: int,
    tile: int = NODE_TILE,
    edge_block: int = EDGE_BLOCK,
    min_capacity: int = 0,
) -> tuple[np.ndarray, ...]:
    """Re-lay receiver-sorted edges into a block-aligned CSR layout.

    Every ``tile``-node range's edge run is padded to a multiple of
    ``edge_block`` (at least one block, so every output tile is covered by
    the scatter kernel's grid), and a per-block tile index is emitted. The
    dummy edges point a padding sender at the tile's base node; their
    messages are exactly zero downstream (masked edge-LN zeroes padded
    rows), so they are no-ops in the scatter.

    Returns (senders, receivers, edge_weight, edge_gid, tile_ptr,
    edge_block_tile).
    """
    assert num_nodes % tile == 0
    n_tiles = num_nodes // tile
    counts = np.bincount(
        np.minimum(receivers // tile, n_tiles - 1), minlength=n_tiles
    )
    cap = np.maximum(((counts + edge_block - 1) // edge_block), 1) * edge_block
    total = int(cap.sum())
    if min_capacity and total < min_capacity:
        assert (min_capacity - total) % edge_block == 0, (
            f"min_capacity {min_capacity} not EDGE_BLOCK({edge_block})-"
            f"aligned with layout total {total} (check PDG_EDGE_BLOCK vs "
            "the edge-capacity rounding)"
        )
        cap[-1] += min_capacity - total  # whole extra blocks on the last tile
        total = min_capacity
    starts = np.concatenate([[0], np.cumsum(cap)])[:-1]

    E = len(senders)
    o_snd = np.full(total, num_nodes - 1, senders.dtype)
    o_rcv = np.empty(total, receivers.dtype)
    o_ew = np.zeros((total,) + edge_weight.shape[1:], edge_weight.dtype)
    o_eg = np.full(total, n_graphs, edge_gid.dtype)
    # default receivers: each tile's LAST node — keeps the global receiver
    # array sorted (real receivers in tile t are ≤ t·tile+tile−1), so the
    # XLA path can still use indices_are_sorted=True. Contributions are
    # zero regardless (masked messages).
    for t in range(n_tiles):
        o_rcv[starts[t] : starts[t] + cap[t]] = t * tile + (tile - 1)
    # place real edges at their tile's block start (they are contiguous in
    # the receiver-sorted input)
    in_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    for t in range(n_tiles):
        c = counts[t]
        if c:
            s_in, s_out = in_starts[t], starts[t]
            o_snd[s_out : s_out + c] = senders[s_in : s_in + c]
            o_rcv[s_out : s_out + c] = receivers[s_in : s_in + c]
            o_ew[s_out : s_out + c] = edge_weight[s_in : s_in + c]
            o_eg[s_out : s_out + c] = edge_gid[s_in : s_in + c]
    tile_ptr = np.concatenate([starts, [total]]).astype(np.int32)
    edge_block_tile = np.repeat(
        np.arange(n_tiles, dtype=np.int32), cap // edge_block
    )
    return o_snd, o_rcv, o_ew, o_eg, tile_ptr, edge_block_tile


def blockify_edges_pair(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_weight: np.ndarray,
    edge_gid: np.ndarray,
    num_nodes: int,
    n_graphs: int,
    tile: int = NODE_TILE,
    edge_block: int = EDGE_BLOCK,
    min_capacity: int = 0,
) -> tuple[np.ndarray, ...]:
    """Pair-blocked layout for the fully-fused edge kernel (fused2): edges
    grouped by (receiver_tile, sender_tile), each group padded to
    ``edge_block``. Receiver-tile-major order keeps the kernel's R
    accumulator revisits consecutive; within a block BOTH endpoints live in
    single 128-node tiles, so the sender gather becomes an in-VMEM one-hot
    contraction and the per-edge ``s_msg``/``s_upd`` HBM streams disappear.

    Padding edges point receiver/sender at their tiles' LAST nodes; their
    contributions are masked (gid == n_graphs) everywhere downstream.

    Returns (senders, receivers, edge_weight, edge_gid, tile_ptr,
    edge_block_tile (rcv tile per block), edge_block_snd_tile).
    """
    assert num_nodes % tile == 0
    n_tiles = num_nodes // tile
    rt = np.minimum(receivers // tile, n_tiles - 1).astype(np.int64)
    st = np.minimum(senders // tile, n_tiles - 1).astype(np.int64)
    key = rt * n_tiles + st
    order = np.argsort(key, kind="stable")
    pairs, counts = np.unique(key[order], return_counts=True)
    # every receiver tile needs at least one block so R covers all tiles
    missing_rt = np.setdiff1d(
        np.arange(n_tiles, dtype=np.int64), pairs // n_tiles
    )
    pairs = np.concatenate([pairs, missing_rt * n_tiles + missing_rt])
    counts = np.concatenate([counts, np.zeros(len(missing_rt), np.int64)])
    resort = np.argsort(pairs, kind="stable")
    pairs, counts = pairs[resort], counts[resort]

    cap = np.maximum((counts + edge_block - 1) // edge_block, 1) * edge_block
    total = int(cap.sum())
    if min_capacity and total < min_capacity:
        assert (min_capacity - total) % edge_block == 0, (
            f"min_capacity {min_capacity} not EDGE_BLOCK({edge_block})-"
            "aligned for the pair layout"
        )
        cap[-1] += min_capacity - total
        total = min_capacity
    starts = np.concatenate([[0], np.cumsum(cap)])[:-1]

    p_rt = (pairs // n_tiles).astype(np.int32)
    p_st = (pairs % n_tiles).astype(np.int32)
    o_snd = np.empty(total, senders.dtype)
    o_rcv = np.empty(total, receivers.dtype)
    o_ew = np.zeros((total,) + edge_weight.shape[1:], edge_weight.dtype)
    o_eg = np.full(total, n_graphs, edge_gid.dtype)
    for g in range(len(pairs)):
        o_rcv[starts[g] : starts[g] + cap[g]] = p_rt[g] * tile + (tile - 1)
        o_snd[starts[g] : starts[g] + cap[g]] = p_st[g] * tile + (tile - 1)
    in_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    for g in range(len(pairs)):
        c = counts[g]
        if c:
            src = order[in_starts[g] : in_starts[g] + c]
            o_snd[starts[g] : starts[g] + c] = senders[src]
            o_rcv[starts[g] : starts[g] + c] = receivers[src]
            o_ew[starts[g] : starts[g] + c] = edge_weight[src]
            o_eg[starts[g] : starts[g] + c] = edge_gid[src]
    edge_block_tile = np.repeat(p_rt, cap // edge_block)
    edge_block_snd_tile = np.repeat(p_st, cap // edge_block)
    # per-receiver-tile CSR offsets (carried for parity with the rcv-major
    # layout; blocks of one rcv tile stay contiguous)
    tile_tot = np.zeros(n_tiles, np.int64)
    np.add.at(tile_tot, p_rt, cap)
    tile_ptr = np.concatenate([[0], np.cumsum(tile_tot)]).astype(np.int32)
    return (
        o_snd, o_rcv, o_ew, o_eg, tile_ptr,
        edge_block_tile.astype(np.int32),
        edge_block_snd_tile.astype(np.int32),
    )


def build_sender_view(
    senders: np.ndarray,
    num_nodes: int,
    tile: int = NODE_TILE,
    edge_block: int = SND_BLOCK,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sender-major blockified view of an edge layout: edge slots re-sorted
    by SENDER tile, per-tile runs padded to ``edge_block``.

    Purpose: the VJP of the per-edge sender gathers (``proj[senders]``) is a
    scatter-add over senders; XLA lowers that to a slow generic per-element
    scatter on TPU. With this view the cotangent stream is permuted into
    sender-tile blocks (``jnp.take`` with ``fill_value=0`` for the padding
    slots, perm == -1) and accumulated by the MXU one-hot scatter kernel
    (ops/scatter_pallas.py) instead.

    Returns (snd_perm (Ep2,) i32 — source edge slot or PAD_SLOT,
             snd_sorted (Ep2,) i32 — sender node id per slot,
             snd_block_tile (Ep2/edge_block,) i32 — sender tile per block).
    """
    assert num_nodes % tile == 0
    n_tiles = num_nodes // tile
    Ep = len(senders)
    s_tile = np.minimum(senders // tile, n_tiles - 1)
    counts = np.bincount(s_tile, minlength=n_tiles)
    cap = np.maximum((counts + edge_block - 1) // edge_block, 1) * edge_block
    total = int(cap.sum())
    starts = np.concatenate([[0], np.cumsum(cap)])[:-1]

    order = np.argsort(s_tile, kind="stable")
    snd_perm = np.full(total, PAD_SLOT, np.int32)
    snd_sorted = np.full(total, PAD_NODE, np.int32)
    in_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    for t in range(n_tiles):
        c = counts[t]
        if c:
            src = order[in_starts[t] : in_starts[t] + c]
            snd_perm[starts[t] : starts[t] + c] = src
            snd_sorted[starts[t] : starts[t] + c] = senders[src]
    snd_block_tile = np.repeat(
        np.arange(n_tiles, dtype=np.int32), cap // edge_block
    )
    return snd_perm, snd_sorted, snd_block_tile


def pad_sender_view(
    snd_perm: np.ndarray,
    snd_sorted: np.ndarray,
    snd_block_tile: np.ndarray,
    target_capacity: int,
    num_nodes: int,
    tile: int = NODE_TILE,
    edge_block: int = SND_BLOCK,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grow a sender view to a common capacity (whole padding blocks on the
    last tile — zero contributions) so views stack across DP shards."""
    cur = len(snd_perm)
    assert target_capacity % edge_block == 0 and target_capacity >= cur
    if cur == target_capacity:
        return snd_perm, snd_sorted, snd_block_tile
    extra = target_capacity - cur
    last_tile = num_nodes // tile - 1
    return (
        np.concatenate([snd_perm, np.full(extra, PAD_SLOT, np.int32)]),
        np.concatenate(
            [snd_sorted, np.full(extra, PAD_NODE, np.int32)]
        ),
        np.concatenate(
            [snd_block_tile,
             np.full(extra // edge_block, last_tile, np.int32)]
        ),
    )


def _ell_from_coo(
    key: np.ndarray,
    payloads: tuple[np.ndarray, ...],
    num_rows: int,
    pads: tuple,
    w_bucket: int = 4,
    min_w: int | None = None,
) -> tuple[np.ndarray, ...]:
    """Pack COO entries into a padded ELL table: row r's entries occupy
    ``out[r, :counts[r]]``; W = max fan-in rounded up to ``w_bucket`` (one
    XLA program per W bucket). Vectorized — no per-row Python loop."""
    K = len(key)
    order = np.argsort(key, kind="stable")
    k_sorted = key[order].astype(np.int64)
    counts = np.bincount(k_sorted, minlength=num_rows)
    W = int(max(counts.max() if K else 0, 1))
    W = _round_up(W, w_bucket)
    if min_w is not None:
        W = max(W, min_w)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(K, dtype=np.int64) - starts[k_sorted]
    flat = k_sorted * W + pos
    outs = []
    for payload, pad in zip(payloads, pads):
        o = np.full(num_rows * W, pad, dtype=payload.dtype)
        o[flat] = payload[order]
        outs.append(o.reshape(num_rows, W))
    return tuple(outs)


def build_div_ell(
    div_data: np.ndarray,
    div_row: np.ndarray,
    div_col_node: np.ndarray,
    div_col_is_y: np.ndarray,
    num_nodes: int,
    w_bucket: int = 4,
    pad_w: int | None = None,
    pad_wt: int | None = None,
) -> dict[str, np.ndarray]:
    """Gather-only (ELL) views of the divergence operator — the TPU answer
    to the COO scatter (round-3 perf work: the unsorted COO segment-sum and
    its scatter-add VJP cost ~54 ms of the 281 ms train step,
    docs/evidence/microbench.json).

    Row view (forward): per padded node r, W slots of (source node, value,
    is_y); ``div[r] = Σ_w val·select(S[src])``. Transpose view (backward):
    per source node s, Wt slots of (row node, value, is_y);
    ``dS[s] = Σ_w val·select(ct[row])``. Both directions are dense gathers
    + lane reductions — no scatter anywhere. Padding slots point at node
    num_nodes−1 with value 0 (exact no-ops)."""
    src, val, isy = _ell_from_coo(
        div_row.astype(np.int64),
        (div_col_node.astype(np.int32), div_data.astype(np.float32),
         div_col_is_y.astype(np.int8)),
        num_nodes,
        pads=(np.int32(num_nodes - 1), np.float32(0), np.int8(0)),
        w_bucket=w_bucket,
        min_w=pad_w,
    )
    trow, tval, tisy = _ell_from_coo(
        div_col_node.astype(np.int64),
        (div_row.astype(np.int32), div_data.astype(np.float32),
         div_col_is_y.astype(np.int8)),
        num_nodes,
        pads=(np.int32(num_nodes - 1), np.float32(0), np.int8(0)),
        w_bucket=w_bucket,
        min_w=pad_wt,
    )
    if pad_w is not None:
        assert src.shape[1] == pad_w, (src.shape, pad_w)
    if pad_wt is not None:
        assert trow.shape[1] == pad_wt, (trow.shape, pad_wt)
    return {
        "div_src": src, "div_val": val, "div_isy": isy,
        "divT_row": trow, "divT_val": tval, "divT_isy": tisy,
    }


def rcm_order(
    edge_index: np.ndarray, num_nodes: int
) -> np.ndarray:
    """Reverse Cuthill-McKee node ordering of one graph.

    Returns ``perm`` with ``perm[i]`` = original index of the node placed
    at position ``i``. RCM minimizes adjacency bandwidth, so after
    reordering both endpoints of (almost) every edge fall in the same or
    a neighboring 128-node tile — the property the sender-view gather and
    banded scatter paths exploit. The model is permutation-equivariant
    over nodes (message passing + masked segment reductions), so
    reordering changes float reduction order only, never semantics."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    adj = coo_matrix(
        (
            np.ones(edge_index.shape[1], np.int8),
            (edge_index[0], edge_index[1]),
        ),
        shape=(num_nodes, num_nodes),
    ).tocsr()
    return np.asarray(
        reverse_cuthill_mckee(adj, symmetric_mode=True), dtype=np.int64
    )


def _reorder_sample(s: GraphSample) -> tuple[GraphSample, np.ndarray]:
    """RCM-permuted copy of a sample (host-side numpy; O(N + E))."""
    n = s.num_nodes
    perm = rcm_order(np.asarray(s.graph.edge_index), n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    g = s.graph
    graph = dataclasses.replace(
        g,
        pos=np.asarray(g.pos)[perm],
        edge_index=inv[np.asarray(g.edge_index)],
        faces=(inv[np.asarray(g.faces)] if g.faces is not None else None),
    )
    cols = np.asarray(s.div_col, np.int64)
    comp, node = cols // n, cols % n
    # entries with col >= 2n (virtual strain dofs) are dropped by pack_batch
    # — map only the in-range ones, keep the drop marker intact
    in_range = comp < 2
    new_cols = np.where(in_range, comp * n + inv[np.clip(node, 0, n - 1)],
                        cols)
    return (
        dataclasses.replace(
            s,
            graph=graph,
            local_stress=np.asarray(s.local_stress)[perm],
            node_labels=np.asarray(s.node_labels)[perm],
            div_row=inv[np.asarray(s.div_row, np.int64)],
            div_col=new_cols,
        ),
        perm,
    )


def _bucket(x: int, m: int, buckets: tuple[int, ...] | None) -> int:
    x = _round_up(x, m)
    if buckets:
        for b in buckets:
            if x <= b:
                return b
    return x


def pack_batch(
    samples: list[GraphSample],
    n_graphs: int | None = None,
    pad_nodes: int | None = None,
    pad_edges: int | None = None,
    pad_div: int | None = None,
    tile: int = NODE_TILE,
    node_buckets: tuple[int, ...] | None = None,
    edge_buckets: tuple[int, ...] | None = None,
    pair_blocks: bool = False,
    sender_view: bool = True,
    div_ell: bool = True,
    pad_div_w: int | None = None,
    pad_div_wt: int | None = None,
    reorder: str | None = None,
) -> GraphBatch:
    """Concatenate samples into one padded batch (host-side, numpy).

    Node layout: graphs contiguous in input order, then padding. Edges are
    globally sorted by receiver (graphs stay contiguous because receivers
    live in per-graph node ranges); padding edges self-loop on the final
    padding node so scatters into real nodes are never polluted.
    """
    G = n_graphs if n_graphs is not None else len(samples)
    assert len(samples) <= G
    node_order = None
    if reorder is not None:
        assert reorder == "rcm", f"unknown reorder {reorder!r}"
        reordered = [_reorder_sample(s) for s in samples]
        samples = [s for s, _ in reordered]
        perms = [p for _, p in reordered]
    tot_nodes = sum(s.num_nodes for s in samples)
    tot_edges = sum(s.num_edges for s in samples)
    tot_div = sum(s.num_div_entries for s in samples)

    Np = pad_nodes if pad_nodes is not None else _bucket(
        tot_nodes + 1, tile, node_buckets
    )
    Ep = pad_edges if pad_edges is not None else _bucket(
        max(tot_edges, 1), 512, edge_buckets
    )
    # the block-aligned CSR layout needs a whole number of EDGE_BLOCKs;
    # callers' capacities (bucket ladders, edges_per_node products) are
    # normalized here so every layout's min_capacity check holds
    Ep = _round_up(Ep, EDGE_BLOCK)
    Kp = pad_div if pad_div is not None else _bucket(max(tot_div, 1), 512, None)
    assert Np > tot_nodes, "need at least one padding node"
    assert Ep >= tot_edges and Kp >= tot_div

    pos = np.zeros((Np, 2), np.float32)
    mean_stress = np.zeros((Np, 3), np.float32)
    node_type = np.zeros((Np, 1), np.float32)
    local_stress = np.zeros((Np, 3), np.float32)
    node_gid = np.full(Np, G, np.int32)

    senders = np.full(Ep, Np - 1, np.int32)
    receivers = np.full(Ep, Np - 1, np.int32)
    edge_weight = np.zeros((Ep, 1), np.float32)
    edge_gid = np.full(Ep, G, np.int32)

    div_data = np.zeros(Kp, np.float32)
    div_row = np.full(Kp, Np - 1, np.int32)
    div_col_node = np.full(Kp, Np - 1, np.int32)
    div_col_is_y = np.zeros(Kp, np.int32)

    graph_node_count = np.zeros(G, np.int32)
    graph_node_offset = np.zeros(G, np.int32)

    n_off = e_off = k_off = 0
    for g, s in enumerate(samples):
        n, e, k = s.num_nodes, s.num_edges, s.num_div_entries
        pos[n_off : n_off + n] = np.asarray(s.graph.pos[:, :2], np.float32)
        mean_stress[n_off : n_off + n] = np.asarray(s.mean_stress, np.float32)
        node_type[n_off : n_off + n, 0] = np.asarray(s.node_labels, np.float32)
        local_stress[n_off : n_off + n] = np.asarray(s.local_stress, np.float32)
        node_gid[n_off : n_off + n] = g

        senders[e_off : e_off + e] = s.graph.edge_index[0] + n_off
        receivers[e_off : e_off + e] = s.graph.edge_index[1] + n_off
        edge_weight[e_off : e_off + e, 0] = s.graph.edge_weight
        edge_gid[e_off : e_off + e] = g

        # Divergence COO: column c in [0, 2N) → (node c % N, component c // N)
        # — component-major dof layout, matching the stacked stress vector
        # built in the reference loss (`gnn_train.py:68-70`). Entries with
        # col >= 2N (virtual strain nodes) are dropped by the loader.
        cols = np.asarray(s.div_col, np.int64)
        keep = cols < 2 * n
        div_data[k_off : k_off + keep.sum()] = np.asarray(s.div_data, np.float32)[
            keep
        ]
        div_row[k_off : k_off + keep.sum()] = (
            np.asarray(s.div_row, np.int64)[keep] + n_off
        )
        div_col_node[k_off : k_off + keep.sum()] = (cols[keep] % n) + n_off
        div_col_is_y[k_off : k_off + keep.sum()] = (cols[keep] // n).astype(
            np.int32
        )
        graph_node_count[g] = n
        graph_node_offset[g] = n_off
        n_off += n
        e_off += e
        k_off += int(keep.sum())

    # CSR-sort edges by receiver (stable keeps canonical (s,r) order within
    # a receiver), then re-lay into the block-aligned layout the Pallas
    # scatter kernel consumes (per-tile ranges padded to EDGE_BLOCK).
    real = e_off
    order = np.argsort(receivers[:real], kind="stable")
    edge_block_snd_tile = None
    if pair_blocks:
        (
            senders, receivers, edge_weight, edge_gid, tile_ptr,
            edge_block_tile, edge_block_snd_tile,
        ) = blockify_edges_pair(
            senders[:real][order],
            receivers[:real][order],
            edge_weight[:real][order],
            edge_gid[:real][order],
            num_nodes=Np,
            n_graphs=G,
            tile=tile,
            min_capacity=Ep,
        )
    else:
        (
            senders,
            receivers,
            edge_weight,
            edge_gid,
            tile_ptr,
            edge_block_tile,
        ) = blockify_edges(
            senders[:real][order],
            receivers[:real][order],
            edge_weight[:real][order],
            edge_gid[:real][order],
            num_nodes=Np,
            n_graphs=G,
            tile=tile,
            min_capacity=Ep,
        )

    # The sender-major view only feeds the fused/hybrid sender-gather VJP;
    # building it costs a host per-tile loop + ~9 B/edge-slot of extra
    # host→device transfer per step, so xla/pallas consumers opt out.
    if sender_view:
        snd_perm, snd_sorted, snd_block_tile = build_sender_view(
            senders, num_nodes=Np, tile=tile
        )
    else:
        snd_perm = snd_sorted = snd_block_tile = None
    # gather-only divergence views, built from the REAL entries only
    # ([0, k_off) — padding entries would inflate node Np−1's fan-in)
    ell = {}
    if div_ell:
        ell = build_div_ell(
            div_data[:k_off], div_row[:k_off], div_col_node[:k_off],
            div_col_is_y[:k_off], num_nodes=Np,
            pad_w=pad_div_w, pad_wt=pad_div_wt,
        )
    if reorder is not None:
        node_order = np.zeros(Np, np.int32)
        for g, s in enumerate(samples):
            off = int(graph_node_offset[g])
            node_order[off : off + s.num_nodes] = perms[g].astype(np.int32)
    return GraphBatch(
        node_order=node_order,
        **ell,
        pos=pos,
        mean_stress=mean_stress,
        node_type=node_type,
        local_stress=local_stress,
        node_gid=node_gid,
        senders=senders,
        receivers=receivers,
        edge_weight=edge_weight,
        edge_gid=edge_gid,
        tile_ptr=tile_ptr,
        edge_block_tile=edge_block_tile,
        edge_block_snd_tile=edge_block_snd_tile,
        snd_perm=snd_perm,
        snd_sorted=snd_sorted,
        snd_block_tile=snd_block_tile,
        div_data=div_data,
        div_row=div_row,
        div_col_node=div_col_node,
        div_col_is_y=div_col_is_y,
        graph_node_count=graph_node_count,
        graph_node_offset=graph_node_offset,
        n_graphs=G,
        tile=tile,
    )


def unpack_predictions(
    batch: GraphBatch, prediction: np.ndarray
) -> list[np.ndarray]:
    """Slice a (Np, C) node prediction back into per-graph arrays —
    the static-shape twin of `slice_batch_predictions`
    (`data_utils.py:36-43`)."""
    out = []
    counts = np.asarray(batch.graph_node_count)
    offsets = np.asarray(batch.graph_node_offset)
    order = (
        np.asarray(batch.node_order) if batch.node_order is not None
        else None
    )
    for g in range(batch.n_graphs):
        n = int(counts[g])
        if n == 0:
            continue
        off = int(offsets[g])
        pred = np.asarray(prediction[off : off + n])
        if order is not None:
            # invert the pack-time node reordering: packed row i holds the
            # node whose ORIGINAL local index is order[off + i]
            orig = np.empty_like(pred)
            orig[order[off : off + n]] = pred
            pred = orig
        out.append(pred)
    return out


def default_node_buckets(max_nodes: int = 1 << 17) -> tuple[int, ...]:
    """Geometric bucket ladder — bounds recompiles to ~2 per octave while
    wasting <~30% padding."""
    buckets = []
    b = 1024
    while b <= max_nodes:
        buckets.append(b)
        buckets.append(b + b // 2)
        b *= 2
    return tuple(buckets)
