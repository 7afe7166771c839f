"""Edge-partitioned graph execution — the TP/SP analog for mesh GNNs
(SURVEY §2 parallelism item 2; no reference counterpart — the reference is
single-GPU).

A (batch of) graph(s) is split into contiguous node ranges, one per device
on the ``graph`` mesh axis. Each shard owns its node range plus every edge
whose RECEIVER lands in the range; senders that live elsewhere become
ghosts. The host-side planner builds a fixed-size halo: each shard
publishes the union of its nodes needed by any other shard, one
``all_gather`` per message-passing step refreshes all ghosts, and edge
sender indices are pre-encoded into the extended
``[local ++ D·H ghost]`` address space. Periodic boundary edges (C2) are
the canonical cut edges — they connect opposite sides of the RVE and are
usually remote.

Losses psum per-graph segment partials so the partitioned step reproduces
the single-device numbers (see losses.partitioned_batch_loss).
"""

from __future__ import annotations

from typing import Any

from typing import Callable

import jax
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from p_div_gnn_tpu.graphs.batching import NODE_TILE
from p_div_gnn_tpu.graphs.container import GraphBatch, NormStats
from p_div_gnn_tpu.losses import partitioned_batch_loss
from p_div_gnn_tpu.models.epd import Halo


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def partition_batch(
    batch: GraphBatch,
    n_shards: int,
    tile: int = NODE_TILE,
    halo_mode: str = "a2a",
) -> tuple[GraphBatch, np.ndarray]:
    """Split a packed (unsharded) GraphBatch into ``n_shards`` node-range
    shards. Returns (stacked local batches with leading shard axis,
    halo send_idx — (D, D, Hp) for ``halo_mode="a2a"`` per-peer exchange,
    (D, H) for the legacy ``"all_gather"`` union broadcast).

    Edge senders and divergence-operator column nodes are rewritten into
    each shard's extended address space; padding rows self-loop on the
    local padding node.
    """
    assert halo_mode in ("a2a", "all_gather"), halo_mode
    Np = batch.num_nodes_padded
    per = _round_up((Np + n_shards - 1) // n_shards, tile)
    Nl = per + tile  # room so the last shard's range + pad node fits
    offsets = np.arange(n_shards) * per

    pos = np.asarray(batch.pos)
    senders = np.asarray(batch.senders)
    receivers = np.asarray(batch.receivers)
    node_gid = np.asarray(batch.node_gid)

    def owner(nodes: np.ndarray) -> np.ndarray:
        return np.minimum(nodes // per, n_shards - 1)

    # --- per-shard edge lists (owner of receiver)
    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

    e_owner = owner(receivers)
    edge_lists = [np.where(e_owner == d)[0] for d in range(n_shards)]
    # uniform local edge capacity across shards AFTER block alignment
    n_tiles_l = (per + tile) // tile  # == Nl // tile
    El = 0
    for d in range(n_shards):
        l_rcv = receivers[edge_lists[d]] - offsets[d]
        counts = np.bincount(
            np.minimum(l_rcv // tile, n_tiles_l - 1), minlength=n_tiles_l
        )
        tot = int(
            (np.maximum((counts + EDGE_BLOCK - 1) // EDGE_BLOCK, 1)
             * EDGE_BLOCK).sum()
        )
        El = max(El, tot)

    # --- div entries: owner of row node
    div_row = np.asarray(batch.div_row)
    div_col_node = np.asarray(batch.div_col_node)
    k_owner = owner(div_row)
    div_lists = [np.where(k_owner == d)[0] for d in range(n_shards)]
    Kl = _round_up(max(max(len(k) for k in div_lists), 1), 512)

    # --- ghost sets: per (owner o → requester r) pair, the nodes o must
    # send to r. The a2a plan keeps them per-pair (traffic O(D·Hp), Hp =
    # max pair size); the legacy all_gather plan unions them per owner
    # (traffic O(D·H), H = max union size).
    need_pair: list[list[set[int]]] = [
        [set() for _ in range(n_shards)] for _ in range(n_shards)
    ]
    for d in range(n_shards):
        for arr in (senders[edge_lists[d]], div_col_node[div_lists[d]]):
            remote = arr[owner(arr) != d]
            for o in np.unique(owner(remote)):
                sel = remote[owner(remote) == o]
                need_pair[int(o)][d].update(np.unique(sel).tolist())

    if halo_mode == "a2a":
        # tile-aligned so the extended [local ++ D·Hp ghost] address space
        # stays tile-aligned — required by the per-shard sender-major view
        # (the MXU one-hot scatter kernel works in node tiles)
        Hp = _round_up(
            max(max((len(s) for row in need_pair for s in row), default=1), 1),
            tile,
        )
        # shard o's send plan: row r = its slots for peer r → (D, D, Hp)
        send_idx = np.zeros((n_shards, n_shards, Hp), dtype=np.int32)
        pair_slot: list[list[dict[int, int]]] = [
            [{} for _ in range(n_shards)] for _ in range(n_shards)
        ]
        for o in range(n_shards):
            for r in range(n_shards):
                sl = np.sort(np.fromiter(need_pair[o][r], dtype=np.int64))
                send_idx[o, r, : len(sl)] = sl - offsets[o]
                pair_slot[o][r] = {int(g): i for i, g in enumerate(sl)}

        def ghost_slot(o: int, d: int, g: int) -> int:
            # received block is laid out (D, Hp): row o = from peer o
            return Nl + o * Hp + pair_slot[o][d][g]

    else:
        need: list[set[int]] = [set() for _ in range(n_shards)]
        for o in range(n_shards):
            for r in range(n_shards):
                need[o].update(need_pair[o][r])
        send_lists = [np.sort(np.fromiter(s, dtype=np.int64)) for s in need]
        H = _round_up(
            max(max((len(s) for s in send_lists), default=1), 1), tile
        )

        send_idx = np.zeros((n_shards, H), dtype=np.int32)  # local indices
        slot_of: list[dict[int, int]] = []
        for o in range(n_shards):
            sl = send_lists[o]
            send_idx[o, : len(sl)] = sl - offsets[o]
            slot_of.append({int(g): i for i, g in enumerate(sl)})

        def ghost_slot(o: int, d: int, g: int) -> int:
            return Nl + o * H + slot_of[o][g]

    def ext_addr(global_nodes: np.ndarray, d: int) -> np.ndarray:
        """Rewrite global node ids into shard d's extended address space."""
        own = owner(global_nodes)
        local = global_nodes - offsets[d]
        out = np.empty(len(global_nodes), dtype=np.int32)
        mine = own == d
        out[mine] = local[mine]
        for o in np.unique(own[~mine]):
            sel = (own == o) & ~mine
            out[sel] = np.array(
                [ghost_slot(int(o), d, int(g)) for g in global_nodes[sel]],
                dtype=np.int32,
            )
        return out

    shards = []
    for d in range(n_shards):
        lo = offsets[d]
        hi = max(lo, min(lo + per, Np))  # shards past Np own nothing
        n_here = hi - lo
        sl = slice(lo, hi)

        def node_arr(a, fill=0.0):
            out = np.full((Nl,) + a.shape[1:], fill, dtype=a.dtype)
            out[:n_here] = a[sl]
            return out

        l_pos = node_arr(pos)
        l_gid = np.full(Nl, batch.n_graphs, np.int32)
        l_gid[:n_here] = node_gid[sl]

        e_idx = edge_lists[d]
        raw_snd = ext_addr(senders[e_idx], d) if len(e_idx) else np.zeros(
            0, np.int32
        )
        raw_rcv = (receivers[e_idx] - lo).astype(np.int32)
        raw_ew = np.asarray(batch.edge_weight)[e_idx]
        raw_eg = np.asarray(batch.edge_gid)[e_idx]
        order = np.argsort(raw_rcv, kind="stable")
        from p_div_gnn_tpu.graphs.batching import blockify_edges

        l_snd, l_rcv, l_ew, l_eg, l_tp, l_bt = blockify_edges(
            raw_snd[order].astype(np.int32),
            raw_rcv[order],
            raw_ew[order],
            raw_eg[order],
            num_nodes=Nl,
            n_graphs=batch.n_graphs,
            tile=tile,
            min_capacity=El,
        )
        # sender-major view over the EXTENDED [local ++ ghost] address
        # space: puts the fused path's merged sender-gather VJP (MXU
        # one-hot scatter) on the partitioned step too — without it the
        # backward under a halo reverts to XLA's generic per-element
        # scatter (VERDICT r3 weak #6)
        n_ghost_rows = n_shards * send_idx.shape[-1]  # D·Hp (a2a) / D·H
        from p_div_gnn_tpu.graphs.batching import build_sender_view

        l_sp, l_ss, l_sbt = build_sender_view(l_snd, Nl + n_ghost_rows, tile)

        k_idx = div_lists[d]
        l_dd = np.zeros(Kl, np.float32)
        l_dr = np.full(Kl, Nl - 1, np.int32)
        l_dc = np.full(Kl, Nl - 1, np.int32)
        l_dy = np.zeros(Kl, np.int32)
        l_dd[: len(k_idx)] = np.asarray(batch.div_data)[k_idx]
        l_dr[: len(k_idx)] = div_row[k_idx] - lo
        l_dc[: len(k_idx)] = ext_addr(div_col_node[k_idx], d)
        l_dy[: len(k_idx)] = np.asarray(batch.div_col_is_y)[k_idx]

        # local per-graph counts (psum'd in the loss)
        counts = np.zeros(batch.n_graphs, np.int32)
        ids, c = np.unique(l_gid[l_gid < batch.n_graphs], return_counts=True)
        counts[ids] = c

        shards.append(
            GraphBatch(
                pos=l_pos,
                mean_stress=node_arr(np.asarray(batch.mean_stress)),
                node_type=node_arr(np.asarray(batch.node_type)),
                local_stress=node_arr(np.asarray(batch.local_stress)),
                node_gid=l_gid,
                senders=l_snd,
                receivers=l_rcv,
                edge_weight=l_ew,
                edge_gid=l_eg,
                tile_ptr=l_tp,
                edge_block_tile=l_bt,
                div_data=l_dd,
                div_row=l_dr,
                div_col_node=l_dc,
                div_col_is_y=l_dy,
                graph_node_count=counts,
                graph_node_offset=np.zeros(batch.n_graphs, np.int32),
                n_graphs=batch.n_graphs,
                tile=tile,
                snd_perm=l_sp,
                snd_sorted=l_ss,
                snd_block_tile=l_sbt,
            )
        )
    # equalize sender-view capacity across shards (one compiled program)
    from p_div_gnn_tpu.graphs.batching import pad_sender_view

    n_ghost_rows = n_shards * send_idx.shape[-1]
    vcap = max(len(b.snd_perm) for b in shards)
    shards = [
        b.replace(
            **dict(zip(
                ("snd_perm", "snd_sorted", "snd_block_tile"),
                pad_sender_view(
                    b.snd_perm, b.snd_sorted, b.snd_block_tile, vcap,
                    Nl + n_ghost_rows, tile,
                ),
            ))
        )
        for b in shards
    ]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *shards)
    return stacked, send_idx


def make_partitioned_forward(
    model: Any, stats: NormStats, mesh: Mesh, axis: str = "graph",
    scale_output: bool = True,
) -> Callable:
    """jit'd partitioned forward: (params, stacked_batch, send_idx) →
    (D, Nl, 3) local predictions."""

    def per_shard(params, local_batch, send_idx):
        local_batch = jax.tree.map(lambda x: x[0], local_batch)
        halo = Halo(send_idx=send_idx[0], axis_name=axis)
        pred = model.apply(
            params,
            local_batch,
            stats,
            scale_input=True,
            scale_output=scale_output,
            axis_name=axis,
            halo=halo,
        )
        return pred[None]

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )


def make_partitioned_train_step(
    model: Any,
    stats: NormStats,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    divergence_penalty: float = 0.0,
    optimize_divergence: bool = False,
    axis: str = "graph",
) -> Callable:
    """Full training step over edge-partitioned graphs: halo-exchanged
    forward, psum'd partitioned loss, psum'd grads, replicated Adam."""

    def loss_fn(params, local_batch, halo):
        pred = model.apply(
            params,
            local_batch,
            stats,
            scale_input=True,
            scale_output=False,
            axis_name=axis,
            halo=halo,
        )
        gt = (
            local_batch.local_stress - stats.mean_local_stress
        ) / stats.std_local_stress
        return partitioned_batch_loss(
            local_batch,
            pred,
            gt,
            halo,
            axis,
            divergence_penalty=divergence_penalty,
            optimize_divergence=optimize_divergence,
        )

    def per_shard(params, opt_state, local_batch, send_idx):
        local_batch = jax.tree.map(lambda x: x[0], local_batch)
        halo = Halo(send_idx=send_idx[0], axis_name=axis)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, local_batch, halo
        )
        # Same collective-normalization contract as dp.py: psum transposes
        # scale the summed partials by D; pmean restores the true gradient.
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["total"] = total
        return params, opt_state, aux

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def device_put_partitioned(batch: Any, send_idx: Any, mesh: Mesh, axis: str = "graph") -> tuple:
    """Place shard-stacked arrays onto the mesh (multi-process aware: each
    process contributes only its addressable rows, like the DP path)."""
    from p_div_gnn_tpu.parallel.dp import device_put_sharded_batch

    return (
        device_put_sharded_batch(batch, mesh, axis),
        device_put_sharded_batch(send_idx, mesh, axis),
    )
