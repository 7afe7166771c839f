"""EncodeProcessDecode — the P-DivGNN model family, TPU-first.

Faithful re-design of the reference model
(`/root/reference/gnn_local_stress/models.py:98-326`):

- node features ``x = [σ̄xx, σ̄yy, σ̄xy, pos_x, pos_y, node_type]`` with
  optional scalar standardization (`models.py:140-152`);
- encoders 6→L and 1→L (Linear→ReLU→Linear→ReLU→graph-LN), ONE Processor
  shared across all message-passing steps (weight tying,
  `models.py:276-280,313-314`), decoder L→L→3;
- Processor step (`models.py:210-243`): messages
  ``edge_net([x_target, x_source, e])`` (PyG ``x_i`` is the TARGET under
  source_to_target flow), scatter-add over targets, node update
  ``node_net([aggr, x])`` + residual; edge update
  ``edge_net([x_source, x_target, e])`` + residual — note the swapped
  concat order vs the message computation: the two edge_net evaluations
  share weights but see different inputs, so both are evaluated (each with
  its own graph-LN statistics);
- zero early-exit when the macroscopic stress is all zero
  (`models.py:294-299`).

TPU-first decomposition: the edge MLP's first linear over the concat
``[u, v, e]`` is split into per-slot kernels so the two node projections
are computed ONCE per step at node granularity (N rows) and gathered,
instead of materializing (E, 3L) concats — at E≈7N this removes ~2/3 of
the per-edge first-layer FLOPs and all concat HBM traffic; the ``e``-slot
projection is shared between the message and edge-update evaluations.
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from p_div_gnn_tpu.graphs.container import GraphBatch, NormStats
from p_div_gnn_tpu.models.blocks import (
    DenseParams,
    GraphLayerNorm,
    LayerNormParams,
    MLPBlock,
    TorchDense,
)
from p_div_gnn_tpu.ops.layernorm import masked_graph_layernorm
from p_div_gnn_tpu.ops.scatter import scatter_add
from p_div_gnn_tpu.utils.precision import matmul_precision


class Halo(flax.struct.PyTreeNode):
    """Ghost-node exchange plan for edge-partitioned execution
    (SURVEY §2 parallelism item 2 — the graph analog of sequence
    parallelism).

    Each shard owns a contiguous node range; edges live with their
    receiver's owner, and senders may reference remote nodes. Per
    message-passing step every shard publishes the ghost values its peers
    need over the ``axis_name`` mesh axis; edge sender indices are
    pre-encoded in the extended address space ``[local 0..Nl) ++ ghosts``.

    Two wire formats (chosen by ``send_idx`` rank — the planner decides):

    - ``(H,)`` *all-gather* (v1): each shard broadcasts the UNION of nodes
      any peer needs; ghost slot of node g owned by o is ``Nl + o·H + s``.
      Simple, but traffic/memory is O(D·H) with H the max union size.
    - ``(D, Hp)`` *all-to-all* (v2): row r holds the slots this shard sends
      to peer r only; ghost slot is ``Nl + o·Hp + s`` with s the slot in
      the (o→me) pair list. Traffic is O(D·Hp) with Hp the max PER-PAIR
      size — for contiguous ranges of a planar mesh each shard talks to
      ~2-4 neighbors, so Hp ≪ H and most of the all-gather's replication
      is gone (VERDICT round-1 weak #3).
    """

    # (H,) shared publish list, or (D, Hp) per-peer rows (see above)
    send_idx: jax.Array
    axis_name: str = flax.struct.field(pytree_node=False, default="graph")

    def exchange_ghosts(self, x_local: jax.Array) -> jax.Array:
        """Collective only — returns the (D·H[p], C) ghost block. Callers
        that consume ghosts through a separate matmul keep this collective
        independent of their local compute, letting XLA's latency-hiding
        scheduler overlap the exchange with local work."""
        buf = x_local[self.send_idx]
        if self.send_idx.ndim == 2:
            # (D, Hp, C): row r → peer r; received row o = from peer o
            recv = jax.lax.all_to_all(
                buf, self.axis_name, split_axis=0, concat_axis=0, tiled=True
            )
        else:
            recv = jax.lax.all_gather(buf, self.axis_name)  # (D, H, C)
        return recv.reshape(-1, x_local.shape[-1])

    def exchange(self, x_local: jax.Array) -> jax.Array:
        return jnp.concatenate(
            [x_local, self.exchange_ghosts(x_local)], axis=0
        )


class Processor(nn.Module):
    """One message-passing step (reference `Processor`, models.py:182-243)."""

    latent_size: int
    scatter_impl: str = "xla"
    # "bfloat16" = speed mode for the fused path: the four big per-edge
    # streams (s_msg, s_upd, z_upd and their backward cotangents) are
    # stored bf16, halving the dominant HBM traffic; all MXU contractions,
    # accumulators, LN moments, residual carries and parameters stay fp32.
    # Off by default (parity with the reference's fp32 training).
    stream_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (Np, L) node latents (owned/local under halo)
        e: jax.Array,  # (Ep, L) edge latents
        batch: GraphBatch,
        axis_name: str | None = None,
        halo: Halo | None = None,
        deg: jax.Array | None = None,  # (Np, 1) real in-degree (hoisted)
    ) -> tuple[jax.Array, jax.Array]:
        L = self.latent_size

        # edge_net first linear, decomposed over concat slots [u, v, e]:
        # rows 0:L ← u (first concat slot), L:2L ← v, 2L:3L ← e. Init bounds
        # use the CONCAT fan-in (3L), matching torch's kaiming_uniform on
        # the full (3L, L) weight — per-slot fan-in would make first-layer
        # activations 3x too hot and stall training.
        bound = 1.0 / jnp.sqrt(3 * L)
        slot_init = lambda k, s: jax.random.uniform(
            k, s, jnp.float32, -bound, bound
        )
        w_u = self.param("edge_w_u", slot_init, (L, L))
        w_v = self.param("edge_w_v", slot_init, (L, L))
        w_e = self.param("edge_w_e", slot_init, (L, L))
        edge_b0 = self.param("edge_b0", slot_init, (L,))
        edge_lin1_k, edge_lin1_b = DenseParams(L, L, name="edge_lin1")()
        edge_ln_w, edge_ln_b = LayerNormParams(L, name="edge_ln")()

        snd, rcv = batch.senders, batch.receivers
        edge_mask = batch.edge_mask

        # Hoisted node projections (N-sized matmuls instead of E-sized).
        # Under edge partitioning, senders address the extended
        # [local ++ ghost] space refreshed by one all-gather per step.
        prec = matmul_precision()
        if self.scatter_impl != "fused3":
            if halo is not None:
                # Exchange RAW features and project ghosts separately: the
                # collective has no data dependence on the local N×L×L
                # matmuls, so XLA overlaps it with them (compute/
                # communication overlap, SURVEY §8.7); ghost projections
                # are tiny (D·Hp rows).
                ghosts = halo.exchange_ghosts(x)
                proj_u = jnp.concatenate(
                    [jnp.dot(x, w_u, precision=prec),
                     jnp.dot(ghosts, w_u, precision=prec)], axis=0
                )
                proj_v = jnp.concatenate(
                    [jnp.dot(x, w_v, precision=prec),
                     jnp.dot(ghosts, w_v, precision=prec)], axis=0
                )
            else:
                proj_u = jnp.dot(x, w_u, precision=prec)  # FIRST slot
                proj_v = jnp.dot(x, w_v, precision=prec)  # SECOND slot
        if self.scatter_impl not in ("fused", "fused2", "fused3"):
            # the fused kernels project e in-kernel (the (Ep, L) ep stream
            # never exists in HBM); the dense XLA paths share one e @ We
            e_proj = jnp.dot(e, w_e, precision=prec)  # shared by both evals

        use_fused = self.scatter_impl in ("fused", "fused2", "fused3")
        if use_fused:
            # The Pallas kernels address node tiles as tile_index*NODE_TILE;
            # a batch packed at a different tile would be silently
            # misaddressed (advisor round-4 finding).
            from p_div_gnn_tpu.graphs.batching import NODE_TILE

            assert batch.tile == NODE_TILE, (
                f"batch packed with tile={batch.tile} but the fused kernels "
                f"are compiled for NODE_TILE={NODE_TILE}; repack the batch "
                f"(or set PDG_NODE_TILE) so the layouts agree"
            )
        if self.scatter_impl == "fused3":
            # v3 raw-x step (round-5): ONE raw sender stream each way in
            # the stream dtype; slot projections + e-projection form
            # in-kernel; the backward's sender cotangent is ONE stream
            # scattered by the dtype-generic block-CSR kernel
            # (ops/fused_edge3.py — 12.5 → ~3.4 ms of sender machinery
            # per MP step at the flagship workload, micro_sender.json).
            from p_div_gnn_tpu.ops.fused_edge import (
                lazy_layernorm_affine,
                moments_from_partials,
            )
            from p_div_gnn_tpu.ops.fused_edge3 import fused_edge_step3
            from p_div_gnn_tpu.ops.segment import segment_sum

            G = batch.n_graphs
            aux = (batch.edge_gid, batch.edge_block_tile)
            Np = x.shape[0]
            sd = (
                jnp.bfloat16 if self.stream_dtype == "bfloat16"
                else jnp.float32
            )
            x_sd = x.astype(sd)
            if halo is not None:
                # ghosts ride the collective in the stream dtype (halves
                # wire bytes in bf16 mode); senders address the extended
                # [local ++ ghost] space like the v2 path
                x_ext = jnp.concatenate(
                    [x_sd, halo.exchange_ghosts(x_sd)], axis=0
                )
            else:
                x_ext = x_sd
            if batch.snd_perm is not None:
                from p_div_gnn_tpu.ops.gather import sender_gather_one

                g_x = sender_gather_one(
                    x_ext, snd, batch.snd_perm, batch.snd_sorted,
                    batch.snd_block_tile, x_ext.shape[0],
                )
            else:
                g_x = x_ext[snd]
            z_upd, r_raw, m = fused_edge_step3(
                x_sd, g_x, e.astype(sd),
                w_u.astype(sd), w_v.astype(sd), w_e.astype(sd),
                edge_b0.astype(sd), edge_lin1_k.astype(sd),
                edge_lin1_b.astype(sd), rcv, aux, G,
            )
            m1, s1 = moments_from_partials(m[0], m[1], edge_mask, axis_name)
            a1, b1 = lazy_layernorm_affine(m1, s1, edge_ln_w, edge_ln_b)
            m2, s2 = moments_from_partials(m[2], m[3], edge_mask, axis_name)
            a2, b2 = lazy_layernorm_affine(m2, s2, edge_ln_w, edge_ln_b)
            if deg is None:
                deg = segment_sum(
                    edge_mask.astype(jnp.float32)[:, None], rcv, Np
                )
            aggr = r_raw * a1 + deg * b1
            new_e = (z_upd * a2 + b2) * edge_mask[:, None]
        elif self.scatter_impl == "fused2":
            # pair-blocked FULL fusion: both endpoint gathers and the
            # e-projection live inside one kernel pass (needs a batch packed
            # with pair_blocks=True; see ops/fused_edge.fused_edge_step2)
            from p_div_gnn_tpu.ops.fused_edge import (
                fused_edge_step2,
                lazy_layernorm_affine,
                moments_from_partials,
            )
            from p_div_gnn_tpu.ops.segment import segment_sum

            assert batch.edge_block_snd_tile is not None, (
                "scatter_impl='fused2' needs pair-blocked batches "
                "(pack_batch(pair_blocks=True))"
            )
            assert halo is None, "fused2 is single-shard for now"
            G = batch.n_graphs
            Np = x.shape[0]
            sd = (
                jnp.bfloat16 if self.stream_dtype == "bfloat16"
                else jnp.float32
            )
            aux2 = (
                batch.edge_gid, batch.edge_block_tile,
                batch.edge_block_snd_tile,
                batch.snd_perm, batch.snd_sorted, batch.snd_block_tile,
            )
            z_upd, r_raw, m = fused_edge_step2(
                proj_u.astype(sd), proj_v.astype(sd), e.astype(sd),
                w_e.astype(sd), edge_b0.astype(sd),
                edge_lin1_k.astype(sd), edge_lin1_b.astype(sd),
                rcv, snd, aux2, G,
            )
            m1, s1 = moments_from_partials(m[0], m[1], edge_mask, axis_name)
            a1, b1 = lazy_layernorm_affine(m1, s1, edge_ln_w, edge_ln_b)
            m2, s2 = moments_from_partials(m[2], m[3], edge_mask, axis_name)
            a2, b2 = lazy_layernorm_affine(m2, s2, edge_ln_w, edge_ln_b)
            if deg is None:
                deg = segment_sum(
                    edge_mask.astype(jnp.float32)[:, None], rcv, Np,
                    indices_are_sorted=False,
                )
            aggr = r_raw * a1 + deg * b1
            new_e = (z_upd * a2 + b2) * edge_mask[:, None]
        elif use_fused:
            from p_div_gnn_tpu.ops.fused_edge import (
                fused_edge_step,
                lazy_layernorm_affine,
                moments_from_partials,
            )
            from p_div_gnn_tpu.ops.segment import segment_sum

            G = batch.n_graphs
            aux = (batch.edge_gid, batch.edge_block_tile)
            Np = x.shape[0]
            # ONE pass over the edge stream: both edge-net evaluations
            # (messages: A-slot = proj_u tile-gathered by receiver, S =
            # sender gather + e-projection + first bias; edge update:
            # slots swapped), the RAW message scatter R and the graph-LN
            # moment partials M — z_msg is never materialized in HBM.
            sd = (
                jnp.bfloat16 if self.stream_dtype == "bfloat16"
                else jnp.float32
            )
            if batch.snd_perm is not None:
                # BOTH sender gathers through one custom-vjp pair whose
                # backward scatters the two cotangent streams in ONE
                # kernel traversal (ops/gather.sender_gather_pair) — the
                # per-block fixed cost dominates the scatter, so merging
                # halves it vs two sender_gather calls. Under a halo the
                # partitioned planner builds the sender view over the
                # extended [local ++ ghost] space (partition_batch), so
                # the same fast path covers partitioned execution; ghost
                # cotangent rows flow on through the collective's VJP.
                from p_div_gnn_tpu.ops.gather import sender_gather_pair

                g_v, g_u = sender_gather_pair(
                    proj_u, proj_v, snd, batch.snd_perm, batch.snd_sorted,
                    batch.snd_block_tile, proj_u.shape[0],
                )
            else:
                g_v, g_u = proj_v[snd], proj_u[snd]
            # the raw streams go straight into the kernel — the per-edge
            # first-layer sums (gathers + e @ We + b0) form in-kernel, so
            # neither the two (Ep, L) s-streams nor the ep stream are ever
            # materialized in HBM
            z_upd, r_raw, m = fused_edge_step(
                proj_u[:Np].astype(sd), proj_v[:Np].astype(sd),
                g_v.astype(sd), g_u.astype(sd), e.astype(sd),
                w_e.astype(sd), edge_b0.astype(sd),
                edge_lin1_k.astype(sd), edge_lin1_b.astype(sd),
                rcv, aux, G,
            )
            # lazy graph-LN: fold the affine into the consumers.
            # aggr_i = Σ_real (z·α1 + β1) = α1·R_i + β1·deg_i.
            # Under sharding the moments psum over the mesh axis (the
            # reference's graph-mode LN spans the whole batch jointly).
            m1, s1 = moments_from_partials(m[0], m[1], edge_mask, axis_name)
            a1, b1 = lazy_layernorm_affine(m1, s1, edge_ln_w, edge_ln_b)
            m2, s2 = moments_from_partials(m[2], m[3], edge_mask, axis_name)
            a2, b2 = lazy_layernorm_affine(m2, s2, edge_ln_w, edge_ln_b)
            if deg is None:
                deg = segment_sum(
                    edge_mask.astype(jnp.float32)[:, None], rcv, Np
                )
            aggr = r_raw * a1 + deg * b1
            new_e = (z_upd * a2 + b2) * edge_mask[:, None]
        else:
            def edge_net_tail(pre: jax.Array) -> jax.Array:
                h = nn.relu(pre)
                y = nn.relu(
                    jnp.dot(h, edge_lin1_k, precision=prec) + edge_lin1_b
                )
                return masked_graph_layernorm(
                    y, edge_mask, edge_ln_w, edge_ln_b, axis_name=axis_name
                )

            if (
                self.scatter_impl == "hybrid"
                and batch.snd_perm is not None
            ):
                # XLA forward (fast: big dense MLP matmuls + sorted-receiver
                # segment sums) with ONLY the sender-gather VJPs swapped for
                # the MXU one-hot scatter — profiling shows the backward's
                # unsorted sender scatters are the XLA path's bottleneck
                # while its forward beats the fused kernel (ops/gather.py).
                from p_div_gnn_tpu.ops.gather import sender_gather

                gather_snd = lambda p: sender_gather(
                    p, snd, batch.snd_perm, batch.snd_sorted,
                    batch.snd_block_tile, p.shape[0],
                )
            else:
                gather_snd = lambda p: p[snd]

            # message: edge_net([x_i, x_j, e]) with i=target, j=source.
            msg_pre = proj_u[rcv] + gather_snd(proj_v) + e_proj + edge_b0
            messages = edge_net_tail(msg_pre)

            # edge update: edge_net([x_row, x_col, e]) = [source, target, e].
            upd_pre = gather_snd(proj_u) + proj_v[rcv] + e_proj + edge_b0
            new_e = edge_net_tail(upd_pre)

            # aggregate (scatter-add over targets) then node_net([aggr, x]).
            aggr = scatter_add(
                messages,
                rcv,
                x.shape[0],
                block_tile=batch.edge_block_tile,
                impl="xla"
                if self.scatter_impl in ("fused", "fused2", "fused3", "hybrid")
                else self.scatter_impl,
                # pair-blocked layouts are not globally receiver-sorted
                sorted_receivers=batch.edge_block_snd_tile is None,
            )
        nbound = 1.0 / jnp.sqrt(2 * L)  # concat fan-in [aggr, x]
        nslot_init = lambda k, s: jax.random.uniform(
            k, s, jnp.float32, -nbound, nbound
        )
        n_a = self.param("node_w_a", nslot_init, (L, L))
        n_x = self.param("node_w_x", nslot_init, (L, L))
        node_b0 = self.param("node_b0", nslot_init, (L,))
        node_lin1 = TorchDense(L, name="node_lin1")
        node_ln = GraphLayerNorm(L, name="node_ln")
        node_pre = (
            jnp.dot(aggr, n_a, precision=prec)
            + jnp.dot(x, n_x, precision=prec)
            + node_b0
        )
        node_h = nn.relu(node_pre)
        new_x = node_ln(nn.relu(node_lin1(node_h)), batch.node_mask, axis_name)

        return new_x + x, new_e + e


class EncodeProcessDecode(nn.Module):
    """Encode-process-decode stress-field model (models.py:246-326)."""

    latent_size: int = 128
    message_passing_steps: int = 10
    input_nodes_features_size: int = 6
    input_edges_features_size: int = 1
    output_nodes_features_size: int = 3
    scatter_impl: str = "xla"
    stream_dtype: str = "float32"  # "bfloat16": fused-path speed mode
    # lax.scan over the weight-tied processor keeps the compiled program a
    # single step long (the reference re-applies ONE Processor instance,
    # models.py:313-314, so scanning is semantically identical); unrolling
    # is available for XLA to fuse across steps when compile time is cheap.
    unroll_steps: bool = False
    # rematerialize each message-passing step in the backward pass: only the
    # (x, e) carries are saved per step instead of every edge-MLP
    # intermediate (~6x less HBM for activations at ~1.3x step FLOPs) —
    # without it a 40k-node batch-16 training step overflows 16G HBM.
    remat_steps: bool = True

    def format_node_features(
        self, batch: GraphBatch, stats: NormStats, scale_input: bool
    ) -> jax.Array:
        mean_stress, pos = batch.mean_stress, batch.pos
        if scale_input:
            mean_stress = (mean_stress - stats.mean_mean_stress) / (
                stats.std_mean_stress
            )
            pos = (pos - stats.mean_pos) / stats.std_pos
        return jnp.concatenate([mean_stress, pos, batch.node_type], axis=-1)

    def format_edge_features(
        self, batch: GraphBatch, stats: NormStats, scale_input: bool
    ) -> jax.Array:
        w = batch.edge_weight
        if scale_input:
            w = (w - stats.mean_edge_weight) / stats.std_edge_weight
        return w

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        stats: NormStats,
        scale_input: bool = True,
        scale_output: bool = True,
        axis_name: str | None = None,
        halo: Halo | None = None,
    ) -> jax.Array:
        x_in = self.format_node_features(batch, stats, scale_input)
        e_in = self.format_edge_features(batch, stats, scale_input)
        node_mask, edge_mask = batch.node_mask, batch.edge_mask

        x = MLPBlock(self.latent_size, name="node_encoder")(
            x_in, node_mask, axis_name
        )
        e = MLPBlock(self.latent_size, name="edge_encoder")(
            e_in, edge_mask, axis_name
        )
        processor = Processor(
            self.latent_size, scatter_impl=self.scatter_impl,
            stream_dtype=self.stream_dtype, name="processor"
        )
        # The lazy-LN fold's per-node real in-degree is the same every MP
        # step; hoisting it out of the scan removes one (Ep,)-sized
        # segment-sum per step (it is NOT reliably loop-invariant-code-
        # motioned out of the scanned/rematerialized body by XLA).
        deg = None
        if self.scatter_impl in ("fused", "fused2", "fused3"):
            from p_div_gnn_tpu.ops.segment import segment_sum

            deg = segment_sum(
                batch.edge_mask.astype(jnp.float32)[:, None],
                batch.receivers, x.shape[0],
                indices_are_sorted=batch.edge_block_snd_tile is None,
            )
        if self.unroll_steps:
            for _ in range(self.message_passing_steps):
                x, e = processor(x, e, batch, axis_name, halo, deg)
        else:
            def body(mdl, carry, _):
                return mdl(carry[0], carry[1], batch, axis_name, halo,
                           deg), None

            if self.remat_steps:
                body = nn.remat(body, prevent_cse=False)
            scan_proc = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=self.message_passing_steps,
            )
            (x, e), _ = scan_proc(processor, (x, e), None)

        decoded = MLPBlock(
            self.latent_size,
            out_size=self.output_nodes_features_size,
            layer_norm=False,
            name="node_decoder",
        )(x)

        if scale_output:
            decoded = decoded * stats.std_local_stress + stats.mean_local_stress

        # Zero early-exit (`models.py:294-299`): all-zero macroscopic stress
        # → zero field. Batch-level check like the reference. psum under
        # sharding so all shards agree.
        any_nonzero = jnp.any(batch.mean_stress != 0)
        if axis_name is not None:
            any_nonzero = jax.lax.psum(
                any_nonzero.astype(jnp.int32), axis_name
            ) > 0
        return jnp.where(any_nonzero, decoded, jnp.zeros_like(decoded))
