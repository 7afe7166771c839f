"""Sender gather with an MXU-scatter backward.

Forward is a plain row gather ``proj[senders]`` (XLA gathers are fast on
TPU). Its VJP is a scatter-add over senders, which XLA lowers to a slow
generic per-element scatter — the dominant backward cost of the fused edge
step's ``s_msg``/``s_upd`` preparation. With the sender-major view built at
pack time (graphs/batching.build_sender_view) the cotangent is instead
permuted into sender-tile blocks (one gather, padding slots filled with 0)
and accumulated by the block-CSR one-hot scatter kernel
(ops/scatter_pallas.pallas_segment_sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sender_gather(
    proj: jax.Array,  # (Np, L)
    senders: jax.Array,  # (Ep,) i32
    snd_perm: jax.Array,  # (Ep2,) i32, OOB sentinel for padding slots
    snd_sorted: jax.Array,  # (Ep2,) i32
    snd_block_tile: jax.Array,  # (Ep2/EDGE_BLOCK,) i32
    num_nodes: int,
) -> jax.Array:
    return jnp.take(proj, senders, axis=0)


def _fwd(proj, senders, snd_perm, snd_sorted, snd_block_tile, num_nodes):
    out = jnp.take(proj, senders, axis=0)
    return out, (senders, snd_perm, snd_sorted, snd_block_tile)


def _bwd(num_nodes, res, g):
    senders, snd_perm, snd_sorted, snd_block_tile = res
    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

    # permute the cotangent stream into sender-tile blocks. Padding slots
    # point at edge slot 0 (valid — the gather runs unguarded) and carry
    # snd_sorted == -1, so the scatter kernel's one-hot row is all-zero
    # and the junk rows contribute nothing.
    g_sorted = g.astype(jnp.float32).at[snd_perm].get(
        mode="promise_in_bounds"
    )
    dproj = pallas_segment_sum(
        g_sorted, snd_sorted, snd_block_tile, num_nodes
    )
    return dproj.astype(g.dtype), None, None, None, None


sender_gather.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def sender_gather_pair(
    proj_u: jax.Array,  # (Np, L)
    proj_v: jax.Array,  # (Np, L)
    senders: jax.Array,  # (Ep,) i32
    snd_perm: jax.Array,
    snd_sorted: jax.Array,
    snd_block_tile: jax.Array,
    num_nodes: int,
) -> tuple[jax.Array, jax.Array]:
    """BOTH sender gathers of a Processor step — ``proj_v[snd]`` (message
    path) and ``proj_u[snd]`` (edge-update path) — with a MERGED backward:
    the two cotangent streams are permuted into the shared sender-tile
    layout and scattered in ONE kernel traversal
    (ops/scatter_pallas.pallas_segment_sum_pair) instead of two. Kernel
    fixed cost (~1 µs/block × ~2k blocks) is the dominant scatter cost, so
    merging halves it."""
    return (
        jnp.take(proj_v, senders, axis=0),
        jnp.take(proj_u, senders, axis=0),
    )


def _pair_fwd(proj_u, proj_v, senders, snd_perm, snd_sorted, snd_block_tile,
              num_nodes):
    out = (
        jnp.take(proj_v, senders, axis=0),
        jnp.take(proj_u, senders, axis=0),
    )
    return out, (snd_perm, snd_sorted, snd_block_tile)


def _pair_bwd(num_nodes, res, cts):
    snd_perm, snd_sorted, snd_block_tile = res
    g_v, g_u = cts  # cotangents of (gather(proj_v), gather(proj_u))
    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum_pair

    # unguarded gathers (padding slots point at slot 0; their one-hot rows
    # are dead via snd_sorted == -1)
    gv_sorted = g_v.astype(jnp.float32).at[snd_perm].get(
        mode="promise_in_bounds"
    )
    gu_sorted = g_u.astype(jnp.float32).at[snd_perm].get(
        mode="promise_in_bounds"
    )
    dv, du = pallas_segment_sum_pair(
        gv_sorted, gu_sorted, snd_sorted, snd_block_tile, num_nodes
    )
    return (du.astype(g_u.dtype), dv.astype(g_v.dtype),
            None, None, None, None)


sender_gather_pair.defvjp(_pair_fwd, _pair_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sender_gather_one(
    x: jax.Array,  # (Np, L) — raw node latents, stream dtype (v3)
    senders: jax.Array,  # (Ep,) i32
    snd_perm: jax.Array,
    snd_sorted: jax.Array,
    snd_block_tile: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """The v3 (raw-x) sender gather: ONE stream each way, in the stream
    dtype. Forward is a plain row gather ``x[senders]``; the backward
    permutes the single cotangent stream into the sender-tile layout
    WITHOUT leaving the stream dtype and accumulates it with the
    dtype-generic block-CSR scatter kernel (fp32 accumulators). vs
    sender_gather_pair this halves the stream count and, in bf16 mode,
    halves the bytes again (micro_sender.json: 12.5 ms → ~3.4 ms of
    machinery per MP step at the flagship workload)."""
    return jnp.take(x, senders, axis=0)


def _one_fwd(x, senders, snd_perm, snd_sorted, snd_block_tile, num_nodes):
    out = jnp.take(x, senders, axis=0)
    return out, (snd_perm, snd_sorted, snd_block_tile)


def _one_bwd(num_nodes, res, g):
    snd_perm, snd_sorted, snd_block_tile = res
    from p_div_gnn_tpu.ops.scatter_pallas import pallas_segment_sum

    # unguarded gather (padding slots point at slot 0; their one-hot rows
    # are dead via snd_sorted == -1) — stays in the stream dtype; the
    # cotangent dtype equals the primal x's (gather preserves dtype)
    g_sorted = g.at[snd_perm].get(mode="promise_in_bounds")
    dx = pallas_segment_sum(g_sorted, snd_sorted, snd_block_tile, num_nodes)
    return dx.astype(g.dtype), None, None, None, None


sender_gather_one.defvjp(_one_fwd, _one_bwd)
