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

    # permute the cotangent stream into sender-tile blocks; padding slots
    # carry a high out-of-bounds sentinel → filled with 0
    g_sorted = jnp.take(
        g.astype(jnp.float32), snd_perm, axis=0,
        mode="fill", fill_value=0.0,
    )
    dproj = pallas_segment_sum(
        g_sorted, snd_sorted, snd_block_tile, num_nodes
    )
    return dproj.astype(g.dtype), None, None, None, None


sender_gather.defvjp(_fwd, _bwd)
