"""Fused, segment-reduction losses: per-graph NMSE + divergence penalty.

Behavioral twins of the reference's per-graph Python-loop losses
(`/root/reference/scripts/gnn_train.py:41-57` NMSE, `:60-92` divergence),
re-designed for TPU: every per-graph quantity is a segment reduction keyed
by graph id over the padded batch — no Python loop, no sparse→dense
densification (the reference's second hot spot, `gnn_train.py:73-76`), one
fused jit region.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from p_div_gnn_tpu.graphs.container import GraphBatch
from p_div_gnn_tpu.ops.segment import segment_sum


@jax.custom_vjp
def _div_ell_apply(stress, div_src, div_val, div_isy, divT_row, divT_val,
                   divT_isy):
    """Gather-only divergence operator: (Np, 3) stress → (Np, 2) div.

    Forward contracts the row-ELL view (fixed fan-in W per node); the VJP
    contracts the TRANSPOSE ELL view — both pure gathers + lane reductions,
    so neither direction ever runs a scatter (the COO path's unsorted
    scatter + scatter-VJP dominated the train step at ~54 ms;
    docs/evidence/microbench.json)."""
    g = jnp.take(stress, div_src, axis=0)  # (Np, W, 3)
    isy = div_isy.astype(stress.dtype)
    v0 = g[..., 0] * (1 - isy) + g[..., 2] * isy
    v1 = g[..., 2] * (1 - isy) + g[..., 1] * isy
    d0 = jnp.sum(div_val * v0, axis=1)
    d1 = jnp.sum(div_val * v1, axis=1)
    return jnp.stack([d0, d1], axis=-1)


def _div_ell_fwd(stress, div_src, div_val, div_isy, divT_row, divT_val,
                 divT_isy):
    out = _div_ell_apply(stress, div_src, div_val, div_isy, divT_row,
                         divT_val, divT_isy)
    return out, (divT_row, divT_val, divT_isy)


def _div_ell_bwd(res, ct):
    divT_row, divT_val, divT_isy = res
    h = jnp.take(ct, divT_row, axis=0)  # (Np, Wt, 2)
    isy = divT_isy.astype(ct.dtype)
    w0 = divT_val * h[..., 0]
    w1 = divT_val * h[..., 1]
    # entry (r, s, isy): isy=0 → dS[s,0] += val·ct[r,0], dS[s,2] += val·ct[r,1]
    #                    isy=1 → dS[s,2] += val·ct[r,0], dS[s,1] += val·ct[r,1]
    ds0 = jnp.sum(w0 * (1 - isy), axis=1)
    ds1 = jnp.sum(w1 * isy, axis=1)
    ds2 = jnp.sum(w0 * isy + w1 * (1 - isy), axis=1)
    dstress = jnp.stack([ds0, ds1, ds2], axis=-1)
    return (dstress, None, None, None, None, None, None)


_div_ell_apply.defvjp(_div_ell_fwd, _div_ell_bwd)


def per_graph_nmse(
    batch: GraphBatch, prediction: jax.Array, ground_truth: jax.Array
) -> jax.Array:
    """Per-graph normalized MSE, shape (G,).

    Reference math (`gnn_train.py:41-57`): for each graph and stress
    component c, ``Σ_n (gt - pred)² / Σ_n (gt - mean_n(gt))²``, then the
    mean over the 3 components.
    """
    G = batch.n_graphs
    gid = batch.node_gid
    mask = batch.node_mask.astype(prediction.dtype)[:, None]

    gt = ground_truth * mask
    pred = prediction * mask
    count = segment_sum(mask, gid, G + 1)  # (G+1, 1)
    sum_gt = segment_sum(gt, gid, G + 1)  # (G+1, 3)
    mean_gt = sum_gt / jnp.maximum(count, 1.0)

    num = segment_sum((gt - pred) ** 2 * mask, gid, G + 1)
    den = segment_sum((gt - mean_gt[gid]) ** 2 * mask, gid, G + 1)
    ratio = num / jnp.where(den == 0, 1.0, den)
    return jnp.mean(ratio, axis=-1)[:G]


def divergence_field(
    batch: GraphBatch, stress: jax.Array, zero_internal_boundary: bool = True
) -> jax.Array:
    """Nodal divergence vectors (Np, 2) of a (Np, 3) [xx, yy, xy] field.

    Matches `compute_divergence`'s operator application
    (`gnn_train.py:60-86`): the padded COO stores, per entry, the target
    node row, the source dof's node and component; component 0 of the
    divergence contracts (σxx, σxy) and component 1 contracts (σxy, σyy)
    over the x/y dofs respectively. Boundary rows are zeroed — both
    boundary types for the training penalty (`gnn_train.py:79-86`), only
    the external boundary for analysis fields
    (`compare_results.py:122-141`).
    """
    Np = stress.shape[0]
    if batch.div_src is not None:
        div = _div_ell_apply(
            stress, batch.div_src, batch.div_val, batch.div_isy,
            batch.divT_row, batch.divT_val, batch.divT_isy,
        )
    else:
        # COO fallback (edge-partitioned shards; pack_batch(div_ell=False))
        is_y = batch.div_col_is_y.astype(stress.dtype)
        src = batch.div_col_node
        v0 = jnp.where(is_y == 1, stress[src, 2], stress[src, 0])
        v1 = jnp.where(is_y == 1, stress[src, 1], stress[src, 2])
        contrib = batch.div_data[:, None] * jnp.stack([v0, v1], axis=-1)
        div = segment_sum(
            contrib, batch.div_row, Np, indices_are_sorted=False
        )

    node_type = batch.node_type[:, 0]
    if zero_internal_boundary:
        keep = (node_type == 0)[:, None]
    else:
        keep = (node_type != 1)[:, None]
    return jnp.where(keep, div, 0.0)


def per_graph_divergence(
    batch: GraphBatch,
    stress: jax.Array,
    reduce_strategy: str = "square",
) -> jax.Array:
    """Per-graph scalar divergence penalty, shape (G,).

    ``Σ_c mean_n(div_c²)`` per graph (`gnn_train.py:87-92`) — the node mean
    runs over ALL the graph's nodes (boundary rows are zeroed but still
    count in the denominator, like the reference).
    """
    div = divergence_field(batch, stress, zero_internal_boundary=True)
    if reduce_strategy == "abs":
        red = jnp.abs(div)
    elif reduce_strategy == "square":
        red = div * div
    else:
        raise AttributeError("reduce_strategy must be 'abs' or 'square'")
    G = batch.n_graphs
    mask = batch.node_mask.astype(stress.dtype)[:, None]
    per_graph = segment_sum(red * mask, batch.node_gid, G + 1)[:G]
    count = jnp.maximum(batch.graph_node_count.astype(stress.dtype), 1.0)
    return jnp.sum(per_graph, axis=-1) / count


def partitioned_batch_loss(
    batch: GraphBatch,
    prediction: jax.Array,
    ground_truth: jax.Array,
    halo: Any,
    axis_name: str,
    divergence_penalty: float = 0.0,
    optimize_divergence: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Loss under edge-partitioned execution: the SAME graphs are split
    across shards, so per-graph segment sums (counts, GT means, NMSE
    numerators/denominators, divergence partials) are psum'd over the graph
    axis before forming the per-graph ratios. Divergence-operator columns
    may reference remote nodes; the prediction is halo-exchanged once.

    Returns the replicated (identical on every shard) total loss.
    """
    G = batch.n_graphs
    gid = batch.node_gid
    mask = batch.node_mask.astype(prediction.dtype)[:, None]
    psum = lambda v: jax.lax.psum(v, axis_name)

    gt = ground_truth * mask
    pred = prediction * mask
    count = psum(segment_sum(mask, gid, G + 1))
    sum_gt = psum(segment_sum(gt, gid, G + 1))
    mean_gt = sum_gt / jnp.maximum(count, 1.0)
    num = psum(segment_sum((gt - pred) ** 2 * mask, gid, G + 1))
    den = psum(segment_sum((gt - mean_gt[gid]) ** 2 * mask, gid, G + 1))
    nmse_per_graph = jnp.mean(num / jnp.where(den == 0, 1.0, den), axis=-1)[:G]

    gmask = (count[:G, 0] > 0).astype(prediction.dtype)
    n_real = jnp.maximum(jnp.sum(gmask), 1.0)
    nmse = jnp.sum(nmse_per_graph * gmask) / n_real
    aux = {"nmse": nmse}
    total = nmse
    if optimize_divergence:
        pred_ext = halo.exchange(prediction)
        Np = prediction.shape[0]
        is_y = batch.div_col_is_y.astype(prediction.dtype)
        src = batch.div_col_node  # extended address space under partitioning
        v0 = jnp.where(is_y == 1, pred_ext[src, 2], pred_ext[src, 0])
        v1 = jnp.where(is_y == 1, pred_ext[src, 1], pred_ext[src, 2])
        contrib = batch.div_data[:, None] * jnp.stack([v0, v1], axis=-1)
        div = segment_sum(contrib, batch.div_row, Np, indices_are_sorted=False)
        keep = (batch.node_type[:, 0] == 0)[:, None]
        div = jnp.where(keep, div, 0.0)
        per_graph = psum(
            segment_sum(div * div * mask, gid, G + 1)
        )[:G]
        div_per_graph = jnp.sum(per_graph, axis=-1) / jnp.maximum(
            count[:G, 0], 1.0
        )
        div_loss = (
            jnp.sum(div_per_graph * gmask) / n_real
        ) * divergence_penalty
        aux["divergence"] = div_loss
        total = total + div_loss
    return total, aux


def batch_loss(
    batch: GraphBatch,
    prediction: jax.Array,
    ground_truth: jax.Array,
    divergence_penalty: float = 0.0,
    optimize_divergence: bool = False,
    axis_name: str | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Total batch loss = mean-over-real-graphs NMSE (+ λ·mean divergence).

    The reference sums per-graph losses and divides by the number of graphs
    in the batch (`gnn_train.py:179,193-197`). Under data-parallel sharding
    (``axis_name`` set inside shard_map) the sums and real-graph counts are
    psum'd so the sharded loss equals the unsharded whole-batch loss.
    """
    gmask = batch.graph_mask.astype(prediction.dtype)
    nmse_sum = jnp.sum(per_graph_nmse(batch, prediction, ground_truth) * gmask)
    n_real = jnp.sum(gmask)
    if axis_name is not None:
        nmse_sum = jax.lax.psum(nmse_sum, axis_name)
        n_real = jax.lax.psum(n_real, axis_name)
    n_real = jnp.maximum(n_real, 1.0)
    nmse = nmse_sum / n_real
    aux = {"nmse": nmse}
    total = nmse
    if optimize_divergence:
        div_sum = jnp.sum(per_graph_divergence(batch, prediction) * gmask)
        if axis_name is not None:
            div_sum = jax.lax.psum(div_sum, axis_name)
        div = (div_sum / n_real) * divergence_penalty
        aux["divergence"] = div
        total = total + div
    return total, aux
