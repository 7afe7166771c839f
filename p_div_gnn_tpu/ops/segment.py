"""Segment reductions and gathers — the XLA reference path for the GNN's
scatter/gather ops.

The reference aggregates messages with PyG's CUDA scatter-add
(`/root/reference/gnn_local_stress/models.py:191,215-217`). The TPU-native
counterpart is a segment-sum over receiver-sorted (CSR-ordered) edges: the
batcher guarantees sorted receivers, so we pass ``indices_are_sorted=True``
and XLA lowers to an efficient sorted-scatter. A Pallas kernel
(ops/scatter_pallas.py) provides the tuned MXU one-hot-matmul path for the
same contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Mean per segment with empty segments → 0."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    if total.ndim > 1:
        count = count.reshape((-1,) + (1,) * (total.ndim - 1))
    return total / count


def gather_nodes(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] — per-edge gather of node features (XLA gather)."""
    return jnp.take(x, idx, axis=0)
