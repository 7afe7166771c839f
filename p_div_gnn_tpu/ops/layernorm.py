"""Mask-aware graph-mode LayerNorm.

The reference uses ``torch_geometric.nn.LayerNorm`` inside
``torch.nn.Sequential`` (`/root/reference/gnn_local_stress/models.py:27-30,
199,207,265,273`), so the layer always receives ``batch=None`` and its
graph-mode path normalizes with the mean and (biased) std computed over the
ENTIRE node/edge tensor of the whole batch jointly — all rows AND all
channels at once (PyG graph mode with batch=None:
``x = x - x.mean(); out = x / (x.std(unbiased=False) + eps)``), followed by
a per-channel affine. This makes the op batch-composition dependent
(SURVEY.md §7.3), so under padding the statistics must only see real rows,
and under data-parallel sharding they must be reduced across the batch axis
(``axis_name``) to stay bit-equivalent to the single-device batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_graph_layernorm(
    x: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    axis_name: str | None = None,
) -> jax.Array:
    """Normalize x (R, C) by masked whole-tensor mean/std, then affine.

    Args:
      x: (R, C) features (rows = nodes or edges, padded).
      mask: (R,) bool/float — 1 for real rows.
      weight, bias: (C,) per-channel affine (PyG default affine=True).
      axis_name: if inside shard_map/pmap, psum statistics over this axis so
        sharded batches match the unsharded computation.
    """
    m = mask.astype(x.dtype)[:, None]
    count = jnp.sum(m) * x.shape[-1]
    total = jnp.sum(x * m)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        total = jax.lax.psum(total, axis_name)
    mean = total / jnp.maximum(count, 1.0)
    centered = (x - mean) * m
    sq = jnp.sum(centered * centered)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
    # torch .std(unbiased=False) == sqrt(E[(x-mean)^2]); eps added to STD,
    # not the variance — a PyG quirk reproduced deliberately.
    std = jnp.sqrt(sq / jnp.maximum(count, 1.0))
    out = (x - mean) / (std + eps)
    out = out * weight + bias
    return out * m
