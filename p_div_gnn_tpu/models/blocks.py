"""Building blocks: torch-compatible Dense init and graph-mode LayerNorm
as a flax module.

Initialization mirrors torch.nn.Linear defaults (kaiming_uniform with
a=sqrt(5) → U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so
training dynamics match the reference (`models.py:194-286` builds plain
torch Linears).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from p_div_gnn_tpu.ops.layernorm import masked_graph_layernorm
from p_div_gnn_tpu.utils.precision import matmul_precision


def torch_linear_kernel_init(key: jax.Array, shape: tuple, dtype: Any=jnp.float32) -> jax.Array:
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear-compatible default init."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        bound = 1.0 / jnp.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        return jnp.dot(x, kernel, precision=matmul_precision()) + bias


class DenseParams(nn.Module):
    """Parameter-only Dense declaration (same tree layout as TorchDense:
    <name>/{kernel,bias}); lets kernels consume the raw arrays while the
    unfused path computes the dot itself."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (self.in_features, self.features)
        )
        bound = 1.0 / jnp.sqrt(self.in_features)
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,),
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    """Parameter-only graph-LN declaration (<name>/{weight,bias})."""

    features: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return weight, bias


class GraphLayerNorm(nn.Module):
    """PyG graph-mode LayerNorm (whole-tensor stats), mask-aware.

    See ops/layernorm.py for the exact semantics being reproduced
    (`/root/reference/gnn_local_stress/models.py:27-30`)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        axis_name: str | None = None,
    ) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return masked_graph_layernorm(
            x, mask, weight, bias, eps=self.eps, axis_name=axis_name
        )


class MLPBlock(nn.Module):
    """Linear→ReLU→Linear→ReLU(→graph-LN) — the reference's Sequential
    blocks (`models.py:194-208,260-274`)."""

    latent_size: int
    out_size: int | None = None
    layer_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        axis_name: str | None = None,
    ) -> jax.Array:
        h = nn.relu(TorchDense(self.latent_size, name="lin0")(x))
        out = TorchDense(self.out_size or self.latent_size, name="lin1")(h)
        if self.layer_norm:
            out = nn.relu(out)
            assert mask is not None, "graph-LN needs a row mask"
            out = GraphLayerNorm(self.out_size or self.latent_size, name="ln")(
                out, mask, axis_name
            )
        return out
