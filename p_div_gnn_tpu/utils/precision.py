"""Matmul precision policy.

The reference trains in effective fp32 (CUDA autocast pinned to
``dtype=torch.float32``, `/root/reference/scripts/gnn_train.py:111,158`).
JAX's *default* matmul precision on TPU (and the jax-0.9 CPU emulation of
it) is bf16-class, which breaks activation parity (~5e-2 abs error per
matmul). The framework therefore passes an explicit precision to every
matmul: ``highest`` (fp32, default — parity mode) or ``default``
(bf16-class MXU passes — speed mode, opt-in via PDG_MATMUL_PRECISION).
"""

from __future__ import annotations

import os

import jax


def matmul_precision() -> jax.lax.Precision:
    name = os.environ.get("PDG_MATMUL_PRECISION", "highest").lower()
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "float32": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
        "bfloat16": jax.lax.Precision.DEFAULT,
    }[name]
