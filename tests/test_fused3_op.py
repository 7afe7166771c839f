"""Unit tests for the round-5 raw-x ops: ops/fused_edge3.fused_edge_step3
against a pure-JAX reference (forward + gradients w.r.t. every
differentiable input, nonzero cotangents on all three outputs, multiple
node tiles so every revisited-accumulator path runs), and
ops/gather.sender_gather_one's dtype-generic scatter VJP against a dense
scatter-add in both stream dtypes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import build_sender_view
from p_div_gnn_tpu.ops.fused_edge import NODE_TILE
from p_div_gnn_tpu.ops.fused_edge3 import fused_edge_step3
from p_div_gnn_tpu.ops.gather import sender_gather_one

from test_fused_op import _random_problem


def _reference3(x, g_x, e, w_u, w_v, w_e, b0, w2, b2, rcv, gid, n_graphs,
                num_nodes):
    mask = (gid < n_graphs).astype(jnp.float32)[:, None]
    ep = e @ w_e
    pre1 = x[rcv] @ w_u + g_x @ w_v + ep + b0
    pre2 = x[rcv] @ w_v + g_x @ w_u + ep + b0
    z_msg = jnp.maximum(jnp.maximum(pre1, 0.0) @ w2 + b2, 0.0) * mask
    z_upd = jnp.maximum(jnp.maximum(pre2, 0.0) @ w2 + b2, 0.0) * mask
    r = jax.ops.segment_sum(z_msg, rcv, num_segments=num_nodes)
    m = jnp.stack([
        jnp.sum(z_msg, axis=0),
        jnp.sum(z_msg * z_msg, axis=0),
        jnp.sum(z_upd, axis=0),
        jnp.sum(z_upd * z_upd, axis=0),
    ] + [jnp.zeros(z_msg.shape[1])] * 4)
    return z_upd, r, m


@pytest.mark.parametrize("n_tiles", [1, 3])
def test_fused_edge_step3_forward_and_grads(n_tiles):
    L = 16
    num_nodes, n_graphs, (snd, rcv, gid, block_tile), rng = _random_problem(
        11 + n_tiles, n_tiles, L
    )
    Ep = rcv.shape[0]
    x = jnp.asarray(rng.normal(size=(num_nodes, L)), jnp.float32)
    g_x = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) / np.sqrt(L), jnp.float32)
    w_u, w_v, w_e, w2 = mk(L, L), mk(L, L), mk(L, L), mk(L, L)
    b0 = jnp.asarray(rng.normal(size=(L,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(L,)), jnp.float32)
    rcv_j, gid_j = jnp.asarray(rcv), jnp.asarray(gid)
    aux = (gid_j, jnp.asarray(block_tile))

    with pltpu.force_tpu_interpret_mode():
        z_upd, r, m = fused_edge_step3(
            x, g_x, e, w_u, w_v, w_e, b0, w2, b2, rcv_j, aux, n_graphs
        )
    z_ref, r_ref, m_ref = _reference3(
        x, g_x, e, w_u, w_v, w_e, b0, w2, b2, rcv_j, gid_j, n_graphs,
        num_nodes
    )
    np.testing.assert_allclose(np.asarray(z_upd), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-3, atol=1e-3)

    # gradients w.r.t. every differentiable input, nonzero cotangents on
    # ALL outputs (z_upd, R, M — including the moment partials)
    cz = jnp.asarray(rng.normal(size=z_ref.shape), jnp.float32)
    cr = jnp.asarray(rng.normal(size=r_ref.shape), jnp.float32)
    cm = jnp.asarray(rng.normal(size=m_ref.shape), jnp.float32)

    def loss_kernel(args):
        with pltpu.force_tpu_interpret_mode():
            z, rr, mm = fused_edge_step3(*args, rcv_j, aux, n_graphs)
        return jnp.sum(z * cz) + jnp.sum(rr * cr) + jnp.sum(mm * cm)

    def loss_ref(args):
        z, rr, mm = _reference3(*args, rcv_j, gid_j, n_graphs, num_nodes)
        return jnp.sum(z * cz) + jnp.sum(rr * cr) + jnp.sum(mm * cm)

    args = (x, g_x, e, w_u, w_v, w_e, b0, w2, b2)
    gk = jax.grad(loss_kernel)(args)
    gr = jax.grad(loss_ref)(args)
    names = ["x", "g_x", "e", "w_u", "w_v", "w_e", "b0", "w2", "b2"]
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_sender_gather_one_vjp_matches_dense(dtype):
    """The dtype-generic single-stream scatter VJP (fwd: plain row
    gather; bwd: permute into the sender-major view + block-CSR one-hot
    scatter) must reproduce the dense scatter-add in both stream
    dtypes."""
    rng = np.random.default_rng(3)
    num_nodes = 2 * NODE_TILE
    E = 5 * num_nodes
    snd = rng.integers(0, num_nodes, size=E).astype(np.int64)
    sp, ss, sbt = build_sender_view(snd, num_nodes)
    x = jnp.asarray(rng.normal(size=(num_nodes, 8)), jnp.float32).astype(
        dtype
    )
    ct = jnp.asarray(rng.normal(size=(E, 8)), jnp.float32).astype(dtype)
    snd_j = jnp.asarray(snd)

    def f(xx):
        with pltpu.force_tpu_interpret_mode():
            out = sender_gather_one(
                xx, snd_j, jnp.asarray(sp), jnp.asarray(ss),
                jnp.asarray(sbt), num_nodes,
            )
        return jnp.sum(out.astype(jnp.float32)
                       * ct.astype(jnp.float32))

    g = jax.grad(f)(x)
    ref = jax.ops.segment_sum(
        ct.astype(jnp.float32), snd_j, num_segments=num_nodes
    )
    tol = 1e-4 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(ref.astype(dtype), np.float32),
        rtol=tol, atol=tol,
    )
