"""Unit tests for ops/fused_edge.fused_edge_step against a pure-JAX
reference implementation: forward outputs and gradients w.r.t. every
differentiable input, with nonzero cotangents on all three outputs, and
with MULTIPLE 128-node tiles so the revisited-block accumulation paths
(R tiles, dA tiles, dW2/db2 single block) are exercised."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK, blockify_edges
from p_div_gnn_tpu.ops.fused_edge import NODE_TILE, fused_edge_step


def _reference(a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, rcv, gid,
               n_graphs, num_nodes):
    mask = (gid < n_graphs).astype(jnp.float32)[:, None]
    ep = e @ w_e
    z_msg = jnp.maximum(
        jnp.maximum(a_u[rcv] + g_v + ep + b0, 0.0) @ w2 + b2, 0.0
    ) * mask
    z_upd = jnp.maximum(
        jnp.maximum(a_v[rcv] + g_u + ep + b0, 0.0) @ w2 + b2, 0.0
    ) * mask
    r = jax.ops.segment_sum(z_msg, rcv, num_segments=num_nodes)
    m = jnp.stack([
        jnp.sum(z_msg, axis=0),
        jnp.sum(z_msg * z_msg, axis=0),
        jnp.sum(z_upd, axis=0),
        jnp.sum(z_upd * z_upd, axis=0),
    ] + [jnp.zeros(z_msg.shape[1])] * 4)
    return z_upd, r, m


def _random_problem(seed, n_tiles=3, L=16):
    rng = np.random.default_rng(seed)
    num_nodes = n_tiles * NODE_TILE
    # ~6 edges per node, receivers anywhere, then blockify to the CSR
    # block-aligned contract the kernel requires
    E = 6 * num_nodes
    rcv = rng.integers(0, num_nodes, size=E).astype(np.int64)
    snd = rng.integers(0, num_nodes, size=E).astype(np.int64)
    gid = np.zeros(E, np.int64)  # one real graph
    n_graphs = 1
    order = np.argsort(rcv, kind="stable")
    rcv, snd, gid = rcv[order], snd[order], gid[order]
    ew = np.ones(E, np.float32)
    snd_b, rcv_b, _, gid_b, _, block_tile = blockify_edges(
        senders=snd, receivers=rcv, edge_weight=ew, edge_gid=gid,
        num_nodes=num_nodes, n_graphs=n_graphs,
    )
    return num_nodes, n_graphs, (snd_b, rcv_b, gid_b, block_tile), rng


@pytest.mark.parametrize("n_tiles", [1, 3])
def test_fused_edge_step_forward_and_grads(n_tiles):
    L = 16
    num_nodes, n_graphs, (snd, rcv, gid, block_tile), rng = _random_problem(
        7 + n_tiles, n_tiles, L
    )

    Ep = rcv.shape[0]
    a_u = jnp.asarray(rng.normal(size=(num_nodes, L)), jnp.float32)
    a_v = jnp.asarray(rng.normal(size=(num_nodes, L)), jnp.float32)
    g_v = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    g_u = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(Ep, L)), jnp.float32)
    w_e = jnp.asarray(rng.normal(size=(L, L)) / np.sqrt(L), jnp.float32)
    b0 = jnp.asarray(rng.normal(size=(L,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(L, L)) / np.sqrt(L), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(L,)), jnp.float32)
    rcv_j = jnp.asarray(rcv)
    gid_j = jnp.asarray(gid)
    aux = (gid_j, jnp.asarray(block_tile))

    with pltpu.force_tpu_interpret_mode():
        z_upd, r, m = fused_edge_step(
            a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, rcv_j, aux, n_graphs
        )
    z_ref, r_ref, m_ref = _reference(
        a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, rcv_j, gid_j, n_graphs,
        num_nodes
    )
    np.testing.assert_allclose(np.asarray(z_upd), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m)[:4], np.asarray(m_ref)[:4],
                               rtol=1e-4, atol=1e-3)

    # gradients: nonzero cotangents on ALL outputs via a mixed scalar loss
    def loss_fused(args):
        a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2 = args
        z, r, m = fused_edge_step(
            a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, rcv_j, aux, n_graphs
        )
        return (jnp.sum(jnp.sin(z)) + jnp.sum(r * r) * 0.1
                + jnp.sum(m[:4] * jnp.arange(1.0, 5.0)[:, None]))

    def loss_ref(args):
        a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2 = args
        z, r, m = _reference(
            a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2, rcv_j, gid_j,
            n_graphs, num_nodes
        )
        return (jnp.sum(jnp.sin(z)) + jnp.sum(r * r) * 0.1
                + jnp.sum(m[:4] * jnp.arange(1.0, 5.0)[:, None]))

    args = (a_u, a_v, g_v, g_u, e, w_e, b0, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    names = ["a_u", "a_v", "g_v", "g_u", "e", "w_e", "b0", "w2", "b2"]
    for name, a, b in zip(names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_sender_gather_vjp_matches_xla():
    """ops/gather.sender_gather: the MXU-scatter backward must equal the
    plain-gather VJP (XLA generic scatter)."""
    import jax
    import jax.numpy as jnp
    from p_div_gnn_tpu.graphs.batching import build_sender_view
    from p_div_gnn_tpu.ops.gather import sender_gather

    rng = np.random.default_rng(3)
    Np, Ep, L = 256, 512, 32
    proj = jnp.asarray(rng.normal(size=(Np, L)).astype(np.float32))
    snd = jnp.asarray(rng.integers(0, Np, size=Ep).astype(np.int32))
    cot = rng.normal(size=(Ep, L)).astype(np.float32)
    perm, srt, bt = build_sender_view(np.asarray(snd), Np)

    f_new = lambda p: jnp.vdot(
        sender_gather(p, snd, jnp.asarray(perm), jnp.asarray(srt),
                      jnp.asarray(bt), Np), cot
    )
    f_ref = lambda p: jnp.vdot(p[snd], cot)
    g_new = jax.grad(f_new)(proj)
    g_ref = jax.grad(f_ref)(proj)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_model_grads_same_with_and_without_sender_view():
    """End-to-end: stripping the sender view must not change the fused
    model's gradients (only the scatter implementation differs)."""
    import jax
    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from test_model import STATS, _mesh_sample

    batch = pack_batch([_mesh_sample(0), _mesh_sample(1, nx=4)], n_graphs=2)
    stripped = batch.replace(snd_perm=None, snd_sorted=None,
                             snd_block_tile=None)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2,
                                scatter_impl="fused", remat_steps=False)
    params = model.init(jax.random.PRNGKey(0), stripped, STATS)

    def loss(p, b):
        out = model.apply(p, b, STATS, scale_output=False)
        return (out ** 2).sum()

    g_view = jax.grad(loss)(params, batch)
    g_ref = jax.grad(loss)(params, stripped)
    for a, b in zip(jax.tree.leaves(g_view), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _pair_batch(seed=0):
    from p_div_gnn_tpu.graphs import pack_batch
    from test_model import _mesh_sample

    samples = [_mesh_sample(seed), _mesh_sample(seed + 1, nx=4)]
    return (
        pack_batch(samples, n_graphs=2, pair_blocks=True),
        pack_batch(samples, n_graphs=2),
    )


def test_pair_layout_preserves_edges():
    """blockify_edges_pair must keep exactly the real (sender, receiver,
    weight) multiset and give every block single rcv AND snd tiles."""
    pair, canon = _pair_batch(3)
    from p_div_gnn_tpu.graphs.batching import EDGE_BLOCK

    for b in (pair, canon):
        real = np.asarray(b.edge_gid) < 2
        key = (np.asarray(b.senders)[real] * 10**6
               + np.asarray(b.receivers)[real])
        if b is pair:
            pair_keys = np.sort(key)
        else:
            canon_keys = np.sort(key)
    np.testing.assert_array_equal(pair_keys, canon_keys)
    rt = np.asarray(pair.receivers).reshape(-1, EDGE_BLOCK) // pair.tile
    st = np.asarray(pair.senders).reshape(-1, EDGE_BLOCK) // pair.tile
    assert (rt == rt[:, :1]).all() and (st == st[:, :1]).all()
    np.testing.assert_array_equal(rt[:, 0], np.asarray(pair.edge_block_tile))
    np.testing.assert_array_equal(
        st[:, 0], np.asarray(pair.edge_block_snd_tile)
    )
    # rcv-tile-major: R accumulator revisits stay consecutive
    bt = np.asarray(pair.edge_block_tile)
    assert (np.diff(bt) >= 0).all()


def test_fused2_forward_and_grads_match_xla():
    """fused2 (pair-blocked full fusion) ≡ the XLA path on the same
    samples — forward and all parameter gradients."""
    import jax
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from test_model import STATS

    pair, canon = _pair_batch(7)
    xla_model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    f2_model = EncodeProcessDecode(latent_size=16, message_passing_steps=2,
                                   scatter_impl="fused2", remat_steps=False)
    params = xla_model.init(jax.random.PRNGKey(0), canon, STATS)

    ref = np.asarray(xla_model.apply(params, canon, STATS,
                                     scale_output=True))
    got = np.asarray(f2_model.apply(params, pair, STATS, scale_output=True))
    real = np.asarray(canon.node_mask)
    np.testing.assert_allclose(got[real], ref[real], rtol=1e-4, atol=1e-5)

    def loss(model, p, b):
        out = model.apply(p, b, STATS, scale_output=False)
        mask = b.node_mask.astype(out.dtype)[:, None]
        return ((out * mask) ** 2).sum()

    import functools
    g_ref = jax.grad(functools.partial(loss, xla_model))(params, canon)
    g_f2 = jax.grad(functools.partial(loss, f2_model))(params, pair)
    import jax as _j
    for (pa, a), (_, b) in zip(
        _j.tree_util.tree_leaves_with_path(g_f2),
        _j.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4,
            err_msg=str(pa),
        )


def test_hybrid_impl_matches_xla():
    """scatter_impl='hybrid' (XLA fwd + sender-view VJP): forward AND
    grads identical to the pure XLA path."""
    import functools
    import jax
    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from test_model import STATS, _mesh_sample

    batch = pack_batch([_mesh_sample(11), _mesh_sample(12, nx=4)], n_graphs=2)
    xm = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    hm = EncodeProcessDecode(latent_size=16, message_passing_steps=2,
                             scatter_impl="hybrid")
    params = xm.init(jax.random.PRNGKey(0), batch, STATS)
    np.testing.assert_allclose(
        np.asarray(hm.apply(params, batch, STATS)),
        np.asarray(xm.apply(params, batch, STATS)),
        rtol=1e-6, atol=1e-6,
    )

    def loss(model, p):
        out = model.apply(p, batch, STATS, scale_output=False)
        return (out ** 2).sum()

    g_h = jax.grad(functools.partial(loss, hm))(params)
    g_x = jax.grad(functools.partial(loss, xm))(params)
    for a, b in zip(jax.tree.leaves(g_h), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
