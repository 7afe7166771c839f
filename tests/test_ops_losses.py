"""Ops/losses vs independent dense-numpy golden references (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.graphs.batching import GraphSample
from p_div_gnn_tpu.graphs.build import MeshGraph
from p_div_gnn_tpu.losses import (
    batch_loss,
    divergence_field,
    per_graph_divergence,
    per_graph_nmse,
)
from p_div_gnn_tpu.ops import masked_graph_layernorm, segment_mean, segment_sum


def _random_sample(rng, n=None) -> GraphSample:
    n = n or int(rng.integers(8, 30))
    e = int(rng.integers(2 * n, 4 * n))
    senders = rng.integers(0, n, size=e)
    receivers = rng.integers(0, n, size=e)
    pos = rng.normal(size=(n, 3))
    pos[:, 2] = 0
    graph = MeshGraph(
        pos=pos,
        edge_index=np.stack([senders, receivers]).astype(np.int64),
        edge_weight=rng.normal(size=e).astype(np.float32),
    )
    nnz = int(rng.integers(n, 6 * n))
    return GraphSample(
        graph=graph,
        mean_stress=rng.normal(size=3).astype(np.float32),
        local_stress=rng.normal(size=(n, 3)).astype(np.float32),
        node_labels=rng.choice([-1, 0, 0, 0, 1], size=n),
        div_data=rng.normal(size=nnz).astype(np.float32),
        div_row=rng.integers(0, n, size=nnz),
        div_col=rng.integers(0, 2 * n, size=nnz),
    )


def _dense_div(sample: GraphSample) -> np.ndarray:
    """Dense-matrix reference mirroring `gnn_train.py:60-92` exactly."""
    n = sample.num_nodes
    D = np.zeros((n, 2 * n), np.float64)
    for d, r, c in zip(sample.div_data, sample.div_row, sample.div_col):
        if c < 2 * n:
            D[r, c] += d
    s = sample.local_stress.astype(np.float64)
    stress_x_xy = s[:, [0, 2]].T.reshape(-1)  # [σxx_all ; σxy_all]
    stress_xy_y = s[:, [2, 1]].T.reshape(-1)
    S = np.stack([stress_x_xy, stress_xy_y], axis=1)  # (2N, 2)
    div = D @ S
    div[sample.node_labels == 1] = 0
    div[sample.node_labels == -1] = 0
    return div


def test_segment_sum_and_mean():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(20, 4)).astype(np.float32)
    ids = np.sort(rng.integers(0, 5, size=20)).astype(np.int32)
    out = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), 6))
    expect = np.zeros((6, 4), np.float32)
    np.add.at(expect, ids, data)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    m = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), 6))
    counts = np.bincount(ids, minlength=6)[:, None]
    np.testing.assert_allclose(
        m, expect / np.maximum(counts, 1), rtol=1e-5
    )


def test_masked_layernorm_matches_pyg_graph_mode():
    """Golden reference: x = x - x.mean(); x / (x.std(biased) + eps),
    per-channel affine — computed only over real rows."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(17, 8)).astype(np.float32) * 3 + 1
    mask = np.ones(17, bool)
    mask[12:] = False
    w = rng.normal(size=8).astype(np.float32)
    b = rng.normal(size=8).astype(np.float32)
    out = np.asarray(
        masked_graph_layernorm(jnp.array(x), jnp.array(mask), jnp.array(w), jnp.array(b))
    )
    xr = x[mask]
    mu = xr.mean()
    std = xr.std()  # numpy default = biased, matches unbiased=False
    expect = (xr - mu) / (std + 1e-5) * w + b
    np.testing.assert_allclose(out[mask], expect, rtol=1e-5, atol=1e-6)
    assert np.all(out[~mask] == 0)


def test_masked_layernorm_padding_invariance():
    """Adding padding rows must not change real-row outputs (SURVEY §7.10)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    w = np.ones(4, np.float32)
    b = np.zeros(4, np.float32)
    small = masked_graph_layernorm(
        jnp.array(x), jnp.ones(10, bool), jnp.array(w), jnp.array(b)
    )
    xpad = np.concatenate([x, 99 * np.ones((6, 4), np.float32)])
    mask = np.concatenate([np.ones(10, bool), np.zeros(6, bool)])
    padded = masked_graph_layernorm(
        jnp.array(xpad), jnp.array(mask), jnp.array(w), jnp.array(b)
    )
    np.testing.assert_allclose(np.asarray(padded)[:10], np.asarray(small), rtol=1e-6)


def test_divergence_matches_dense_reference():
    rng = np.random.default_rng(3)
    samples = [_random_sample(rng) for _ in range(3)]
    batch = pack_batch(samples, n_graphs=4)
    stress = jnp.array(batch.local_stress)
    div = np.asarray(divergence_field(batch, stress))
    off = 0
    for s in samples:
        expect = _dense_div(s)
        np.testing.assert_allclose(
            div[off : off + s.num_nodes], expect, rtol=1e-4, atol=1e-5
        )
        off += s.num_nodes
    # padding rows zero
    assert np.all(div[np.asarray(~batch.node_mask)] == 0)

    per_graph = np.asarray(per_graph_divergence(batch, stress))
    for g, s in enumerate(samples):
        expect_scalar = np.sum(np.mean(_dense_div(s) ** 2, axis=0))
        np.testing.assert_allclose(per_graph[g], expect_scalar, rtol=1e-4)
    assert per_graph[3] == 0


def test_divergence_ell_matches_coo_with_grads():
    """The gather-only ELL path (round-3: batching.build_div_ell +
    losses._div_ell_apply) must match the COO segment-sum path exactly —
    value AND gradient — including duplicate (row, col) entries."""
    rng = np.random.default_rng(7)
    samples = [_random_sample(rng) for _ in range(3)]
    b_ell = pack_batch(samples, n_graphs=4, div_ell=True)
    b_coo = pack_batch(samples, n_graphs=4, div_ell=False)
    assert b_ell.div_src is not None and b_coo.div_src is None
    stress = jnp.array(b_ell.local_stress) + 0.3

    def loss(batch, s):
        return jnp.sum(per_graph_divergence(batch, s))

    v_ell, g_ell = jax.value_and_grad(loss, argnums=1)(b_ell, stress)
    v_coo, g_coo = jax.value_and_grad(loss, argnums=1)(b_coo, stress)
    np.testing.assert_allclose(float(v_ell), float(v_coo), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_ell), np.asarray(g_coo), rtol=1e-5, atol=1e-6
    )


def test_nmse_matches_reference_formula():
    rng = np.random.default_rng(4)
    samples = [_random_sample(rng) for _ in range(2)]
    batch = pack_batch(samples, n_graphs=3)
    pred = jnp.array(np.asarray(batch.local_stress) * 0.9 + 0.05)
    got = np.asarray(per_graph_nmse(batch, pred, jnp.array(batch.local_stress)))
    off = 0
    for g, s in enumerate(samples):
        gt = s.local_stress.astype(np.float64)
        p = np.asarray(pred)[off : off + s.num_nodes].astype(np.float64)
        mse = ((gt - p) ** 2).sum(axis=0)
        norm = ((gt - gt.mean(axis=0)) ** 2).sum(axis=0)
        np.testing.assert_allclose(got[g], (mse / norm).mean(), rtol=1e-4)
        off += s.num_nodes


def test_batch_loss_combines_and_is_differentiable():
    rng = np.random.default_rng(5)
    samples = [_random_sample(rng) for _ in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    gt = jnp.array(batch.local_stress)

    def f(pred):
        total, aux = batch_loss(
            batch, pred, gt, divergence_penalty=10.0, optimize_divergence=True
        )
        return total

    pred = gt * 0.8
    total, aux = batch_loss(
        batch, pred, gt, divergence_penalty=10.0, optimize_divergence=True
    )
    np.testing.assert_allclose(
        float(total), float(aux["nmse"] + aux["divergence"]), rtol=1e-6
    )
    g = jax.grad(f)(pred)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient only flows into real nodes
    assert np.all(np.asarray(g)[np.asarray(~batch.node_mask)] == 0)


def test_loss_padding_graph_invariance():
    """Extra empty graph slots must not change the batch loss."""
    rng = np.random.default_rng(6)
    samples = [_random_sample(rng) for _ in range(2)]
    b2 = pack_batch(samples, n_graphs=2)
    b5 = pack_batch(samples, n_graphs=5)
    gt2, gt5 = jnp.array(b2.local_stress), jnp.array(b5.local_stress)
    t2, _ = batch_loss(b2, gt2 * 0.5, gt2, 10.0, True)
    t5, _ = batch_loss(b5, gt5 * 0.5, gt5, 10.0, True)
    np.testing.assert_allclose(float(t2), float(t5), rtol=1e-5)
