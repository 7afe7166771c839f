"""Model parity vs the independent numpy golden implementation (SURVEY §4:
golden-value tests for Processor/EncodeProcessDecode on handcrafted graphs)."""

import numpy as np
import jax
import jax.numpy as jnp

from p_div_gnn_tpu.graphs import NormStats, compute_periodic_graph, mesh_to_graph, pack_batch
from p_div_gnn_tpu.graphs.batching import GraphSample
from p_div_gnn_tpu.models import EncodeProcessDecode

from numpy_golden import extract_golden_weights, golden_forward
from toy_meshes import grid_mesh_with_hole
from p_div_gnn_tpu.graphs.labels import compute_node_labels


def _mesh_sample(seed: int, nx: int = 5) -> GraphSample:
    rng = np.random.default_rng(seed)
    mesh = grid_mesh_with_hole(nx, nx, width=100.0, hole_cell=(1, 1))
    g = compute_periodic_graph(mesh_to_graph(mesh))
    n = g.num_nodes
    return GraphSample(
        graph=g,
        mean_stress=rng.normal(size=3).astype(np.float32),
        local_stress=rng.normal(size=(n, 3)).astype(np.float32),
        node_labels=compute_node_labels(mesh),
        div_data=np.ones(1, np.float32),
        div_row=np.zeros(1, np.int64),
        div_col=np.zeros(1, np.int64),
    )


STATS = NormStats(
    mean_pos=jnp.float32(50.0),
    std_pos=jnp.float32(30.0),
    mean_mean_stress=jnp.float32(0.1),
    std_mean_stress=jnp.float32(2.0),
    mean_local_stress=jnp.float32(0.05),
    std_local_stress=jnp.float32(1.5),
    mean_edge_weight=jnp.float32(20.0),
    std_edge_weight=jnp.float32(8.0),
)


def _run_both(samples, steps=4, scale_output=True):
    batch = pack_batch(samples, n_graphs=len(samples) + 1)
    model = EncodeProcessDecode(latent_size=32, message_passing_steps=steps)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    out = np.asarray(
        model.apply(batch, STATS, scale_output=scale_output, method=model.__call__)
        if False
        else model.apply(params, batch, STATS, scale_output=scale_output)
    )

    weights = extract_golden_weights(params)
    stats_np = {k: float(getattr(STATS, k)) for k in STATS.__dataclass_fields__}
    # build concatenated unpadded arrays
    pos = np.concatenate([s.graph.pos[:, :2] for s in samples])
    ms = np.concatenate(
        [np.broadcast_to(s.mean_stress, (s.num_nodes, 3)) for s in samples]
    )
    nt = np.concatenate(
        [s.node_labels[:, None].astype(np.float64) for s in samples]
    )
    offs = np.cumsum([0] + [s.num_nodes for s in samples])
    snd = np.concatenate(
        [s.graph.edge_index[0] + o for s, o in zip(samples, offs)]
    )
    rcv = np.concatenate(
        [s.graph.edge_index[1] + o for s, o in zip(samples, offs)]
    )
    ew = np.concatenate([s.graph.edge_weight for s in samples])
    golden = golden_forward(
        weights, pos, ms, nt, snd, rcv, ew, stats_np, steps=steps,
        scale_output=scale_output,
    )
    real = np.asarray(batch.node_mask)
    return out[real], golden, batch, out


def test_forward_matches_golden_single_graph():
    out, golden, _, _ = _run_both([_mesh_sample(0)], steps=4)
    np.testing.assert_allclose(out, golden, rtol=2e-3, atol=2e-4)


def test_forward_matches_golden_multi_graph_batch():
    # Graph-mode LN couples graphs across the batch; both implementations
    # must agree jointly (SURVEY §7.3).
    out, golden, _, _ = _run_both(
        [_mesh_sample(1, nx=4), _mesh_sample(2, nx=5)], steps=3
    )
    np.testing.assert_allclose(out, golden, rtol=2e-3, atol=2e-4)


def test_padding_invariance():
    s = _mesh_sample(3)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    b1 = pack_batch([s], n_graphs=1)
    b2 = pack_batch([s], n_graphs=3, pad_nodes=b1.num_nodes_padded + 256,
                    pad_edges=b1.num_edges_padded + 1024)
    params = model.init(jax.random.PRNGKey(1), b1, STATS)
    o1 = np.asarray(model.apply(params, b1, STATS))
    o2 = np.asarray(model.apply(params, b2, STATS))
    n = s.num_nodes
    np.testing.assert_allclose(o1[:n], o2[:n], rtol=1e-4, atol=1e-5)


def test_zero_mean_stress_early_exit():
    s = _mesh_sample(4)
    s.mean_stress = np.zeros(3, np.float32)
    batch = pack_batch([s], n_graphs=1)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = model.init(jax.random.PRNGKey(2), batch, STATS)
    out = np.asarray(model.apply(params, batch, STATS))
    assert np.all(out == 0)


def test_param_count_flagship_config():
    # Reference flagship: L=128, in 6, edge-in 1, out 3 → ≈1.7e5 params
    # (SURVEY §7.2).
    s = _mesh_sample(5)
    batch = pack_batch([s], n_graphs=1)
    model = EncodeProcessDecode(latent_size=128, message_passing_steps=1)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # torch reference: encoders (6·128+128 + 128·128+128 + 2·128)
    #   + (1·128+128 + 128·128+128 + 2·128)
    #   + processor edge (384·128+128 + 128·128+128 + 2·128)
    #   + processor node (256·128+128 + 128·128+128 + 2·128)
    #   + decoder (128·128+128 + 128·3+3)
    expect = (
        (6 * 128 + 128) + (128 * 128 + 128) + 2 * 128
        + (1 * 128 + 128) + (128 * 128 + 128) + 2 * 128
        + (384 * 128 + 128) + (128 * 128 + 128) + 2 * 128
        + (256 * 128 + 128) + (128 * 128 + 128) + 2 * 128
        + (128 * 128 + 128) + (128 * 3 + 3)
    )
    assert n_params == expect


def test_grad_flows_and_finite():
    s = _mesh_sample(6)
    batch = pack_batch([s], n_graphs=1)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = model.init(jax.random.PRNGKey(3), batch, STATS)

    def loss(p):
        out = model.apply(p, batch, STATS, scale_output=False)
        return jnp.sum(out**2 * batch.node_mask[:, None])

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
