"""Edge-partitioned execution correctness on the virtual CPU mesh: the
halo-exchanged forward and full train step must reproduce the single-device
computation (SURVEY §8.7 — hard part 3: halo correctness incl. periodic cut
edges)."""

import numpy as np
import jax
import optax
import pytest
from jax.sharding import Mesh

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.losses import batch_loss
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.parallel.partition import (
    device_put_partitioned,
    make_partitioned_forward,
    make_partitioned_train_step,
    partition_batch,
)

from test_model import _mesh_sample, STATS


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()
    assert len(devs) >= 4
    return Mesh(np.array(devs[:4]), ("graph",))


def _reassemble(local_pred: np.ndarray, batch, n_shards: int) -> np.ndarray:
    """Stitch (D, Nl, C) local predictions back to the global node order."""
    Np = batch.num_nodes_padded
    per = local_pred.shape[1]
    out = np.zeros((Np, local_pred.shape[-1]), np.float32)
    from p_div_gnn_tpu.graphs.batching import NODE_TILE

    tile_per = (
        ((Np + n_shards - 1) // n_shards + NODE_TILE - 1)
        // NODE_TILE * NODE_TILE
    )
    for d in range(n_shards):
        lo = d * tile_per
        hi = min(lo + tile_per, Np)
        if hi > lo:
            out[lo:hi] = local_pred[d, : hi - lo]
    return out


@pytest.mark.parametrize("halo_mode", ["a2a", "all_gather"])
def test_partitioned_forward_matches_single_device(mesh4, halo_mode):
    # periodic mesh graphs: periodic edges are remote cut edges by design
    samples = [_mesh_sample(i, nx=5) for i in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=3)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    ref = np.asarray(model.apply(params, batch, STATS, scale_output=True))

    stacked, send_idx = partition_batch(batch, n_shards=4, halo_mode=halo_mode)
    stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh4)
    fwd = make_partitioned_forward(model, STATS, mesh4, scale_output=True)
    local = np.asarray(fwd(params, stacked, send_idx))
    got = _reassemble(local, batch, 4)
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[real], ref[real], rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("halo_mode", ["a2a", "all_gather"])
def test_partitioned_train_step_matches_single_device(mesh4, halo_mode):
    samples = [_mesh_sample(10 + i, nx=5) for i in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(1), batch, STATS)
    opt_state = optimizer.init(params)

    def ref_loss(p):
        pred = model.apply(p, batch, STATS, scale_output=False)
        gt = (
            batch.local_stress - STATS.mean_local_stress
        ) / STATS.std_local_stress
        return batch_loss(batch, pred, gt, 10.0, True)

    (ref_total, ref_aux), ref_grads = jax.value_and_grad(
        ref_loss, has_aux=True
    )(params)

    # reference update BEFORE the donating sharded step consumes buffers
    updates, _ = optimizer.update(ref_grads, opt_state, params)
    ref_new = optax.apply_updates(params, updates)

    stacked, send_idx = partition_batch(batch, n_shards=4, halo_mode=halo_mode)
    stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh4)
    step = make_partitioned_train_step(
        model, STATS, optimizer, mesh4,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    new_params, new_opt, aux = step(params, opt_state, stacked, send_idx)
    np.testing.assert_allclose(float(aux["total"]), float(ref_total), rtol=5e-4)
    np.testing.assert_allclose(
        float(aux["nmse"]), float(ref_aux["nmse"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(aux["divergence"]), float(ref_aux["divergence"]), rtol=5e-3
    )
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_new)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )


def test_partitioned_forward_matches_at_scale(mesh4):
    """≥10^4-node single graph (VERDICT round-1 weak #4: partitioning was
    only exercised on toy graphs): a real graded plate-with-hole mesh,
    partitioned 4 ways with the per-peer a2a halo, must reproduce the
    single-device forward."""
    from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh
    from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix
    from p_div_gnn_tpu.graphs import compute_periodic_graph, mesh_to_graph
    from p_div_gnn_tpu.graphs.batching import GraphSample
    from p_div_gnn_tpu.graphs.labels import compute_node_labels

    mesh = hole_plate_mesh(
        100.0, 100.0, radius=20.0, hole_center=(50.0, 50.0),
        hole_refinement_factor=3.0, global_mesh_refinement_size=0.92,
        seed=3,
    )
    g = compute_periodic_graph(mesh_to_graph(mesh))
    assert g.num_nodes >= 10_000, g.num_nodes
    op = compute_op_div_matrix(mesh.points[:, :2], mesh.faces)
    rng = np.random.default_rng(0)
    sample = GraphSample(
        graph=g,
        mean_stress=rng.normal(size=3).astype(np.float32),
        local_stress=rng.normal(size=(g.num_nodes, 3)).astype(np.float32),
        node_labels=compute_node_labels(mesh),
        div_data=op.data.astype(np.float32),
        div_row=op.row.astype(np.int64),
        div_col=op.col.astype(np.int64),
    )
    batch = pack_batch([sample], n_graphs=1)
    model = EncodeProcessDecode(latent_size=8, message_passing_steps=2)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    ref = np.asarray(model.apply(params, batch, STATS, scale_output=True))

    stacked, send_idx = partition_batch(batch, n_shards=4, halo_mode="a2a")
    # sanity on the plan itself: low capacity blow-up, pair ≪ union halo
    assert stacked.senders.shape[-1] * 4 <= 1.25 * batch.num_edges_padded
    stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh4)
    fwd = make_partitioned_forward(model, STATS, mesh4, scale_output=True)
    local = np.asarray(fwd(params, stacked, send_idx))
    got = _reassemble(local, batch, 4)
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[real], ref[real], rtol=1e-3, atol=1e-4)
