"""End-to-end training smoke test on a synthetic on-disk dataset written in
the reference's file format (vtk + npz + csv), exercising dataset loading,
bucketed batching, the jit'd train step, checkpoints and resume
(SURVEY §4: end-to-end small-batch training smoke tests)."""

import numpy as np
import pandas as pd
import pytest

import jax

from p_div_gnn_tpu.graphs import (
    MeshStressFieldDataset,
    compute_node_labels,
    write_vtk,
)
from p_div_gnn_tpu.graphs.meshio import save_sample_npz
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.train import (
    BEST_CHECKPOINT,
    LAST_CHECKPOINT,
    GraphLoader,
    Trainer,
    load_checkpoint,
)

from toy_meshes import grid_mesh_with_hole


def _write_toy_dataset(root, n_samples=6, seed=0):
    rng = np.random.default_rng(seed)
    meshes = root / "meshes"
    fields = root / "fields"
    meshes.mkdir(parents=True)
    fields.mkdir(parents=True)
    rows = []
    for i in range(n_samples):
        nx = int(rng.integers(4, 7))
        mesh = grid_mesh_with_hole(nx, nx, width=100.0, hole_cell=(1, 1))
        n = mesh.n_points
        mesh_fn = meshes / f"hole_plate_mesh_{i}.vtk"
        data_fn = fields / f"hole_plate_mesh_{i}.npz"
        write_vtk(mesh_fn, mesh)
        labels = compute_node_labels(mesh)
        mean_stress = rng.normal(size=3)
        # synthetic smooth target correlated with mean stress
        stress = mean_stress[None, :] * (
            1.0 + 0.2 * np.sin(mesh.points[:, :1] / 20.0)
        )
        nnz = 4 * n
        save_sample_npz(
            data_fn,
            stress_field=stress.astype(np.float32),
            mean_stress=mean_stress.astype(np.float32),
            mean_strain=rng.normal(size=3).astype(np.float32),
            op_div_matrix_data=(rng.normal(size=nnz) / n).astype(np.float32),
            op_div_matrix_row_indices=rng.integers(0, n, nnz),
            op_div_matrix_col_indices=rng.integers(0, 2 * n, nnz),
            op_div_matrix_shape=np.array([n, 2 * n]),
            op_mean_stress=np.zeros((3, n), np.float32),
            node_labels=labels,
        )
        rows.append(
            {
                "mesh_filename": str(mesh_fn),
                "data_filename": str(data_fn),
                "mean_stress_x": mean_stress[0],
                "mean_stress_y": mean_stress[1],
                "mean_stress_xy": mean_stress[2],
                "hole_plate_radius": 10.0,
            }
        )
    df = pd.DataFrame(rows)
    df.to_csv(root / "dataset.csv", index=False)
    return df


@pytest.mark.slow
def test_train_e2e_loss_decreases_and_checkpoints(tmp_path):
    df = _write_toy_dataset(tmp_path, n_samples=6)
    ds = MeshStressFieldDataset(df, periodic_graph=True)
    assert len(ds) == 6
    loader = GraphLoader(ds.samples, batch_size=3, shuffle=True, seed=1)
    test_loader = GraphLoader(ds.samples, batch_size=3)

    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    trainer = Trainer(
        model=model,
        stats=ds.stats,
        learning_rate=1e-3,
        divergence_penalty=0.1,
        optimize_divergence=True,
        monitor_divergence_in_test=True,
    )
    params, opt_state = trainer.init(
        jax.random.PRNGKey(0), next(iter(test_loader))
    )
    params, opt_state, train_losses, test_losses = trainer.fit(
        params,
        opt_state,
        loader,
        test_loader,
        epochs=5,
        weights_folder=tmp_path / "weights",
        verbose=False,
    )
    assert len(train_losses) == 5
    assert train_losses[-1] < train_losses[0]  # learning happens
    assert (tmp_path / "weights" / BEST_CHECKPOINT).exists()
    assert (tmp_path / "weights" / LAST_CHECKPOINT).exists()

    # load checkpoint: params + stats + optimizer round-trip
    p2, o2, epoch, stats2 = load_checkpoint(
        tmp_path / "weights" / LAST_CHECKPOINT, params, opt_state
    )
    assert epoch == 5
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert stats2.to_dict() == ds.stats.to_dict()
    # optimizer state restored (counts match)
    o2_leaves = jax.tree.leaves(o2)
    o_leaves = jax.tree.leaves(opt_state)
    assert len(o2_leaves) == len(o_leaves)
    for a, b in zip(o2_leaves, o_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_weights_folder_collision_fails_fast(tmp_path):
    # reference: mkdir(exist_ok=False) makes reruns fail fast
    # (`gnn_train.py:113`)
    df = _write_toy_dataset(tmp_path, n_samples=2)
    ds = MeshStressFieldDataset(df)
    loader = GraphLoader(ds.samples, batch_size=2)
    model = EncodeProcessDecode(latent_size=8, message_passing_steps=1)
    trainer = Trainer(model=model, stats=ds.stats, optimize_divergence=False)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), next(iter(loader)))
    (tmp_path / "w").mkdir()
    with pytest.raises(FileExistsError):
        trainer.fit(params, opt_state, loader, loader, 1, tmp_path / "w",
                    verbose=False)


def test_cache_groups_loader(tmp_path):
    """cache_groups: same batch set every epoch, order permuted, device
    resident."""
    df = _write_toy_dataset(tmp_path, n_samples=8, seed=11)
    from p_div_gnn_tpu.graphs import MeshStressFieldDataset

    ds = MeshStressFieldDataset(df)
    loader = GraphLoader(ds.samples, 2, shuffle=True, seed=3,
                         cache_groups=True)
    first = [np.asarray(b.node_gid).tobytes() + np.asarray(b.pos).tobytes()
             for b in loader]
    second = [np.asarray(b.node_gid).tobytes() + np.asarray(b.pos).tobytes()
              for b in loader]
    assert sorted(first) == sorted(second)  # same multiset of batches
    third = [np.asarray(b.pos).tobytes() for b in loader]
    assert len(third) == len(first)


def test_skip_nonfinite_updates(tmp_path):
    """Opt-in fault tolerance: a batch whose loss/grads go nonfinite must
    not poison params — the update is skipped and training continues
    (observed failure mode: one spiking step NaN'd a converged run)."""
    df = _write_toy_dataset(tmp_path, n_samples=6)
    ds = MeshStressFieldDataset(df, periodic_graph=True)
    loader = GraphLoader(ds.samples, batch_size=3)

    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    trainer = Trainer(
        model=model,
        stats=ds.stats,
        learning_rate=1e-3,
        divergence_penalty=0.0,
        optimize_divergence=False,
        skip_nonfinite_updates=True,
    )
    batches = list(loader)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), batches[0])

    poisoned = batches[0].replace(
        local_stress=np.full_like(
            np.asarray(batches[0].local_stress), np.nan
        )
    )
    params, opt_state, aux = trainer._train_step(params, opt_state, poisoned)
    assert not np.isfinite(float(aux["total"]))  # the loss itself is NaN
    # ... but the parameters were NOT updated with NaNs
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)
    )
    # and a following healthy step still learns
    p_before = jax.tree.leaves(params)[0].copy()
    params, opt_state, aux = trainer._train_step(params, opt_state, batches[1])
    assert np.isfinite(float(aux["total"]))
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params)
    )
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(params)[0]), np.asarray(p_before)
    )


@pytest.mark.slow
def test_flatten_optimizer_identical_updates():
    """Trainer(flatten_optimizer=True) — optax.flatten(adam) over one
    concatenated vector — must produce bit-compatible parameter updates
    with the per-leaf Adam (it is a glue-fusion lever, not a numerics
    change)."""
    import jax
    import numpy as np

    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.train.loop import Trainer
    from test_model import _mesh_sample, STATS

    batch = pack_batch([_mesh_sample(3, nx=4)], n_graphs=1)
    model = EncodeProcessDecode(latent_size=8, message_passing_steps=2)
    t_ref = Trainer(model=model, stats=STATS, learning_rate=1e-3,
                    divergence_penalty=10.0, optimize_divergence=True)
    t_flat = Trainer(model=model, stats=STATS, learning_rate=1e-3,
                     divergence_penalty=10.0, optimize_divergence=True,
                     flatten_optimizer=True)
    params, opt_ref = t_ref.init(jax.random.PRNGKey(0), batch)
    _, opt_flat = t_flat.init(jax.random.PRNGKey(0), batch)
    # the train steps donate their (params, opt_state) buffers — each
    # trainer needs its own device copy
    import jax.numpy as jnp

    p_ref = jax.tree.map(jnp.array, params)
    p_flat = jax.tree.map(jnp.array, params)
    for _ in range(3):
        p_ref, opt_ref, aux_r = t_ref._train_step(p_ref, opt_ref, batch)
        p_flat, opt_flat, aux_f = t_flat._train_step(p_flat, opt_flat, batch)
    np.testing.assert_allclose(
        float(aux_r["total"]), float(aux_f["total"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
