"""Data-parallel correctness on the virtual 8-device CPU mesh: the sharded
train step must match the unsharded whole-batch step numerically
(SURVEY §4: multi-device tests via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import optax
import pytest
from jax.sharding import Mesh

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.parallel.dp import (
    device_put_sharded_batch,
    make_dp_eval_step,
    make_dp_train_step,
    pack_sharded_batch,
)
from p_div_gnn_tpu.losses import batch_loss

from test_model import _mesh_sample, STATS


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()
    assert len(devs) >= 4, "conftest must provide >=4 virtual devices"
    return Mesh(np.array(devs[:4]), ("data",))


@pytest.mark.slow
def test_dp_train_step_matches_single_device(mesh4):
    samples = [_mesh_sample(i, nx=4 + (i % 3)) for i in range(8)]
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)

    # single-device reference step
    ref_batch = pack_batch(samples, n_graphs=8)
    params = model.init(jax.random.PRNGKey(0), ref_batch, STATS)
    opt_state = optimizer.init(params)

    def ref_loss(p):
        pred = model.apply(p, ref_batch, STATS, scale_output=False)
        gt = (
            ref_batch.local_stress - STATS.mean_local_stress
        ) / STATS.std_local_stress
        return batch_loss(ref_batch, pred, gt, 10.0, True)

    (ref_total, ref_aux), ref_grads = jax.value_and_grad(
        ref_loss, has_aux=True
    )(params)
    updates, _ = optimizer.update(ref_grads, opt_state, params)
    ref_new_params = optax.apply_updates(params, updates)

    # sharded step
    sharded_batch = pack_sharded_batch(samples, n_shards=4, graphs_per_shard=2)
    sharded_batch = device_put_sharded_batch(sharded_batch, mesh4)
    step = make_dp_train_step(
        model, STATS, optimizer, mesh4,
        divergence_penalty=10.0, optimize_divergence=True,
    )

    # raw-gradient equality (Adam's first-step scale invariance would mask
    # a psum/pmean scaling bug if only updated params were compared)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from p_div_gnn_tpu.losses import batch_loss as bl

    def shard_grads(params, batch):
        def per_shard(p, b):
            b = jax.tree.map(lambda x: x[0], b)

            def lf(p):
                pred = model.apply(
                    p, b, STATS, scale_output=False, axis_name="data"
                )
                gt = (
                    b.local_stress - STATS.mean_local_stress
                ) / STATS.std_local_stress
                total, _ = bl(b, pred, gt, 10.0, True, axis_name="data")
                return total

            # shard_map AD transposes the loss's psums by psum-ing
            # cotangents, which scales the summed per-shard partials by D;
            # pmean restores the true global gradient (verified exactly
            # here — this pins the collective-normalization contract).
            return jax.lax.pmean(jax.grad(lf)(p), "data")

        return shard_map(
            per_shard, mesh=mesh4, in_specs=(P(), P("data")),
            out_specs=P(), check_vma=False,
        )(params, batch)

    dp_grads = shard_grads(params, sharded_batch)
    for a, b in zip(jax.tree.leaves(dp_grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )

    new_params, new_opt, aux = step(params, opt_state, sharded_batch)

    np.testing.assert_allclose(
        float(aux["total"]), float(ref_total), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(aux["nmse"]), float(ref_aux["nmse"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_new_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
        )


def test_dp_eval_unpacks_per_shard(mesh4):
    samples = [_mesh_sample(10 + i) for i in range(4)]
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=1)
    sharded = pack_sharded_batch(samples, n_shards=4, graphs_per_shard=1)
    sharded = device_put_sharded_batch(sharded, mesh4)
    init_batch = jax.tree.map(
        lambda x: np.asarray(x)[0] if hasattr(x, "shape") and x.ndim else x,
        sharded,
    )
    params = model.init(jax.random.PRNGKey(1), init_batch, STATS)
    ev = make_dp_eval_step(model, STATS, mesh4)
    pred = np.asarray(ev(params, sharded))
    assert pred.shape == (4, init_batch.pos.shape[0], 3)
    assert np.all(np.isfinite(pred))


def _toy_ds(tmp_path, n=4, seed=7):
    from p_div_gnn_tpu.graphs import MeshStressFieldDataset
    from test_train_e2e import _write_toy_dataset

    return MeshStressFieldDataset(_write_toy_dataset(tmp_path, n_samples=n, seed=seed))


@pytest.mark.slow
def test_unified_trainer_dp_matches_single_chip(mesh4, tmp_path):
    """Trainer(mesh=...) .fit ≡ Trainer() .fit — the unified loop gives the
    same trajectory sharded and unsharded (whole-batch DP semantics)."""
    from p_div_gnn_tpu.parallel.dp import DPGraphLoader
    from p_div_gnn_tpu.train import GraphLoader, Trainer

    ds = _toy_ds(tmp_path)
    model = EncodeProcessDecode(latent_size=8, message_passing_steps=1)

    def run(mesh, loader_cls, wf):
        tr = Trainer(
            model=model, stats=ds.stats, optimize_divergence=True,
            divergence_penalty=10.0, monitor_divergence_in_test=True,
            mesh=mesh,
        )
        if mesh is None:
            mk = lambda: GraphLoader(ds.samples, 4, shuffle=False)
        else:
            mk = lambda: DPGraphLoader(ds.samples, 4, mesh, shuffle=False)
        params, opt = tr.init(jax.random.PRNGKey(0), next(iter(mk())))
        return tr.fit(
            params, opt, mk(), mk(), epochs=2, weights_folder=wf,
            verbose=False,
        )

    p_ref, _, tr_ref, te_ref = run(None, None, tmp_path / "single")
    p_dp, _, tr_dp, te_dp = run(mesh4, None, tmp_path / "dp")
    np.testing.assert_allclose(tr_ref, tr_dp, rtol=2e-3)
    np.testing.assert_allclose(te_ref, te_dp, rtol=2e-3)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
        )


@pytest.mark.slow
def test_dp_resume_continues_trajectory(mesh4, tmp_path):
    """DP fit 2 epochs + resume 2 more ≡ DP fit 4 epochs straight
    (VERDICT round-1 weak #2: the DP loop must be as recoverable as the
    single-chip one)."""
    from p_div_gnn_tpu.parallel.dp import DPGraphLoader
    from p_div_gnn_tpu.train import Trainer, load_checkpoint
    from p_div_gnn_tpu.train.checkpoint import LAST_CHECKPOINT

    ds = _toy_ds(tmp_path)
    model = EncodeProcessDecode(latent_size=8, message_passing_steps=1)
    mk_loader = lambda s: DPGraphLoader(ds.samples, 4, mesh4, shuffle=True, seed=s)

    def make_trainer():
        return Trainer(
            model=model, stats=ds.stats, optimize_divergence=False,
            monitor_divergence_in_test=False, mesh=mesh4,
        )

    tr = make_trainer()
    params, opt = tr.init(jax.random.PRNGKey(0), next(iter(mk_loader(0))))
    pa, _, _, _ = tr.fit(
        params, opt, mk_loader(1), mk_loader(2), epochs=4,
        weights_folder=tmp_path / "a", verbose=False,
    )

    tr = make_trainer()
    params, opt = tr.init(jax.random.PRNGKey(0), next(iter(mk_loader(0))))
    pb, ob, _, _ = tr.fit(
        params, opt, mk_loader(1), mk_loader(2), epochs=2,
        weights_folder=tmp_path / "b", verbose=False,
    )
    p2, o2, epoch, stats = load_checkpoint(
        tmp_path / "b" / LAST_CHECKPOINT, pb, ob
    )
    assert epoch == 2
    lt, le = mk_loader(1), mk_loader(2)
    for _ in range(2):
        for _b in lt:
            pass
        for _b in le:
            pass
    tr2 = make_trainer()
    tr2.stats = stats
    pb2, _, _, _ = tr2.fit(
        p2, o2, lt, le, epochs=4, weights_folder=tmp_path / "b",
        verbose=False, start_epoch=2,
    )
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6,
                                   atol=1e-7)
