"""Fused edge-pipeline path vs the XLA reference path (interpret mode on
CPU): forward parity and gradient parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.models import EncodeProcessDecode

from test_model import STATS, _mesh_sample


def _outputs(impl, params, batch, steps):
    model = EncodeProcessDecode(
        latent_size=16, message_passing_steps=steps, scatter_impl=impl, remat_steps=False
    )
    with pltpu.force_tpu_interpret_mode():
        out = model.apply(params, batch, STATS, scale_output=False)
    return np.asarray(out)


@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_forward_matches_xla(impl):
    samples = [_mesh_sample(0, nx=4), _mesh_sample(1, nx=5)]
    batch = pack_batch(samples, n_graphs=2)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    ref = _outputs("xla", params, batch, 2)
    fused = _outputs(impl, params, batch, 2)
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(fused[real], ref[real], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_gradients_match_xla(impl):
    samples = [_mesh_sample(2, nx=4)]
    batch = pack_batch(samples, n_graphs=1)
    base = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = base.init(jax.random.PRNGKey(1), batch, STATS)

    def loss(impl, p):
        model = EncodeProcessDecode(
            latent_size=16, message_passing_steps=2, scatter_impl=impl, remat_steps=False
        )
        out = model.apply(p, batch, STATS, scale_output=False)
        return jnp.sum((out * batch.node_mask[:, None]) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_ref = jax.grad(lambda p: loss("xla", p))(params)
        g_fused = jax.grad(lambda p: loss(impl, p))(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )


@pytest.mark.slow
@pytest.mark.parametrize("fused_impl", ["fused", "fused3"])
def test_fused_dp_grads_match_xla_dp(fused_impl):
    """Fused path under data-parallel sharding: the psum'd lazy-LN moments
    must reproduce the XLA path's whole-batch graph-LN statistics."""
    import optax
    from jax.sharding import Mesh

    from p_div_gnn_tpu.parallel.dp import (
        device_put_sharded_batch,
        make_dp_train_step,
        pack_sharded_batch,
    )

    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.array(devs[:4]), ("data",))
    samples = [_mesh_sample(i, nx=4 + (i % 2)) for i in range(4)]
    optimizer = optax.adam(1e-3)
    sharded = pack_sharded_batch(samples, n_shards=4, graphs_per_shard=1)
    sharded = device_put_sharded_batch(sharded, mesh)
    init_local = jax.tree.map(
        lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x, sharded
    )

    outs = {}
    for impl in ("xla", fused_impl):
        model = EncodeProcessDecode(
            latent_size=16, message_passing_steps=2, scatter_impl=impl,
            remat_steps=False,
        )
        params = model.init(jax.random.PRNGKey(3), init_local, STATS)
        opt_state = optimizer.init(params)
        step = make_dp_train_step(
            model, STATS, optimizer, mesh,
            divergence_penalty=10.0, optimize_divergence=True,
        )
        with pltpu.force_tpu_interpret_mode():
            new_params, _, aux = step(params, opt_state, sharded)
        outs[impl] = (new_params, float(aux["total"]))

    np.testing.assert_allclose(outs[fused_impl][1], outs["xla"][1],
                               rtol=2e-4)
    for a, b in zip(
        jax.tree.leaves(outs[fused_impl][0]), jax.tree.leaves(outs["xla"][0])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5
        )


@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_partitioned_forward_matches_single_device(impl):
    """Fused path under edge-partitioned halo execution (fused3: raw-x
    ghosts ride the collective and the sender view covers the extended
    address space)."""
    from jax.sharding import Mesh

    from p_div_gnn_tpu.parallel.partition import (
        device_put_partitioned,
        make_partitioned_forward,
        partition_batch,
    )
    from test_partition import _reassemble

    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.array(devs[:4]), ("graph",))
    samples = [_mesh_sample(i, nx=5) for i in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    model = EncodeProcessDecode(
        latent_size=16, message_passing_steps=3, scatter_impl=impl,
        remat_steps=False,
    )
    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(0), batch, STATS)
        ref = np.asarray(model.apply(params, batch, STATS, scale_output=True))

        stacked, send_idx = partition_batch(batch, n_shards=4)
        stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh)
        fwd = make_partitioned_forward(model, STATS, mesh, scale_output=True)
        local = np.asarray(fwd(params, stacked, send_idx))
    got = _reassemble(local, batch, 4)
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(got[real], ref[real], rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_padding_invariance(impl):
    from p_div_gnn_tpu.graphs import pack_batch as _pack

    s = _mesh_sample(5, nx=4)
    model = EncodeProcessDecode(
        latent_size=16, message_passing_steps=2, scatter_impl=impl,
        remat_steps=False,
    )
    b1 = _pack([s], n_graphs=1)
    b2 = _pack([s], n_graphs=2, pad_nodes=b1.num_nodes_padded + 256)
    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(4), b1, STATS)
        o1 = np.asarray(model.apply(params, b1, STATS))
        o2 = np.asarray(model.apply(params, b2, STATS))
    n = s.num_nodes
    np.testing.assert_allclose(o1[:n], o2[:n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_bf16_stream_mode_close_to_fp32(impl):
    """Speed mode: bf16 streams, fp32 accumulation — outputs and gradients
    stay within bf16-scale tolerance of the fp32 fused path."""
    samples = [_mesh_sample(7, nx=5)]
    batch = pack_batch(samples, n_graphs=1)
    base = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = base.init(jax.random.PRNGKey(5), batch, STATS)

    def run(dtype):
        model = EncodeProcessDecode(
            latent_size=16, message_passing_steps=2, scatter_impl=impl,
            stream_dtype=dtype, remat_steps=False,
        )

        def loss(p):
            out = model.apply(p, batch, STATS, scale_output=False)
            return jnp.sum((out * batch.node_mask[:, None]) ** 2), out

        with pltpu.force_tpu_interpret_mode():
            (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        return l, out, g

    l32, o32, g32 = run("float32")
    l16, o16, g16 = run("bfloat16")
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(
        np.asarray(o16)[real], np.asarray(o32)[real], rtol=0.1, atol=0.05
    )
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.1)
    # gradient direction must agree (cosine similarity)
    v16 = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g16)])
    v32 = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g32)])
    cos = float(v16 @ v32 / (np.linalg.norm(v16) * np.linalg.norm(v32) + 1e-12))
    assert cos > 0.99, cos


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["fused", "fused3"])
def test_fused_partitioned_train_step_matches_single_device(impl):
    """Fused TRAIN STEP under a halo ≡ fused single-shard train step
    (VERDICT r3 weak #6 / item 5): the partitioned planner now builds the
    sender-major view over the extended [local ++ ghost] address space, so
    the merged sender-gather VJP (MXU one-hot scatter) runs in the
    partitioned backward too — this pins its numerics against the
    single-device fused step, gradients included."""
    import optax
    from jax.sharding import Mesh

    from p_div_gnn_tpu.losses import batch_loss
    from p_div_gnn_tpu.parallel.partition import (
        device_put_partitioned,
        make_partitioned_train_step,
        partition_batch,
    )

    devs = jax.devices()
    assert len(devs) >= 4
    mesh = Mesh(np.array(devs[:4]), ("graph",))
    samples = [_mesh_sample(20 + i, nx=5) for i in range(2)]
    batch = pack_batch(samples, n_graphs=2)
    model = EncodeProcessDecode(
        latent_size=16, message_passing_steps=2, scatter_impl=impl,
        remat_steps=False,
    )
    optimizer = optax.adam(1e-3)
    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(2), batch, STATS)
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
        updates, _ = optimizer.update(ref_grads, opt_state, params)
        ref_new = optax.apply_updates(params, updates)

        stacked, send_idx = partition_batch(batch, n_shards=4)
        # the planner must have put the fused path's sender view on every
        # shard (no silent fallback to XLA generic scatter)
        assert stacked.snd_perm is not None
        stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh)
        step = make_partitioned_train_step(
            model, STATS, optimizer, mesh,
            divergence_penalty=10.0, optimize_divergence=True,
        )
        new_params, _, aux = step(params, opt_state, stacked, send_idx)
    np.testing.assert_allclose(
        float(aux["total"]), float(ref_total), rtol=5e-4
    )
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_new)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )
