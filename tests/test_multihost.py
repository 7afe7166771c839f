"""Multi-process (multi-"host") validation over a loopback coordinator:
2 separate JAX processes x 2 CPU devices each run the DP train step over
the 4-device GLOBAL mesh; both must produce the identical loss and params,
equal to the single-process 4-device reference (the same collectives a
DCN-connected pod runs, minus the physical network)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real-subprocess tests, ~45 s

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_matches_single_process():
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_mh",
            # the worker is run by path, so Python puts tests/ (not the
            # repo root) on sys.path — make the package importable without
            # requiring a pip-installed copy
            PYTHONPATH=str(REPO),
        )
        workers.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py")],
                env=env, cwd=str(REPO), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    results = {}
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=570)
        logs.append(out)
        assert w.returncode == 0, f"worker failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("MULTIHOST_RESULT"):
                _, pid, total, checksum = line.split()
                results[int(pid)] = (float(total), float(checksum))
    assert set(results) == {0, 1}, f"missing results:\n{logs}"
    # both processes replicate the identical global step
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)

    # single-process 4-device reference (this test process has 8 virtual
    # devices via conftest)
    import jax
    import optax

    from p_div_gnn_tpu.graphs.container import NormStats  # noqa: F401
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.parallel.dp import (
        device_put_sharded_batch,
        make_dp_train_step,
        pack_sharded_batch,
    )
    from jax.sharding import Mesh

    from test_model import STATS, _mesh_sample

    samples = [_mesh_sample(i, nx=4 + (i % 2)) for i in range(4)]
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    stacked = pack_sharded_batch(samples, n_shards=4, graphs_per_shard=1)
    stacked = device_put_sharded_batch(stacked, mesh)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)
    local0 = jax.tree.map(
        lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x, stacked
    )
    params = model.init(jax.random.PRNGKey(0), local0, STATS)
    opt_state = optimizer.init(params)
    step = make_dp_train_step(
        model, STATS, optimizer, mesh,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, _, aux = step(params, opt_state, stacked)
    ref_total = float(aux["total"])
    ref_checksum = float(
        sum(abs(np.asarray(x)).sum() for x in jax.tree.leaves(params))
    )
    np.testing.assert_allclose(results[0][0], ref_total, rtol=1e-5)
    np.testing.assert_allclose(results[0][1], ref_checksum, rtol=1e-5)


def test_two_process_partitioned_step_matches_single_process():
    """Edge-partitioned step with the per-peer a2a halo across 2 REAL
    processes (2 devices each): identical loss/params on both, equal to
    the single-process 4-device run."""
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_mh",
            PDG_MH_MODE="partition",
            PYTHONPATH=str(REPO),
        )
        workers.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py")],
                env=env, cwd=str(REPO), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    results = {}
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=570)
        logs.append(out)
        assert w.returncode == 0, f"worker failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("MULTIHOST_RESULT"):
                _, pid, total, checksum = line.split()
                results[int(pid)] = (float(total), float(checksum))
    assert set(results) == {0, 1}, f"missing results:\n{logs}"
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)

    # single-process 4-device reference
    import jax
    import optax
    from jax.sharding import Mesh

    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.parallel.partition import (
        device_put_partitioned,
        make_partitioned_train_step,
        partition_batch,
    )

    from test_model import STATS, _mesh_sample

    mesh = Mesh(np.array(jax.devices()[:4]), ("graph",))
    batch = pack_batch([_mesh_sample(0), _mesh_sample(1, nx=4)], n_graphs=2)
    stacked, send_idx = partition_batch(batch, n_shards=4, halo_mode="a2a")
    local0 = jax.tree.map(
        lambda x: np.asarray(x)[0] if getattr(x, "ndim", 0) else x, stacked
    )
    stacked, send_idx = device_put_partitioned(stacked, send_idx, mesh)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    optimizer = optax.adam(1e-3)
    params = model.init(jax.random.PRNGKey(0), local0, STATS)
    opt_state = optimizer.init(params)
    step = make_partitioned_train_step(
        model, STATS, optimizer, mesh,
        divergence_penalty=10.0, optimize_divergence=True,
    )
    params, _, aux = step(params, opt_state, stacked, send_idx)
    np.testing.assert_allclose(results[0][0], float(aux["total"]), rtol=1e-5)
    ref_checksum = float(
        sum(abs(np.asarray(x)).sum() for x in jax.tree.leaves(params))
    )
    np.testing.assert_allclose(results[0][1], ref_checksum, rtol=1e-5)
