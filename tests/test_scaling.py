"""Scaling harness smoke test on the virtual CPU mesh (semantics, not
performance)."""

import jax
import pytest

from p_div_gnn_tpu.parallel.scaling import measure_dp_scaling

from test_model import _mesh_sample


@pytest.mark.slow
def test_dp_scaling_harness_runs():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    rows = measure_dp_scaling(
        [_mesh_sample(0, nx=4)],
        device_counts=[1, 2],
        latent_size=8,
        message_passing_steps=1,
        iters=2,
    )
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["efficiency"] == 1.0
    assert all(r["edges_per_s"] > 0 for r in rows)
