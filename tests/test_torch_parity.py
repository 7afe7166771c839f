"""Cross-runtime activation parity: JAX framework vs the pure-torch twin of
the reference model (tests/torch_reference.py, VERDICT round-1 item 1).

Three directions:
1. torch-initialized weights → reference-format .pth → torch_import →
   framework forward ≡ torch forward (the inference-from-reference path);
2. framework-initialized params → state_dict export → torch forward ≡
   framework forward (the export-to-reference path);
3. float64 torch twin ≡ the numpy golden model (cross-checks the golden
   fixture itself against torch numerics).
"""

import numpy as np
import jax
import pytest
import torch

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.models.torch_import import (
    load_torch_checkpoint,
    save_torch_checkpoint,
    state_dict_from_params,
)

from numpy_golden import extract_golden_weights, golden_forward
from test_model import STATS, _mesh_sample
from torch_reference import TorchEncodeProcessDecode

STATS_NP = {k: float(getattr(STATS, k)) for k in STATS.__dataclass_fields__}


def _torch_inputs(sample):
    return dict(
        pos=torch.tensor(sample.graph.pos[:, :2], dtype=torch.float32),
        mean_stress=torch.tensor(
            np.broadcast_to(sample.mean_stress, (sample.num_nodes, 3)).copy()
        ),
        nodes_types=torch.tensor(
            sample.node_labels[:, None], dtype=torch.float32
        ),
        edge_index=torch.tensor(sample.graph.edge_index, dtype=torch.long),
        edge_weight=torch.tensor(
            sample.graph.edge_weight, dtype=torch.float32
        ),
    )


def _torch_forward(tm, sample, **kw):
    tm.eval()
    with torch.no_grad():
        return tm(**_torch_inputs(sample), **kw).numpy()


@pytest.mark.parametrize("steps", [3, 10])
def test_torch_checkpoint_roundtrip_parity(tmp_path, steps):
    torch.manual_seed(7)
    tm = TorchEncodeProcessDecode(
        latent_size=32, message_passing_steps=steps, stats=STATS_NP
    )
    path = tmp_path / "ref.pth"
    tm.save_reference_checkpoint(path, epoch=5)

    params, stats, epoch = load_torch_checkpoint(path)
    assert epoch == 5
    assert float(stats.std_pos) == STATS_NP["std_pos"]

    sample = _mesh_sample(0)
    batch = pack_batch([sample], n_graphs=1)
    model = EncodeProcessDecode(latent_size=32, message_passing_steps=steps)
    ours = np.asarray(
        model.apply(params, batch, stats, scale_output=True)
    )[: sample.num_nodes]
    ref = _torch_forward(tm, sample, scale_output=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_framework_export_runs_under_torch(tmp_path):
    sample = _mesh_sample(1)
    batch = pack_batch([sample], n_graphs=1)
    model = EncodeProcessDecode(latent_size=32, message_passing_steps=4)
    params = model.init(jax.random.PRNGKey(3), batch, STATS)

    path = tmp_path / "exported.pth"
    save_torch_checkpoint(path, params, STATS, epoch=9)
    tm = TorchEncodeProcessDecode(latent_size=32, message_passing_steps=4)
    assert tm.load_reference_checkpoint(path) == 9

    ours = np.asarray(
        model.apply(params, batch, STATS, scale_output=True)
    )[: sample.num_nodes]
    ref = _torch_forward(tm, sample, scale_output=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_export_import_is_identity():
    batch = pack_batch([_mesh_sample(2)], n_graphs=1)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    params = model.init(jax.random.PRNGKey(0), batch, STATS)
    from p_div_gnn_tpu.models.torch_import import params_from_state_dict

    rt = params_from_state_dict(state_dict_from_params(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(rt))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


def test_torch_twin_matches_numpy_golden_float64():
    """The float64 torch twin pins the golden fixture against torch numerics
    (same math, independent runtimes)."""
    torch.manual_seed(11)
    tm = TorchEncodeProcessDecode(
        latent_size=16, message_passing_steps=5, stats=STATS_NP
    ).double()
    sample = _mesh_sample(4)
    inp = {
        k: (v.double() if v.is_floating_point() else v)
        for k, v in _torch_inputs(sample).items()
    }
    tm.eval()
    with torch.no_grad():
        ref = tm(**inp, scale_output=True).numpy()

    from p_div_gnn_tpu.models.torch_import import params_from_state_dict

    params = params_from_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    golden = golden_forward(
        extract_golden_weights(params),
        sample.graph.pos[:, :2],
        np.broadcast_to(sample.mean_stress, (sample.num_nodes, 3)),
        sample.node_labels[:, None].astype(np.float64),
        sample.graph.edge_index[0],
        sample.graph.edge_index[1],
        sample.graph.edge_weight,
        STATS_NP,
        steps=5,
        scale_output=True,
    )
    # scatter summation order differs (index_add_ vs np.add.at) and LN
    # amplifies it over 5 steps — agreement to ~1e-8 abs is the f64 floor.
    np.testing.assert_allclose(golden, ref, rtol=1e-6, atol=1e-8)


def test_zero_stress_early_exit_matches():
    sample = _mesh_sample(5)
    sample = sample.__class__(
        graph=sample.graph,
        mean_stress=np.zeros(3, np.float32),
        local_stress=sample.local_stress,
        node_labels=sample.node_labels,
        div_data=sample.div_data,
        div_row=sample.div_row,
        div_col=sample.div_col,
    )
    torch.manual_seed(1)
    tm = TorchEncodeProcessDecode(
        latent_size=16, message_passing_steps=2, stats=STATS_NP
    )
    ref = _torch_forward(tm, sample)
    assert not ref.any()

    batch = pack_batch([sample], n_graphs=1)
    from p_div_gnn_tpu.models.torch_import import params_from_state_dict

    params = params_from_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=2)
    ours = np.asarray(model.apply(params, batch, STATS))[: sample.num_nodes]
    assert not ours.any()
