"""Torch-checkpoint import: state_dict mapping must reproduce the reference
forward (validated against the independent numpy golden model, which
implements the reference math directly)."""

import numpy as np
import pytest

from p_div_gnn_tpu.graphs import pack_batch
from p_div_gnn_tpu.models import EncodeProcessDecode
from p_div_gnn_tpu.models.torch_import import (
    load_torch_checkpoint,
    params_from_state_dict,
)

from numpy_golden import extract_golden_weights, golden_forward
from test_model import STATS, _mesh_sample


def _fake_state_dict(L=16, rng=None):
    rng = rng or np.random.default_rng(0)

    def lin(out_f, in_f):
        return rng.normal(size=(out_f, in_f)).astype(np.float32), rng.normal(
            size=out_f
        ).astype(np.float32)

    sd = {}
    for prefix, in0 in [("node_encoder", 6), ("edge_encoder", 1)]:
        w0, b0 = lin(L, in0)
        w2, b2 = lin(L, L)
        sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"] = w0, b0
        sd[f"{prefix}.2.weight"], sd[f"{prefix}.2.bias"] = w2, b2
        sd[f"{prefix}.4.weight"] = rng.normal(size=L).astype(np.float32)
        sd[f"{prefix}.4.bias"] = rng.normal(size=L).astype(np.float32)
    for prefix, in0 in [
        ("processor.edge_net", 3 * L),
        ("processor.node_net", 2 * L),
    ]:
        w0, b0 = lin(L, in0)
        w2, b2 = lin(L, L)
        sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"] = w0, b0
        sd[f"{prefix}.2.weight"], sd[f"{prefix}.2.bias"] = w2, b2
        sd[f"{prefix}.4.weight"] = rng.normal(size=L).astype(np.float32)
        sd[f"{prefix}.4.bias"] = rng.normal(size=L).astype(np.float32)
    w0, b0 = lin(L, L)
    w2, b2 = lin(3, L)
    sd["node_decoder.0.weight"], sd["node_decoder.0.bias"] = w0, b0
    sd["node_decoder.2.weight"], sd["node_decoder.2.bias"] = w2, b2
    return sd


def test_imported_params_reproduce_reference_math():
    sd = _fake_state_dict(L=16)
    params = params_from_state_dict(sd)
    s = _mesh_sample(0)
    batch = pack_batch([s], n_graphs=1)
    model = EncodeProcessDecode(latent_size=16, message_passing_steps=3)
    out = np.asarray(model.apply(params, batch, STATS, scale_output=True))

    # golden model consumes the same params via the flax-extraction path;
    # independently rebuild its weights straight from the torch layout too
    weights = extract_golden_weights(params)
    np.testing.assert_allclose(
        weights["edge_net"]["k0"],
        np.asarray(sd["processor.edge_net.0.weight"], np.float64).T,
    )
    stats_np = {k: float(getattr(STATS, k)) for k in STATS.__dataclass_fields__}
    golden = golden_forward(
        weights,
        s.graph.pos[:, :2],
        np.broadcast_to(s.mean_stress, (s.num_nodes, 3)),
        s.node_labels[:, None].astype(np.float64),
        s.graph.edge_index[0],
        s.graph.edge_index[1],
        s.graph.edge_weight,
        stats_np,
        steps=3,
        scale_output=True,
    )
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(out[real], golden, rtol=2e-3, atol=2e-4)


def test_full_pth_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    sd = {k: torch.tensor(v) for k, v in _fake_state_dict(L=8).items()}
    ckpt = {
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "epoch": 42,
        "mean_pos": torch.tensor(1.0),
        "std_pos": torch.tensor(2.0),
        "mean_mean_stress": torch.tensor(3.0),
        "std_mean_stress": torch.tensor(4.0),
        "mean_local_stress": torch.tensor(5.0),
        "std_local_stress": torch.tensor(6.0),
        "mean_edge_weight": torch.tensor(7.0),
        "std_edge_weight": torch.tensor(8.0),
    }
    path = tmp_path / "model_weights.pth"
    torch.save(ckpt, path)
    params, stats, epoch = load_torch_checkpoint(path)
    assert epoch == 42
    assert float(stats.std_local_stress) == 6.0
    assert params["params"]["processor"]["edge_w_u"].shape == (8, 8)
