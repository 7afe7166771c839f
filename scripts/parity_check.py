"""Activation-parity harness vs the reference implementation.

Usage (in an environment where BOTH this package and the reference's
torch/torch_geometric stack are importable):

    python scripts/parity_check.py --checkpoint model_weights.pth \
        --mesh path/to/hole_plate_mesh_0.vtk --data path/to/....npz

Loads the reference checkpoint into this framework (torch_import mapping),
runs our jit'd forward, and — when torch_geometric is importable — builds
the reference `EncodeProcessDecode` on the same graph and compares the
outputs allclose (SURVEY.md parity bar). Without torch_geometric it falls
back to the built-in float64 numpy golden model of the reference math
(tests/numpy_golden.py), which the test suite also pins the flax model
against.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--mesh", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--periodic", action="store_true", default=True)
    p.add_argument("--latent_size", type=int, default=128)
    p.add_argument("--message_passing_steps", type=int, default=10)
    p.add_argument("--rtol", type=float, default=1e-3)
    p.add_argument("--atol", type=float, default=1e-4)
    args = p.parse_args()

    from p_div_gnn_tpu.graphs import pack_batch
    from p_div_gnn_tpu.graphs.dataset import load_sample
    from p_div_gnn_tpu.models import EncodeProcessDecode
    from p_div_gnn_tpu.models.torch_import import load_torch_checkpoint

    sample = load_sample(args.mesh, args.data, periodic_graph=args.periodic)
    batch = pack_batch([sample], n_graphs=1)
    model = EncodeProcessDecode(
        latent_size=args.latent_size,
        message_passing_steps=args.message_passing_steps,
    )
    if args.checkpoint.endswith(".ckpt"):
        # framework msgpack checkpoint → params + stats directly
        import jax

        from p_div_gnn_tpu.graphs.container import NormStats
        from p_div_gnn_tpu.train.checkpoint import load_checkpoint

        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), batch, NormStats.ones())
        )
        template = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), template
        )
        params, _, epoch, stats = load_checkpoint(args.checkpoint, template)
    else:
        params, stats, epoch = load_torch_checkpoint(args.checkpoint)
    ours = np.asarray(
        model.apply(params, batch, stats, scale_input=True, scale_output=True)
    )[: sample.num_nodes]
    print(f"framework output: mean {ours.mean():.6g} std {ours.std():.6g} "
          f"(checkpoint epoch {epoch})")

    try:
        import torch
        import torch_geometric  # noqa: F401

        ref = _run_reference(args, sample)
        diff = np.abs(ours - ref)
        ok = np.allclose(ours, ref, rtol=args.rtol, atol=args.atol)
        print(f"reference comparison: max abs diff {diff.max():.3e} "
              f"allclose={ok}")
        sys.exit(0 if ok else 1)
    except ImportError:
        print("torch_geometric unavailable — comparing against the pure-torch"
              " twin of the reference (tests/torch_reference.py) and the"
              " builtin float64 golden model instead")
        tok = True  # torch-twin verdict (skipped = does not fail the check)
        try:
            import torch

            from p_div_gnn_tpu.models.torch_import import (
                state_dict_from_params,
            )
            from torch_reference import TorchEncodeProcessDecode

            tm = TorchEncodeProcessDecode(
                latent_size=args.latent_size,
                message_passing_steps=args.message_passing_steps,
                stats=stats.to_dict(),
            )
            tm.load_state_dict(
                {k: torch.tensor(v)
                 for k, v in state_dict_from_params(params).items()}
            )
            tm.eval()
            with torch.no_grad():
                tref = tm(
                    pos=torch.tensor(sample.graph.pos[:, :2],
                                     dtype=torch.float32),
                    mean_stress=torch.tensor(np.broadcast_to(
                        sample.mean_stress, (sample.num_nodes, 3)).copy()),
                    nodes_types=torch.tensor(sample.node_labels[:, None],
                                             dtype=torch.float32),
                    edge_index=torch.tensor(sample.graph.edge_index,
                                            dtype=torch.long),
                    edge_weight=torch.tensor(sample.graph.edge_weight,
                                             dtype=torch.float32),
                    scale_output=True,
                ).numpy()
            tdiff = np.abs(ours - tref)
            tok = np.allclose(ours, tref, rtol=args.rtol, atol=args.atol)
            print(f"torch-twin comparison: max abs diff {tdiff.max():.3e} "
                  f"allclose={tok}")
        except ImportError:
            print("torch unavailable too — numpy golden comparison only")

        from numpy_golden import extract_golden_weights, golden_forward

        weights = extract_golden_weights(params)
        golden = golden_forward(
            weights,
            sample.graph.pos[:, :2],
            np.broadcast_to(sample.mean_stress, (sample.num_nodes, 3)),
            sample.node_labels[:, None].astype(np.float64),
            sample.graph.edge_index[0],
            sample.graph.edge_index[1],
            sample.graph.edge_weight,
            stats.to_dict(),
            steps=args.message_passing_steps,
        )
        diff = np.abs(ours - golden)
        ok = np.allclose(ours, golden, rtol=args.rtol, atol=args.atol)
        print(f"golden comparison: max abs diff {diff.max():.3e} "
              f"allclose={ok}")
        sys.exit(0 if (ok and tok) else 1)


def _run_reference(args, sample):
    """Run the actual reference model (requires its package installed)."""
    import torch
    from gnn_local_stress import models as ref_models
    import torch_geometric as PyG

    graph = PyG.data.Data(
        pos=torch.tensor(
            np.concatenate(
                [sample.graph.pos[:, :2],
                 np.zeros((sample.num_nodes, 1))], axis=1
            ),
            dtype=torch.float32,
        ),
        edge_index=torch.tensor(sample.graph.edge_index, dtype=torch.long),
        edge_attr=torch.tensor(sample.graph.edge_weight, dtype=torch.float32),
    )
    graph.pos = graph.pos[:, :2].float()
    graph.mean_stress = torch.ones((sample.num_nodes, 3)) * torch.tensor(
        sample.mean_stress
    )
    graph.nodes_types = torch.tensor(
        sample.node_labels[:, None], dtype=torch.float32
    )
    model = ref_models.EncodeProcessDecode(
        input_edges_features_size=1,
        input_nodes_features_size=6,
        message_passing_steps=args.message_passing_steps,
        latent_size=args.latent_size,
        output_nodes_features_size=3,
    )
    ref_models.load_model_checkpoint(model, args.checkpoint)
    model.eval()
    with torch.no_grad():
        out = model.forward(graph, scale_output=True, scale_input=True)
    return out.local_stress.numpy()


if __name__ == "__main__":
    main()
