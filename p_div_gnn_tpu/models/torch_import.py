"""Import reference PyTorch checkpoints (.pth) into framework params.

The reference checkpoints (`models.py:44-63`) hold a plain state_dict of
the Sequential blocks plus the 8 normalization scalars. Mapping (torch
Linear weights are (out, in); flax kernels are (in, out)):

  node_encoder.{0,2}.<w/b>  → node_encoder.{lin0,lin1}
  node_encoder.4.<w/b>      → node_encoder.ln            (PyG LayerNorm)
  edge_encoder.*            → edge_encoder.*
  processor.edge_net.0      → edge_w_u/edge_w_v/edge_w_e (+ edge_b0)
                              (concat slots [x_i, x_j, e] split row-wise)
  processor.edge_net.2      → processor.edge_lin1
  processor.edge_net.4      → processor.edge_ln
  processor.node_net.0      → node_w_a/node_w_x (+ node_b0) ([aggr, x])
  processor.node_net.2/4    → processor.node_lin1 / node_ln
  node_decoder.{0,2}        → node_decoder.{lin0,lin1}

This is the activation-parity bridge: run the reference model on a
checkpoint, import it here, and compare outputs allclose (SURVEY §4).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from p_div_gnn_tpu.graphs.container import NormStats


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _a(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def params_from_state_dict(state: dict) -> dict:
    """torch state_dict (tensors or arrays) → flax params dict."""
    sd = {k: np.asarray(v) for k, v in state.items()}
    L = sd["processor.edge_net.2.weight"].shape[0]

    def block(prefix: str, has_ln: bool = True) -> dict:
        out = {
            "lin0": {
                "kernel": _t(sd[f"{prefix}.0.weight"]),
                "bias": _a(sd[f"{prefix}.0.bias"]),
            },
            "lin1": {
                "kernel": _t(sd[f"{prefix}.2.weight"]),
                "bias": _a(sd[f"{prefix}.2.bias"]),
            },
        }
        if has_ln:
            out["ln"] = {
                "weight": _a(sd[f"{prefix}.4.weight"]),
                "bias": _a(sd[f"{prefix}.4.bias"]),
            }
        return out

    ew = _t(sd["processor.edge_net.0.weight"])  # (3L, L)
    nw = _t(sd["processor.node_net.0.weight"])  # (2L, L)
    processor = {
        "edge_w_u": ew[:L],
        "edge_w_v": ew[L : 2 * L],
        "edge_w_e": ew[2 * L :],
        "edge_b0": _a(sd["processor.edge_net.0.bias"]),
        "edge_lin1": {
            "kernel": _t(sd["processor.edge_net.2.weight"]),
            "bias": _a(sd["processor.edge_net.2.bias"]),
        },
        "edge_ln": {
            "weight": _a(sd["processor.edge_net.4.weight"]),
            "bias": _a(sd["processor.edge_net.4.bias"]),
        },
        "node_w_a": nw[:L],
        "node_w_x": nw[L:],
        "node_b0": _a(sd["processor.node_net.0.bias"]),
        "node_lin1": {
            "kernel": _t(sd["processor.node_net.2.weight"]),
            "bias": _a(sd["processor.node_net.2.bias"]),
        },
        "node_ln": {
            "weight": _a(sd["processor.node_net.4.weight"]),
            "bias": _a(sd["processor.node_net.4.bias"]),
        },
    }
    return {
        "params": {
            "node_encoder": block("node_encoder"),
            "edge_encoder": block("edge_encoder"),
            "processor": processor,
            "node_decoder": block("node_decoder", has_ln=False),
        }
    }


def state_dict_from_params(params: dict) -> dict:
    """Inverse mapping: flax params → reference-layout torch state_dict
    (numpy arrays; pass through ``torch.tensor`` before ``load_state_dict``).

    Lets a framework-trained checkpoint run under the reference
    implementation (`models.py:66-87` loads exactly these keys) — the
    export half of the activation-parity bridge.
    """
    p = params["params"] if "params" in params else params

    def block(prefix: str, m: dict, has_ln: bool = True) -> dict:
        out = {
            f"{prefix}.0.weight": _t(m["lin0"]["kernel"]),
            f"{prefix}.0.bias": _a(m["lin0"]["bias"]),
            f"{prefix}.2.weight": _t(m["lin1"]["kernel"]),
            f"{prefix}.2.bias": _a(m["lin1"]["bias"]),
        }
        if has_ln:
            out[f"{prefix}.4.weight"] = _a(m["ln"]["weight"])
            out[f"{prefix}.4.bias"] = _a(m["ln"]["bias"])
        return out

    proc = p["processor"]
    sd = {}
    sd.update(block("node_encoder", p["node_encoder"]))
    sd.update(block("edge_encoder", p["edge_encoder"]))
    sd.update(block("node_decoder", p["node_decoder"], has_ln=False))
    ew = np.concatenate(
        [_a(proc["edge_w_u"]), _a(proc["edge_w_v"]), _a(proc["edge_w_e"])],
        axis=0,
    )  # (3L, L) in flax (in, out) layout → transpose to torch (out, in)
    nw = np.concatenate([_a(proc["node_w_a"]), _a(proc["node_w_x"])], axis=0)
    sd["processor.edge_net.0.weight"] = np.ascontiguousarray(ew.T)
    sd["processor.edge_net.0.bias"] = _a(proc["edge_b0"])
    sd["processor.node_net.0.weight"] = np.ascontiguousarray(nw.T)
    sd["processor.node_net.0.bias"] = _a(proc["node_b0"])
    sd.update(
        {
            "processor.edge_net.2.weight": _t(proc["edge_lin1"]["kernel"]),
            "processor.edge_net.2.bias": _a(proc["edge_lin1"]["bias"]),
            "processor.edge_net.4.weight": _a(proc["edge_ln"]["weight"]),
            "processor.edge_net.4.bias": _a(proc["edge_ln"]["bias"]),
            "processor.node_net.2.weight": _t(proc["node_lin1"]["kernel"]),
            "processor.node_net.2.bias": _a(proc["node_lin1"]["bias"]),
            "processor.node_net.4.weight": _a(proc["node_ln"]["weight"]),
            "processor.node_net.4.bias": _a(proc["node_ln"]["bias"]),
        }
    )
    return sd


def save_torch_checkpoint(
    path: str | Path, params: dict, stats: NormStats, epoch: int = 0
) -> None:
    """Write a reference-format .pth checkpoint (`models.py:44-63` layout)
    from framework params — runnable by the actual reference code."""
    import torch

    ckpt: dict = {
        "model_state_dict": {
            k: torch.tensor(v) for k, v in state_dict_from_params(params).items()
        },
        "optimizer_state_dict": {},
        "epoch": epoch,
    }
    for k in NormStats.__dataclass_fields__:
        ckpt[k] = torch.tensor(float(getattr(stats, k)))
    torch.save(ckpt, path)


def load_torch_checkpoint(path: str | Path) -> tuple[dict, NormStats, int]:
    """Load a reference .pth checkpoint → (flax params, stats, epoch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = params_from_state_dict(
        {k: v.numpy() for k, v in ckpt["model_state_dict"].items()}
    )
    stats = NormStats.from_dict(
        {
            k: float(np.asarray(ckpt[k]))
            for k in NormStats.__dataclass_fields__
        }
    )
    return params, stats, int(ckpt["epoch"])
