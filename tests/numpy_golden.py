"""Independent float64 numpy golden model of the reference forward pass.

Implements the math spec of SURVEY.md §7 / `models.py:98-326` directly with
dense concats and np.add.at scatter — deliberately the naive formulation, to
cross-check the TPU model's decomposed/hoisted formulation.
"""

from __future__ import annotations

import numpy as np


def relu(x):
    return np.maximum(x, 0.0)


def mlp_ln(x, p, ln=True):
    h = relu(x @ p["k0"] + p["b0"])
    o = h @ p["k1"] + p["b1"]
    if not ln:
        return o
    o = relu(o)
    mu = o.mean()
    sd = o.std()  # biased
    return (o - mu) / (sd + 1e-5) * p["lnw"] + p["lnb"]


def extract_golden_weights(params: dict) -> dict:
    """flax param tree → concat-form numpy weights."""
    p = params["params"]

    def blk(m):
        return {
            "k0": np.asarray(m["lin0"]["kernel"], np.float64),
            "b0": np.asarray(m["lin0"]["bias"], np.float64),
            "k1": np.asarray(m["lin1"]["kernel"], np.float64),
            "b1": np.asarray(m["lin1"]["bias"], np.float64),
            "lnw": np.asarray(m["ln"]["weight"], np.float64)
            if "ln" in m
            else None,
            "lnb": np.asarray(m["ln"]["bias"], np.float64) if "ln" in m else None,
        }

    proc = p["processor"]
    edge_net = {
        "k0": np.concatenate(
            [
                np.asarray(proc["edge_w_u"], np.float64),
                np.asarray(proc["edge_w_v"], np.float64),
                np.asarray(proc["edge_w_e"], np.float64),
            ],
            axis=0,
        ),
        "b0": np.asarray(proc["edge_b0"], np.float64),
        "k1": np.asarray(proc["edge_lin1"]["kernel"], np.float64),
        "b1": np.asarray(proc["edge_lin1"]["bias"], np.float64),
        "lnw": np.asarray(proc["edge_ln"]["weight"], np.float64),
        "lnb": np.asarray(proc["edge_ln"]["bias"], np.float64),
    }
    node_net = {
        "k0": np.concatenate(
            [
                np.asarray(proc["node_w_a"], np.float64),
                np.asarray(proc["node_w_x"], np.float64),
            ],
            axis=0,
        ),
        "b0": np.asarray(proc["node_b0"], np.float64),
        "k1": np.asarray(proc["node_lin1"]["kernel"], np.float64),
        "b1": np.asarray(proc["node_lin1"]["bias"], np.float64),
        "lnw": np.asarray(proc["node_ln"]["weight"], np.float64),
        "lnb": np.asarray(proc["node_ln"]["bias"], np.float64),
    }
    return {
        "node_encoder": blk(p["node_encoder"]),
        "edge_encoder": blk(p["edge_encoder"]),
        "edge_net": edge_net,
        "node_net": node_net,
        "node_decoder": blk(p["node_decoder"]),
    }


def golden_forward(
    weights: dict,
    pos: np.ndarray,  # (N, 2) concatenated over graphs
    mean_stress: np.ndarray,  # (N, 3)
    node_type: np.ndarray,  # (N, 1)
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_weight: np.ndarray,  # (E,)
    stats: dict,
    steps: int = 10,
    scale_input: bool = True,
    scale_output: bool = True,
) -> np.ndarray:
    if not np.any(mean_stress):
        return np.zeros_like(mean_stress)
    ms, p = mean_stress, pos
    if scale_input:
        ms = (ms - stats["mean_mean_stress"]) / stats["std_mean_stress"]
        p = (p - stats["mean_pos"]) / stats["std_pos"]
        ew = (edge_weight - stats["mean_edge_weight"]) / stats["std_edge_weight"]
    else:
        ew = edge_weight
    x = np.concatenate([ms, p, node_type], axis=1).astype(np.float64)
    e = ew[:, None].astype(np.float64)

    x = mlp_ln(x, weights["node_encoder"])
    e = mlp_ln(e, weights["edge_encoder"])
    N = x.shape[0]
    for _ in range(steps):
        msg = mlp_ln(
            np.concatenate([x[receivers], x[senders], e], axis=1),
            weights["edge_net"],
        )
        new_e = mlp_ln(
            np.concatenate([x[senders], x[receivers], e], axis=1),
            weights["edge_net"],
        )
        aggr = np.zeros_like(x)
        np.add.at(aggr, receivers, msg)
        new_x = mlp_ln(np.concatenate([aggr, x], axis=1), weights["node_net"])
        x = new_x + x
        e = new_e + e
    out = mlp_ln(x, weights["node_decoder"], ln=False)
    if scale_output:
        out = out * stats["std_local_stress"] + stats["mean_local_stress"]
    return out
