"""Data-parallel training over a device mesh (SURVEY §2 parallelism item 1).

The reference is single-GPU (no DDP/torch.distributed anywhere); DP is a
new first-class capability of the TPU build: the padded graph batch gains a
leading shard axis, ``shard_map`` over a 1-D ``Mesh('data')`` gives each
device its local sub-batch, and three collectives make the sharded step
*numerically identical* to the unsharded whole-batch step:

1. graph-mode LayerNorm statistics are psum'd (the LN couples ALL graphs of
   the batch — SURVEY §7.3 — so per-shard stats would change the model);
2. the loss's per-graph sums and real-graph counts are psum'd;
3. gradients are pmean'd before the (replicated) Adam update.

Collectives ride ICI when the mesh spans a slice; multi-host extends the
same code via jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from p_div_gnn_tpu.graphs.batching import NODE_TILE, GraphSample, pack_batch
from p_div_gnn_tpu.graphs.container import GraphBatch, NormStats
from p_div_gnn_tpu.losses import batch_loss


def pack_sharded_batch(
    samples: list[GraphSample],
    n_shards: int,
    graphs_per_shard: int | None = None,
    tile: int = NODE_TILE,
) -> GraphBatch:
    """Pack samples into ``n_shards`` equal-capacity local batches stacked
    on a leading shard axis (round-robin assignment by size for balance)."""
    gps = graphs_per_shard or (len(samples) + n_shards - 1) // n_shards
    shards: list[list[GraphSample]] = [[] for _ in range(n_shards)]
    order = np.argsort([-s.num_nodes for s in samples])  # big first → balance
    loads = np.zeros(n_shards, dtype=np.int64)
    for i in order:
        d = int(np.argmin(loads))
        if len(shards[d]) >= gps:
            d = int(np.argmin([len(s) for s in shards]))
        shards[d].append(samples[i])
        loads[d] += samples[i].num_nodes
    # common capacities across shards (one compiled program)
    pad_nodes = max(
        ((sum(s.num_nodes for s in sh) + 1 + tile - 1) // tile + 1) * tile
        for sh in shards
    )
    pad_edges = max(
        ((max(sum(s.num_edges for s in sh), 1) + 511) // 512) * 512
        for sh in shards
    )
    pad_div = max(
        ((max(sum(s.num_div_entries for s in sh), 1) + 511) // 512) * 512
        for sh in shards
    )
    def pack_all(edge_cap):
        return [
            pack_batch(
                sh,
                n_graphs=gps,
                pad_nodes=pad_nodes,
                pad_edges=edge_cap,
                pad_div=pad_div,
                tile=tile,
            )
            for sh in shards
        ]

    packed = pack_all(pad_edges)
    # block alignment can grow edge capacity per shard; equalize
    caps = {b.num_edges_padded for b in packed}
    if len(caps) > 1:
        packed = pack_all(max(caps))
    # sender-view capacities must match across shards too
    from p_div_gnn_tpu.graphs.batching import pad_sender_view

    vcap = max(len(b.snd_perm) for b in packed)
    packed = [
        b.replace(
            **dict(zip(
                ("snd_perm", "snd_sorted", "snd_block_tile"),
                pad_sender_view(
                    b.snd_perm, b.snd_sorted, b.snd_block_tile, vcap,
                    b.num_nodes_padded, tile,
                ),
            ))
        )
        for b in packed
    ]
    # divergence-ELL fan-in widths must match across shards too (padding
    # slots point at the shard's last padding node with value 0 — no-ops)
    def pad_ell(arr, w, pad):
        dw = w - arr.shape[1]
        if dw == 0:
            return arr
        return np.pad(arr, ((0, 0), (0, dw)), constant_values=pad)

    if packed[0].div_src is not None:  # ELL views absent under div_ell=False
        w = max(b.div_src.shape[1] for b in packed)
        wt = max(b.divT_row.shape[1] for b in packed)
        packed = [
            b.replace(
                div_src=pad_ell(b.div_src, w, b.num_nodes_padded - 1),
                div_val=pad_ell(b.div_val, w, 0),
                div_isy=pad_ell(b.div_isy, w, 0),
                divT_row=pad_ell(b.divT_row, wt, b.num_nodes_padded - 1),
                divT_val=pad_ell(b.divT_val, wt, 0),
                divT_isy=pad_ell(b.divT_isy, wt, 0),
            )
            for b in packed
        ]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *packed)
    return stacked


class DPGraphLoader:
    """Shuffled loader yielding device-sharded stacked batches (the DP
    counterpart of train.data.GraphLoader)."""

    def __init__(
        self,
        samples: list[GraphSample],
        batch_size: int,
        mesh: Mesh,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.samples = samples
        self.batch_size = batch_size
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        assert batch_size % self.n_shards == 0, (
            f"batch_size {batch_size} must divide across {self.n_shards} "
            "devices"
        )
        self.graphs_per_shard = batch_size // self.n_shards
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.samples))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            stacked = pack_sharded_batch(
                [self.samples[i] for i in idx],
                n_shards=self.n_shards,
                graphs_per_shard=self.graphs_per_shard,
            )
            yield device_put_sharded_batch(stacked, self.mesh)


def make_dp_train_step(
    model: Any,
    stats: NormStats,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    divergence_penalty: float = 0.0,
    optimize_divergence: bool = False,
    axis: str = "data",
) -> Callable:
    """Build a jit'd DP train step: (params, opt_state, stacked_batch) →
    (params, opt_state, aux). Params/opt state replicated; batch sharded on
    its leading axis."""

    def loss_fn(params, local_batch: GraphBatch):
        pred = model.apply(
            params,
            local_batch,
            stats,
            scale_input=True,
            scale_output=False,
            axis_name=axis,
        )
        gt = (
            local_batch.local_stress - stats.mean_local_stress
        ) / stats.std_local_stress
        return batch_loss(
            local_batch,
            pred,
            gt,
            divergence_penalty=divergence_penalty,
            optimize_divergence=optimize_divergence,
            axis_name=axis,
        )

    def per_shard(params, opt_state, local_batch: GraphBatch):
        # shard_map keeps a size-1 leading shard axis on every leaf
        local_batch = jax.tree.map(lambda x: x[0], local_batch)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, local_batch
        )
        # The loss is the *global* batch loss (psum'd sums/counts →
        # replicated value). shard_map's AD transposes those psums by
        # psum-ing cotangents, so each shard's raw grad is a partial scaled
        # by D; pmean (= psum/D) of the partials is exactly the true global
        # gradient. A raw-gradient test pins this contract — Adam's scale
        # normalization would hide a psum/pmean mix-up in loss curves.
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["total"] = total
        return params, opt_state, aux

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),  # prefix spec: leading axis of every
        # GraphBatch leaf is the shard axis
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_dp_eval_step(
    model: Any, stats: NormStats, mesh: Mesh, axis: str = "data"
) -> Callable:
    def per_shard(params, local_batch: GraphBatch):
        local_batch = jax.tree.map(lambda x: x[0], local_batch)
        pred = model.apply(
            params,
            local_batch,
            stats,
            scale_input=True,
            scale_output=True,
            axis_name=axis,
        )
        return pred[None]  # re-add the shard axis for out_specs P(axis)

    return jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )


def device_put_sharded_batch(batch: GraphBatch, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host-stacked batch onto the mesh, one shard per device.

    Under multi-process execution (jax.distributed initialized, mesh over
    the GLOBAL device list) every process runs this with the SAME
    deterministic host batch and contributes only the rows of its own
    addressable devices — which makes the single-controller DP loop work
    unchanged across hosts."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        local_ids = {d.id for d in jax.local_devices()}
        mesh_devs = list(mesh.devices.ravel())
        rows = np.array(
            [i for i, d in enumerate(mesh_devs) if d.id in local_ids]
        )

        def put(x):
            x = np.asarray(x)
            if x.ndim == 0:
                return x
            return jax.make_array_from_process_local_data(
                sharding, x[rows], x.shape
            )

        return jax.tree.map(put, batch)
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch
    )
