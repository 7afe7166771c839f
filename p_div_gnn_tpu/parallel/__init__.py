from p_div_gnn_tpu.parallel.dp import (
    device_put_sharded_batch,
    make_dp_eval_step,
    make_dp_train_step,
    pack_sharded_batch,
)
from p_div_gnn_tpu.parallel.partition import (
    device_put_partitioned,
    make_partitioned_forward,
    make_partitioned_train_step,
    partition_batch,
)

__all__ = [
    "ensure_distributed",
    "global_data_mesh",
    "pack_global_batch",
    "device_put_partitioned",
    "device_put_sharded_batch",
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_partitioned_forward",
    "make_partitioned_train_step",
    "pack_sharded_batch",
    "partition_batch",
]
from p_div_gnn_tpu.parallel.multihost import (
    ensure_distributed,
    global_data_mesh,
    pack_global_batch,
)
