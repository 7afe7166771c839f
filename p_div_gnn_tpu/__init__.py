"""p_div_gnn_tpu — TPU-native physics-informed GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
`ricardo0115/p-div-gnn` (P-DivGNN: local stress field reconstruction on
periodic FEM meshes with a divergence-penalty loss), built TPU-first:
static-shape padded graph batches, MXU-friendly message passing, Pallas
scatter kernels, and pjit/shard_map multi-chip scaling.
"""

__version__ = "0.1.0"
