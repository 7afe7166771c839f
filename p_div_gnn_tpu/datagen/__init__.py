from p_div_gnn_tpu.datagen.fem import solve_periodic_rve
from p_div_gnn_tpu.datagen.mesher import hole_plate_mesh, is_periodic_mesh
from p_div_gnn_tpu.datagen.opdiv import compute_op_div_matrix

__all__ = [
    "compute_op_div_matrix",
    "hole_plate_mesh",
    "is_periodic_mesh",
    "solve_periodic_rve",
]
