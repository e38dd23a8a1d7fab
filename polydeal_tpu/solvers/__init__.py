from polydeal_tpu.solvers.amg import AMG, build_amg, constant_nullspace, block_nullspace
from polydeal_tpu.solvers.cg import cg_solve, block_jacobi_preconditioner
from polydeal_tpu.solvers.chebyshev import ChebyshevSmoother, estimate_lambda_max
from polydeal_tpu.solvers.multigrid import (
    Multigrid,
    Transfer,
    build_embedding,
    build_field_block_multigrid,
    build_multigrid,
    maybe_pack_level,
    build_rtree_hierarchy,
    relabel_band_minimizing,
    detect_grid_shapes,
    build_structured_hierarchy,
    galerkin_coarsen,
)

__all__ = [
    "AMG",
    "build_amg",
    "constant_nullspace",
    "block_nullspace",
    "cg_solve",
    "block_jacobi_preconditioner",
    "ChebyshevSmoother",
    "estimate_lambda_max",
    "Multigrid",
    "Transfer",
    "build_embedding",
    "build_field_block_multigrid",
    "build_multigrid",
    "maybe_pack_level",
    "build_rtree_hierarchy",
    "relabel_band_minimizing",
    "detect_grid_shapes",
    "build_structured_hierarchy",
    "galerkin_coarsen",
]
