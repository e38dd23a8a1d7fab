from polydeal_tpu.solvers.cg import cg_solve, block_jacobi_preconditioner

__all__ = ["cg_solve", "block_jacobi_preconditioner"]
