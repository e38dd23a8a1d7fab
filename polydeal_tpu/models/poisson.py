"""Poisson on an agglomerated polytopal mesh — the canonical application.

Rebuild of reference examples/poisson.cc (serial SIPG Poisson with METIS /
R-tree / trivial agglomeration, p- and h-convergence study) as a CLI:

    python -m polydeal_tpu.models.poisson --dim 2 --n 16 --degree 2 \
        --strategy rtree --solver mg

Prints the mesh/agglomeration summary, solver telemetry (iterations,
residual — reference SolverControl analogue) and L2/H1 errors against the
product-sine manufactured solution (poisson.cc's ConvergenceInfo).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def solve_poisson(
    dim: int = 2,
    n: int = 16,
    degree: int = 1,
    strategy: str = "rtree",
    n_agglomerates: int | None = None,
    solver: str = "mg",
    distort: float = 0.0,
    rtol: float = 1e-9,
    dtype=None,
    verbose: bool = True,
):
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import RTreeAgglomerator, agglomerate_by_partition
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
    from polydeal_tpu.postprocess import compute_global_error
    from polydeal_tpu.solvers import (
        build_multigrid,
        build_rtree_hierarchy,
        cg_solve,
        block_jacobi_preconditioner,
    )

    def log(*a):
        if verbose:
            print(*a)

    t0 = time.perf_counter()
    m0 = pd.hyper_cube(dim, n)
    mesh = pd.distort_random(m0, distort, seed=1) if distort else m0

    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: dim * jnp.pi**2 * u_ex(x)

    def grad_u(x):
        comps = []
        for d in range(dim):
            g = jnp.pi * jnp.cos(jnp.pi * x[..., d])
            for e in range(dim):
                if e != d:
                    g = g * jnp.sin(jnp.pi * x[..., e])
            comps.append(g)
        return jnp.stack(comps, axis=-1)

    handlers = parents = None
    if strategy == "rtree":
        agg = RTreeAgglomerator.build(m0.cell_centers())
        levels = list(range(1, agg.n_levels - 1))
        handlers, parents = build_rtree_hierarchy(
            mesh, agg, levels, degree=degree
        )
        ah = handlers[-1]
    elif strategy == "metis":
        n_agg = n_agglomerates or max(mesh.n_cells // (2**dim), 1)
        c2p = agglomerate_by_partition(m0.cell_centers(), m0.neighbors, n_agg)
        ah = pd.AgglomerationHandler(mesh, c2p, degree=degree)
    elif strategy == "trivial":
        ah = pd.AgglomerationHandler(
            mesh, np.arange(mesh.n_cells, dtype=np.int32), degree=degree
        )
    else:
        raise ValueError(f"unknown strategy: {strategy}")
    t_setup = time.perf_counter() - t0
    log(f"mesh: {mesh.n_cells} cells | polytopes: {ah.n_poly} | "
        f"DoFs: {ah.n_dofs} (p={degree}) | setup {t_setup:.2f}s")

    t0 = time.perf_counter()
    A = assemble_sipg_matrix(ah, dtype=dtype)
    b = assemble_rhs(ah, f, u_ex, dtype=dtype)
    jax.block_until_ready(b)
    t_asm = time.perf_counter() - t0
    log(f"assembly: {t_asm:.3f}s ({A.data.shape[0]} blocks)")

    t0 = time.perf_counter()
    if solver == "mg" and handlers is not None and len(handlers) > 1:
        mg = build_multigrid(handlers, parents, A, dtype=dtype)
        res = mg.solve_cg(b, rtol=rtol)
    elif solver == "amg":
        # the reference's Trilinos-AMG comparison arm
        # (examples/agglo_amg.cc:1473-1530), rebuilt as smoothed
        # aggregation on the assembled matrix
        from polydeal_tpu.solvers.amg import block_nullspace, build_amg

        amg = build_amg(A, nullspace=block_nullspace(ah))
        res = amg.solve_cg(b, rtol=rtol)
    else:
        res = cg_solve(
            A.matvec, b, M=block_jacobi_preconditioner(A.diag_blocks()),
            rtol=rtol, maxiter=10000,
        )
    jax.block_until_ready(res.x)
    t_solve = time.perf_counter() - t0
    log(f"solve [{solver}]: {t_solve:.3f}s, {int(res.iterations)} iterations, "
        f"residual {float(res.residual):.2e}")

    l2, h1 = compute_global_error(ah, res.x, u_ex, grad_u)
    log(f"L2 error = {float(l2):.6e}   H1 error = {float(h1):.6e}")
    return dict(
        n_cells=mesh.n_cells,
        n_poly=ah.n_poly,
        n_dofs=ah.n_dofs,
        iterations=int(res.iterations),
        residual=float(res.residual),
        l2=float(l2),
        h1=float(h1),
        t_setup=t_setup,
        t_assembly=t_asm,
        t_solve=t_solve,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3))
    ap.add_argument("--n", type=int, default=16, help="cells per direction")
    ap.add_argument("--degree", type=int, default=1)
    ap.add_argument("--strategy", default="rtree",
                    choices=("rtree", "metis", "trivial"))
    ap.add_argument("--n-agglomerates", type=int, default=None)
    ap.add_argument("--solver", default="mg", choices=("mg", "amg", "cg"))
    ap.add_argument("--distort", type=float, default=0.0)
    ap.add_argument("--rtol", type=float, default=1e-9)
    ap.add_argument("--x64", action="store_true", default=True)
    ap.add_argument("--no-x64", dest="x64", action="store_false")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    solve_poisson(
        dim=args.dim, n=args.n, degree=args.degree, strategy=args.strategy,
        n_agglomerates=args.n_agglomerates, solver=args.solver,
        distort=args.distort, rtol=args.rtol,
    )


if __name__ == "__main__":
    main()
