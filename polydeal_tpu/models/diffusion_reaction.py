"""Diffusion–reaction on agglomerated polytopal meshes.

Rebuild of reference examples/diffusion_reaction.cc (865 LoC): solve
-Δu + c u = f with SIPG on a METIS- or R-tree-agglomerated mesh, CG
preconditioned with MG (the reference uses Trilinos AMG; R3MG is our
preconditioner story, cf. SURVEY §7 item 5), plus the convergence-rate
check the reference performs across refinements.
"""

from __future__ import annotations

import argparse

import numpy as np


def solve_diffusion_reaction(
    dim: int = 2,
    n: int = 16,
    degree: int = 1,
    reaction: float = 1.0,
    strategy: str = "rtree",
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
    from polydeal_tpu.assembly import (
        assemble_sipg_matrix,
        assemble_rhs,
        mass_matrix,
    )
    from polydeal_tpu.postprocess import compute_global_error
    from polydeal_tpu.solvers import (
        build_multigrid,
        build_rtree_hierarchy,
        cg_solve,
        block_jacobi_preconditioner,
    )

    mesh = pd.hyper_cube(dim, n)
    # manufactured solution: product of sines; -Δu + c u = (dim π² + c) u
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: (dim * jnp.pi**2 + reaction) * u_ex(x)

    handlers = parents = None
    if strategy == "rtree":
        agg = RTreeAgglomerator.build(mesh.cell_centers())
        handlers, parents = build_rtree_hierarchy(
            mesh, agg, list(range(1, agg.n_levels - 1)), degree=degree
        )
        ah = handlers[-1]
    else:
        c2p = agglomerate_by_partition(
            mesh.cell_centers(), mesh.neighbors, max(mesh.n_cells // (2**dim), 1)
        )
        ah = pd.AgglomerationHandler(mesh, c2p, degree=degree)

    K = assemble_sipg_matrix(ah, dtype=dtype)
    M = mass_matrix(ah, dtype=dtype)
    A = K.add(M.scale(reaction))
    b = assemble_rhs(ah, f, u_ex, dtype=dtype)

    if handlers is not None and len(handlers) > 1:
        # MG on the full diffusion+reaction operator: coarse levels get the
        # same composition (direct per-level assembly + reaction mass)
        from polydeal_tpu.solvers.multigrid import Multigrid, Transfer, build_embedding
        from polydeal_tpu.assembly import assemble_sipg_matrix as asm

        import jax as _jax

        transfers = [
            Transfer(
                E=build_embedding(handlers[l], handlers[l + 1], parents[l],
                                  dtype=dtype),
                parent=parents[l],
                n_coarse=handlers[l].n_poly,
            )
            for l in range(len(handlers) - 1)
        ]

        @_jax.jit
        def _levels():
            mats = []
            for h in handlers[:-1]:
                Kl = asm(h, dtype=dtype)
                Ml = mass_matrix(h, dtype=dtype)
                mats.append(Kl.add(Ml.scale(reaction)))
            return mats

        matrices = _levels() + [A]
        mg = Multigrid.setup(matrices, transfers)
        res = mg.solve_cg(b, rtol=rtol)
    else:
        # no geometric hierarchy (METIS path): CG + smoothed-aggregation
        # AMG — the reference solves exactly this way (METIS agglomerates,
        # Trilinos AMG; diffusion_reaction.cc:710-724)
        from polydeal_tpu.solvers import block_nullspace, build_amg

        amg = build_amg(A, nullspace=block_nullspace(ah))
        res = amg.solve_cg(b, rtol=rtol)

    l2, _ = compute_global_error(ah, res.x, u_ex)
    if verbose:
        print(f"n={n} polytopes={ah.n_poly} dofs={ah.n_dofs} "
              f"iters={int(res.iterations)} L2={float(l2):.6e}")
    return dict(n_dofs=ah.n_dofs, iterations=int(res.iterations), l2=float(l2))


def convergence_study(dim=2, degree=1, sizes=(8, 16, 32), **kw):
    """Reference diffusion_reaction.cc convergence-rate check."""
    errs = []
    for n in sizes:
        errs.append(solve_diffusion_reaction(dim=dim, n=n, degree=degree, **kw)["l2"])
    rates = [float(np.log2(errs[i] / errs[i + 1])) for i in range(len(errs) - 1)]
    return errs, rates


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--degree", type=int, default=1)
    ap.add_argument("--reaction", type=float, default=1.0)
    ap.add_argument("--strategy", default="rtree", choices=("rtree", "metis"))
    ap.add_argument("--convergence", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if args.convergence:
        errs, rates = convergence_study(dim=args.dim, degree=args.degree,
                                        strategy=args.strategy,
                                        reaction=args.reaction)
        print("errors:", errs)
        print("rates:", rates)
    else:
        solve_diffusion_reaction(dim=args.dim, n=args.n, degree=args.degree,
                                 reaction=args.reaction, strategy=args.strategy)


if __name__ == "__main__":
    main()
