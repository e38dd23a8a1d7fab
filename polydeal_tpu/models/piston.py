"""3D piston: unstructured hex geometry + boundary ids + R3MG solve.

Analogue of the reference's ``examples/3D_piston.cc`` (921 LoC): a
diffusion–reaction problem on a genuinely 3D piston geometry, R-tree
agglomerated and solved with MG-preconditioned CG.  The reference loads
an external ``piston_3.inp`` abaqus mesh (3D_piston.cc:396-400, not in
the repository); here the geometry is generated procedurally — a
cylindrical crown with a combustion bowl and a stepped skirt — which
keeps the app self-contained while exercising everything the reference's
version does: an irregular cell subset (carved structured grid), curved
coordinate mapping, per-id boundary conditions (hot crown, cooled skirt,
insulated lateral surface), R-tree hierarchy on non-grid-aligned cells.

Boundary ids: 1 = crown top (Dirichlet, hot), 2 = skirt bottom
(Dirichlet, cool), 0 = lateral/bowl surfaces (homogeneous Neumann —
the no-flux handling of reference utils.h:1647-1659, here explicit via
dirichlet_ids).
"""

from __future__ import annotations

import argparse

import numpy as np

__all__ = ["piston_mesh", "solve_piston"]


def piston_mesh(n: int = 16):
    """Carved + mapped structured hex grid shaped like a piston.

    Start from [-1,1]² × [0,1]; keep the crown disc (r ≤ 1, z ≥ 0.55)
    and the skirt annulus-ish band (r ≤ 0.82, z < 0.55); map the square
    cross-section to a disc and sink a combustion bowl into the top.
    """
    from polydeal_tpu.mesh.fine_mesh import FineMesh, hyper_rectangle

    base = hyper_rectangle(3, [n, n, n], lo=[-1, -1, 0], hi=[1, 1, 1])
    centers = base.cell_centers()
    # square-frame radius of the UNIT square (before disc mapping)
    rs = np.maximum(np.abs(centers[:, 0]), np.abs(centers[:, 1]))
    z = centers[:, 2]
    keep = ((z >= 0.55) & (rs <= 0.999)) | ((z < 0.55) & (rs <= 0.82))
    cells = base.cells[keep]
    used = np.unique(cells)
    remap = np.full(base.n_vertices, -1, dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    verts = base.vertices[used].copy()

    # square -> disc map on the cross-section (angle-preserving radial
    # scaling: p' = p * max(|x|,|y|) / |p|), radius 0.5 units per frame
    xy = verts[:, :2]
    rfrm = np.maximum(np.abs(xy[:, 0]), np.abs(xy[:, 1]))
    rlen = np.linalg.norm(xy, axis=1)
    scale = np.where(rlen > 1e-12, rfrm / np.maximum(rlen, 1e-12), 1.0)
    verts[:, :2] = xy * scale[:, None]
    # combustion bowl: sink the top surface near the axis
    r2 = (verts[:, 0] ** 2 + verts[:, 1] ** 2)
    bowl = 0.25 * np.exp(-6.0 * r2)
    verts[:, 2] = verts[:, 2] * (1.0 - bowl * np.clip(verts[:, 2], 0, 1))

    mesh = FineMesh(dim=3, vertices=verts,
                    cells=remap[cells].astype(np.int32))

    def ids(fc, nrm):
        out = np.zeros(fc.shape[0], dtype=np.int32)
        out[(nrm[:, 2] > 0.5) & (fc[:, 2] > 0.5)] = 1  # crown top
        out[(nrm[:, 2] < -0.5) & (fc[:, 2] < 0.1)] = 2  # skirt bottom
        return out

    return mesh.mark_boundary(ids)


def solve_piston(n: int = 16, degree: int = 1, reaction: float = 1.0,
                 t_hot: float = 1.0, t_cool: float = 0.0,
                 rtol: float = 1e-8, verbose: bool = True):
    """-Δu + c u = 0 with u = t_hot on the crown, t_cool on the skirt
    bottom, no-flux elsewhere; R-tree agglomerated MG-CG solve."""
    import jax
    import jax.numpy as jnp

    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.assembly import (
        assemble_sipg_matrix,
        assemble_rhs,
        mass_matrix,
    )
    from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mesh = piston_mesh(n)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    levels = list(range(1, agg.n_levels - 1)) or [agg.n_levels - 1]
    handlers, parents = build_rtree_hierarchy(mesh, agg, levels,
                                              degree=degree)
    ah = handlers[-1]

    def g_dirichlet(x):
        # hot on the crown (id 1 faces have z high), cool at the bottom
        return jnp.where(x[..., 2] > 0.5, t_hot, t_cool)

    dir_ids = (1, 2)

    def asm_level(h):
        K = assemble_sipg_matrix(h, dtype=dtype, dirichlet_ids=dir_ids)
        M = mass_matrix(h, dtype=dtype)
        return K.add(M.scale(reaction))

    from polydeal_tpu.solvers.multigrid import Multigrid, Transfer, build_embedding

    transfers = [
        Transfer(E=build_embedding(handlers[l], handlers[l + 1], parents[l],
                                   dtype=dtype),
                 parent=parents[l], n_coarse=handlers[l].n_poly)
        for l in range(len(handlers) - 1)
    ]
    matrices = [asm_level(h) for h in handlers]
    mg = Multigrid.setup(matrices, transfers)
    b = assemble_rhs(ah, lambda x: jnp.zeros(x.shape[:-1]), g_dirichlet,
                     dtype=dtype, dirichlet_ids=dir_ids,
                     neumann_fn=lambda x, nrm: jnp.zeros(x.shape[:-1]))
    res = mg.solve_cg(b, rtol=rtol, maxiter=200)

    # physical sanity: solution bounded by the Dirichlet data (maximum
    # principle up to DG wiggle) and monotone-ish in z
    from polydeal_tpu.postprocess import evaluate_at_quadrature

    uq, _ = evaluate_at_quadrature(ah, res.x)
    out = dict(
        n_cells=mesh.n_cells,
        n_poly=ah.n_poly,
        n_dofs=ah.n_dofs,
        iterations=int(res.iterations),
        residual=float(res.residual),
        u_min=float(uq.min()),
        u_max=float(uq.max()),
    )
    if verbose:
        print(f"piston: cells={out['n_cells']} polytopes={out['n_poly']} "
              f"dofs={out['n_dofs']} iters={out['iterations']} "
              f"u∈[{out['u_min']:.3f}, {out['u_max']:.3f}]")
    return out, (ah, res)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--degree", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vtu", default=None, help="write solution VTU")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    out, (ah, res) = solve_piston(args.n, args.degree)
    if args.vtu:
        from polydeal_tpu.io import write_vtu
        from polydeal_tpu.postprocess import interpolate_to_fine_grid

        uf = interpolate_to_fine_grid(ah, res.x)
        write_vtu(args.vtu, ah.mesh, point_data={"u": np.asarray(uf)})
        print(f"wrote {args.vtu}")


if __name__ == "__main__":
    main()
