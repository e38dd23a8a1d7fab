"""Per-polytope polynomial degree (hp) on one polytopal mesh.

TPU-native recast of the reference's hp machinery — an FECollection with
a different active FE per polytope
(reference source/agglomeration_handler.cc:381-474 hp
``distribute_agglomerated_dofs``; test/polydeal/fe_collection_agglomeration.cc):
instead of per-cell active_fe_index dispatch, polytopes are BUCKETED by
degree and each bucket becomes one :class:`~polydeal_tpu.fem.system.Field`
over its polytope subset — all shapes static, no masking in the compute
path.  Interior faces split into (degree_in, degree_out) classes; the
mixed-degree classes assemble rectangular SIPG blocks through the same
kernels as the coupled apps (assembly/mixed.py).

Penalty on a face uses the LARGER side's degree (the reference's
fe-domination convention): gamma = 10 (p_max + dim)(p_max + 1) / h_f.
"""

from __future__ import annotations

import numpy as np

__all__ = ["build_hp_poisson", "solve_hp_dense", "hp_l2_error",
           "interpolate_hp_to_fine_grid"]


def build_hp_poisson(ah, degrees, f_fn, g_fn=None):
    """Assemble the SIPG Laplacian with per-polytope degree.

    degrees: [n_poly] int array.  Returns (space, op, rhs_vector).
    """
    import jax
    import jax.numpy as jnp

    from polydeal_tpu.assembly.mixed import (
        MixedOperator,
        MixedRhs,
        face_side_tables,
        scalar_interior_blocks,
    )
    from polydeal_tpu.assembly.sipg import (
        build_volume_tables,
        default_penalty_constant,
    )
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.fem.system import Field, SystemSpace

    dim = ah.dim
    dtype = jnp.zeros(0).dtype
    degrees = np.asarray(degrees, dtype=np.int64)
    assert degrees.shape[0] == ah.n_poly
    degs = sorted(int(d) for d in np.unique(degrees))
    if ah.n_quad < max(degs) + 1:
        # the shape tables are evaluated at the HANDLER's composite
        # quadrature; p+1 Gauss points per direction are needed for the
        # degree-2p stiffness/penalty integrands (under-integration
        # surfaces as O(1e-5) exactness loss at p=3)
        raise ValueError(
            f"handler n_quad={ah.n_quad} under-integrates hp degree "
            f"{max(degs)}; build the AgglomerationHandler with "
            f"n_quad >= {max(degs) + 1}")
    bases = {d: LegendreDGP(dim, d) for d in degs}
    fields = [
        Field(f"u{d}", bases[d], 1, np.where(degrees == d)[0]) for d in degs
    ]
    space = SystemSpace(ah, fields)
    loc = {d: space.local_poly(f"u{d}") for d in degs}

    op = MixedOperator(space)
    rhs = MixedRhs(space)
    c2p = ah.cell2poly

    # ---- volume: one stiffness einsum per degree bucket
    vols = {d: build_volume_tables(ah, dtype, basis=bases[d]) for d in degs}
    for d in degs:
        cells = np.where(degrees[c2p] == d)[0]
        if not cells.size:
            continue
        v = vols[d]
        G, w = v.G[cells], v.w[cells]
        K = jnp.einsum("cqid,cqjd,cq->cij", G, G, w)
        rows = loc[d][c2p[cells]]
        op.add(f"u{d}", f"u{d}", rows, rows, K)
        fv = f_fn(v.x[cells])
        rhs.add(f"u{d}", rows, jnp.einsum("cqi,cq,cq->ci",
                                          v.B[cells], w, fv))

    # ---- interior faces by (deg_in, deg_out) class
    ft = ah.faces
    is_b = ft.poly_out < 0
    din = degrees[ft.poly_in]
    dout = np.where(is_b, -1, degrees[np.maximum(ft.poly_out, 0)])
    for da in degs:
        for db in degs:
            m = (~is_b) & (din == da) & (dout == db)
            if not m.any():
                continue
            fsel = ft._select(m)
            B0, G0 = face_side_tables(bases[da], fsel, 0, ah.extents, dtype)
            B1, G1 = face_side_tables(bases[db], fsel, 1, ah.extents, dtype)
            pmax = max(da, db)
            sigma = (default_penalty_constant(pmax, dim)
                     / np.asarray(fsel.h_f))
            blocks = scalar_interior_blocks(
                (B0, B1), (G0, G1), jnp.asarray(fsel.weights, dtype),
                jnp.asarray(fsel.normals, dtype), jnp.asarray(sigma, dtype))
            names = (f"u{da}", f"u{db}")
            sides = (loc[da][fsel.poly_in], loc[db][fsel.poly_out])
            for (s, t), val in blocks.items():
                op.add(names[s], names[t], sides[s], sides[t], val)

    # ---- boundary Nitsche per bucket
    for d in degs:
        m = is_b & (din == d)
        if not m.any():
            continue
        fsel = ft._select(m)
        B0, G0 = face_side_tables(bases[d], fsel, 0, ah.extents, dtype)
        w = jnp.asarray(fsel.weights, dtype)
        nrm = jnp.asarray(fsel.normals, dtype)
        gamma = jnp.asarray(
            default_penalty_constant(d, dim) / np.asarray(fsel.h_f), dtype)
        gn = jnp.einsum("fqid,fqd->fqi", G0, nrm)
        Mb = (-jnp.einsum("fqi,fqj,fq->fij", B0, gn, w)
              - jnp.einsum("fqi,fqj,fq->fij", gn, B0, w)
              + jnp.einsum("fqi,fqj,fq->fij", B0, B0,
                           w * gamma[:, None]))
        rows = loc[d][fsel.poly_in]
        op.add(f"u{d}", f"u{d}", rows, rows, Mb)
        if g_fn is not None:
            gv = g_fn(jnp.asarray(fsel.points_real, dtype))
            rb = jnp.einsum("fqi,fq,fq->fi",
                            B0 * gamma[:, None, None] - gn, w, gv)
            rhs.add(f"u{d}", rows, rb)

    return space, op, rhs.finalize()


def solve_hp_dense(space, op, rhs):
    """Direct solve (the test-scale path; iterative = gmres on
    op.matvec with op.block_jacobi)."""
    import jax.numpy as jnp

    return jnp.linalg.solve(op.to_dense(), rhs)


def interpolate_hp_to_fine_grid(space, ah, x, degree: int | None = None,
                                family: str = "dgq"):
    """Interpolate an hp solution to one fine-grid space: sum of the
    per-bucket field interpolations (each is zero outside its bucket's
    polytopes).  The target degree defaults to the max bucket degree —
    the reference's hp ``interpolate_to_fine_grid``
    (poly_utils.h:1322-1458) with the FECollection replaced by degree
    buckets.  Returns [n_cells, n_fine_basis]."""
    from polydeal_tpu.postprocess import interpolate_field_to_fine_grid

    if degree is None:
        degree = max(f.basis.degree for f in space.fields.values())
    total = None
    for name in space.fields:
        v = interpolate_field_to_fine_grid(space, ah, x, name,
                                           degree=degree, family=family)
        total = v if total is None else total + v
    return total[:, 0]


def hp_l2_error(ah, space, degrees, x, exact_fn):
    """Global L2 error of the hp solution vs an exact field."""
    import jax.numpy as jnp

    from polydeal_tpu.assembly.sipg import build_volume_tables
    from polydeal_tpu.fem.basis import LegendreDGP

    degrees = np.asarray(degrees)
    c2p = ah.cell2poly
    total = 0.0
    for d in sorted(int(v) for v in np.unique(degrees)):
        basis = LegendreDGP(ah.dim, d)
        vol = build_volume_tables(ah, jnp.zeros(0).dtype, basis=basis)
        cells = np.where(degrees[c2p] == d)[0]
        if not cells.size:
            continue
        f = space.fields[f"u{d}"]
        loc = space.local_poly(f"u{d}")
        ub = space.unpack(x, f"u{d}")[:, 0, :][loc[c2p[cells]]]
        vals = jnp.einsum("cqi,ci->cq", vol.B[cells], ub)
        diff = vals - exact_fn(vol.x[cells])
        total = total + jnp.sum(vol.w[cells] * diff**2)
    return float(jnp.sqrt(total))
