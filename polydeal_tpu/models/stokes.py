"""Stokes flow with vector DG on polytopal meshes.

Foundation for the reference's coupled-flow family
(examples/darcy_stokes.cc, examples/oseen.cc — FESystem(FE_AggloDGP^dim,
FE_AggloDGP) per subdomain, darcy_stokes.cc:602-606): mixed
[DGP_p]^dim velocity × DGP_{p-1} pressure on the agglomerated mesh.

Discretization:
  a(u,v)  = component-wise SIPG Laplacian (the scalar kernel reused per
            velocity component),
  b(v,q)  = -∫ q div v + ∫_F {q} [v]·n + ∫_∂Ω q v·n,
  c(p,q)  = δ Σ_F h_F ∫_F [p][q]   (pressure-jump stabilization)

System  [[A, Bᵀ], [B, -C]] (u, p) = (F, G); mean pressure pinned.  The
vector unknown layout is component-major: u dofs [P, dim, nbv] flattened,
then pressure [P, nbp].

Round-1 scope: assembled operators + dense solve for correctness
(exactness of divergence-free linear flow, divergence control); the
MG-preconditioned Uzawa/Schur path is a follow-up.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_stokes_operators(ah, degree_u=None, dtype=None, delta=0.1):
    import jax
    import jax.numpy as jnp
    from polydeal_tpu.assembly import (
        assemble_sipg_matrix,
        build_volume_tables,
        build_face_tables,
        default_penalty_constant,
    )
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.sparse import BlockMatrix

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    dim = ah.dim
    degree_u = degree_u or ah.degree
    assert degree_u >= 1
    basis_u = LegendreDGP(dim, degree_u)
    basis_p = LegendreDGP(dim, degree_u - 1)
    nbv, nbp = basis_u.n_basis, basis_p.n_basis
    P = ah.n_poly

    vol_u = build_volume_tables(ah, dtype, basis=basis_u)
    vol_p = build_volume_tables(ah, dtype, basis=basis_p)
    fi_u, fb_u = build_face_tables(ah, dtype, basis=basis_u)
    fi_p, fb_p = build_face_tables(ah, dtype, basis=basis_p)

    # ---- A: scalar SIPG, applied per component
    A_scalar = assemble_sipg_matrix(ah, dtype=dtype, vol=vol_u,
                                    faces=(fi_u, fb_u))

    # ---- B: pressure-velocity coupling, block rows=pressure, cols=(d, v)
    c2p = jnp.asarray(vol_u.cell2poly)
    # volume: -∫ q ∂_d v_d  -> [n_c, nbp, nbv, dim]
    Bv_cell = -jnp.einsum("cqi,cqjd,cq->cijd", vol_p.B, vol_u.G, vol_u.w)
    B_diag = jax.ops.segment_sum(Bv_cell, c2p, num_segments=P)

    rows = [np.arange(P)]
    cols = [np.arange(P)]
    datas = [B_diag]
    # interior faces: + ∫ {q}[v]·n  ({q} = (q0+q1)/2, [v] = v0 - v1)
    n_ = fi_u.n
    w_ = fi_u.w

    def fblk(qB, vB, sign):
        return sign * 0.5 * jnp.einsum("fqi,fqj,fqd,fq->fijd", qB, vB, n_, w_)

    f_in = jnp.asarray(fi_u.poly_in)
    f_out = jnp.asarray(fi_u.poly_out)
    B_diag2 =jax.ops.segment_sum(fblk(fi_p.B0, fi_u.B0, +1.0), f_in, num_segments=P)
    B_diag2 = B_diag2 + jax.ops.segment_sum(
        fblk(fi_p.B1, fi_u.B1, -1.0), f_out, num_segments=P)
    datas[0] = datas[0] + B_diag2
    key = fi_u.poly_in.astype(np.int64) * P + fi_u.poly_out
    pairs, pair_id = np.unique(key, return_inverse=True)
    pid = jnp.asarray(pair_id)
    n_pairs = pairs.shape[0]
    B01 = jax.ops.segment_sum(fblk(fi_p.B0, fi_u.B1, -1.0), pid, num_segments=n_pairs)
    B10 = jax.ops.segment_sum(fblk(fi_p.B1, fi_u.B0, +1.0), pid, num_segments=n_pairs)
    rows += [(pairs // P), (pairs % P)]
    cols += [(pairs % P), (pairs // P)]
    datas += [B01, B10]
    # boundary faces: + ∫ q v·n
    if fb_u.poly_in.shape[0]:
        Bb = jnp.einsum("fqi,fqj,fqd,fq->fijd", fb_p.B0, fb_u.B0, fb_u.n, fb_u.w)
        datas[0] = datas[0] + jax.ops.segment_sum(
            Bb, jnp.asarray(fb_u.poly_in), num_segments=P)

    # flatten (d, jv) into one column-block axis of size dim*nbv
    data = jnp.concatenate(
        [d.transpose(0, 1, 3, 2).reshape(d.shape[0], nbp, dim * nbv)
         for d in datas], axis=0)
    B = BlockMatrix.from_blocks(np.concatenate(rows), np.concatenate(cols),
                                data, P, P)

    # ---- C: pressure jump stabilization  δ Σ h_F ∫ [p][q]
    hf = fi_p.h_f[:, None]
    wC = fi_p.w * hf * delta
    C00 = jnp.einsum("fqi,fqj,fq->fij", fi_p.B0, fi_p.B0, wC)
    C11 = jnp.einsum("fqi,fqj,fq->fij", fi_p.B1, fi_p.B1, wC)
    C01 = -jnp.einsum("fqi,fqj,fq->fij", fi_p.B0, fi_p.B1, wC)
    C10 = -jnp.einsum("fqi,fqj,fq->fij", fi_p.B1, fi_p.B0, wC)
    Cd = jax.ops.segment_sum(C00, f_in, num_segments=P) + \
        jax.ops.segment_sum(C11, f_out, num_segments=P)
    C01m = jax.ops.segment_sum(C01, pid, num_segments=n_pairs)
    C10m = jax.ops.segment_sum(C10, pid, num_segments=n_pairs)
    C = BlockMatrix.from_blocks(
        np.concatenate([np.arange(P), pairs // P, pairs % P]),
        np.concatenate([np.arange(P), pairs % P, pairs // P]),
        jnp.concatenate([Cd, C01m, C10m], axis=0), P, P)

    meta = dict(dim=dim, nbv=nbv, nbp=nbp, P=P, basis_u=basis_u,
                basis_p=basis_p, vol_u=vol_u, vol_p=vol_p,
                fi_u=fi_u, fb_u=fb_u, fi_p=fi_p, fb_p=fb_p,
                penalty=default_penalty_constant(degree_u, dim))
    return A_scalar, B, C, meta


def stokes_rhs(ah, meta, f_fn, g_fn, dtype=None):
    """RHS: (F_v) = ∫ f·v + velocity-Dirichlet Nitsche terms per component;
    (G_q) = ∫_∂ q g·n (from b's boundary term)."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = meta["vol_u"].B.dtype
    dim, nbv, nbp, P = meta["dim"], meta["nbv"], meta["nbp"], meta["P"]
    vol_u, fb_u, fb_p = meta["vol_u"], meta["fb_u"], meta["fb_p"]
    gamma_c = meta["penalty"]
    c2p = jnp.asarray(vol_u.cell2poly)

    fv = f_fn(vol_u.x)  # [n_c, q, dim]
    Fc = jnp.einsum("cqi,cqd,cq->cdi", vol_u.B, fv, vol_u.w)
    F = jax.ops.segment_sum(Fc, c2p, num_segments=P)  # [P, dim, nbv]

    G = jnp.zeros((P, nbp), dtype=dtype)
    if fb_u.poly_in.shape[0]:
        gv = g_fn(fb_u.x)  # [n_f, q, dim]
        gamma = (gamma_c / fb_u.h_f)[:, None]
        gn = jnp.einsum("fqid,fqd->fqi", fb_u.G0, fb_u.n)
        # per component: ∫ (-∂n v + γ v) g_d
        Ff = jnp.einsum("fqi,fqd,fq->fdi", fb_u.B0 * gamma[..., None] - gn,
                        gv, fb_u.w)
        F = F + jax.ops.segment_sum(Ff, jnp.asarray(fb_u.poly_in),
                                    num_segments=P)
        # G_q += ∫ q g·n (consistency with b's boundary term)
        gq = jnp.einsum("fqi,fqd,fqd,fq->fi", fb_p.B0, gv, fb_u.n, fb_u.w)
        G = G + jax.ops.segment_sum(gq, jnp.asarray(fb_u.poly_in),
                                    num_segments=P)
    return F.reshape(-1), G.reshape(-1)


def solve_stokes_dense(ah, f_fn, g_fn, degree_u=None, delta=0.1, dtype=None):
    """Assemble the full saddle system densely and solve with the mean
    pressure pinned (correctness path; small problems)."""
    import jax.numpy as jnp
    import numpy as np

    A_s, B, C, meta = build_stokes_operators(ah, degree_u, dtype, delta)
    dim, nbv, nbp, P = meta["dim"], meta["nbv"], meta["nbp"], meta["P"]
    nU, nP = P * dim * nbv, P * nbp

    # component-major expansion of the scalar SIPG into the velocity block
    Afull = np.zeros((nU, nU))
    Adata = np.asarray(A_s.data)
    for k in range(Adata.shape[0]):
        r, c = A_s.rows[k], A_s.cols[k]
        for d in range(dim):
            r0 = (r * dim + d) * nbv
            c0 = (c * dim + d) * nbv
            Afull[r0:r0 + nbv, c0:c0 + nbv] += Adata[k]
    Bd = np.asarray(B.to_dense())  # [nP, nU]
    Cd = np.asarray(C.to_dense())
    K = np.zeros((nU + nP, nU + nP))
    K[:nU, :nU] = Afull
    K[:nU, nU:] = Bd.T
    K[nU:, :nU] = Bd
    K[nU:, nU:] = -Cd

    F, G = stokes_rhs(ah, meta, f_fn, g_fn, dtype)
    rhs = np.concatenate([np.asarray(F), np.asarray(G)])
    # zero-mean pressure via symmetric rank-1 regularization K + m mᵀ
    # (m = pressure-mean functional): keeps the system structure intact
    # (row replacement destroys symmetry) and the solution automatically
    # satisfies mᵀx = 0
    m = pressure_mean_vector(ah, meta)
    K = K + np.outer(m, m)
    sol = np.linalg.solve(K, rhs)
    U = jnp.asarray(sol[:nU])
    Pr = jnp.asarray(sol[nU:])
    return U, Pr, meta


def pressure_mean_vector(ah, meta):
    """m with mᵀx = ∫_Ω p for the (u, p) layout: per-polytope integrals
    of the pressure basis over the composite quadrature."""
    import jax
    import jax.numpy as jnp

    vol_p = meta["vol_p"]
    dim, nbv, nbp, P = meta["dim"], meta["nbv"], meta["nbp"], meta["P"]
    ints = jnp.einsum("cqi,cq->ci", vol_p.B, vol_p.w)
    mp = jax.ops.segment_sum(ints, jnp.asarray(vol_p.cell2poly),
                             num_segments=P)
    return np.concatenate([np.zeros(P * dim * nbv),
                           np.asarray(mp).reshape(-1)])


def pressure_errors(ah, meta, Pr, exact_p):
    """L2 error of the pressure field vs a zero-mean exact pressure."""
    import jax.numpy as jnp

    vol_p = meta["vol_p"]
    nbp, P = meta["nbp"], meta["P"]
    Pb = Pr.reshape(P, nbp)[jnp.asarray(vol_p.cell2poly)]
    vals = jnp.einsum("cqi,ci->cq", vol_p.B, Pb)
    pex = exact_p(vol_p.x)
    mean = jnp.sum(vol_p.w * pex) / vol_p.w.sum()
    diff = vals - (pex - mean)
    return float(jnp.sqrt(jnp.sum(vol_p.w * diff**2)))


def velocity_errors(ah, meta, U, exact_u):
    """L2 error of the velocity field."""
    import jax.numpy as jnp

    vol_u = meta["vol_u"]
    dim, nbv, P = meta["dim"], meta["nbv"], meta["P"]
    Ub = U.reshape(P, dim, nbv)[jnp.asarray(vol_u.cell2poly)]  # [n_c,dim,nbv]
    vals = jnp.einsum("cqi,cdi->cqd", vol_u.B, Ub)
    diff = vals - exact_u(vol_u.x)
    return float(jnp.sqrt(jnp.sum(vol_u.w[..., None] * diff**2)))


def divergence_norm(ah, meta, U):
    import jax.numpy as jnp

    vol_u = meta["vol_u"]
    dim, nbv, P = meta["dim"], meta["nbv"], meta["P"]
    Ub = U.reshape(P, dim, nbv)[jnp.asarray(vol_u.cell2poly)]
    div = jnp.einsum("cqid,cdi->cq", vol_u.G, Ub)
    return float(jnp.sqrt(jnp.sum(vol_u.w * div**2)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--degree", type=int, default=2)
    ap.add_argument("--n-agglomerates", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition

    m = pd.hyper_cube(2, args.n)
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors,
                                   args.n_agglomerates)
    ah = pd.AgglomerationHandler(m, c2p, degree=args.degree)
    # rigid-rotation-like exact flow u = (y, x) (divergence-free, Δu = 0),
    # p = 0; f = 0
    u_ex = lambda x: jnp.stack([x[..., 1], x[..., 0]], axis=-1)
    f = lambda x: jnp.zeros_like(x)
    U, Pr, meta = solve_stokes_dense(ah, f, u_ex, degree_u=args.degree)
    print(f"velocity L2 error: {velocity_errors(ah, meta, U, u_ex):.3e}")
    print(f"||div u_h||: {divergence_norm(ah, meta, U):.3e}")


if __name__ == "__main__":
    main()
