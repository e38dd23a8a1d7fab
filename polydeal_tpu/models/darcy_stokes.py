"""Coupled Stokes–Darcy flow with Beavers–Joseph–Saffman interface
coupling on agglomerated polytopal meshes.

TPU-native rebuild of the reference's largest application
(reference examples/darcy_stokes.cc): the unit square split at y = 1/2
into a Stokes region (top) and a Darcy region (bottom), discretized with
IPDG on polytopal agglomerates that never straddle the interface, and
verified against the Lipnikov–Vassilev–Yotov manufactured solution
(Numer. Math. 126:321-360, 2014 — the same one the reference uses,
darcy_stokes.cc:96-135).

Design differences from the reference (deliberate, TPU-first):

* the per-subdomain hp FESystem/FE_Nothing machinery
  (darcy_stokes.cc:600-608) becomes three :class:`Field`s on polytope
  subsets (velocity + Stokes pressure on the top polytopes, Darcy
  pressure on the bottom) — see ``polydeal_tpu/fem/system.py``;
* every face class (Stokes–Stokes, Darcy–Darcy, interface, two
  boundaries) is one static index selection + one batched einsum kernel
  (``polydeal_tpu/assembly/mixed.py``) instead of a polytope/face loop;
* manufactured right-hand sides are derived by jax autodiff from the
  exact solution (f_S = -ν Δu + ∇p_S etc.) instead of hand-coded
  formulas (darcy_stokes.cc:265-340) — transcription-proof;
* the mean-pressure constraint ∫(p_S + p_D) = 0 enters as a rank-1
  regularization m mᵀ of the system (m = pressure-mean functional)
  rather than pinning a dof and post-shifting
  (darcy_stokes.cc:1704-1716,1723-1776).

Physical parameters match the reference (darcy_stokes.cc:536-551):
ν = 0.1, K = I, α_BJ = 0.5, penalty constants 40 / 1 / 10.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

import numpy as np


# ----------------------------------------------------------------------
# Manufactured solution (Lipnikov–Vassilev–Yotov), parameters as in the
# reference darcy_stokes.cc:121-135.
NU = 0.1
KAPPA = 1.0
ALPHA_BJ = 0.5
OMEGA = 6.0


def _consts():
    G = np.sqrt(NU * KAPPA) / ALPHA_BJ
    xi = (1.0 - G) / (2.0 * (1.0 + G))
    chi = (-30.0 * xi - 17.0) / 48.0
    return G, xi, chi


def u_exact_fn():
    import jax.numpy as jnp

    _, xi, _ = _consts()

    def u(p):  # p: [..., 2] -> [..., 2]; defined on the Stokes side
        x, y = p[..., 0], p[..., 1]
        return jnp.stack([
            (2.0 - x) * (1.5 - y) * (y - xi),
            -y**3 / 3.0 + y**2 / 2.0 * (xi + 1.5) - 1.5 * xi * y - 0.5
            + jnp.sin(OMEGA * x),
        ], axis=-1)

    return u


def pS_exact_fn():
    import jax.numpy as jnp

    _, xi, chi = _consts()

    def pS(p):
        x, y = p[..., 0], p[..., 1]
        return (-(jnp.sin(OMEGA * x) + chi) / (2.0 * KAPPA)
                + NU * (0.5 - xi) + jnp.cos(jnp.pi * y))

    return pS


def pD_exact_fn():
    import jax.numpy as jnp

    _, _, chi = _consts()

    def pD(p):
        x, y = p[..., 0], p[..., 1]
        return (-(chi * (y + 0.5) ** 2) / (2.0 * KAPPA)
                - jnp.sin(OMEGA * x) * y / KAPPA)

    return pD


def manufactured_rhs():
    """f_S = -ν Δu + ∇p_S and f_D = -∇·(K ∇p_D) via jax autodiff —
    replaces the reference's hand-derived RightHandSide_{S,D}
    (darcy_stokes.cc:265-340)."""
    import jax
    import jax.numpy as jnp

    u, pS, pD = u_exact_fn(), pS_exact_fn(), pD_exact_fn()

    def f_S_point(p):  # p: [2]
        lap = jnp.trace(jax.hessian(lambda q: u(q))(p), axis1=1, axis2=2)
        return -NU * lap + jax.grad(pS)(p)

    def f_D_point(p):
        return -KAPPA * jnp.trace(jax.hessian(pD)(p))

    f_S = jax.vmap(f_S_point)
    f_D = jax.vmap(f_D_point)

    def gD_point(p, n):  # Neumann datum -K ∇p_D · n
        return -KAPPA * jnp.dot(jax.grad(pD)(p), n)

    g_D = jax.vmap(gD_point)
    return (lambda x: f_S(x.reshape(-1, 2)).reshape(x.shape),
            lambda x: f_D(x.reshape(-1, 2)).reshape(x.shape[:-1]),
            lambda x, n: g_D(x.reshape(-1, 2),
                             n.reshape(-1, 2)).reshape(x.shape[:-1]))


# ----------------------------------------------------------------------
@dataclass
class StokesDarcySystem:
    space: object
    op: object  # MixedOperator
    rhs: object  # jnp vector
    meta: dict


def build_darcy_stokes(ah, domain_id, degree_v=2, degree_pS=1, degree_pD=1,
                       penalty_v=40.0, penalty_pS=1.0, penalty_pD=10.0,
                       u_dirichlet=None, f_S=None, f_D=None, g_D=None):
    """Assemble the coupled Stokes–Darcy IPDG system.

    ``domain_id[p]`` = 0 for Stokes polytopes, 1 for Darcy.  Agglomerates
    must not straddle the interface (the reference enforces this with one
    R-tree per subdomain, darcy_stokes.cc:806-822).

    Default data: the manufactured solution above (pass explicit
    callables to override).
    """
    import jax.numpy as jnp

    from polydeal_tpu.assembly.mixed import (
        MixedOperator, MixedRhs, swap_sides, face_side_tables,
        stokes_interior_blocks, stokes_boundary_blocks, stokes_boundary_rhs,
        scalar_interior_blocks, bjs_interface_blocks, expand_vector_blocks,
    )
    from polydeal_tpu.assembly.sipg import build_volume_tables
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.fem.system import Field, SystemSpace

    dim = ah.dim
    assert dim == 2, "Stokes–Darcy app is 2D (parity with the reference)"
    dtype = jnp.zeros(0).dtype  # follow jax_enable_x64
    domain_id = np.asarray(domain_id)
    sp_polys = np.where(domain_id == 0)[0]
    da_polys = np.where(domain_id == 1)[0]

    bv = LegendreDGP(dim, degree_v)
    bpS = LegendreDGP(dim, degree_pS)
    bpD = LegendreDGP(dim, degree_pD)
    fields = [
        Field("u", bv, dim, sp_polys),
        Field("pS", bpS, 1, sp_polys),
        Field("pD", bpD, 1, da_polys),
    ]
    space = SystemSpace(ah, fields)
    loc_s = space.local_poly("u")
    loc_d = space.local_poly("pD")

    if u_dirichlet is None:
        u_dirichlet = u_exact_fn()
    if f_S is None or f_D is None or g_D is None:
        mf_S, mf_D, mg_D = manufactured_rhs()
        f_S = f_S or mf_S
        f_D = f_D or mf_D
        g_D = g_D or mg_D

    op = MixedOperator(space)
    rhs = MixedRhs(space)
    diam = ah.diameters

    # ---------------- volume terms --------------------------------
    vol_v = build_volume_tables(ah, dtype, basis=bv)
    vol_pS = build_volume_tables(ah, dtype, basis=bpS)
    vol_pD = build_volume_tables(ah, dtype, basis=bpD)
    c2p = ah.cell2poly
    cs = np.where(domain_id[c2p] == 0)[0]  # Stokes fine cells
    cd = np.where(domain_id[c2p] == 1)[0]
    rows_s = loc_s[c2p[cs]]
    rows_d = loc_d[c2p[cd]]

    Gv, wv = vol_v.G[cs], vol_v.w[cs]
    # ν ∇v:∇u (per component) — scalar stiffness ⊗ I_dim
    Ks = NU * jnp.einsum("cqid,cqjd,cq->cij", Gv, Gv, wv)
    op.add("u", "u", rows_s, rows_s, expand_vector_blocks(Ks, dim))
    # - (∇·v) p + q (∇·u):  div of component-d test fn i = G[:, :, i, d]
    BpSs = vol_pS.B[cs]
    vp = -jnp.einsum("cqid,cqj,cq->cdij", Gv, BpSs, wv)
    c_, d_, i_, j_ = vp.shape
    op.add("u", "pS", rows_s, rows_s, vp.reshape(c_, d_ * i_, j_))
    pv = jnp.einsum("cqi,cqjd,cq->cidj", BpSs, Gv, wv)
    op.add("pS", "u", rows_s, rows_s, pv.reshape(c_, j_, d_ * i_))
    # Darcy volume: K ∇q·∇p
    Gd, wd = vol_pD.G[cd], vol_pD.w[cd]
    Kd = KAPPA * jnp.einsum("cqid,cqjd,cq->cij", Gd, Gd, wd)
    op.add("pD", "pD", rows_d, rows_d, Kd)
    # volume rhs
    fSv = f_S(vol_v.x[cs])  # [c, q, dim]
    rv = jnp.einsum("cqi,cqd,cq->cdi", vol_v.B[cs], fSv, wv)
    rhs.add("u", rows_s, rv)
    fDv = f_D(vol_pD.x[cd])
    rhs.add("pD", rows_d, jnp.einsum("cqi,cq,cq->ci", vol_pD.B[cd], fDv, wd))

    # ---------------- face classification -------------------------
    ft = ah.faces
    dom_in = domain_id[ft.poly_in]
    dom_out = np.where(ft.poly_out >= 0, domain_id[np.maximum(ft.poly_out, 0)], -1)
    is_b = ft.poly_out < 0
    m_ss = (~is_b) & (dom_in == 0) & (dom_out == 0)
    m_dd = (~is_b) & (dom_in == 1) & (dom_out == 1)
    m_sd = (~is_b) & (dom_in != dom_out)
    m_bs = is_b & (dom_in == 0)
    m_bd = is_b & (dom_in == 1)

    def tau_v(p):
        return NU * (degree_v + 1) * (degree_v + dim) / diam[p]

    # ---- Stokes–Stokes interior faces
    if m_ss.any():
        fss = ft._select(m_ss)
        Bv0, Gv0 = face_side_tables(bv, fss, 0, ah.extents, dtype)
        Bv1, Gv1 = face_side_tables(bv, fss, 1, ah.extents, dtype)
        Bp0, _ = face_side_tables(bpS, fss, 0, ah.extents, dtype)
        Bp1, _ = face_side_tables(bpS, fss, 1, ah.extents, dtype)
        sigma_v = penalty_v * np.maximum(tau_v(fss.poly_in),
                                         tau_v(fss.poly_out))
        zeta = diam / NU
        sigma_p = penalty_pS * np.maximum(zeta[fss.poly_in],
                                          zeta[fss.poly_out])
        blocks = stokes_interior_blocks(
            (Bv0, Bv1), (Gv0, Gv1), (Bp0, Bp1), jnp.asarray(fss.weights, dtype),
            jnp.asarray(fss.normals, dtype), jnp.asarray(sigma_v, dtype),
            jnp.asarray(sigma_p, dtype), NU)
        sides = (loc_s[fss.poly_in], loc_s[fss.poly_out])
        name = {"v": "u", "p": "pS"}
        for ((kt, st), (kl, sl)), val in blocks.items():
            op.add(name[kt], name[kl], sides[st], sides[sl], val)

    # ---- Darcy–Darcy interior faces
    if m_dd.any():
        fdd = ft._select(m_dd)
        B0, G0 = face_side_tables(bpD, fdd, 0, ah.extents, dtype)
        B1, G1 = face_side_tables(bpD, fdd, 1, ah.extents, dtype)
        tau = KAPPA * (degree_pD + 1) * (degree_pD + dim) / diam
        sigma = penalty_pD * np.maximum(tau[fdd.poly_in], tau[fdd.poly_out])
        blocks = scalar_interior_blocks(
            (B0, B1), (G0, G1), jnp.asarray(fdd.weights, dtype),
            jnp.asarray(fdd.normals, dtype), jnp.asarray(sigma, dtype),
            kappa=KAPPA)
        sides = (loc_d[fdd.poly_in], loc_d[fdd.poly_out])
        for (s, t), val in blocks.items():
            op.add("pD", "pD", sides[s], sides[t], val)

    # ---- Stokes–Darcy interface (BJS): orient side 0 = Stokes
    if m_sd.any():
        fsd = swap_sides(ft._select(m_sd), diam, dom_in[m_sd] == 1)
        Bv0, _ = face_side_tables(bv, fsd, 0, ah.extents, dtype)
        BpD1, _ = face_side_tables(bpD, fsd, 1, ah.extents, dtype)
        nu_over_G = ALPHA_BJ * np.sqrt(NU) / np.sqrt(KAPPA)
        blocks = bjs_interface_blocks(
            Bv0, BpD1, jnp.asarray(fsd.weights, dtype),
            jnp.asarray(fsd.normals, dtype), nu_over_G)
        ls, ld = loc_s[fsd.poly_in], loc_d[fsd.poly_out]
        op.add("u", "pD", ls, ld, blocks[("v", "p")])
        op.add("pD", "u", ld, ls, blocks[("p", "v")])
        op.add("u", "u", ls, ls, blocks[("v", "v")])

    # ---- Stokes outer boundary (Dirichlet velocity)
    if m_bs.any():
        fbs = ft._select(m_bs)
        Bv0, Gv0 = face_side_tables(bv, fbs, 0, ah.extents, dtype)
        Bp0, _ = face_side_tables(bpS, fbs, 0, ah.extents, dtype)
        w_, n_ = jnp.asarray(fbs.weights, dtype), jnp.asarray(fbs.normals, dtype)
        sigma_v = jnp.asarray(penalty_v * tau_v(fbs.poly_in), dtype)
        blocks = stokes_boundary_blocks(Bv0, Gv0, Bp0, w_, n_, sigma_v, NU)
        lb = loc_s[fbs.poly_in]
        op.add("u", "u", lb, lb, blocks[("v", "v")])
        op.add("u", "pS", lb, lb, blocks[("v", "p")])
        op.add("pS", "u", lb, lb, blocks[("p", "v")])
        g = u_dirichlet(jnp.asarray(fbs.points_real, dtype))
        rv, rp = stokes_boundary_rhs(Bv0, Gv0, Bp0, w_, n_, sigma_v, NU, g)
        rhs.add("u", lb, rv)
        rhs.add("pS", lb, rp)

    # ---- Darcy outer boundary (Neumann): rhs only
    if m_bd.any():
        fbd = ft._select(m_bd)
        B0, _ = face_side_tables(bpD, fbd, 0, ah.extents, dtype)
        gD = g_D(jnp.asarray(fbd.points_real, dtype),
                 jnp.asarray(fbd.normals, dtype))
        rb = -jnp.einsum("fqi,fq,fq->fi", B0, gD,
                         jnp.asarray(fbd.weights, dtype))
        rhs.add("pD", loc_d[fbd.poly_in], rb)

    meta = dict(dim=dim, domain_id=domain_id, vol_v=vol_v, vol_pS=vol_pS,
                vol_pD=vol_pD, cells_s=cs, cells_d=cd, rows_s=rows_s,
                rows_d=rows_d, degree_v=degree_v)
    return StokesDarcySystem(space=space, op=op, rhs=rhs.finalize(), meta=meta)


def pressure_mean_vector(sys: StokesDarcySystem):
    """m with mᵀx = ∫_ΩS p_S + ∫_ΩD p_D (the zero-mean functional,
    reference darcy_stokes.cc:1723-1776)."""
    import jax
    import jax.numpy as jnp

    sp = sys.space
    meta = sys.meta
    parts = {"u": jnp.zeros((sp.fields["u"].n_polys, sp.fields["u"].block))}
    for name, vol, cells, rows in (("pS", meta["vol_pS"], meta["cells_s"],
                                    meta["rows_s"]),
                                   ("pD", meta["vol_pD"], meta["cells_d"],
                                    meta["rows_d"])):
        ints = jnp.einsum("cqi,cq->ci", vol.B[cells], vol.w[cells])
        parts[name] = jax.ops.segment_sum(
            ints, jnp.asarray(rows), num_segments=sp.fields[name].n_polys)
    return sp.pack(parts)


def solve_darcy_stokes_dense(sys: StokesDarcySystem):
    """Direct solve with the rank-1 zero-mean regularization (the
    analogue of the reference's UMFPACK + dof pinning,
    darcy_stokes.cc:1688-1716)."""
    import jax.numpy as jnp

    K = sys.op.to_dense()
    m = pressure_mean_vector(sys)
    K = K + jnp.outer(m, m)
    return jnp.linalg.solve(K, sys.rhs)


def solve_darcy_stokes_iterative(sys: StokesDarcySystem, rtol: float = 1e-10,
                                 restart: int = 60, max_restarts: int = 200):
    """Matrix-free iterative solve: GMRES(restart) on the coupled block
    operator (+ rank-1 zero-mean regularization) with a field-wise
    block-Jacobi preconditioner — the TPU-scale replacement for the
    reference's UMFPACK factorization (darcy_stokes.cc:1688-1696)."""
    import jax.numpy as jnp

    from polydeal_tpu.solvers.gmres import gmres_solve

    m = pressure_mean_vector(sys)
    M = sys.op.block_jacobi()

    def A(v):
        return sys.op.matvec(v) + m * jnp.vdot(m, v)

    return gmres_solve(A, sys.rhs, M=M, restart=restart, rtol=rtol,
                       max_restarts=max_restarts)


def block_hierarchy(mesh, n: int, block: int, degree: int):
    """Nested block-agglomeration chain (coarse -> fine) whose finest
    level matches :func:`run`'s c2p ordering — the geometric hierarchy
    feeding the field-wise R3MG preconditioner below.

    Returns (handlers, parents).
    """
    import polydeal_tpu as pd

    bs = n // block
    sides = [bs]
    while sides[-1] % 2 == 0 and sides[-1] > 2:
        sides.append(sides[-1] // 2)
    sides = sides[::-1]  # coarse -> fine
    centers = mesh.cell_centers()
    c2ps = []
    for s in sides:
        blk = n // s
        bx = np.minimum((centers[:, 0] * n // blk).astype(int), s - 1)
        by = np.minimum((centers[:, 1] * n // blk).astype(int), s - 1)
        c2ps.append((bx * s + by).astype(np.int32))
    handlers = [pd.AgglomerationHandler(mesh, c, degree=degree)
                for c in c2ps]
    parents = []
    for li in range(len(sides) - 1):
        s = sides[li + 1]
        ids = np.arange(s * s)
        bx, by = ids // s, ids % s
        parents.append(((bx // 2) * (s // 2) + by // 2).astype(np.int64))
    return handlers, parents


def mg_block_preconditioner(sys: StokesDarcySystem, mesh, n: int,
                            block: int, nu: float | None = None,
                            kappa: float | None = None,
                            penalty_v: float = 40.0,
                            source: str = "system",
                            ps_mode: str = "bj",
                            structure: str = "diag"):
    """Field-wise R3MG preconditioner for the coupled GMRES solve
    (improves on the reference's sparse direct solver,
    darcy_stokes.cc:1688-1696):

      u  : V-cycle on the velocity block — with ``source='system'``
           (default) the Galerkin hierarchy of the coupled system's TRUE
           u-u block (SIPG + BJS tangential interface terms + the
           subdomain's actual boundary conditions), all components in
           one cycle; with ``source='proxy'`` a scalar SIPG re-assembly
           per level with the system's penalty scale, per component,
           scaled by 1/nu;
      pS : field block-Jacobi (the pressure-stabilization proxy; the
           plain nu*M_p^{-1} Schur surrogate measured WORSE here because
           the pS-pS block is jump-stabilization, not a mass matrix);
      pD : V-cycle on the TRUE pD-pD block (source='system') — the block
           is Neumann on the subdomain and the true-block hierarchy
           preserves that, where the proxy (a global-Dirichlet scalar
           SIPG scaled by 1/kappa) was spectrally rougher and the main
           source of iteration growth under refinement.

    ``structure``: 'diag' applies the three blocks independently;
    'tri' applies them block-LOWER-TRIANGULARLY (u, then pS minus its
    u-coupling, then pD minus its u/pS-couplings).  Measured with EXACT
    block inverses on n=8/16/32: diag 36/60/78 vs tri 23/30/36 GMRES
    iterations — the off-diagonal (divergence + BJS interface) coupling,
    not block quality, drives the diag growth; the reference sidesteps
    the question with UMFPACK (darcy_stokes.cc:1688-1696).
    """
    import jax.numpy as jnp

    from polydeal_tpu.assembly import assemble_sipg_matrix
    from polydeal_tpu.solvers import (build_field_block_multigrid,
                                      build_multigrid)

    nu = NU if nu is None else nu
    kappa = KAPPA if kappa is None else kappa
    sp = sys.space
    fu, fpD = sp.fields["u"], sp.fields["pD"]
    deg_v = fu.basis.degree
    deg_pS = sp.fields["pS"].basis.degree
    deg_pD = fpD.basis.degree
    dim = mesh.dim

    level_ops = None
    if source == "system":
        # coupled system RE-ASSEMBLED on every hierarchy level (shared
        # by the u and pD chains — same polytope ids per level): the
        # field blocks then carry level-correct SIPG penalties.  The
        # Galerkin-inherited alternative keeps the FINE penalty on every
        # coarse level; its u-block V-cycle CG grows 15/26/36 over
        # n=8/16/32 where the re-discretized chain stays near-flat.
        handlers_v, parents_v = block_hierarchy(mesh, n, block, deg_v)
        level_ops = []
        for li, h in enumerate(handlers_v):
            if li == len(handlers_v) - 1:
                level_ops.append((sp, sys.op))
                continue
            pcy = np.zeros(h.n_poly)
            np.add.at(pcy, h.cell2poly, mesh.cell_centers()[:, 1])
            pcy /= np.bincount(h.cell2poly)
            sys_l = build_darcy_stokes(
                h, (pcy < 0.5).astype(int), degree_v=deg_v,
                degree_pS=deg_pS, degree_pD=deg_pD, penalty_v=penalty_v)
            level_ops.append((sys_l.space, sys_l.op))

    mgs = {}
    specs = (("u", deg_v, nu,
              penalty_v * (deg_v + 1) * (deg_v + dim)),
             ("pD", deg_pD, kappa, None))
    for name, deg, scale, pc in specs:
        handlers, parents = (
            (handlers_v, parents_v) if source == "system" and deg == deg_v
            else block_hierarchy(mesh, n, block, deg))
        if source == "system":
            # cheb=5 measured best (52/116 GMRES iters over the n=8/16
            # refinement vs 58/131 at the default degree 3)
            mg_f = build_field_block_multigrid(sp, sys.op, name,
                                               handlers, parents,
                                               chebyshev_degree=5,
                                               level_ops=level_ops)
            mgs[name] = (mg_f, 1.0, handlers[-1], True)
        else:
            A = assemble_sipg_matrix(handlers[-1], penalty_constant=pc)
            mgs[name] = (build_multigrid(handlers, parents, A), scale,
                         handlers[-1], False)

    bj = sys.op.block_jacobi()

    # pS Schur-complement block options (ps_mode):
    #   'bj'        — block-Jacobi of the pS-pS stabilization block
    #   'mass'      — nu * M_p^{-1}: the classic Stokes Schur surrogate
    #                 S ~ (1/nu) M_p (pressure mass matrix)
    #   'mass+stab' — (D_C + (1/nu) M_p)^{-1}: the stabilized-Schur
    #                 block-diagonal, D_C = per-polytope diagonal of the
    #                 pS-pS jump-stabilization block
    ps_apply = None
    if ps_mode != "bj":
        meta = sys.meta
        fpS = sp.fields["pS"]
        volp = meta["vol_pS"]
        cs_, rows_s = meta["cells_s"], meta["rows_s"]
        Mc = jnp.einsum("cqi,cqj,cq->cij", volp.B[cs_], volp.B[cs_],
                        volp.w[cs_])
        Mp = jnp.zeros((fpS.n_polys, fpS.block, fpS.block),
                       dtype=Mc.dtype).at[jnp.asarray(rows_s)].add(Mc)
        if ps_mode == "mass":
            Sinv = nu * jnp.linalg.inv(Mp)
        elif ps_mode == "mass+stab":
            key = ("pS", "pS")
            D = jnp.zeros_like(Mp)
            if key in sys.op.finalize():
                r_, c_, d_ = sys.op.finalize()[key]
                eq = r_ == c_
                D = D.at[r_[eq]].add(d_[eq])
            Sinv = jnp.linalg.inv(D + Mp / nu)
        else:
            raise ValueError(f"unknown ps_mode: {ps_mode!r}")

        def ps_apply(rb):  # rb: [n_polys_pS, block]
            return jnp.einsum("pij,pj->pi", Sinv, rb)[:, None, :]

    def field_mg(name, r):
        # r: field-local [n_f, d, nb]
        mg_f, s_f, ah_f, true_block = mgs[name]
        f = sp.fields[name]
        if true_block:
            # one V-cycle over all components (blocks are comp-major)
            full = jnp.zeros((ah_f.n_poly, f.block), dtype=r.dtype)
            full = full.at[jnp.asarray(f.polys)].set(
                r.reshape(f.n_polys, f.block))
            z = mg_f.v_cycle(full.reshape(-1))
            return z.reshape(ah_f.n_poly, f.block)[
                jnp.asarray(f.polys)].reshape(f.n_polys, f.n_components,
                                              f.basis.n_basis)
        comps = []
        for d in range(f.n_components):
            full = jnp.zeros((ah_f.n_poly, f.basis.n_basis),
                             dtype=r.dtype)
            full = full.at[jnp.asarray(f.polys)].set(r[:, d, :])
            z = mg_f.v_cycle(full.reshape(-1)) / s_f
            comps.append(z.reshape(ah_f.n_poly,
                                   f.basis.n_basis)[jnp.asarray(f.polys)])
        return jnp.stack(comps, axis=1)

    fpS_ = sp.fields["pS"]
    fpD_ = sp.fields["pD"]
    tri = structure == "tri"
    if tri and ps_apply is None:
        raise ValueError("structure='tri' needs an explicit pS Schur "
                         "block (ps_mode 'mass' or 'mass+stab')")

    def M(v):
        zu = field_mg("u", sp.unpack(v, "u"))
        parts = {"u": zu}
        rS = sp.unpack(v, "pS").reshape(fpS_.n_polys, fpS_.block)
        if tri:
            zu_b = zu.reshape(fu.n_polys, fu.block)
            rS = rS - sys.op.block_apply("pS", "u", zu_b)
        if ps_apply is None:
            parts["pS"] = bj(v)[sp.dof_slice("pS")]
            zS_b = parts["pS"].reshape(fpS_.n_polys, fpS_.block)
        else:
            zS = ps_apply(rS)
            parts["pS"] = zS.reshape(-1)
            zS_b = zS.reshape(fpS_.n_polys, fpS_.block)
        rD = sp.unpack(v, "pD")
        if tri:
            rD_b = (rD.reshape(fpD_.n_polys, fpD_.block)
                    - sys.op.block_apply("pD", "u", zu_b)
                    - sys.op.block_apply("pD", "pS", zS_b))
            rD = rD_b.reshape(fpD_.n_polys, fpD_.n_components,
                              fpD_.basis.n_basis)
        parts["pD"] = field_mg("pD", rD)
        return sp.pack(parts)

    return M


def solve_darcy_stokes_mg(sys: StokesDarcySystem, mesh, n: int, block: int,
                          rtol: float = 1e-10, restart: int = 200,
                          max_restarts: int = 40, ps_mode: str = "mass+stab",
                          structure: str = "tri"):
    """GMRES with the field-wise R3MG preconditioner, applied
    block-triangularly by default (V-cycle velocity block, stabilized
    pressure-Schur pS block, V-cycle pD block, each consuming the
    residual left by the previous blocks) — mesh-robust iteration
    counts, unlike plain block-Jacobi or the block-diagonal variant."""
    import jax.numpy as jnp

    from polydeal_tpu.solvers.gmres import gmres_solve

    m = pressure_mean_vector(sys)
    M = mg_block_preconditioner(sys, mesh, n, block, ps_mode=ps_mode,
                                structure=structure)

    def A(v):
        return sys.op.matvec(v) + m * jnp.vdot(m, v)

    return gmres_solve(A, sys.rhs, M=M, restart=restart, rtol=rtol,
                       max_restarts=max_restarts)


def errors(sys: StokesDarcySystem, x):
    """(u_L2, u_H1semi, pS_L2, pD_L2) vs the manufactured solution,
    with the combined pressure mean removed from the exact fields (the
    reference subtracts its hard-coded mean_pressure constant,
    darcy_stokes.cc:143-146; we compute the mean numerically)."""
    import jax.numpy as jnp

    sp, meta = sys.space, sys.meta
    u, pS, pD = u_exact_fn(), pS_exact_fn(), pD_exact_fn()
    vol_v, vol_pS, vol_pD = meta["vol_v"], meta["vol_pS"], meta["vol_pD"]
    cs, cd = meta["cells_s"], meta["cells_d"]
    rs, rd = meta["rows_s"], meta["rows_d"]

    # numerically computed combined pressure mean of the exact solution
    # over Ω (area 1), so both solutions satisfy the same constraint
    mean_ex = (jnp.einsum("cq,cq->", vol_pS.w[cs], pS(vol_pS.x[cs]))
               + jnp.einsum("cq,cq->", vol_pD.w[cd], pD(vol_pD.x[cd])))
    area = vol_pS.w.sum()
    mean_ex = mean_ex / area

    Ub = sp.unpack(x, "u")[rs]  # [c, dim, nbv]
    uh = jnp.einsum("cqi,cdi->cqd", vol_v.B[cs], Ub)
    du = uh - u(vol_v.x[cs])
    e_u = jnp.sqrt(jnp.einsum("cq,cqd->", vol_v.w[cs], du**2))
    # H1 seminorm: grad of component d = sum_i U[d,i] G[:, :, i, :]
    Gh = jnp.einsum("cqie,cdi->cqde", vol_v.G[cs], Ub)

    import jax

    gex = jax.vmap(jax.jacfwd(u_exact_fn()))(
        vol_v.x[cs].reshape(-1, 2)).reshape(Gh.shape)
    e_u_h1 = jnp.sqrt(jnp.einsum("cq,cqde->", vol_v.w[cs], (Gh - gex) ** 2))

    Pb = sp.unpack(x, "pS")[rs][:, 0]
    ph = jnp.einsum("cqi,ci->cq", vol_pS.B[cs], Pb)
    e_ps = jnp.sqrt(jnp.einsum(
        "cq,cq->", vol_pS.w[cs], (ph - (pS(vol_pS.x[cs]) - mean_ex)) ** 2))
    Db = sp.unpack(x, "pD")[rd][:, 0]
    dh = jnp.einsum("cqi,ci->cq", vol_pD.B[cd], Db)
    e_pd = jnp.sqrt(jnp.einsum(
        "cq,cq->", vol_pD.w[cd], (dh - (pD(vol_pD.x[cd]) - mean_ex)) ** 2))
    return float(e_u), float(e_u_h1), float(e_ps), float(e_pd)


def run(n=32, block=4, degree_v=2, degree_pS=1, degree_pD=1):
    """Block agglomeration of the unit-square n×n grid that never
    straddles y = 1/2 (requires block | n/2) — the analogue of the
    reference's per-subdomain R-trees (darcy_stokes.cc:806-822) — then
    assemble and solve."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import polydeal_tpu as pd

    assert n % 2 == 0 and (n // 2) % block == 0
    mesh = pd.hyper_cube(2, n)
    centers = mesh.cell_centers()
    bx = np.minimum((centers[:, 0] * n // block).astype(int), n // block - 1)
    by = np.minimum((centers[:, 1] * n // block).astype(int), n // block - 1)
    c2p = bx * (n // block) + by
    ah = pd.AgglomerationHandler(mesh, c2p, degree=degree_v)
    pcy = np.zeros(ah.n_poly)
    np.add.at(pcy, c2p, centers[:, 1])
    pcy /= np.bincount(c2p)
    domain_id = (pcy < 0.5).astype(int)
    sys = build_darcy_stokes(ah, domain_id, degree_v, degree_pS, degree_pD)
    x = solve_darcy_stokes_dense(sys)
    return sys, x


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--degree-v", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    sys_, x = run(args.n, args.block, args.degree_v)
    e_u, e_u_h1, e_ps, e_pd = errors(sys_, x)
    print(f"n={args.n} dofs={sys_.space.n_dofs}")
    print(f"u  L2: {e_u:.4e}   H1: {e_u_h1:.4e}")
    print(f"pS L2: {e_ps:.4e}  pD L2: {e_pd:.4e}")


if __name__ == "__main__":
    main()
