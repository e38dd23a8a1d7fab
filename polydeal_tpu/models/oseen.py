"""Two-domain Oseen flow (Kovasznay benchmark) with upwind DG on
agglomerated polytopal meshes.

TPU-native rebuild of the reference's oseen application
(reference examples/oseen.cc): the Kovasznay flow on
Ω = (−1/2, 3/2) × (0, 2), discretized with IPDG + upwind convection,
with TWO independent velocity/pressure spaces on the left and right
halves of the domain whose polynomial degrees may differ — the
multi-space (hp FESystem) mechanism of oseen.cc:475-478,672-690
expressed as four :class:`Field`s.  Interface faces between the halves
couple test/trial functions from *different* spaces (non-square blocks).

The reference splits the domain by curved manifolds
(oseen.cc:519-600); :func:`run` uses the straight line x = 1/2 and
:func:`run_curved` the curved interface x = 1/2 + a·sin(πy) —
fine cells are CLASSIFIED by the curve and agglomerates never straddle
it (blocks cut by the curve split per side, disconnected pieces
repaired), so the interface is resolved by the fine-cell faces along
the curve, exactly as the reference's manifold-classified agglomerates
resolve theirs.

Formulation (oseen.cc:745-1240): ν ∇v:∇u − (∇·v)p + q(∇·u) + v·(β·∇)u
volume terms; SIPG velocity faces with σ_v = 40 ν(p+1)(p+d)/diam;
pressure jump stabilization σ_p = 1/(ν/diam + β_max); upwind convective
face term −(β·n)(v_down · [u]); β = u_exact, ν = 1/Re.  Right-hand side
derived by jax autodiff (f = −νΔu + (β·∇)u + ∇p) instead of the
hand-coded formulas (oseen.cc:209-233).
"""

from __future__ import annotations

import argparse

import numpy as np

PENALTY_V = 40.0
PENALTY_P = 1.0


def kovasznay(Re: float = 10.0):
    """Exact (u, p) of the Kovasznay flow (oseen.cc:160-205); p is
    returned WITHOUT the zero-mean shift (handled numerically)."""
    import jax.numpy as jnp

    lam = Re / 2.0 - np.sqrt(Re * Re / 4.0 + 4.0 * np.pi**2)

    def u(x):
        ex = jnp.exp(lam * x[..., 0])
        return jnp.stack([
            1.0 - ex * jnp.cos(2 * jnp.pi * x[..., 1]),
            lam / (2 * jnp.pi) * ex * jnp.sin(2 * jnp.pi * x[..., 1]),
        ], axis=-1)

    def p(x):
        return 0.5 * jnp.exp(2.0 * lam * x[..., 0])

    return u, p


def oseen_rhs(Re: float = 10.0):
    """f = −ν Δu + (β·∇)u + ∇p via autodiff, with β = u_exact."""
    import jax
    import jax.numpy as jnp

    u, p = kovasznay(Re)
    nu = 1.0 / Re

    def f_point(x):
        lap = jnp.trace(jax.hessian(u)(x), axis1=1, axis2=2)
        J = jax.jacfwd(u)(x)  # J[i, j] = du_i/dx_j
        beta = u(x)
        return -nu * lap + J @ beta + jax.grad(p)(x)

    fv = jax.vmap(f_point)
    return lambda x: fv(x.reshape(-1, 2)).reshape(x.shape)


def build_oseen(ah, domain_id, degrees=((2, 1), (2, 1)), Re: float = 10.0,
                u_exact=None, f_fn=None, beta_fn=None):
    """Assemble the two-space Oseen system.

    ``domain_id[p]`` ∈ {0 (left), 1 (right)}; ``degrees[k]`` =
    (velocity degree, pressure degree) of space k.  Default data: the
    Kovasznay manufactured solution.
    """
    import jax.numpy as jnp

    from polydeal_tpu.assembly.mixed import (
        MixedOperator, MixedRhs, swap_sides, face_side_tables,
        stokes_interior_blocks, stokes_boundary_blocks, stokes_boundary_rhs,
        expand_vector_blocks,
    )
    from polydeal_tpu.assembly.sipg import build_volume_tables
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.fem.system import Field, SystemSpace

    dim = ah.dim
    nu = 1.0 / Re
    dtype = jnp.zeros(0).dtype
    domain_id = np.asarray(domain_id)
    if u_exact is None or f_fn is None:
        ue, _ = kovasznay(Re)
        u_exact = u_exact or ue
        f_fn = f_fn or oseen_rhs(Re)
    beta_fn = beta_fn or u_exact

    names = (("uL", "pL"), ("uR", "pR"))
    bases = {}
    fields = []
    polys = [np.where(domain_id == k)[0] for k in (0, 1)]
    for k in (0, 1):
        dv, dp = degrees[k]
        bases[names[k][0]] = LegendreDGP(dim, dv)
        bases[names[k][1]] = LegendreDGP(dim, dp)
        fields.append(Field(names[k][0], bases[names[k][0]], dim, polys[k]))
        fields.append(Field(names[k][1], bases[names[k][1]], 1, polys[k]))
    space = SystemSpace(ah, fields)
    loc = [space.local_poly(names[k][0]) for k in (0, 1)]
    deg_v = [degrees[0][0], degrees[1][0]]

    op = MixedOperator(space)
    rhs = MixedRhs(space)
    diam = ah.diameters

    # ---------------- volume terms (per space) ---------------------
    c2p = ah.cell2poly
    vols = {}
    for k in (0, 1):
        vn, pn = names[k]
        vol_v = build_volume_tables(ah, dtype, basis=bases[vn])
        vol_p = build_volume_tables(ah, dtype, basis=bases[pn])
        vols[k] = (vol_v, vol_p)
        cs = np.where(domain_id[c2p] == k)[0]
        rows = loc[k][c2p[cs]]
        Gv, Bv, wv = vol_v.G[cs], vol_v.B[cs], vol_v.w[cs]
        betav = beta_fn(vol_v.x[cs])
        Ks = nu * jnp.einsum("cqid,cqjd,cq->cij", Gv, Gv, wv)
        conv = jnp.einsum("cqi,cqjd,cqd,cq->cij", Bv, Gv, betav, wv)
        op.add(vn, vn, rows, rows, expand_vector_blocks(Ks + conv, dim))
        Bp = vol_p.B[cs]
        vp = -jnp.einsum("cqid,cqj,cq->cdij", Gv, Bp, wv)
        c_, d_, i_, j_ = vp.shape
        op.add(vn, pn, rows, rows, vp.reshape(c_, d_ * i_, j_))
        pv = jnp.einsum("cqi,cqjd,cq->cidj", Bp, Gv, wv)
        op.add(pn, vn, rows, rows, pv.reshape(c_, j_, d_ * i_))
        fv = f_fn(vol_v.x[cs])
        rhs.add(vn, rows, jnp.einsum("cqi,cqd,cq->cdi", Bv, fv, wv))

    # ---------------- faces ----------------------------------------
    ft = ah.faces
    dom_in = domain_id[ft.poly_in]
    dom_out = np.where(ft.poly_out >= 0,
                       domain_id[np.maximum(ft.poly_out, 0)], -1)
    is_b = ft.poly_out < 0

    def tau_v(k, p):
        return nu * (deg_v[k] + 1) * (deg_v[k] + dim) / diam[p]

    def face_penalties(f, ka, kb):
        """(sigma_v, sigma_p, beta at face qpoints)."""
        beta = beta_fn(jnp.asarray(f.points_real, dtype))
        bmax = jnp.max(jnp.linalg.norm(beta, axis=-1), axis=-1)  # [f]
        sv = PENALTY_V * np.maximum(tau_v(ka, f.poly_in),
                                    tau_v(kb, f.poly_out))
        # reference takes max over the two sides' zetas (oseen.cc:1013-1020)
        za = 1.0 / (nu / jnp.asarray(diam[f.poly_in]) + bmax)
        zb = 1.0 / (nu / jnp.asarray(diam[f.poly_out]) + bmax)
        sp = PENALTY_P * jnp.maximum(za, zb)
        return jnp.asarray(sv, dtype), sp.astype(dtype), beta

    # interior faces per (ka, kb) class; orient side 0 = space ka
    for ka, kb in ((0, 0), (1, 1), (0, 1)):
        if ka == kb:
            m = (~is_b) & (dom_in == ka) & (dom_out == ka)
        else:
            m = (~is_b) & (dom_in != dom_out)
        if not m.any():
            continue
        f = ft._select(m)
        if ka != kb:
            f = swap_sides(f, diam, domain_id[f.poly_in] == 1)
        vn_a, pn_a = names[ka]
        vn_b, pn_b = names[kb]
        Bv0, Gv0 = face_side_tables(bases[vn_a], f, 0, ah.extents, dtype)
        Bv1, Gv1 = face_side_tables(bases[vn_b], f, 1, ah.extents, dtype)
        Bp0, _ = face_side_tables(bases[pn_a], f, 0, ah.extents, dtype)
        Bp1, _ = face_side_tables(bases[pn_b], f, 1, ah.extents, dtype)
        sv, sp_, beta = face_penalties(f, ka, kb)
        blocks = stokes_interior_blocks(
            (Bv0, Bv1), (Gv0, Gv1), (Bp0, Bp1),
            jnp.asarray(f.weights, dtype), jnp.asarray(f.normals, dtype),
            sv, sp_, nu, beta=beta)
        sides = (loc[ka][f.poly_in], loc[kb][f.poly_out])
        fname = ((vn_a, pn_a), (vn_b, pn_b))
        for ((kt, st), (kl, sl)), val in blocks.items():
            op.add(fname[st][kt == "p"], fname[sl][kl == "p"],
                   sides[st], sides[sl], val)

    # boundary faces (full Dirichlet, upwind inflow terms)
    for k in (0, 1):
        m = is_b & (dom_in == k)
        if not m.any():
            continue
        f = ft._select(m)
        vn, pn = names[k]
        Bv0, Gv0 = face_side_tables(bases[vn], f, 0, ah.extents, dtype)
        Bp0, _ = face_side_tables(bases[pn], f, 0, ah.extents, dtype)
        w_, n_ = jnp.asarray(f.weights, dtype), jnp.asarray(f.normals, dtype)
        beta = beta_fn(jnp.asarray(f.points_real, dtype))
        sv = jnp.asarray(PENALTY_V * tau_v(k, f.poly_in), dtype)
        blocks = stokes_boundary_blocks(Bv0, Gv0, Bp0, w_, n_, sv, nu,
                                        beta=beta)
        lb = loc[k][f.poly_in]
        op.add(vn, vn, lb, lb, blocks[("v", "v")])
        op.add(vn, pn, lb, lb, blocks[("v", "p")])
        op.add(pn, vn, lb, lb, blocks[("p", "v")])
        g = u_exact(jnp.asarray(f.points_real, dtype))
        rv, rp = stokes_boundary_rhs(Bv0, Gv0, Bp0, w_, n_, sv, nu, g,
                                     beta=beta)
        rhs.add(vn, lb, rv)
        rhs.add(pn, lb, rp)

    meta = dict(dim=dim, domain_id=domain_id, names=names, vols=vols,
                bases=bases, Re=Re,
                cells=[np.where(domain_id[c2p] == k)[0] for k in (0, 1)],
                rows=[loc[k][c2p[np.where(domain_id[c2p] == k)[0]]]
                      for k in (0, 1)])
    return space, op, rhs.finalize(), meta


def pressure_mean_vector(space, meta):
    import jax
    import jax.numpy as jnp

    parts = {}
    for k in (0, 1):
        vn, pn = meta["names"][k]
        f = space.fields[vn]
        parts[vn] = jnp.zeros((f.n_polys, f.block))
        vol_p = meta["vols"][k][1]
        cells, rows = meta["cells"][k], meta["rows"][k]
        ints = jnp.einsum("cqi,cq->ci", vol_p.B[cells], vol_p.w[cells])
        parts[pn] = jax.ops.segment_sum(
            ints, jnp.asarray(rows),
            num_segments=space.fields[pn].n_polys)
    return space.pack(parts)


def solve_oseen_dense(space, op, rhs, meta):
    import jax.numpy as jnp

    K = op.to_dense()
    m = pressure_mean_vector(space, meta)
    K = K + jnp.outer(m, m)
    return jnp.linalg.solve(K, rhs)


def solve_oseen_iterative(space, op, rhs, meta, rtol: float = 1e-10,
                          restart: int = 60, max_restarts: int = 200):
    """GMRES(restart) + field-wise block-Jacobi on the coupled Oseen
    operator (+ rank-1 zero-mean regularization) — iterative counterpart
    of the dense solve (the reference uses a sparse direct solver)."""
    import jax.numpy as jnp

    from polydeal_tpu.solvers.gmres import gmres_solve

    m = pressure_mean_vector(space, meta)
    M = op.block_jacobi()

    def A(v):
        return op.matvec(v) + m * jnp.vdot(m, v)

    return gmres_solve(A, rhs, M=M, restart=restart, rtol=rtol,
                       max_restarts=max_restarts)


def oseen_block_hierarchy(mesh, n: int, block: int, degree: int):
    """Nested block-agglomeration chain on the Kovasznay rectangle whose
    finest level matches :func:`run`'s c2p ordering."""
    import polydeal_tpu as pd

    m0 = n // block
    sides = [m0]
    while sides[-1] % 2 == 0 and sides[-1] > 2:
        sides.append(sides[-1] // 2)
    sides = sides[::-1]
    centers = mesh.cell_centers()
    c2ps = []
    for m in sides:
        bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int), m - 1)
        by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
        c2ps.append((bx * m + by).astype(np.int32))
    handlers = [pd.AgglomerationHandler(mesh, c, degree=degree)
                for c in c2ps]
    parents = []
    for li in range(len(sides) - 1):
        m = sides[li + 1]
        ids = np.arange(m * m)
        bx, by = ids // m, ids % m
        parents.append(((bx // 2) * (m // 2) + by // 2).astype(np.int64))
    return handlers, parents


def solve_oseen_mg(space, op, rhs, meta, mesh, n: int, block: int,
                   rtol: float = 1e-10, restart: int = 200,
                   max_restarts: int = 40, structure: str = "diag"):
    """GMRES with a field-wise R3MG preconditioner: per-space velocity
    blocks get a penalty-matched scalar SIPG V-cycle (scaled by 1/nu —
    the diffusive part dominates at moderate Re), pressures keep the
    stabilization block-Jacobi.

    ``structure='tri'`` applies the blocks block-LOWER-TRIANGULARLY with
    stabilized mass-Schur pressure blocks — the structure that made
    darcy_stokes mesh-independent — but MEASURED WORSE here: 77/185 vs
    diag's 70/130 GMRES iterations over n=8/16.  The velocity block is a
    symmetric SIPG *proxy* of a nonsymmetric advective block, so the
    coupling subtraction feeds the proxy's error into the pressure
    residuals, and the mass Schur ignores advection (a PCD-style
    commutator surrogate would be needed).  Kept selectable for study;
    'diag' stays the default.  Improves on the reference's sparse direct
    solver (oseen.cc).

    Measured: the symmetric SIPG proxy beats the true-u-u-block Galerkin
    MG (:func:`~polydeal_tpu.solvers.build_field_block_multigrid`) here —
    70/130 vs 71/205 GMRES iterations over n=8/16 — because the
    Chebyshev smoother targets SPD operators and the Galerkin-coarsened
    advection degrades it; the opposite of darcy_stokes, whose blocks
    are symmetric and where the true block wins."""
    import jax.numpy as jnp

    from polydeal_tpu.assembly import assemble_sipg_matrix
    from polydeal_tpu.solvers import build_multigrid
    from polydeal_tpu.solvers.gmres import gmres_solve

    nu = 1.0 / meta["Re"]
    dim = meta["dim"]
    m = pressure_mean_vector(space, meta)
    bj = op.block_jacobi()
    tri = structure == "tri"

    mgs = {}
    for k in (0, 1):
        vn, _ = meta["names"][k]
        deg = space.fields[vn].basis.degree
        if deg not in mgs:
            handlers, parents = oseen_block_hierarchy(mesh, n, block, deg)
            pc = PENALTY_V * (deg + 1) * (deg + dim)
            Am = assemble_sipg_matrix(handlers[-1], penalty_constant=pc)
            mgs[deg] = (build_multigrid(handlers, parents, Am),
                        handlers[-1])

    # stabilized pressure-Schur blocks: (D_stab + M_p/nu)^{-1} per
    # polytope, D_stab = diagonal blocks of the (p, p) jump
    # stabilization (cf. darcy_stokes mg_block_preconditioner ps_mode
    # 'mass+stab')
    Sinvs = {}
    if tri:
        for k in (0, 1):
            _, pn = meta["names"][k]
            fp = space.fields[pn]
            vol_p = meta["vols"][k][1]
            cells, rows = meta["cells"][k], meta["rows"][k]
            Mc = jnp.einsum("cqi,cqj,cq->cij", vol_p.B[cells],
                            vol_p.B[cells], vol_p.w[cells])
            Mp = jnp.zeros((fp.n_polys, fp.block, fp.block),
                           dtype=Mc.dtype).at[jnp.asarray(rows)].add(Mc)
            D = jnp.zeros_like(Mp)
            ent = op.finalize().get((pn, pn))
            if ent is not None:
                r_, c_, d_ = ent
                eq = r_ == c_
                D = D.at[r_[eq]].add(d_[eq])
            Sinvs[pn] = jnp.linalg.inv(D + Mp / nu)

    def field_v(vn, r):
        # r: [n_polys, block] -> velocity V-cycle per component
        f = space.fields[vn]
        mg_v, ah_v = mgs[f.basis.degree]
        rr = r.reshape(f.n_polys, f.n_components, f.basis.n_basis)
        comps = []
        for d in range(f.n_components):
            full = jnp.zeros((ah_v.n_poly, f.basis.n_basis),
                             dtype=r.dtype)
            full = full.at[jnp.asarray(f.polys)].set(rr[:, d, :])
            z = mg_v.v_cycle(full.reshape(-1)) / nu
            comps.append(z.reshape(ah_v.n_poly, -1)[jnp.asarray(f.polys)])
        return jnp.stack(comps, axis=1).reshape(f.n_polys, f.block)

    order = [meta["names"][0][0], meta["names"][0][1],
             meta["names"][1][0], meta["names"][1][1]]
    is_vel = {meta["names"][k][0] for k in (0, 1)}

    def M(v):
        parts = {}
        if not tri:
            zbj = bj(v)
        done = {}
        for name in order:
            f = space.fields[name]
            r = space.unpack(v, name).reshape(f.n_polys, f.block)
            if tri:
                for prev, zp in done.items():
                    r = r - op.block_apply(name, prev, zp)
            if name in is_vel:
                z = field_v(name, r)
            elif tri:
                z = jnp.einsum("pij,pj->pi", Sinvs[name], r)
            else:
                z = zbj[space.dof_slice(name)].reshape(f.n_polys, f.block)
            done[name] = z
            parts[name] = z.reshape(f.n_polys, f.n_components,
                                    f.basis.n_basis)
        return space.pack(parts)

    def A(v):
        return op.matvec(v) + m * jnp.vdot(m, v)

    return gmres_solve(A, rhs, M=M, restart=restart, rtol=rtol,
                       max_restarts=max_restarts)


def oseen_errors(space, x, meta):
    """(u_L2, u_H1semi, p_L2) over the whole domain vs Kovasznay."""
    import jax
    import jax.numpy as jnp

    u_ex, p_ex = kovasznay(meta["Re"])
    # zero-mean shift of the exact pressure over Ω
    area = 0.0
    mean = 0.0
    for k in (0, 1):
        vol_p = meta["vols"][k][1]
        cells = meta["cells"][k]
        mean = mean + jnp.einsum("cq,cq->", vol_p.w[cells],
                                 p_ex(vol_p.x[cells]))
        area = area + vol_p.w[cells].sum()
    mean = mean / area
    e_u2 = e_h1 = e_p2 = 0.0
    for k in (0, 1):
        vn, pn = meta["names"][k]
        vol_v, vol_p = meta["vols"][k]
        cells, rows = meta["cells"][k], meta["rows"][k]
        U = space.unpack(x, vn)[rows]
        uh = jnp.einsum("cqi,cdi->cqd", vol_v.B[cells], U)
        du = uh - u_ex(vol_v.x[cells])
        e_u2 = e_u2 + jnp.einsum("cq,cqd->", vol_v.w[cells], du**2)
        Gh = jnp.einsum("cqie,cdi->cqde", vol_v.G[cells], U)
        gex = jax.vmap(jax.jacfwd(u_ex))(
            vol_v.x[cells].reshape(-1, 2)).reshape(Gh.shape)
        e_h1 = e_h1 + jnp.einsum("cq,cqde->", vol_v.w[cells], (Gh - gex)**2)
        Pc = space.unpack(x, pn)[rows][:, 0]
        ph = jnp.einsum("cqi,ci->cq", vol_p.B[cells], Pc)
        dp = ph - (p_ex(vol_p.x[cells]) - mean)
        e_p2 = e_p2 + jnp.einsum("cq,cq->", vol_p.w[cells], dp**2)
    return float(jnp.sqrt(e_u2)), float(jnp.sqrt(e_h1)), float(jnp.sqrt(e_p2))


def run(n=16, block=2, degrees=((2, 1), (2, 1)), Re=10.0):
    """Kovasznay flow on (−1/2,3/2)×(0,2), block-agglomerated, split at
    x = 1/2 into the two FE spaces."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import polydeal_tpu as pd
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle

    mesh = hyper_rectangle(2, [n, n], lo=[-0.5, 0.0], hi=[1.5, 2.0])
    centers = mesh.cell_centers()
    m = n // block
    bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int), m - 1)
    by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
    c2p = bx * m + by
    deg_max = max(degrees[0][0], degrees[1][0])
    ah = pd.AgglomerationHandler(mesh, c2p, degree=deg_max)
    pcx = np.zeros(ah.n_poly)
    np.add.at(pcx, c2p, centers[:, 0])
    pcx /= np.bincount(c2p)
    domain_id = (pcx > 0.5).astype(int)
    space, op, rhs, meta = build_oseen(ah, domain_id, degrees, Re)
    x = solve_oseen_dense(space, op, rhs, meta)
    return space, x, meta


def curved_split_agglomeration(mesh, n: int, block: int, curve_fn):
    """Block agglomeration that never straddles the curved interface
    x = curve_fn(y) (the reference's curved-manifold two-domain split,
    oseen.cc:519-600, done by cell classification): blocks containing
    cells on both sides split into one polytope per side; pieces a
    wiggly curve disconnects are split further (Utils::Graph repair,
    reference agglomeration_handler.cc:172-207).

    Returns (c2p, domain_id[poly])."""
    from polydeal_tpu.agglomeration.graph import (compact_labels,
                                                  split_disconnected)

    centers = mesh.cell_centers()
    m = n // block
    bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int), m - 1)
    by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
    side = (centers[:, 0] > curve_fn(centers[:, 1])).astype(np.int64)
    key = (bx * m + by) * 2 + side
    _, c2p = np.unique(key, return_inverse=True)
    c2p = split_disconnected(c2p.astype(np.int64), mesh.neighbors)
    c2p = compact_labels(c2p)
    n_poly = int(c2p.max()) + 1
    # every polytope is single-sided by construction
    dom = np.zeros(n_poly, dtype=np.int64)
    np.maximum.at(dom, c2p, side)
    return c2p.astype(np.int32), dom.astype(int)


def run_curved(n=16, block=2, degrees=((2, 1), (2, 1)), Re=10.0,
               amplitude=0.15):
    """Kovasznay flow with the TWO spaces split by the CURVED interface
    x = 1/2 + amplitude*sin(pi*y) (reference oseen.cc:519-600)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import polydeal_tpu as pd
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle

    mesh = hyper_rectangle(2, [n, n], lo=[-0.5, 0.0], hi=[1.5, 2.0])
    c2p, domain_id = curved_split_agglomeration(
        mesh, n, block, lambda y: 0.5 + amplitude * np.sin(np.pi * y))
    deg_max = max(degrees[0][0], degrees[1][0])
    ah = pd.AgglomerationHandler(mesh, c2p, degree=deg_max)
    space, op, rhs, meta = build_oseen(ah, domain_id, degrees, Re)
    x = solve_oseen_dense(space, op, rhs, meta)
    return space, x, meta


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--block", type=int, default=2)
    ap.add_argument("--degree-v", type=int, default=2)
    ap.add_argument("--Re", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dv = args.degree_v
    space, x, meta = run(args.n, args.block,
                         ((dv, dv - 1), (dv, dv - 1)), args.Re)
    e = oseen_errors(space, x, meta)
    print(f"n={args.n} dofs={space.n_dofs}")
    print(f"u L2: {e[0]:.4e}  u H1: {e[1]:.4e}  p L2: {e[2]:.4e}")


if __name__ == "__main__":
    main()
