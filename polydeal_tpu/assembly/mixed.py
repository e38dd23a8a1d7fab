"""Mixed / multi-domain DG assembly toolkit.

Array machinery behind the coupled-flow applications (the reference's
``examples/darcy_stokes.cc`` and ``examples/oseen.cc``): block operators
between :class:`~polydeal_tpu.fem.system.Field`s that live on different
subdomains with different bases, assembled from batched einsum kernels
over face/volume tables.

Where the reference drives an hp FEValues machinery through nested
(i, j, q) loops and FE_Nothing placeholders, here each face class
(Stokes–Stokes, Darcy–Darcy, interface, boundary) is one static index
selection at setup plus one einsum batch at assembly:

  * velocity–velocity SIPG blocks are scalar blocks ⊗ I_dim (components
    decouple) except the BJS tangential term, which is dense in (d, e);
  * velocity–pressure coupling blocks carry the face normal component;
  * upwind convection enters through per-quadrature-point inflow signs.

Kernel sign conventions follow the reference exactly so the discrete
systems match (darcy_stokes.cc:1019-1664, oseen.cc:824-1240):
jump [v] = v_in - v_out, average {v} = (v_in + v_out)/2, with the normal
pointing outward from the "in" side.
"""

from __future__ import annotations

import numpy as np

from polydeal_tpu.handler import FaceTable

__all__ = [
    "swap_sides",
    "face_side_tables",
    "MixedOperator",
    "MixedRhs",
    "expand_vector_blocks",
    "stokes_interior_blocks",
    "stokes_boundary_blocks",
    "stokes_boundary_rhs",
    "scalar_interior_blocks",
    "bjs_interface_blocks",
]


def swap_sides(ft: FaceTable, diameters: np.ndarray,
               mask: np.ndarray) -> FaceTable:
    """Swap in/out on masked rows (flipping normals) so callers can fix
    an orientation convention — e.g. "side 0 is always the Stokes side"
    on Stokes–Darcy interface faces (the reference flips the normal when
    the current polytope is on the Darcy side, darcy_stokes.cc:1569-1572).
    """
    m = np.asarray(mask, dtype=bool)
    pin = np.where(m, ft.poly_out, ft.poly_in)
    pout = np.where(m, ft.poly_in, ft.poly_out)
    sgn = np.where(m, -1.0, 1.0)[:, None, None]
    return FaceTable(
        poly_in=pin.astype(ft.poly_in.dtype),
        poly_out=pout.astype(ft.poly_out.dtype),
        points_real=ft.points_real,
        points_in=np.where(m[:, None, None], ft.points_out, ft.points_in),
        points_out=np.where(m[:, None, None], ft.points_in, ft.points_out),
        weights=ft.weights,
        normals=ft.normals * sgn,
        h_f=diameters[pin],
    )


def face_side_tables(basis, ft: FaceTable, side: int, extents, dtype):
    """Shape tables (B [f,q,nb], G real-gradients [f,q,nb,dim]) of
    ``basis`` on one side of the given face rows."""
    import jax.numpy as jnp

    pts = ft.points_in if side == 0 else ft.points_out
    poly = ft.poly_in if side == 0 else ft.poly_out
    pts = jnp.asarray(pts, dtype=dtype)
    B = basis.eval(pts).astype(dtype)
    G = basis.grad(pts).astype(dtype)
    ext = jnp.asarray(extents[np.maximum(poly, 0)], dtype=dtype)
    return B, G / ext[:, None, None, :]


class MixedOperator:
    """Block operator between the fields of a :class:`SystemSpace`.

    Entries accumulate as (field-local block rows, cols, dense values)
    triplets per (test, trial) field pair; duplicates merge on
    finalization.  ``matvec`` is the TPU execution path (gather + batched
    matmul + segment-sum per pair); ``to_dense`` serves the direct
    solver, mirroring the reference's UMFPACK path
    (darcy_stokes.cc:1688-1696).
    """

    def __init__(self, space):
        self.space = space
        self._entries = {}  # (test, trial) -> list[(rows, cols, vals)]
        self._merged = None

    def add(self, test: str, trial: str, rows, cols, vals):
        """rows/cols are FIELD-LOCAL polytope indices (static numpy);
        vals is [n, block_test, block_trial]."""
        assert vals.ndim == 3
        ft, fl = self.space.fields[test], self.space.fields[trial]
        assert vals.shape[1] == ft.block and vals.shape[2] == fl.block, (
            test, trial, vals.shape, ft.block, fl.block)
        self._entries.setdefault((test, trial), []).append(
            (np.asarray(rows, dtype=np.int64),
             np.asarray(cols, dtype=np.int64), vals))
        self._merged = None

    def finalize(self):
        """Merge duplicate (row, col) blocks per field pair."""
        import jax
        import jax.numpy as jnp

        if self._merged is not None:
            return self._merged
        merged = {}
        for key, ent in self._entries.items():
            rows = np.concatenate([e[0] for e in ent])
            cols = np.concatenate([e[1] for e in ent])
            vals = jnp.concatenate([e[2] for e in ent], axis=0)
            ncols = self.space.fields[key[1]].n_polys
            k = rows * ncols + cols
            uniq, inv = np.unique(k, return_inverse=True)
            data = jax.ops.segment_sum(vals, jnp.asarray(inv),
                                       num_segments=uniq.shape[0])
            merged[key] = ((uniq // ncols), (uniq % ncols), data)
        self._merged = merged
        return merged

    def matvec(self, x):
        import jax
        import jax.numpy as jnp

        sp = self.space
        out = {name: 0.0 for name in sp.fields}
        for (test, trial), (rows, cols, data) in self.finalize().items():
            fl = sp.fields[trial]
            ftst = sp.fields[test]
            xb = x[sp.dof_slice(trial)].reshape(fl.n_polys, fl.block)
            prod = jnp.einsum("kij,kj->ki", data, xb[jnp.asarray(cols)])
            yb = jax.ops.segment_sum(prod, jnp.asarray(rows),
                                     num_segments=ftst.n_polys)
            out[test] = out[test] + yb
        parts = {}
        for name in sp.fields:
            f = sp.fields[name]
            v = out[name]
            if isinstance(v, float):
                v = jnp.zeros((f.n_polys, f.block), dtype=x.dtype)
            parts[name] = v
        return sp.pack(parts)

    def block_apply(self, test: str, trial: str, xb):
        """y = A[test, trial] @ x_trial on field-local block vectors:
        ``xb`` [n_polys_trial, block_trial] -> [n_polys_test, block_test].
        Zero when the pair never assembled.  Serves the block-triangular
        preconditioner (the coupling-subtraction terms)."""
        import jax
        import jax.numpy as jnp

        ft = self.space.fields[test]
        ent = self.finalize().get((test, trial))
        if ent is None:
            return jnp.zeros((ft.n_polys, ft.block), dtype=xb.dtype)
        rows, cols, data = ent
        prod = jnp.einsum("kij,kj->ki", data, xb[jnp.asarray(cols)])
        return jax.ops.segment_sum(prod, jnp.asarray(rows),
                                   num_segments=ft.n_polys)

    def block_jacobi(self):
        """Field-wise block-Jacobi preconditioner: invert each field's
        per-polytope diagonal block (the natural saddle-point
        preconditioner for GMRES on the coupled systems)."""
        import jax.numpy as jnp

        sp = self.space
        invs = {}
        for name, f in sp.fields.items():
            key = (name, name)
            D = jnp.zeros((f.n_polys, f.block, f.block))
            if key in self.finalize():
                rows, cols, data = self.finalize()[key]
                d = rows == cols
                D = D.at[rows[d]].add(data[d])
            # guard empty/zero diagonals
            eye = jnp.eye(f.block)
            D = jnp.where(jnp.abs(D).sum((1, 2), keepdims=True) > 0, D,
                          eye[None])
            invs[name] = jnp.linalg.inv(D)

        def apply(r):
            parts = {}
            for name, f in sp.fields.items():
                rb = r[sp.dof_slice(name)].reshape(f.n_polys, f.block)
                parts[name] = jnp.einsum("pij,pj->pi", invs[name], rb)
            return sp.pack(parts)

        return apply

    def to_dense(self):
        import jax.numpy as jnp

        sp = self.space
        n = sp.n_dofs
        out = jnp.zeros((n, n))
        for (test, trial), (rows, cols, data) in self.finalize().items():
            ft, fl = sp.fields[test], sp.fields[trial]
            blk = jnp.zeros((ft.n_polys, ft.block, fl.n_polys, fl.block),
                            dtype=data.dtype)
            blk = blk.at[rows, :, cols, :].add(data)
            blk = blk.reshape(ft.n_dofs, fl.n_dofs)
            out = out.at[sp.dof_slice(test), sp.dof_slice(trial)].add(blk)
        return out


class MixedRhs:
    """Per-field rhs accumulator (field-local rows, block values)."""

    def __init__(self, space):
        self.space = space
        self._entries = {name: [] for name in space.fields}

    def add(self, field: str, rows, vals):
        self._entries[field].append((np.asarray(rows, dtype=np.int64), vals))

    def finalize(self):
        import jax
        import jax.numpy as jnp

        parts = {}
        for name, f in self.space.fields.items():
            acc = jnp.zeros((f.n_polys, f.block))
            for rows, vals in self._entries[name]:
                acc = acc + jax.ops.segment_sum(
                    vals.reshape(vals.shape[0], f.block), jnp.asarray(rows),
                    num_segments=f.n_polys)
            parts[name] = acc
        return self.space.pack(parts)


def expand_vector_blocks(scalar_blocks, dim: int):
    """[f, i, j] scalar blocks -> [f, dim*i, dim*j] = blocks ⊗ I_dim
    (vector components decouple)."""
    import jax.numpy as jnp

    f, ni, nj = scalar_blocks.shape
    eye = jnp.eye(dim, dtype=scalar_blocks.dtype)
    out = jnp.einsum("fij,de->fdiej", scalar_blocks, eye)
    return out.reshape(f, dim * ni, dim * nj)


def _vec(shape4):
    """[f, d, i, e, j] -> [f, d*i, e*j]."""
    f, d, i, e, j = shape4.shape
    return shape4.reshape(f, d * i, e * j)


def stokes_interior_blocks(Bv, Gv, Bp, w, n, sigma_v, sigma_p, nu,
                           beta=None):
    """All 16 SIPG face blocks of a velocity–pressure DG pair on one
    interior face set.

    Inputs per side s ∈ {0, 1}: Bv[s] [f,q,nbv], Gv[s] [f,q,nbv,dim]
    (real gradients), Bp[s] [f,q,nbp]; w [f,q]; n [f,q,dim] outward from
    side 0; sigma_v/sigma_p [f]; optional beta [f,q,dim] adds the upwind
    convective term (oseen.cc:1086-1240).

    Returns dict {(('v', s_test), ('v', s_trial)): [f, dim*nbv, dim*nbv],
    (('v', s), ('p', t)): [f, dim*nbv, nbp], ...} with the reference's
    sign conventions (darcy_stokes.cc:1190-1412):

      - nu [v]·({∇u}n) - nu [u]·({∇v}n) + sigma_v [v]·[u]
      + {p}[v]·n - {q}[u]·n + sigma_p [p][q]  (- (β·n) v_down·[u])
    """
    import jax.numpy as jnp

    dim = n.shape[-1]
    # jump/average sign of each side: [v] = v0 - v1, {v} = (v0 + v1)/2
    jsign = (1.0, -1.0)
    Gn = [jnp.einsum("fqid,fqd->fqi", Gv[s], n) for s in (0, 1)]
    sv = sigma_v[:, None]
    sp_ = sigma_p[:, None]
    if beta is not None:
        bn = jnp.einsum("fqd,fqd->fq", beta, n)  # [f, q]
        # downwind side: inflow (β·n<0) -> side 0, else side 1
        # v_down = +v0 / +v1 with the sign pattern of the reference
        # (oseen.cc:1027-1063): down0 = ±B0, down1 = ∓B1
        inflow = (bn < 0)
        down_sign = [jnp.where(inflow, 1.0, -1.0),
                     jnp.where(inflow, -1.0, 1.0)]

    out = {}
    for s in (0, 1):
        for t in (0, 1):
            ji, jj = jsign[s], jsign[t]
            # scalar part of the v-v block
            m = (-nu * 0.5 * ji * jnp.einsum("fqi,fqj,fq->fij", Bv[s], Gn[t], w)
                 - nu * 0.5 * jj * jnp.einsum("fqi,fqj,fq->fij", Gn[s], Bv[t], w)
                 + ji * jj * jnp.einsum("fqi,fqj,fq->fij", Bv[s], Bv[t],
                                        w * sv))
            if beta is not None:
                m = m - jj * jnp.einsum(
                    "fqi,fqj,fq->fij", Bv[s], Bv[t], w * bn * down_sign[s])
            out[(("v", s), ("v", t))] = expand_vector_blocks(m, dim)
            # p-p jump stabilization
            out[(("p", s), ("p", t))] = ji * jj * jnp.einsum(
                "fqi,fqj,fq->fij", Bp[s], Bp[t], w * sp_)
            # + {p}[v]·n : test v side s, trial p side t
            vp = 0.5 * ji * jnp.einsum("fqi,fqj,fqd,fq->fdij",
                                       Bv[s], Bp[t], n, w)
            f_, d_, i_, j_ = vp.shape  # [f, dim, nbv_s, nbp_t]
            out[(("v", s), ("p", t))] = vp.reshape(f_, d_ * i_, j_)
            # - {q}[u]·n : test p side s, trial v side t (sides may carry
            # different spaces — shapes must come from pv itself)
            pv = -0.5 * jj * jnp.einsum("fqi,fqj,fqd,fq->fidj",
                                        Bp[s], Bv[t], n, w)
            fp_, ip_, dp_, jp_ = pv.shape  # [f, nbp_s, dim, nbv_t]
            out[(("p", s), ("v", t))] = pv.reshape(fp_, ip_, dp_ * jp_)
    return out


def stokes_boundary_blocks(Bv, Gv, Bp, w, n, sigma_v, nu, beta=None):
    """Boundary (Nitsche weak-Dirichlet) blocks: single side, jump =
    average = own value (darcy_stokes.cc:1019-1101; oseen upwind
    boundary oseen.cc:845-870)."""
    import jax.numpy as jnp

    dim = n.shape[-1]
    Gn = jnp.einsum("fqid,fqd->fqi", Gv, n)
    sv = sigma_v[:, None]
    m = (-nu * jnp.einsum("fqi,fqj,fq->fij", Bv, Gn, w)
         - nu * jnp.einsum("fqi,fqj,fq->fij", Gn, Bv, w)
         + jnp.einsum("fqi,fqj,fq->fij", Bv, Bv, w * sv))
    if beta is not None:
        bn = jnp.einsum("fqd,fqd->fq", beta, n)
        inflow = (bn < 0).astype(w.dtype)
        m = m - jnp.einsum("fqi,fqj,fq->fij", Bv, Bv, w * bn * inflow)
    out = {("v", "v"): expand_vector_blocks(m, dim)}
    vp = jnp.einsum("fqi,fqj,fqd,fq->fdij", Bv, Bp, n, w)
    f_, d_, i_, j_ = vp.shape
    out[("v", "p")] = vp.reshape(f_, d_ * i_, j_)
    pv = -jnp.einsum("fqi,fqj,fqd,fq->fidj", Bp, Bv, n, w)
    out[("p", "v")] = pv.reshape(f_, j_, d_ * i_)
    return out


def stokes_boundary_rhs(Bv, Gv, Bp, w, n, sigma_v, nu, g, beta=None):
    """Dirichlet-data rhs on the velocity boundary: test-v and test-p
    parts (darcy_stokes.cc:1083-1100; oseen.cc:896-910).  g [f,q,dim]."""
    import jax.numpy as jnp

    Gn = jnp.einsum("fqid,fqd->fqi", Gv, n)
    sv = sigma_v[:, None]
    rv = (-nu * jnp.einsum("fqi,fqd,fq->fdi", Gn, g, w)
          + jnp.einsum("fqi,fqd,fq->fdi", Bv, g, w * sv))
    if beta is not None:
        bn = jnp.einsum("fqd,fqd->fq", beta, n)
        inflow = (bn < 0).astype(w.dtype)
        rv = rv - jnp.einsum("fqi,fqd,fq->fdi", Bv, g, w * bn * inflow)
    gn = jnp.einsum("fqd,fqd->fq", g, n)
    rp = -jnp.einsum("fqi,fq,fq->fi", Bp, gn, w)
    f_, d_, i_ = rv.shape
    return rv.reshape(f_, d_ * i_), rp


def scalar_interior_blocks(B, G, w, n, sigma, kappa=1.0):
    """Scalar SIPG face blocks (the Darcy pressure,
    darcy_stokes.cc:1415-1546): dict {(s, t): [f, nb, nb]} with
      - [q]({K∇p}·n) - [p]({K∇q}·n) + sigma [p][q].
    """
    import jax.numpy as jnp

    jsign = (1.0, -1.0)
    Gn = [kappa * jnp.einsum("fqid,fqd->fqi", G[s], n) for s in (0, 1)]
    sg = sigma[:, None]
    out = {}
    for s in (0, 1):
        for t in (0, 1):
            ji, jj = jsign[s], jsign[t]
            out[(s, t)] = (
                -0.5 * ji * jnp.einsum("fqi,fqj,fq->fij", B[s], Gn[t], w)
                - 0.5 * jj * jnp.einsum("fqi,fqj,fq->fij", Gn[s], B[t], w)
                + ji * jj * jnp.einsum("fqi,fqj,fq->fij", B[s], B[t], w * sg))
    return out


def bjs_interface_blocks(Bv, BpD, w, n, nu_over_G):
    """Beavers–Joseph–Saffman interface blocks (darcy_stokes.cc:51-101,
    1548-1664).  Side 0 = Stokes (velocity), side 1 = Darcy (pressure);
    n points from Stokes into Darcy.  Terms (u, v Stokes velocity; p_D,
    q_D Darcy pressure):

        + p_D (v·n)          coupling into the momentum equation
        - q_D (u·n)          mass-flux continuity
        + (ν/G) u_τ · v_τ    BJS slip (tangential projector form,
                             u_τ = u - (u·n) n — reduces to the
                             reference's 2D tangential vector and is
                             well-defined in 3D)

    Returns {('v','p'): [f, dim*nbv, nbpD], ('p','v'): ...,
    ('v','v'): [f, dim*nbv, dim*nbv]}.
    """
    import jax.numpy as jnp

    dim = n.shape[-1]
    f_ = Bv.shape[0]
    vp = jnp.einsum("fqi,fqj,fqd,fq->fdij", Bv, BpD, n, w)
    fdij = vp.shape
    out = {("v", "p"): vp.reshape(f_, dim * fdij[2], fdij[3])}
    pv = -jnp.einsum("fqi,fqj,fqd,fq->fidj", BpD, Bv, n, w)
    out[("p", "v")] = pv.reshape(f_, fdij[3], dim * fdij[2])
    # tangential projector T = I - n n^T per quadrature point
    eye = jnp.eye(dim, dtype=n.dtype)
    T = eye[None, None] - jnp.einsum("fqd,fqe->fqde", n, n)
    vv = nu_over_G * jnp.einsum("fqde,fqi,fqj,fq->fdiej", T, Bv, Bv, w)
    out[("v", "v")] = _vec(vv)
    return out
