"""Matrix-free SIPG operators.

Rebuild of the reference's MatrixFree path
(``Utils::MatrixFreeOperators::LaplaceOperatorDG`` /
``MonodomainOperatorDG``, reference include/utils.h:375-1821): the
operator action v = A u without an assembled matrix.  The reference
evaluates FEEvaluation sum-factorization kernels per cell/face batch; here
the action is three batched einsum pipelines (cells, interior faces,
boundary faces) over *geometry only* — quadrature points, weights,
normals — with basis values recomputed on the fly from the Legendre
recurrence.  Memory per apply is O(geometry), not O(shape tables), which
is what matters at 10^7+ cells; for small p the assembled block-ELL SpMV
is faster, and both are provided (the reference also keeps both paths,
utils.h:533-745 get_system_matrix).

The diagonal (for Chebyshev/Jacobi smoothing, reference utils.h:796-814)
falls out of the same tables: diag = sum_q w (G_ii)^2 etc., computed
without the basis-vector trick because our tables are explicit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from polydeal_tpu.assembly.sipg import default_penalty_constant
from polydeal_tpu.handler import AgglomerationHandler

__all__ = ["PolyReducer", "MatrixFreeLaplace", "MatrixFreeMass"]


@jax.tree_util.register_pytree_node_class
@dataclass
class _Geometry:
    """Static geometry feeding the on-the-fly operator."""

    # cells
    cell_pts: jnp.ndarray  # [n_c, q, dim] unit coords in owning bbox
    cell_w: jnp.ndarray  # [n_c, q]
    cell_ext: jnp.ndarray  # [n_c, dim] owning bbox extents
    cell2poly: np.ndarray  # static
    poly2cells: np.ndarray  # static padded [P, C]
    # interior faces
    fi_pts_in: jnp.ndarray
    fi_pts_out: jnp.ndarray
    fi_w: jnp.ndarray
    fi_n: jnp.ndarray
    fi_hf: jnp.ndarray
    fi_ext_in: jnp.ndarray
    fi_ext_out: jnp.ndarray
    fi_in: np.ndarray  # static
    fi_out: np.ndarray  # static
    # boundary faces
    fb_pts: jnp.ndarray
    fb_w: jnp.ndarray
    fb_n: jnp.ndarray
    fb_hf: jnp.ndarray
    fb_ext: jnp.ndarray
    fb_in: np.ndarray  # static

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static as W

        dyn = (self.cell_pts, self.cell_w, self.cell_ext,
               self.fi_pts_in, self.fi_pts_out, self.fi_w, self.fi_n,
               self.fi_hf, self.fi_ext_in, self.fi_ext_out,
               self.fb_pts, self.fb_w, self.fb_n, self.fb_hf, self.fb_ext)
        aux = (W(self.cell2poly), W(self.poly2cells), W(self.fi_in),
               W(self.fi_out), W(self.fb_in))
        return dyn, aux

    @classmethod
    def tree_unflatten(cls, aux, d):
        from polydeal_tpu.utils.static import unwrap_static as U

        return cls(d[0], d[1], d[2], U(aux[0]), U(aux[1]),
                   d[3], d[4], d[5], d[6], d[7], d[8], d[9],
                   U(aux[2]), U(aux[3]),
                   d[10], d[11], d[12], d[13], d[14], U(aux[4]))


class PolyReducer:
    """Scatter-free reduction of per-entity [n_e, nb] contributions onto
    polytopes: a padded inverse gather map built once per index array
    (TPU: gathers are fast, scatters are not)."""

    def __init__(self, n_poly: int):
        self.n_poly = n_poly
        self._cache = {}

    def __call__(self, contrib, idx):
        # key by id BUT retain the array in the cache entry: if the index
        # array were gc'd and its id reused, a stale map would silently be
        # returned — holding the reference keeps the id valid forever
        key = id(idx)
        if key not in self._cache:
            from polydeal_tpu.utils.grouping import padded_group_lists

            members, _ = padded_group_lists(idx, self.n_poly)
            mask = (members >= 0).astype(np.float64)
            ent = np.maximum(members, 0)
            self._cache[key] = (idx, ent, mask)
        _, ent, mask = self._cache[key]
        return jnp.einsum(
            "pc,pci->pi", jnp.asarray(mask, contrib.dtype), contrib[ent]
        )


class MatrixFreeLaplace:
    """v = A u for the SIPG Laplacian, basis evaluated on the fly."""

    def __init__(self, ah: AgglomerationHandler, penalty_constant=None,
                 dtype=jnp.float32):
        self.ah = ah
        self.basis = ah.basis
        self.n_poly = ah.n_poly
        self.n_basis = ah.n_basis
        self.dtype = dtype
        self.penalty_constant = (
            penalty_constant
            if penalty_constant is not None
            else default_penalty_constant(ah.degree, ah.dim)
        )
        self.reduce = PolyReducer(ah.n_poly)
        fi, fb = ah.faces.interior(), ah.faces.boundary()
        a = lambda x: jnp.asarray(x, dtype=dtype)
        self.geom = _Geometry(
            cell_pts=a(ah.cell_qpoints_unit),
            cell_w=a(ah.cell_qweights),
            cell_ext=a(ah.extents[ah.cell2poly]),
            cell2poly=ah.cell2poly,
            poly2cells=ah.poly2cells,
            fi_pts_in=a(fi.points_in),
            fi_pts_out=a(fi.points_out),
            fi_w=a(fi.weights),
            fi_n=a(fi.normals),
            fi_hf=a(fi.h_f),
            fi_ext_in=a(ah.extents[fi.poly_in]),
            fi_ext_out=a(ah.extents[fi.poly_out]),
            fi_in=fi.poly_in,
            fi_out=fi.poly_out,
            fb_pts=a(fb.points_in),
            fb_w=a(fb.weights),
            fb_n=a(fb.normals),
            fb_hf=a(fb.h_f),
            fb_ext=a(ah.extents[fb.poly_in]),
            fb_in=fb.poly_in,
        )

    # ------------------------------------------------------------------
    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """One operator application (the reference's vmult,
        utils.h:445-473)."""
        g = self.geom
        nb = self.n_basis
        ub = u.reshape(self.n_poly, nb)

        # --- cells: sum_q w (grad u . grad phi_i)
        Bc = self.basis.eval(g.cell_pts).astype(self.dtype)  # [n_c,q,nb]
        Gc = self.basis.grad(g.cell_pts).astype(self.dtype) / \
            g.cell_ext[:, None, None, :]
        u_c = ub[jnp.asarray(g.cell2poly)]  # [n_c, nb]
        gu = jnp.einsum("cqid,ci->cqd", Gc, u_c)
        yc = jnp.einsum("cqid,cqd,cq->ci", Gc, gu, g.cell_w)
        y = self.reduce(yc, g.cell2poly)

        # --- interior faces (both sides in one pass)
        if g.fi_in.shape[0] > 0:
            B0 = self.basis.eval(g.fi_pts_in).astype(self.dtype)
            G0 = self.basis.grad(g.fi_pts_in).astype(self.dtype) / \
                g.fi_ext_in[:, None, None, :]
            B1 = self.basis.eval(g.fi_pts_out).astype(self.dtype)
            G1 = self.basis.grad(g.fi_pts_out).astype(self.dtype) / \
                g.fi_ext_out[:, None, None, :]
            gn0 = jnp.einsum("fqid,fqd->fqi", G0, g.fi_n)
            gn1 = jnp.einsum("fqid,fqd->fqi", G1, g.fi_n)
            u0 = ub[jnp.asarray(g.fi_in)]
            u1 = ub[jnp.asarray(g.fi_out)]
            gamma = (self.penalty_constant / g.fi_hf)[:, None]
            # values/fluxes of u at quadrature points
            v0 = jnp.einsum("fqi,fi->fq", B0, u0)
            v1 = jnp.einsum("fqi,fi->fq", B1, u1)
            dn0 = jnp.einsum("fqi,fi->fq", gn0, u0)
            dn1 = jnp.einsum("fqi,fi->fq", gn1, u1)
            jump = v0 - v1
            avg_dn = 0.5 * (dn0 + dn1)
            w = g.fi_w
            # y0_i += w * (-avg_dn * phi0_i - 0.5*jump*gn0_i + gamma*jump*phi0_i)
            y0 = jnp.einsum("fqi,fq->fi", B0, w * (-avg_dn + gamma * jump)) \
                - 0.5 * jnp.einsum("fqi,fq->fi", gn0, w * jump)
            # y1_i += w * ( avg_dn * phi1_i - 0.5*jump*gn1_i - gamma*jump*phi1_i)
            y1 = jnp.einsum("fqi,fq->fi", B1, w * (avg_dn - gamma * jump)) \
                - 0.5 * jnp.einsum("fqi,fq->fi", gn1, w * jump)
            y = y + self.reduce(y0, g.fi_in)
            y = y + self.reduce(y1, g.fi_out)

        # --- boundary faces
        if g.fb_in.shape[0] > 0:
            Bb = self.basis.eval(g.fb_pts).astype(self.dtype)
            Gb = self.basis.grad(g.fb_pts).astype(self.dtype) / \
                g.fb_ext[:, None, None, :]
            gnb = jnp.einsum("fqid,fqd->fqi", Gb, g.fb_n)
            uB = ub[jnp.asarray(g.fb_in)]
            vb = jnp.einsum("fqi,fi->fq", Bb, uB)
            dnb = jnp.einsum("fqi,fi->fq", gnb, uB)
            gamma = (self.penalty_constant / g.fb_hf)[:, None]
            w = g.fb_w
            yb = jnp.einsum("fqi,fq->fi", Bb, w * (-dnb + gamma * vb)) \
                - jnp.einsum("fqi,fq->fi", gnb, w * vb)
            y = y + self.reduce(yb, g.fb_in)

        return y.reshape(-1)

    def __call__(self, u):
        return self.apply(u)

    def diagonal(self) -> jnp.ndarray:
        """Exact operator diagonal for point-Jacobi/Chebyshev smoothing
        (reference computes it with the basis-vector trick,
        utils.h:796-814; here it is a direct reduction)."""
        g = self.geom
        Bc = self.basis.eval(g.cell_pts).astype(self.dtype)
        Gc = self.basis.grad(g.cell_pts).astype(self.dtype) / \
            g.cell_ext[:, None, None, :]
        dc = jnp.einsum("cqid,cqid,cq->ci", Gc, Gc, g.cell_w)
        d = self.reduce(dc, g.cell2poly)
        if g.fi_in.shape[0] > 0:
            B0 = self.basis.eval(g.fi_pts_in).astype(self.dtype)
            G0 = self.basis.grad(g.fi_pts_in).astype(self.dtype) / \
                g.fi_ext_in[:, None, None, :]
            B1 = self.basis.eval(g.fi_pts_out).astype(self.dtype)
            G1 = self.basis.grad(g.fi_pts_out).astype(self.dtype) / \
                g.fi_ext_out[:, None, None, :]
            gn0 = jnp.einsum("fqid,fqd->fqi", G0, g.fi_n)
            gn1 = jnp.einsum("fqid,fqd->fqi", G1, g.fi_n)
            gamma = (self.penalty_constant / g.fi_hf)[:, None]
            w = g.fi_w
            d0 = jnp.einsum("fqi,fqi,fq->fi", B0, -gn0 + gamma[..., None] * B0, w)
            d1 = jnp.einsum("fqi,fqi,fq->fi", B1, gn1 + gamma[..., None] * B1, w)
            d = d + self.reduce(d0, g.fi_in)
            d = d + self.reduce(d1, g.fi_out)
        if g.fb_in.shape[0] > 0:
            Bb = self.basis.eval(g.fb_pts).astype(self.dtype)
            Gb = self.basis.grad(g.fb_pts).astype(self.dtype) / \
                g.fb_ext[:, None, None, :]
            gnb = jnp.einsum("fqid,fqd->fqi", Gb, g.fb_n)
            gamma = (self.penalty_constant / g.fb_hf)[:, None]
            db = jnp.einsum(
                "fqi,fqi,fq->fi", Bb, -2.0 * gnb + gamma[..., None] * Bb, g.fb_w
            )
            d = d + self.reduce(db, g.fb_in)
        return d.reshape(-1)


class MatrixFreeMass:
    """v = M u (+ optional coefficient), the mass action used by the
    monodomain operator's chi*C_m/dt term (reference utils.h:1499-1559)."""

    def __init__(self, ah: AgglomerationHandler, coeff_fn=None,
                 dtype=jnp.float32):
        self.ah = ah
        self.n_poly, self.n_basis = ah.n_poly, ah.n_basis
        self.dtype = dtype
        self.pts = jnp.asarray(ah.cell_qpoints_unit, dtype=dtype)
        w = jnp.asarray(ah.cell_qweights, dtype=dtype)
        if coeff_fn is not None:
            w = w * coeff_fn(jnp.asarray(ah.cell_qpoints_real, dtype=dtype))
        self.w = w
        self.cell2poly = ah.cell2poly
        self.reduce = PolyReducer(ah.n_poly)

    def apply(self, u):
        B = self.ah.basis.eval(self.pts).astype(self.dtype)
        ub = u.reshape(self.n_poly, self.n_basis)[jnp.asarray(self.cell2poly)]
        vq = jnp.einsum("cqi,ci->cq", B, ub)
        yc = jnp.einsum("cqi,cq,cq->ci", B, vq, self.w)
        return self.reduce(yc, self.cell2poly).reshape(-1)

    def __call__(self, u):
        return self.apply(u)
