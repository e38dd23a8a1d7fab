"""Post-processing: error norms, field evaluation, fine-grid interpolation.

Rebuilds the reference's L7 layer (reference include/poly_utils.h:708-1750:
``interpolate_to_fine_grid``, ``compute_global_error``) as batched
evaluations over the materialized quadrature — the "interpolation matrix"
of the reference collapses to evaluating the polytopal modal basis at
fine-cell points (both spaces live on the same background mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from polydeal_tpu.assembly.sipg import VolumeTables, build_volume_tables
from polydeal_tpu.handler import AgglomerationHandler

__all__ = [
    "evaluate_at_quadrature",
    "compute_global_error",
    "interpolate_to_fine_grid",
    "interpolate_field_to_fine_grid",
]


def evaluate_at_quadrature(ah: AgglomerationHandler, u: jnp.ndarray,
                           vol: VolumeTables | None = None):
    """(u_h, grad u_h) at the composite quadrature points: per fine cell."""
    if vol is None:
        vol = build_volume_tables(ah)
    ub = u.reshape(ah.n_poly, ah.n_basis)[jnp.asarray(vol.cell2poly)]  # [n_c, nb]
    vals = jnp.einsum("cqi,ci->cq", vol.B, ub)
    grads = jnp.einsum("cqid,ci->cqd", vol.G, ub)
    return vals, grads


def compute_global_error(
    ah: AgglomerationHandler,
    u: jnp.ndarray,
    exact_fn,
    exact_grad_fn=None,
    vol: VolumeTables | None = None,
):
    """Global L2 error and (optionally) H1 seminorm error vs an exact
    solution (reference poly_utils.h:1647-1750).  Returns (l2, h1semi)
    with h1semi = None when no gradient is given.

    Under sharding the sums become ``psum``s automatically when called
    inside shard_map — they are plain reductions over cell arrays.
    """
    if vol is None:
        vol = build_volume_tables(ah)
    vals, grads = evaluate_at_quadrature(ah, u, vol)
    diff = vals - exact_fn(vol.x)
    l2 = jnp.sqrt(jnp.sum(vol.w * diff**2))
    h1 = None
    if exact_grad_fn is not None:
        gdiff = grads - exact_grad_fn(vol.x)
        h1 = jnp.sqrt(jnp.sum(vol.w * jnp.sum(gdiff**2, axis=-1)))
    return l2, h1


def interpolate_to_fine_grid(
    ah: AgglomerationHandler,
    u: jnp.ndarray,
    degree: int | None = None,
    family: str = "dgq",
    n_components: int = 1,
    basis=None,
):
    """Interpolate a polytopal DG field onto a DG space on the fine
    background mesh (reference poly_utils.h:1145-1458, incl. the system
    and hp variants).

    Targets: ``family='dgq'`` — nodal values at Gauss–Lobatto points
    (interpolation); ``family='dgp'`` — modal Legendre coefficients via
    per-cell L2 projection in unit coordinates.  Both are EXACT: a
    polytopal polynomial restricts to a polynomial on every fine cell.

    ``n_components > 1`` treats u as component-major vector dofs
    [n_poly, n_components, n_basis] (the FESystem layout of the coupled
    apps); output is [n_cells, n_components, n_fine_basis]
    (squeezed for scalars).

    ``basis`` overrides the source basis (default: the handler's own) —
    required for mixed-degree system fields whose basis differs from the
    handler's (the reference's hp interpolation variant,
    poly_utils.h:1322-1458).
    """
    from polydeal_tpu.fem.basis import make_basis, _gauss_lobatto_01
    from polydeal_tpu.fem.quadrature import tensor_gauss

    basis = basis or ah.basis
    if degree is None:
        degree = basis.degree
    fine = make_basis(family, ah.dim, degree)
    if family == "dgq":
        nodes1d = _gauss_lobatto_01(degree + 1)
        E = fine.exponents
        unit_pts = np.stack([nodes1d[E[:, d]] for d in range(ah.dim)],
                            axis=-1)
        W = None  # pure interpolation at the nodes
    elif family == "dgp":
        # modal target: exact L2 projection on the unit cell; with the
        # orthonormal Legendre basis the projector is B_fine^T diag(w)
        unit_pts, wts = tensor_gauss(ah.dim, degree + 1)
        W = jnp.asarray(fine.eval(jnp.asarray(unit_pts))) * wts[:, None]
        # [q, n_fine_b]: coeff_j = sum_q w_q phi_j(x_q) u(x_q)
    else:
        raise NotImplementedError(f"unsupported target family {family}")
    # real coords of each cell's sample points, pulled back to the bbox
    real = ah.mesh.map_points(unit_pts)  # [n_c, n_pts, dim]
    unit_in_poly = ah.to_unit(ah.cell2poly, real)
    B = basis.eval(jnp.asarray(unit_in_poly))  # [n_c, n_pts, nb]
    ub = u.reshape(ah.n_poly, n_components,
                   basis.n_basis)[jnp.asarray(ah.cell2poly)]
    vals = jnp.einsum("cni,cdi->cdn", B, ub)  # [n_c, comp, n_pts]
    if W is not None:
        vals = jnp.einsum("cdq,qj->cdj", vals, W)
    return vals[:, 0] if n_components == 1 else vals


def interpolate_field_to_fine_grid(space, ah, x, name: str,
                                   degree: int | None = None,
                                   family: str = "dgq"):
    """Interpolate one field of a multi-field SystemSpace solution to the
    fine grid: [n_cells, n_components, n_fine_basis], zero on cells
    outside the field's subdomain (the reference's hp interpolation,
    poly_utils.h:1322-1458)."""
    f = space.fields[name]
    ub = space.unpack(x, name)  # [n_polys_f, comp, nb]
    full = jnp.zeros((ah.n_poly,) + ub.shape[1:], dtype=ub.dtype)
    full = full.at[jnp.asarray(f.polys)].set(ub)
    out = interpolate_to_fine_grid(ah, full.reshape(-1), degree=degree,
                                   family=family,
                                   n_components=f.n_components,
                                   basis=f.basis)
    return out if f.n_components > 1 else out[:, None, :]
