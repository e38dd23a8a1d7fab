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
):
    """Interpolate a polytopal DG field onto a nodal DG space on the fine
    background mesh (reference poly_utils.h:1145-1458).

    Returns [n_cells, n_fine_basis] nodal values of the target space —
    enough for VTU export or further fine-grid computation.  Exact (not a
    projection): polytopal polynomials restrict to polynomials on cells.
    """
    from polydeal_tpu.fem.basis import make_basis, _gauss_lobatto_01

    if degree is None:
        degree = ah.degree
    fine = make_basis(family, ah.dim, degree)
    # nodal points of the fine space on the unit cell
    if family == "dgq":
        nodes1d = _gauss_lobatto_01(degree + 1)
        E = fine.exponents
        unit_nodes = np.stack([nodes1d[E[:, d]] for d in range(ah.dim)], axis=-1)
    else:
        raise NotImplementedError("nodal target space required")
    # real coords of each cell's nodes, pulled back to the owning bbox
    real = ah.mesh.map_points(unit_nodes)  # [n_c, n_nodes, dim]
    unit_in_poly = ah.to_unit(ah.cell2poly, real)
    B = ah.basis.eval(jnp.asarray(unit_in_poly))  # [n_c, n_nodes, nb]
    ub = u.reshape(ah.n_poly, ah.n_basis)[jnp.asarray(ah.cell2poly)]
    return jnp.einsum("cni,ci->cn", B, ub)
