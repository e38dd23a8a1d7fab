"""Boundary-id machinery + the 3D piston application.

Mirrors the reference's per-id boundary handling (Neumann no-op faces,
utils.h:1647-1659) and the 3D piston distributed app
(examples/3D_piston.cc) at test scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import agglomerate_by_partition
from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
from polydeal_tpu.solvers import cg_solve, block_jacobi_preconditioner


def test_mixed_bc_exactness():
    """u = x with Dirichlet on the vertical sides and homogeneous
    Neumann on the horizontal sides is reproduced exactly — the sharpest
    check that per-id Dirichlet/Neumann splitting is consistent."""
    mesh = pd.hyper_cube(2, 8)
    # id 1 = x-normal faces (Dirichlet), id 0 = y-normal (Neumann)
    mesh.mark_boundary(
        lambda fc, nrm: (np.abs(nrm[:, 0]) > 0.5).astype(np.int32))
    c2p = agglomerate_by_partition(mesh.cell_centers(), mesh.neighbors, 6)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
    u_ex = lambda x: x[..., 0]
    A = assemble_sipg_matrix(ah, dirichlet_ids=(1,))
    b = assemble_rhs(ah, lambda x: jnp.zeros(x.shape[:-1]), u_ex,
                     dirichlet_ids=(1,),
                     neumann_fn=lambda x, n: jnp.zeros(x.shape[:-1]))
    res = cg_solve(A.matvec, b,
                   M=block_jacobi_preconditioner(A.diag_blocks()),
                   rtol=1e-13, maxiter=2000)
    from polydeal_tpu.postprocess import compute_global_error

    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 1e-10


def test_inhomogeneous_neumann():
    """u = x² + y² on the unit square: Dirichlet left/right, Neumann
    top/bottom with g_N = ∇u·n — convergence-level accuracy at p=2."""
    mesh = pd.hyper_cube(2, 8)
    mesh.mark_boundary(
        lambda fc, nrm: (np.abs(nrm[:, 0]) > 0.5).astype(np.int32))
    c2p = agglomerate_by_partition(mesh.cell_centers(), mesh.neighbors, 6)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=2)
    u_ex = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2
    gN = lambda x, n: 2 * (x[..., 0] * n[..., 0] + x[..., 1] * n[..., 1])
    A = assemble_sipg_matrix(ah, dirichlet_ids=(1,))
    b = assemble_rhs(ah, lambda x: jnp.full(x.shape[:-1], -4.0), u_ex,
                     dirichlet_ids=(1,), neumann_fn=gN)
    res = cg_solve(A.matvec, b,
                   M=block_jacobi_preconditioner(A.diag_blocks()),
                   rtol=1e-13, maxiter=3000)
    from polydeal_tpu.postprocess import compute_global_error

    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 1e-9  # quadratic is exact for p=2


def test_piston_mesh_geometry():
    from polydeal_tpu.models.piston import piston_mesh

    mesh = piston_mesh(10)
    assert mesh.dim == 3 and mesh.n_cells > 300
    bids = mesh.boundary_id_array()
    present = set(np.unique(bids[bids >= 0]).tolist())
    assert {0, 1, 2} <= present
    # carved geometry: fewer cells than the full box
    assert mesh.n_cells < 10 ** 3


def test_piston_solve_maximum_principle():
    from polydeal_tpu.models.piston import solve_piston

    out, _ = solve_piston(n=10, degree=1, rtol=1e-8, verbose=False)
    assert out["iterations"] < 120
    # bounded by the Dirichlet data up to small DG over/undershoot
    assert out["u_min"] > -0.12 and out["u_max"] < 1.12
