"""Simplex mesh + polytopal DG on simplices (reference simplex paths:
exact_solutions_dgp, simplex_agglomerated_multigrid)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.fem.quadrature import grundmann_moeller
from polydeal_tpu.mesh.simplex import SimplexMesh, triangulated_hyper_cube
from polydeal_tpu.agglomeration import RTreeAgglomerator, agglomerate_by_partition
from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs, project
from polydeal_tpu.postprocess import compute_global_error
from polydeal_tpu.solvers import cg_solve, block_jacobi_preconditioner


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("s", [1, 2, 3])
def test_gm_quadrature_exactness(dim, s):
    """GM rule of index s integrates monomials of degree <= 2s+1 exactly."""
    from math import factorial, prod

    pts, wts = grundmann_moeller(dim, s)
    assert abs(wts.sum() - 1.0 / factorial(dim)) < 1e-13
    # exact integral of x^a y^b (z^c) over unit simplex: a!b!c!/(a+b+c+dim)!
    rng = np.random.default_rng(0)
    for _ in range(5):
        alpha = rng.integers(0, s + 1, size=dim)
        while alpha.sum() > 2 * s + 1:
            alpha = rng.integers(0, s + 1, size=dim)
        val = np.sum(wts * np.prod(pts ** alpha[None, :], axis=1))
        exact = prod(factorial(int(a)) for a in alpha) / factorial(
            int(alpha.sum()) + dim)
        assert abs(val - exact) < 1e-13


@pytest.mark.parametrize("dim", [2, 3])
def test_simplex_mesh_measures(dim):
    m = triangulated_hyper_cube(dim, 3)
    assert np.allclose(m.cell_measures().sum(), 1.0, atol=1e-12)
    _, jxw = m.volume_quadrature(2)
    assert np.allclose(jxw.sum(), 1.0, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_simplex_face_quadrature(dim):
    m = triangulated_hyper_cube(dim, 2)
    pts, jxw, normals = m.face_quadrature(2)
    # divergence theorem per cell
    flux = np.einsum("cfq,cfqd->cd", jxw, normals)
    assert np.allclose(flux, 0.0, atol=1e-12)
    xdotn = np.einsum("cfq,cfqd,cfqd->c", jxw, normals, pts)
    assert np.allclose(xdotn, dim * m.cell_measures(), atol=1e-12)
    # boundary of the domain sums to its surface
    nb = m.neighbors
    assert np.allclose(jxw[nb < 0].sum(), 2.0 * dim, atol=1e-10)


def test_simplex_neighbors_conforming():
    m = triangulated_hyper_cube(3, 2)
    nb = m.neighbors
    # Kuhn triangulation is conforming: every interior face matched
    for c in range(m.n_cells):
        for f in range(4):
            n = nb[c, f]
            if n >= 0:
                assert c in nb[n]


def test_simplex_sipg_exact_linear():
    """u = x + y solved exactly on agglomerated triangles (reference
    exact_solutions_dgp pattern on simplex grids)."""
    m = triangulated_hyper_cube(2, 4)
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors, 8)
    ah = pd.AgglomerationHandler(m, c2p, degree=1)
    u_ex = lambda x: x[..., 0] + x[..., 1]
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: jnp.zeros_like(x[..., 0]), u_ex)
    res = cg_solve(A.matvec, b, M=block_jacobi_preconditioner(A.diag_blocks()),
                   rtol=1e-13, maxiter=3000)
    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 1e-11


def test_simplex_rtree_agglomerated_solve():
    """Product-sine Poisson on R-tree-agglomerated tets converges."""
    m = triangulated_hyper_cube(3, 4)
    agg = RTreeAgglomerator.build(m.cell_centers())
    ah = pd.AgglomerationHandler(m, agg.extract_agglomerates(2), degree=1)
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 3 * jnp.pi**2 * u_ex(x), u_ex)
    res = cg_solve(A.matvec, b, M=block_jacobi_preconditioner(A.diag_blocks()),
                   rtol=1e-9, maxiter=3000)
    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 0.3
    # projection of the exact solution is at least as accurate
    up = project(ah, u_ex)
    l2p, _ = compute_global_error(ah, up, u_ex)
    assert float(l2p) <= float(l2) * 1.01


def test_simplex_agglomerated_multigrid():
    """R3MG on a simplex (triangle) mesh: the reference's
    simplex_agglomerated_multigrid.cc — MG-CG converges in few
    iterations and reaches discretization accuracy."""
    from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy

    m = triangulated_hyper_cube(2, 16)
    agg = RTreeAgglomerator.build(m.cell_centers())
    handlers, parents = build_rtree_hierarchy(
        m, agg, list(range(1, agg.n_levels - 1)), degree=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg = build_multigrid(handlers, parents, A)
    res = mg.solve_cg(b, rtol=1e-9)
    assert int(res.iterations) < 40
    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 0.05
