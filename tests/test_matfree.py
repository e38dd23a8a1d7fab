"""Matrix-free operator tests: action must match the assembled matrix
(the reference's get_system_matrix cross-check, utils.h:533-745)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import agglomerate_by_partition
from polydeal_tpu.assembly import assemble_sipg_matrix, mass_matrix
from polydeal_tpu.assembly.matfree import MatrixFreeLaplace, MatrixFreeMass


def make_handler(dim=2, n=4, degree=1, distort=0.15, n_agglo=4):
    m0 = pd.hyper_cube(dim, n)
    m = pd.distort_random(m0, distort, seed=5) if distort else m0
    c2p = agglomerate_by_partition(m0.cell_centers(), m0.neighbors, n_agglo)
    return pd.AgglomerationHandler(m, c2p, degree=degree)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (3, 1)])
def test_matfree_matches_assembled(dim, degree):
    ah = make_handler(dim=dim, degree=degree)
    A = assemble_sipg_matrix(ah)
    op = MatrixFreeLaplace(ah, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=ah.n_dofs))
        y_mat = A.matvec(x)
        y_mf = op.apply(x)
        assert np.allclose(np.asarray(y_mat), np.asarray(y_mf), atol=1e-11)


def test_matfree_diagonal_matches():
    ah = make_handler(dim=2, degree=2)
    A = assemble_sipg_matrix(ah)
    op = MatrixFreeLaplace(ah, dtype=jnp.float64)
    assert np.allclose(np.asarray(A.diagonal()), np.asarray(op.diagonal()),
                       atol=1e-11)


def test_matfree_mass_matches():
    ah = make_handler(dim=2, degree=1)
    M = mass_matrix(ah)
    op = MatrixFreeMass(ah, dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(1).normal(size=ah.n_dofs))
    assert np.allclose(np.asarray(M.matvec(x)), np.asarray(op.apply(x)),
                       atol=1e-12)


def test_matfree_no_boundary_faces_subset():
    """Operator works when some polytope touches no boundary."""
    ah = make_handler(dim=2, n=6, n_agglo=9, distort=0.0)
    op = MatrixFreeLaplace(ah, dtype=jnp.float64)
    A = assemble_sipg_matrix(ah)
    x = jnp.ones(ah.n_dofs)
    assert np.allclose(np.asarray(A.matvec(x)), np.asarray(op.apply(x)),
                       atol=1e-11)


def test_matfree_fine_level_mg():
    """Matrix-free finest operator composed over assembled coarse levels
    (the reference's flagship composition, agglo_amg.cc:1105-1110):
    must reach the same solution and comparable iterations as the fully
    assembled MG-CG."""
    import polydeal_tpu as pd
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
    from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy

    n = 16
    mesh = pd.hyper_cube(2, n)
    handlers, parents, gs = build_structured_hierarchy(mesh, n, degree=2)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    A = assemble_sipg_matrix(ah)
    mg_a = build_multigrid(handlers, parents, A, grid_shapes=gs)
    mg_f = build_multigrid(handlers, parents, None, grid_shapes=gs,
                           matfree_fine=True)
    res_a = mg_a.solve_cg(b, rtol=1e-10)
    res_f = mg_f.solve_cg(b, rtol=1e-10)
    assert abs(int(res_a.iterations) - int(res_f.iterations)) <= 2
    assert np.allclose(np.asarray(res_a.x), np.asarray(res_f.x), atol=1e-8)
