"""Quadrature and basis unit tests (reference tier-1 analogues)."""

import numpy as np
import pytest

import jax.numpy as jnp

from polydeal_tpu.fem.quadrature import (
    gauss_legendre_1d,
    tensor_gauss,
    face_quadrature,
    embed_face_points,
)
from polydeal_tpu.fem.basis import LegendreDGP, TensorDGQ, make_basis


def test_gauss_1d_exactness():
    for n in range(1, 8):
        p, w = gauss_legendre_1d(n)
        for deg in range(2 * n):
            exact = 1.0 / (deg + 1)
            assert abs(np.sum(w * p**deg) - exact) < 1e-13


def test_tensor_gauss_volume():
    for dim in (2, 3):
        p, w = tensor_gauss(dim, 3)
        assert p.shape == (3**dim, dim)
        assert abs(w.sum() - 1.0) < 1e-14
        # integrate x0 * x1 over unit cube = 1/4
        assert abs(np.sum(w * p[:, 0] * p[:, 1]) - 0.25) < 1e-14


def test_embed_face_points():
    fp, _ = face_quadrature(3, 2)
    emb = embed_face_points(fp, axis=1, side=1)
    assert np.all(emb[:, 1] == 1.0)
    assert emb.shape == (4, 3)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_legendre_orthonormal(dim, degree):
    """Modal basis is L2-orthonormal on [0,1]^dim with constant first mode
    (parity with FE_AggloDGP, reference fe_agglodgp.h:31-73)."""
    b = LegendreDGP(dim, degree)
    pts, wts = tensor_gauss(dim, degree + 1)
    V = np.asarray(b.eval(pts))
    M = (V * wts[:, None]).T @ V
    assert np.allclose(M, np.eye(b.n_basis), atol=1e-12)
    assert np.allclose(V[:, 0], V[0, 0])  # first mode constant


def test_legendre_n_basis():
    assert LegendreDGP(2, 2).n_basis == 6
    assert LegendreDGP(3, 2).n_basis == 10
    assert LegendreDGP(2, 3).n_basis == 10


@pytest.mark.parametrize("dim", [1, 2])
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_legendre_gradients_fd(dim, degree):
    b = LegendreDGP(dim, degree)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 0.9, size=(5, dim))
    g = np.asarray(b.grad(x))
    eps = 1e-6
    for d in range(dim):
        xp = x.copy()
        xp[:, d] += eps
        xm = x.copy()
        xm[:, d] -= eps
        fd = (np.asarray(b.eval(xp)) - np.asarray(b.eval(xm))) / (2 * eps)
        assert np.allclose(g[:, :, d], fd, atol=1e-6)


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_dgq_nodal(degree):
    """Lagrange basis is 1 at its own node, 0 at others."""
    b = TensorDGQ(2, degree)
    from polydeal_tpu.fem.basis import _gauss_lobatto_01

    nodes1d = _gauss_lobatto_01(degree + 1)
    E = b.exponents
    nodes = np.stack([nodes1d[E[:, 0]], nodes1d[E[:, 1]]], axis=-1)
    V = np.asarray(b.eval(nodes))
    assert np.allclose(V, np.eye(b.n_basis), atol=1e-10)


def test_dgq_partition_of_unity():
    b = TensorDGQ(3, 2)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(7, 3))
    V = np.asarray(b.eval(x))
    assert np.allclose(V.sum(axis=-1), 1.0, atol=1e-12)


def test_make_basis():
    assert make_basis("dgp", 2, 2).n_basis == 6
    assert make_basis("dgq", 2, 2).n_basis == 9
    with pytest.raises(ValueError):
        make_basis("nope", 2, 1)


# ---------------------------------------------------------------- hp


def test_hp_two_degree_exactness():
    """Per-polytope degree (hp): a two-degree space (p=1 left / p=2
    right) reproduces a LINEAR solution to round-off everywhere, and a
    QUADRATIC one where p=2 locally suffices — the spirit of the
    reference's test/polydeal/fe_collection_agglomeration.cc over its
    hp distribute_agglomerated_dofs (agglomeration_handler.cc:381-474)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.fem.hp import (
        build_hp_poisson, hp_l2_error, solve_hp_dense)

    mesh = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    c2p = agg.extract_agglomerates(2)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1, n_quad=3)
    # polytope centers -> left half p=1, right half p=2
    cx = np.zeros(ah.n_poly)
    np.add.at(cx, c2p, mesh.cell_centers()[:, 0])
    cx /= np.bincount(c2p)
    degrees = np.where(cx < 0.5, 1, 2)
    assert (degrees == 1).any() and (degrees == 2).any()

    # dof bookkeeping: 3 per p1 polytope + 6 per p2 polytope (2D DGP)
    u_lin = lambda x: 1.0 + 2 * x[..., 0] - x[..., 1]
    space, op, rhs = build_hp_poisson(
        ah, degrees, f_fn=lambda x: jnp.zeros(x.shape[:-1]), g_fn=u_lin)
    n1, n2 = int((degrees == 1).sum()), int((degrees == 2).sum())
    assert space.n_dofs == 3 * n1 + 6 * n2
    x = solve_hp_dense(space, op, rhs)
    err = hp_l2_error(ah, space, degrees, x, u_lin)
    assert err < 1e-11, err

    # quadratic: exact where every polytope has p >= 2
    u_quad = lambda x: x[..., 0] ** 2 + 0.5 * x[..., 1] ** 2
    f_quad = lambda x: -3.0 * jnp.ones(x.shape[:-1])
    deg2 = np.full(ah.n_poly, 2)
    space2, op2, rhs2 = build_hp_poisson(ah, deg2, f_fn=f_quad, g_fn=u_quad)
    x2 = solve_hp_dense(space2, op2, rhs2)
    err2 = hp_l2_error(ah, space2, deg2, x2, u_quad)
    assert err2 < 1e-11, err2

    # and with the MIXED space, the quadratic error localizes: the p=2
    # bucket's contribution is discretization-limited by the p=1 side
    # only through the interface — global error far above round-off but
    # bounded (sanity that mixed-degree coupling is consistent)
    space3, op3, rhs3 = build_hp_poisson(ah, degrees, f_fn=f_quad,
                                         g_fn=u_quad)
    x3 = solve_hp_dense(space3, op3, rhs3)
    err3 = hp_l2_error(ah, space3, degrees, x3, u_quad)
    assert 1e-9 < err3 < 0.05, err3


def test_hp_three_degree_buckets():
    """hp with THREE degree buckets (p = 1/2/3 by x-thirds) on an R-tree
    agglomeration: dof bookkeeping is 3/6/10 per polytope, a linear
    solution is exact everywhere, and the mixed-degree rectangular
    coupling blocks stay consistent (a cubic is limited only by the lower
    buckets).  Extends the 2-bucket coverage toward the reference's
    fe_collection machinery (test/polydeal/fe_collection_agglomeration.cc)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.fem.hp import (
        build_hp_poisson, hp_l2_error, solve_hp_dense)

    mesh = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    c2p = agg.extract_agglomerates(2)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1, n_quad=4)
    cx = np.zeros(ah.n_poly)
    np.add.at(cx, c2p, mesh.cell_centers()[:, 0])
    cx /= np.bincount(c2p)
    degrees = np.where(cx < 1 / 3, 1, np.where(cx < 2 / 3, 2, 3))
    assert all((degrees == p).any() for p in (1, 2, 3)), degrees

    u_lin = lambda x: 1.0 + 2 * x[..., 0] - x[..., 1]
    space, op, rhs = build_hp_poisson(
        ah, degrees, f_fn=lambda x: jnp.zeros(x.shape[:-1]), g_fn=u_lin)
    counts = [int((degrees == p).sum()) for p in (1, 2, 3)]
    assert space.n_dofs == 3 * counts[0] + 6 * counts[1] + 10 * counts[2]
    x = solve_hp_dense(space, op, rhs)
    err = hp_l2_error(ah, space, degrees, x, u_lin)
    assert err < 1e-11, err

    # cubic manufactured solution: exact nowhere globally (the p=1/2
    # buckets limit it) but the solve must stay consistent and bounded
    u_cub = lambda x: x[..., 0] ** 3 - 3 * x[..., 0] * x[..., 1] ** 2
    f_cub = lambda x: jnp.zeros(x.shape[:-1])
    space3, op3, rhs3 = build_hp_poisson(ah, degrees, f_fn=f_cub,
                                         g_fn=u_cub)
    x3 = solve_hp_dense(space3, op3, rhs3)
    err3 = hp_l2_error(ah, space3, degrees, x3, u_cub)
    assert 1e-10 < err3 < 0.05, err3

    # and with p=3 everywhere the cubic IS exact — the p=3 hp bucket's
    # volume/face kernels are correct in isolation too
    deg3 = np.full(ah.n_poly, 3)
    space4, op4, rhs4 = build_hp_poisson(ah, deg3, f_fn=f_cub, g_fn=u_cub)
    x4 = solve_hp_dense(space4, op4, rhs4)
    err4 = hp_l2_error(ah, space4, deg3, x4, u_cub)
    assert err4 < 1e-10, err4


def test_hp_interpolate_to_fine():
    """The two-degree hp solution interpolates to a fine DGQ space and
    reproduces the exact linear nodally (reference hp
    interpolate_to_fine_grid, poly_utils.h:1322-1458)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.fem.basis import _gauss_lobatto_01, make_basis
    from polydeal_tpu.fem.hp import (build_hp_poisson,
                                     interpolate_hp_to_fine_grid,
                                     solve_hp_dense)

    mesh = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    c2p = agg.extract_agglomerates(2)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1, n_quad=3)
    cx = np.zeros(ah.n_poly)
    np.add.at(cx, c2p, mesh.cell_centers()[:, 0])
    cx /= np.bincount(c2p)
    degrees = np.where(cx < 0.5, 1, 2)
    u_lin = lambda x: 1.0 + 2 * x[..., 0] - x[..., 1]
    space, op, rhs = build_hp_poisson(
        ah, degrees, f_fn=lambda x: jnp.zeros(x.shape[:-1]), g_fn=u_lin)
    x = solve_hp_dense(space, op, rhs)
    vals = interpolate_hp_to_fine_grid(space, ah, x)  # [n_c, (p+1)^2]
    nodes1d = _gauss_lobatto_01(3)  # target degree = max bucket = 2
    E = make_basis("dgq", 2, 2).exponents
    unit = np.stack([nodes1d[E[:, d]] for d in range(2)], axis=-1)
    pts = mesh.map_points(unit)
    exact = u_lin(jnp.asarray(pts))
    assert float(jnp.abs(vals - exact).max()) < 1e-10
