"""Quadrature and basis unit tests (reference tier-1 analogues)."""

import numpy as np
import pytest

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
