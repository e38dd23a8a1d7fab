"""Fine mesh geometry/connectivity tests."""

import numpy as np
import pytest

from polydeal_tpu.mesh.fine_mesh import hyper_cube, hyper_rectangle, distort_random


def test_hyper_cube_counts():
    m = hyper_cube(2, 4)
    assert m.n_cells == 16
    assert m.n_vertices == 25
    m3 = hyper_cube(3, 3)
    assert m3.n_cells == 27
    assert m3.n_vertices == 64


def test_neighbors_structured_2d():
    m = hyper_cube(2, 2)
    nb = m.neighbors
    assert nb.shape == (4, 4)
    # every interior face matched symmetrically
    for c in range(4):
        for f in range(4):
            n = nb[c, f]
            if n >= 0:
                assert c in nb[n]
    # total boundary faces = perimeter = 8
    assert (nb < 0).sum() == 8


def test_neighbors_structured_3d():
    m = hyper_cube(3, 2)
    nb = m.neighbors
    assert (nb < 0).sum() == 6 * 4  # 6 sides x 4 faces


@pytest.mark.parametrize("dim", [2, 3])
def test_volume_quadrature_measures(dim):
    m = hyper_cube(dim, 3, 0.0, 2.0)
    _, jxw = m.volume_quadrature(2)
    assert np.allclose(jxw.sum(), 2.0**dim, atol=1e-12)
    assert np.allclose(m.cell_measures(), (2.0 / 3) ** dim, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_face_quadrature_surface_and_normals(dim):
    m = hyper_cube(dim, 2)
    pts, jxw, normals = m.face_quadrature(2)
    # each cell of size 1/2: face measure (1/2)^(dim-1)
    assert np.allclose(jxw.sum(axis=-1), 0.5 ** (dim - 1), atol=1e-12)
    # normals unit and outward (dot with center-to-face > 0)
    centers = m.cell_centers()
    fcenters = pts.mean(axis=2)  # [c, f, dim]
    outward = np.einsum("cfqd,cfd->cfq", normals, fcenters - centers[:, None, :])
    assert (outward > 0).all()
    assert np.allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-12)


def test_distorted_divergence_theorem():
    """∮ n dS = 0 and ∮ x·n dS = dim * |cell| on a distorted mesh."""
    m = distort_random(hyper_cube(2, 4), 0.2, seed=3)
    pts, jxw, normals = m.face_quadrature(3)
    flux = np.einsum("cfq,cfqd->cd", jxw, normals)
    assert np.allclose(flux, 0.0, atol=1e-12)
    xdotn = np.einsum("cfq,cfqd,cfqd->c", jxw, normals, pts)
    assert np.allclose(xdotn, 2.0 * m.cell_measures(3), atol=1e-12)


def test_distort_keeps_boundary():
    m0 = hyper_cube(2, 4)
    m = distort_random(m0, 0.2, seed=1)
    bmask = m0.boundary_vertex_mask()
    assert np.allclose(m.vertices[bmask], m0.vertices[bmask])
    assert not np.allclose(m.vertices[~bmask], m0.vertices[~bmask])


def test_hyper_rectangle_anisotropic():
    m = hyper_rectangle(2, [4, 2], lo=[0, 0], hi=[2, 1])
    assert m.n_cells == 8
    assert np.allclose(m.cell_measures(), 0.25, atol=1e-13)
