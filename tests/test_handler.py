"""AgglomerationHandler geometry/connectivity tests.

Mirrors reference tier-1/2: agg_handler_bbox_test, agglomerated_neighbors,
reinit_cell_face (perimeter/area via the face table), polytope_iterator.
"""

import numpy as np
import pytest

from polydeal_tpu.mesh.fine_mesh import hyper_cube, distort_random
from polydeal_tpu.handler import AgglomerationHandler


def quarters_2x2(m):
    """4x4 grid agglomerated into 4 quadrant polytopes (the reference's
    canonical test configuration)."""
    centers = m.cell_centers()
    return (centers[:, 0] > 0.5).astype(np.int32) * 1 + (
        centers[:, 1] > 0.5
    ).astype(np.int32) * 2


def test_bboxes():
    m = hyper_cube(2, 4)
    ah = AgglomerationHandler(m, quarters_2x2(m), degree=1)
    assert ah.n_poly == 4
    assert np.allclose(ah.extents, 0.5)
    assert np.allclose(ah.diameters, np.sqrt(0.5))
    assert np.allclose(ah.volumes, 0.25)


def test_volume_quadrature_sums_to_measure():
    m = distort_random(hyper_cube(2, 4), 0.15, seed=5)
    ah = AgglomerationHandler(m, quarters_2x2(hyper_cube(2, 4)), degree=2)
    # each polytope's composite weights sum to its true measure
    meas = np.zeros(4)
    np.add.at(meas, ah.cell2poly, m.cell_measures(3))
    assert np.allclose(ah.vol_weights.sum(axis=1), meas, atol=1e-12)
    assert np.allclose(ah.vol_weights.sum(), 1.0, atol=1e-12)
    # unit points inside [0,1]
    assert ah.vol_points.min() >= -1e-12
    assert ah.vol_points.max() <= 1 + 1e-12


def test_face_table_quadrants():
    m = hyper_cube(2, 4)
    ah = AgglomerationHandler(m, quarters_2x2(m), degree=1)
    ft = ah.faces
    # interior: 2 horizontal + 2 vertical polytope interfaces, each made of
    # 2 fine faces = 8 interior fine faces; boundary: 16 fine faces
    assert ft.interior().n_faces == 8
    assert ft.boundary().n_faces == 16
    # visit-once: poly_in < poly_out on interior faces
    fi = ft.interior()
    assert (fi.poly_in < fi.poly_out).all()
    # perimeter of each polytope: boundary + interior fragments
    per = np.zeros(4)
    fb = ft.boundary()
    np.add.at(per, fb.poly_in, fb.weights.sum(axis=1))
    np.add.at(per, fi.poly_in, fi.weights.sum(axis=1))
    np.add.at(per, fi.poly_out, fi.weights.sum(axis=1))
    assert np.allclose(per, 2.0, atol=1e-12)  # each quadrant: perimeter 2


def test_face_normals_outward_from_poly_in():
    m = distort_random(hyper_cube(2, 6), 0.1, seed=2)
    c2p = quarters_2x2(hyper_cube(2, 6))
    ah = AgglomerationHandler(m, c2p, degree=1)
    fi = ah.faces.interior()
    # normal at each q-point should point from poly_in bbox center toward
    # poly_out bbox center (axis-aligned quadrants: sign check suffices)
    cen = 0.5 * (ah.bbox_lo + ah.bbox_hi)
    d = cen[fi.poly_out] - cen[fi.poly_in]
    dots = np.einsum("fqd,fd->fq", fi.normals, d)
    assert (dots > 0).all()


def test_polytopal_faces_neighbors():
    """Quadrant agglomeration: each polytope has 2 neighbors + boundary
    (reference agglomerated_neighbors_01 pattern)."""
    m = hyper_cube(2, 4)
    ah = AgglomerationHandler(m, quarters_2x2(m), degree=1)
    pf = ah.poly_faces
    assert ah.n_faces(0) == 3  # neighbors 1, 2 + boundary
    assert set(pf.neighbors[0][:2].tolist()) == {1, 2}
    assert pf.at_boundary(0, 2)
    # symmetry of neighbor relation
    for p in range(4):
        for f in range(ah.n_faces(p)):
            q = pf.neighbor(p, f)
            if q >= 0:
                assert p in pf.neighbors[q]


def test_divergence_theorem_polytopes():
    """∮_∂P n dS = 0 per polytope on a distorted grid — the array analogue
    of the reference's reinit_cell_face/perimeter checks."""
    m0 = hyper_cube(2, 4)
    m = distort_random(m0, 0.2, seed=7)
    ah = AgglomerationHandler(m, quarters_2x2(m0), degree=1, n_quad=3)
    ft = ah.faces
    flux = np.zeros((4, 2))
    fb = ft.boundary()
    np.add.at(flux, fb.poly_in, np.einsum("fq,fqd->fd", fb.weights, fb.normals))
    fi = ft.interior()
    np.add.at(flux, fi.poly_in, np.einsum("fq,fqd->fd", fi.weights, fi.normals))
    np.add.at(flux, fi.poly_out, -np.einsum("fq,fqd->fd", fi.weights, fi.normals))
    assert np.allclose(flux, 0.0, atol=1e-12)


def test_single_cell_polytopes():
    """Trivial agglomeration (one cell per polytope) reduces to plain DG."""
    m = hyper_cube(2, 3)
    ah = AgglomerationHandler(m, np.arange(9, dtype=np.int32), degree=1)
    assert ah.n_poly == 9
    assert ah.faces.interior().n_faces == 12
    assert ah.faces.boundary().n_faces == 12
    assert ah.n_dofs == 9 * 3


def test_dof_indices():
    m = hyper_cube(2, 4)
    ah = AgglomerationHandler(m, quarters_2x2(m), degree=2)
    assert ah.n_basis == 6
    assert np.array_equal(ah.dof_indices(1), np.arange(6, 12))


def test_sparsity_pattern():
    m = hyper_cube(2, 4)
    ah = AgglomerationHandler(m, quarters_2x2(m), degree=1)
    rows, cols = ah.sparsity_block_pairs()
    # 4 diagonal + 4 interfaces x 2 directions
    assert rows.shape[0] == 4 + 8
