"""I/O, metrics, h_orthogonal, and BlockBanded format tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import RTreeAgglomerator
from polydeal_tpu.assembly import assemble_sipg_matrix
from polydeal_tpu.io import export_polygon_csv, write_matrix_market, write_vtu
from polydeal_tpu.metrics import compute_quality_metrics, compute_h_orthogonal


def quad_handler(n=4, degree=1):
    m = pd.hyper_cube(2, n)
    centers = m.cell_centers()
    c2p = (centers[:, 0] > 0.5).astype(np.int32) + 2 * (centers[:, 1] > 0.5)
    return pd.AgglomerationHandler(m, c2p, degree=degree)


def test_banded_matches_coo():
    """BlockBanded SpMV == BlockMatrix SpMV (any offsets)."""
    ah = quad_handler(6, degree=2)
    A = assemble_sipg_matrix(ah)
    B = A.to_banded()
    assert B is not None
    x = jnp.asarray(np.random.default_rng(0).normal(size=A.shape[0]))
    assert np.allclose(np.asarray(A.matvec(x)), np.asarray(B.matvec(x)),
                       atol=1e-11)
    assert np.allclose(np.asarray(A.diagonal()), np.asarray(B.diagonal()),
                       atol=1e-12)


def test_banded_fallback_none():
    """A matrix with too many offsets returns None (caller falls to ELL)."""
    ah = quad_handler(6, degree=1)
    A = assemble_sipg_matrix(ah)
    assert A.to_banded(max_offsets=1) is None


def test_quality_metrics_square_polytopes():
    """Axis-aligned square polytopes: box_ratio = 1, circle ratio and
    uniformity match the square's exact values."""
    ah = quad_handler(4)
    q = compute_quality_metrics(ah)
    assert np.allclose(q["box_ratio"], 1.0, atol=1e-12)
    assert q["coverage"] == pytest.approx(1.0, abs=1e-12)
    # square of side h: r_in = h/2 (at face quadrature), r_out <= h*sqrt(2)/2
    assert (q["circle_ratio"] > 0.5).all()
    assert q["mean_uniformity"] > 0.9


def test_h_orthogonal_square():
    """For 0.5x0.5 square polytopes, depth behind each face = 0.5 (up to
    quadrature sampling of the volume points)."""
    ah = quad_handler(4, degree=2)
    h = compute_h_orthogonal(ah)
    interior = {k: v for k, v in h.items() if k[1] >= 0}
    assert len(interior) == 4  # 4 interior polytopal faces
    for v in interior.values():
        assert 0.35 < v <= 0.5 + 1e-12


def test_export_polygon_csv(tmp_path):
    ah = quad_handler(4)
    path = os.path.join(tmp_path, "poly.csv")
    n = export_polygon_csv(ah, path)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "poly,x0,y0,x1,y1"
    # 4 quadrants x perimeter 2 / fine edge 0.25 = 8 segments each
    assert n == 32
    assert len(lines) == 33


def test_write_matrix_market(tmp_path):
    ah = quad_handler(2)
    A = assemble_sipg_matrix(ah)
    path = os.path.join(tmp_path, "A.mtx")
    n = write_matrix_market(A, path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    rows, cols, nnz = map(int, lines[1].split())
    assert rows == ah.n_dofs and nnz == n
    # re-read and compare to dense
    dense = np.zeros((rows, cols))
    for ln in lines[2:]:
        r, c, v = ln.split()
        dense[int(r) - 1, int(c) - 1] = float(v)
    assert np.allclose(dense, np.asarray(A.to_dense()), atol=1e-12)


def test_write_vtu(tmp_path):
    m = pd.distort_random(pd.hyper_cube(2, 4), 0.1, seed=1)
    agg = RTreeAgglomerator.build(m.cell_centers())
    c2p = agg.extract_agglomerates(1)
    path = os.path.join(tmp_path, "mesh.vtu")
    write_vtu(m, path, cell_data={"poly": c2p.astype(float)})
    text = open(path).read()
    assert "<VTKFile" in text and 'Name="poly"' in text
    assert text.count("</DataArray>") >= 5


def test_write_vtu_3d(tmp_path):
    m = pd.hyper_cube(3, 2)
    path = os.path.join(tmp_path, "mesh3.vtu")
    write_vtu(m, path, cell_data={"id": np.arange(8, dtype=float)})
    assert "12" in open(path).read()  # hexahedron type


def test_banded_direct_assembly_matches_coo():
    """assemble_sipg_banded (lane-aligned direct path) == COO assembly."""
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_sipg_banded

    m0 = pd.hyper_cube(2, 6)
    m = pd.distort_random(m0, 0.15, seed=2)
    from polydeal_tpu.agglomeration import agglomerate_by_partition

    c2p = agglomerate_by_partition(m0.cell_centers(), m0.neighbors, 5)
    ah = pd.AgglomerationHandler(m, c2p, degree=2)
    A = assemble_sipg_matrix(ah)
    Bn = assemble_sipg_banded(ah)
    x = jnp.asarray(np.random.default_rng(0).normal(size=ah.n_dofs))
    assert np.allclose(np.asarray(A.matvec(x)), np.asarray(Bn.matvec(x)),
                       atol=1e-11)
    assert np.allclose(np.asarray(A.diagonal()), np.asarray(Bn.diagonal()),
                       atol=1e-12)
    # superset band structure also works (slots stay zero)
    sup = np.unique(np.concatenate([Bn.offsets, [-7, 7]]))
    Bs = assemble_sipg_banded(ah, offsets=sup)
    assert np.allclose(np.asarray(Bs.matvec(x)), np.asarray(A.matvec(x)),
                       atol=1e-11)


def test_interpolate_to_fine_dgp_target():
    """Modal (DGP) fine-grid target: exact per-cell L2 projection — a
    polytopal linear field round-trips exactly (reference hp variant,
    poly_utils.h:1322-1458)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.assembly import project
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.postprocess import interpolate_to_fine_grid

    mesh = pd.hyper_cube(2, 4)
    c2p = agglomerate_by_partition(mesh.cell_centers(), mesh.neighbors, 4)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
    u = project(ah, lambda x: 1.0 + 2 * x[..., 0] - x[..., 1])
    coeffs = interpolate_to_fine_grid(ah, u, family="dgp")  # [n_c, nfb]
    # evaluate the fine modal field at cell centers and compare
    fine = LegendreDGP(2, 1)
    Bc = np.asarray(fine.eval(jnp.full((1, 2), 0.5)))[0]  # [nfb]
    centers = mesh.cell_centers()
    vals = np.asarray(coeffs) @ Bc
    exact = 1.0 + 2 * centers[:, 0] - centers[:, 1]
    assert np.abs(vals - exact).max() < 1e-12


def test_interpolate_field_system():
    """Vector (system) field interpolation through a SystemSpace."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.fem.system import Field, SystemSpace
    from polydeal_tpu.postprocess import interpolate_field_to_fine_grid

    mesh = pd.hyper_cube(2, 4)
    c2p = agglomerate_by_partition(mesh.cell_centers(), mesh.neighbors, 4)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
    f = Field("u", LegendreDGP(2, 1), 2, np.arange(ah.n_poly))
    space = SystemSpace(ah, [f])
    # constant vector field (1, 2): coefficients = value on mode 0
    x = np.zeros((f.n_polys, 2, 3))
    x[:, 0, 0] = 1.0
    x[:, 1, 0] = 2.0
    out = interpolate_field_to_fine_grid(space, ah, jnp.asarray(x.reshape(-1)), "u")
    assert out.shape[1] == 2
    assert np.allclose(np.asarray(out[:, 0]), 1.0)
    assert np.allclose(np.asarray(out[:, 1]), 2.0)


def test_interpolate_field_mixed_degree():
    """A field whose basis degree differs from the handler's (the
    darcy_stokes/oseen pressure layout: degree-1 field on a degree-2
    handler) must interpolate exactly — regression for the basis/n_basis
    mismatch that raised on reshape."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.fem.basis import LegendreDGP
    from polydeal_tpu.fem.system import Field, SystemSpace
    from polydeal_tpu.postprocess import interpolate_field_to_fine_grid

    mesh = pd.hyper_cube(2, 4)
    c2p = agglomerate_by_partition(mesh.cell_centers(), mesh.neighbors, 4)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=2)  # handler degree 2
    p1 = LegendreDGP(2, 1)  # field degree 1 (nb = 3 != handler nb = 6)
    f = Field("p", p1, 1, np.arange(ah.n_poly))
    space = SystemSpace(ah, [f])
    # affine field 1 + x - 2y, expressed in each polytope's modal basis
    # via L2 projection on the bbox (exact for degree >= 1)
    from polydeal_tpu.fem.quadrature import tensor_gauss

    pts, wts = tensor_gauss(2, 3)
    x_np = np.zeros((f.n_polys, 1, p1.n_basis))
    B = np.asarray(p1.eval(jnp.asarray(pts)))  # [q, nb]
    for k in range(ah.n_poly):
        real = ah.bbox_lo[k] + pts * ah.extents[k]
        vals = 1.0 + real[:, 0] - 2 * real[:, 1]
        x_np[k, 0] = B.T @ (wts * vals)  # orthonormal basis: M = I
    out = interpolate_field_to_fine_grid(
        space, ah, jnp.asarray(x_np.reshape(-1)), "p")
    # evaluate nodal DGQ(1) output at its own support points = cell
    # corners; compare against the affine exact field
    from polydeal_tpu.fem.basis import make_basis, _gauss_lobatto_01

    fine = make_basis("dgq", 2, 1)
    nodes1d = _gauss_lobatto_01(2)
    E = fine.exponents
    unit = np.stack([nodes1d[E[:, d]] for d in range(2)], axis=-1)
    real = np.asarray(mesh.map_points(unit))  # [n_c, 4, 2]
    exact = 1.0 + real[..., 0] - 2 * real[..., 1]
    assert np.abs(np.asarray(out[:, 0]) - exact).max() < 1e-10


def test_h_orthogonal_penalty_ab():
    """A/B: diameter- vs h_perp-scaled penalty on a distorted grid —
    both must solve the same problem to discretization accuracy
    (the reference's optional penalty scaling, poly_utils.h:399-513)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.assembly import (assemble_sipg_matrix, assemble_rhs,
                                       build_face_tables)
    from polydeal_tpu.postprocess import compute_global_error
    from polydeal_tpu.solvers import cg_solve, block_jacobi_preconditioner

    m0 = pd.hyper_cube(2, 8)
    mesh = pd.distort_random(m0, 0.2, seed=3)
    c2p = agglomerate_by_partition(m0.cell_centers(), m0.neighbors, 6)
    ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
    u_ex = lambda x: x[..., 0]
    errs = []
    for h_scale in ("diameter", "orthogonal"):
        faces = build_face_tables(ah, h_scale=h_scale)
        A = assemble_sipg_matrix(ah, faces=faces)
        b = assemble_rhs(ah, lambda x: jnp.zeros(x.shape[:-1]), u_ex,
                         faces=faces)
        res = cg_solve(A.matvec, b,
                       M=block_jacobi_preconditioner(A.diag_blocks()),
                       rtol=1e-12, maxiter=4000)
        l2, _ = compute_global_error(ah, res.x, u_ex)
        errs.append(float(l2))
    assert max(errs) < 1e-9  # linear exactness holds under both scalings


# -------------------------------------------------- exact geometry


def test_h_orthogonal_exact_golden_values():
    """Exact ray-shooting h_perp reproduces the reference's golden
    values (test/polydeal/h_orthogonal.cc + .output): unit hyper_cube
    (2D and 3D) as one polytope -> h = 1 on every boundary face; a 1x2
    rectangle -> 2 from the short sides, 1 from the long sides."""
    from polydeal_tpu.metrics import face_h_orthogonal

    # 2D unit square, single polytope
    m = pd.hyper_cube(2, 4)
    ah = pd.AgglomerationHandler(m, np.zeros(m.n_cells, dtype=np.int64),
                                 degree=1)
    h = face_h_orthogonal(ah, method="exact")
    assert np.allclose(h, 1.0, atol=1e-13)

    # 3D unit cube, single polytope
    m3 = pd.hyper_cube(3, 2)
    ah3 = pd.AgglomerationHandler(m3, np.zeros(m3.n_cells, dtype=np.int64),
                                  degree=1)
    h3 = face_h_orthogonal(ah3, method="exact")
    assert np.allclose(h3, 1.0, atol=1e-13)

    # 1x2 rectangle: depth along y = 2, along x = 1
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle

    mr = hyper_rectangle(2, [2, 4], hi=[1.0, 2.0])
    ahr = pd.AgglomerationHandler(mr, np.zeros(mr.n_cells, dtype=np.int64),
                                  degree=1)
    ft = ahr.faces
    hr = face_h_orthogonal(ahr, method="exact")
    nbar = ft.normals.mean(axis=1)
    along_y = np.abs(nbar[:, 1]) > 0.5
    assert np.allclose(hr[along_y], 2.0, atol=1e-13)
    assert np.allclose(hr[~along_y], 1.0, atol=1e-13)


def test_h_orthogonal_exact_interior_quadrants():
    """4-quadrant agglomeration of the unit square: every interior
    polytopal face has exact depth 0.5 on both sides; the sampled
    variant underestimates (quadrature points only)."""
    ah = quad_handler(4, degree=2)
    exact = compute_h_orthogonal(ah, method="exact")
    sampled = compute_h_orthogonal(ah)
    for k, v in exact.items():
        if k[1] >= 0:
            assert v == pytest.approx(0.5, abs=1e-13), k
            assert sampled[k] <= v + 1e-12


def test_inscribed_circle_exact():
    """Exact 2D inscribed radius: 0.5 for the unit square (one
    polytope), 0.25 for a 1 x 0.5 rectangle; circle_ratio uses
    r_circ = diameter/2 (reference agglomeration_accessor.h:583-599)."""
    m = pd.hyper_cube(2, 4)
    ah = pd.AgglomerationHandler(m, np.zeros(m.n_cells, dtype=np.int64),
                                 degree=1)
    q = compute_quality_metrics(ah, method="exact")
    assert q["circle_ratio"][0] == pytest.approx(0.5 / (np.sqrt(2) / 2),
                                                 abs=1e-9)
    assert q["uniformity_factor"][0] == 1.0
    assert q["coverage"] == pytest.approx(1.0, abs=1e-12)

    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle

    mr = hyper_rectangle(2, [4, 2], hi=[1.0, 0.5])
    ahr = pd.AgglomerationHandler(mr, np.zeros(mr.n_cells, dtype=np.int64),
                                  degree=1)
    qr = compute_quality_metrics(ahr, method="exact")
    r_circ = 0.5 * np.sqrt(1.0 + 0.25)
    assert qr["circle_ratio"][0] == pytest.approx(0.25 / r_circ, abs=1e-9)

    # sampled vs exact on a real R-tree agglomeration: exact >= sampled
    # up to round-off (sampling can only underestimate the inscribed
    # radius is false in general -- centroid-to-quadrature min can be
    # either side -- but both must agree within the fine cell size)
    mesh = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    ah2 = pd.AgglomerationHandler(mesh, agg.extract_agglomerates(2),
                                  degree=1)
    qe = compute_quality_metrics(ah2, method="exact")
    qs = compute_quality_metrics(ah2)
    assert np.all(np.abs(qe["circle_ratio"] - qs["circle_ratio"]) < 0.5)
    assert np.all(qe["circle_ratio"] > 0.2)


def test_chained_cost_methodology():
    """chained_cost returns the per-application slope, immune to the
    fixed per-call dispatch overhead (the tunneled-TPU timing rule)."""
    import jax.numpy as jnp

    from polydeal_tpu.utils.timer import chained_cost

    x0 = jnp.ones((64, 64))
    c = chained_cost(lambda x: x @ x * 1e-3 + x, x0, n_small=4,
                     n_large=32, reps=2)
    assert c > 0.0
    assert c < 0.05  # a 64x64 matmul is far under 50 ms/step


def test_write_svg(tmp_path):
    """SVG grid dump (reference poisson.cc:617-629 GridOut::write_svg
    analogue): one filled polygon per fine cell, thick polytope
    boundaries; well-formed XML."""
    import xml.etree.ElementTree as ET

    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.io import write_svg

    mesh = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    ah = pd.AgglomerationHandler(mesh, agg.extract_agglomerates(1), degree=1)
    path = tmp_path / "grid.svg"
    n = write_svg(ah, str(path))
    assert n == ah.n_poly
    root = ET.parse(path).getroot()
    tags = [e.tag.split("}")[-1] for e in root]
    assert tags.count("polygon") == mesh.n_cells
    # at least one thick interface line per polytope boundary
    assert tags.count("line") > 0
