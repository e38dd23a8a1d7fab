"""gmsh reader tests (reference unstructured_grid.cc tier)."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.mesh.gmsh_io import read_msh

V2_QUAD = textwrap.dedent("""\
    $MeshFormat
    2.2 0 8
    $EndMeshFormat
    $Nodes
    9
    1 0 0 0
    2 0.5 0 0
    3 1 0 0
    4 0 0.5 0
    5 0.5 0.5 0
    6 1 0.5 0
    7 0 1 0
    8 0.5 1 0
    9 1 1 0
    $EndNodes
    $Elements
    4
    1 3 2 0 1 1 2 5 4
    2 3 2 0 1 2 3 6 5
    3 3 2 0 1 4 5 8 7
    4 3 2 0 1 5 6 9 8
    $EndElements
    """)


def test_read_v2_quads(tmp_path):
    p = os.path.join(tmp_path, "m.msh")
    open(p, "w").write(V2_QUAD)
    m = read_msh(p)
    assert m.n_cells == 4 and m.n_vertices == 9
    assert np.allclose(m.cell_measures(2).sum(), 1.0, atol=1e-13)
    assert (m.neighbors < 0).sum() == 8


REF_T3 = "/root/reference/test/polydeal/t3.msh"


@pytest.mark.skipif(not os.path.exists(REF_T3), reason="reference mesh absent")
def test_read_v41_and_solve_unstructured():
    """Solve Poisson on the reference's unstructured t3 grid: the SIPG
    exactness invariant (linears reproduced) must hold on general quads
    (reference unstructured_grid.cc / exact_solutions patterns)."""
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
    from polydeal_tpu.postprocess import compute_global_error
    from polydeal_tpu.solvers import cg_solve, block_jacobi_preconditioner

    m = read_msh(REF_T3)
    assert m.dim == 2 and m.n_cells == 91
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors, 10,
                                   strategy="greedy")
    ah = pd.AgglomerationHandler(m, c2p, degree=1, n_quad=3)
    u_ex = lambda x: 2.0 * x[..., 0] - x[..., 1] + 0.25
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: jnp.zeros_like(x[..., 0]), u_ex)
    res = cg_solve(A.matvec, b, M=block_jacobi_preconditioner(A.diag_blocks()),
                   rtol=1e-13, maxiter=5000)
    l2, _ = compute_global_error(ah, res.x, u_ex)
    assert float(l2) < 1e-10, float(l2)


def test_boundary_ids_from_physical_groups(tmp_path):
    """v2.2 line elements with physical tags become face boundary ids
    (the reference's GridIn boundary-id semantics, examples/3D_piston.cc)."""
    # unit square, 2x2 quads; bottom edge physical 7, left edge physical 9
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
9
1 0 0 0
2 0.5 0 0
3 1 0 0
4 0 0.5 0
5 0.5 0.5 0
6 1 0.5 0
7 0 1 0
8 0.5 1 0
9 1 1 0
$EndNodes
$Elements
8
1 1 2 7 0 1 2
2 1 2 7 0 2 3
3 1 2 9 0 1 4
4 1 2 9 0 4 7
5 3 2 1 0 1 2 5 4
6 3 2 1 0 2 3 6 5
7 3 2 1 0 4 5 8 7
8 3 2 1 0 5 6 9 8
$EndElements
"""
    p = tmp_path / "square_ids.msh"
    p.write_text(msh)
    mesh = read_msh(str(p))
    bids = mesh.boundary_id_array()
    centers = mesh.vertices[mesh.face_vertex_ids()].mean(axis=2)
    on_b = mesh.neighbors < 0
    got = {}
    for c, f in zip(*np.where(on_b)):
        x, y = centers[c, f]
        side = ("bottom" if y < 1e-9 else "top" if y > 1 - 1e-9
                else "left" if x < 1e-9 else "right")
        got.setdefault(side, set()).add(int(bids[c, f]))
    assert got["bottom"] == {7}
    assert got["left"] == {9}
    assert got["top"] == {0} and got["right"] == {0}


def _write_v2_binary(path):
    """Binary v2.2 encoding of the same 3x3-node / 4-quad grid as V2_QUAD,
    with the boundary-id line elements of
    test_boundary_ids_from_physical_groups."""
    import struct

    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n2.2 1 8\n")
        f.write(struct.pack("<i", 1))
        f.write(b"\n$EndMeshFormat\n$Nodes\n9\n")
        coords = [(1, 0, 0), (2, .5, 0), (3, 1, 0), (4, 0, .5),
                  (5, .5, .5), (6, 1, .5), (7, 0, 1), (8, .5, 1),
                  (9, 1, 1)]
        for tag, x, y in coords:
            f.write(struct.pack("<iddd", tag, x, y, 0.0))
        f.write(b"\n$EndNodes\n$Elements\n8\n")
        # block of 4 line elements (type 1), 2 tags each
        f.write(struct.pack("<iii", 1, 4, 2))
        for tag, phys, a, b in ((1, 7, 1, 2), (2, 7, 2, 3),
                                (3, 9, 1, 4), (4, 9, 4, 7)):
            f.write(struct.pack("<iiiii", tag, phys, 0, a, b))
        # block of 4 quads (type 3), 2 tags each
        f.write(struct.pack("<iii", 3, 4, 2))
        for tag, conn in ((5, (1, 2, 5, 4)), (6, (2, 3, 6, 5)),
                          (7, (4, 5, 8, 7)), (8, (5, 6, 9, 8))):
            f.write(struct.pack("<iii", tag, 1, 0))
            f.write(struct.pack("<iiii", *conn))
        f.write(b"\n$EndElements\n")


def _write_v41_binary(path):
    """Binary v4.1 encoding of the same grid (entity physical tags carry
    the boundary ids)."""
    import struct

    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n4.1 1 8\n")
        f.write(struct.pack("<i", 1))
        f.write(b"\n$EndMeshFormat\n$Entities\n")
        # 0 points, 2 curves (bottom id 7, left id 9), 1 surface, 0 vols
        f.write(struct.pack("<qqqq", 0, 2, 1, 0))
        for tag, phys in ((1, 7), (2, 9)):
            f.write(struct.pack("<i", tag))
            f.write(struct.pack("<dddddd", 0, 0, 0, 1, 1, 0))
            f.write(struct.pack("<q", 1))
            f.write(struct.pack("<i", phys))
            f.write(struct.pack("<q", 0))  # no bounding entities
        f.write(struct.pack("<i", 1))  # surface tag 1
        f.write(struct.pack("<dddddd", 0, 0, 0, 1, 1, 0))
        f.write(struct.pack("<q", 0))  # no physical tag
        f.write(struct.pack("<q", 0))
        f.write(b"\n$EndEntities\n$Nodes\n")
        f.write(struct.pack("<qqqq", 1, 9, 1, 9))  # 1 block, 9 nodes
        f.write(struct.pack("<iii", 2, 1, 0))  # dim 2, tag 1, no param
        f.write(struct.pack("<q", 9))
        for tag in range(1, 10):
            f.write(struct.pack("<q", tag))
        coords = [(0, 0), (.5, 0), (1, 0), (0, .5), (.5, .5), (1, .5),
                  (0, 1), (.5, 1), (1, 1)]
        for x, y in coords:
            f.write(struct.pack("<ddd", x, y, 0.0))
        f.write(b"\n$EndNodes\n$Elements\n")
        f.write(struct.pack("<qqqq", 3, 8, 1, 8))  # 3 blocks, 8 elements
        # curve 1 (bottom): 2 lines
        f.write(struct.pack("<iii", 1, 1, 1))
        f.write(struct.pack("<q", 2))
        f.write(struct.pack("<qqq", 1, 1, 2))
        f.write(struct.pack("<qqq", 2, 2, 3))
        # curve 2 (left): 2 lines
        f.write(struct.pack("<iii", 1, 2, 1))
        f.write(struct.pack("<q", 2))
        f.write(struct.pack("<qqq", 3, 1, 4))
        f.write(struct.pack("<qqq", 4, 4, 7))
        # surface 1: 4 quads
        f.write(struct.pack("<iii", 2, 1, 3))
        f.write(struct.pack("<q", 4))
        for tag, conn in ((5, (1, 2, 5, 4)), (6, (2, 3, 6, 5)),
                          (7, (4, 5, 8, 7)), (8, (5, 6, 9, 8))):
            f.write(struct.pack("<qqqqq", tag, *conn))
        f.write(b"\n$EndElements\n")


@pytest.mark.parametrize("writer", [_write_v2_binary, _write_v41_binary])
def test_read_binary_formats(tmp_path, writer):
    """BINARY v2.2 and v4.1 files parse to the same mesh + boundary ids
    as the ASCII encoding (deal.II GridIn generality the reference
    inherits)."""
    pa = tmp_path / "ascii.msh"
    pa.write_text(V2_QUAD)
    ma = read_msh(str(pa))
    pb = tmp_path / "bin.msh"
    writer(str(pb))
    mb = read_msh(str(pb))
    assert mb.n_cells == 4 and mb.n_vertices == 9
    assert np.allclose(mb.vertices, ma.vertices)
    assert np.array_equal(mb.cells, ma.cells)
    bids = mb.boundary_id_array()
    centers = mb.vertices[mb.face_vertex_ids()].mean(axis=2)
    got = {}
    for c, f in zip(*np.where(mb.neighbors < 0)):
        x, y = centers[c, f]
        side = ("bottom" if y < 1e-9 else "top" if y > 1 - 1e-9
                else "left" if x < 1e-9 else "right")
        got.setdefault(side, set()).add(int(bids[c, f]))
    assert got["bottom"] == {7}
    assert got["left"] == {9}
