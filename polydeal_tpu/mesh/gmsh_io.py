"""Minimal gmsh .msh reader (ASCII, formats 2.2 and 4.1).

The reference consumes small gmsh grids in its tests/examples
(test/polydeal/t2.msh, t3.msh, input_grids/square.msh, the 3D piston
mesh).  Supports the element types the framework meshes cover:
quad(3), hexahedron(5), triangle(2), tetrahedron(4); lower-dimensional
elements (points/lines/surfaces in 3D) are skipped.

Node ordering translation: gmsh quads/hexes are corner-cycled
(0,1,2,3 counterclockwise); our FineMesh uses the bit convention
(0=(0,0), 1=(1,0), 2=(0,1), 3=(1,1)) — remapped on read.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_msh"]

# gmsh element type -> (n_nodes, our mesh kind)
_QUAD, _HEX, _TRI, _TET = 3, 5, 2, 4
_N_NODES = {_TRI: 3, _QUAD: 4, _TET: 4, _HEX: 8}
# gmsh corner cycle -> bit-convention order
_REORDER = {
    _QUAD: [0, 1, 3, 2],
    _HEX: [0, 1, 3, 2, 4, 5, 7, 6],
    _TRI: [0, 1, 2],
    _TET: [0, 1, 2, 3],
}


def read_msh(path: str):
    """Returns a FineMesh (quads/hexes) or SimplexMesh (tris/tets)."""
    with open(path) as fh:
        lines = fh.read().split("\n")
    i = 0

    def until(tag):
        nonlocal i
        while i < len(lines) and lines[i].strip() != tag:
            i += 1
        i += 1

    until("$MeshFormat")
    version = float(lines[i].split()[0])
    if version >= 4.0:
        nodes, elements = _read_v4(lines)
    else:
        nodes, elements = _read_v2(lines)

    # decide element family: prefer the highest-dimensional type present
    for types, simplex in (((_HEX,), False), ((_TET,), True),
                           ((_QUAD,), False), ((_TRI,), True)):
        cells = [conn for t, conn in elements if t in types]
        if cells:
            etype = types[0]
            break
    else:
        raise ValueError("no supported volume elements in mesh")

    conn = np.asarray(cells, dtype=np.int64)[:, _REORDER[etype]]
    dim = {_TRI: 2, _QUAD: 2, _TET: 3, _HEX: 3}[etype]
    # gmsh node ids may be sparse: compact them
    used = np.unique(conn)
    remap = np.full(used.max() + 1, -1, dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    verts = nodes[used][:, :dim]

    if etype in (_TRI, _TET):
        from polydeal_tpu.mesh.simplex import SimplexMesh

        return SimplexMesh(dim=dim, vertices=verts,
                           cells=remap[conn].astype(np.int32))
    from polydeal_tpu.mesh.fine_mesh import FineMesh

    return FineMesh(dim=dim, vertices=verts,
                    cells=remap[conn].astype(np.int32))


def _read_v2(lines):
    i = lines.index("$Nodes") + 1
    n_nodes = int(lines[i])
    nodes = np.zeros((n_nodes + 1, 3))
    for k in range(n_nodes):
        parts = lines[i + 1 + k].split()
        nodes[int(parts[0])] = [float(x) for x in parts[1:4]]
    i = lines.index("$Elements") + 1
    n_el = int(lines[i])
    elements = []
    for k in range(n_el):
        parts = lines[i + 1 + k].split()
        etype = int(parts[1])
        if etype not in _N_NODES:
            continue
        n_tags = int(parts[2])
        conn = [int(v) for v in parts[3 + n_tags:]]
        elements.append((etype, conn))
    return nodes, elements


def _read_v4(lines):
    i = lines.index("$Nodes") + 1
    hdr = lines[i].split()
    n_blocks, n_nodes = int(hdr[0]), int(hdr[1])
    max_tag = int(hdr[3])
    nodes = np.zeros((max_tag + 1, 3))
    i += 1
    for _ in range(n_blocks):
        bh = lines[i].split()
        count = int(bh[3])
        i += 1
        tags = [int(lines[i + k]) for k in range(count)]
        i += count
        for k in range(count):
            nodes[tags[k]] = [float(x) for x in lines[i + k].split()[:3]]
        i += count
    j = lines.index("$Elements") + 1
    eh = lines[j].split()
    n_blocks = int(eh[0])
    j += 1
    elements = []
    for _ in range(n_blocks):
        bh = lines[j].split()
        etype, count = int(bh[2]), int(bh[3])
        j += 1
        for k in range(count):
            if etype in _N_NODES:
                parts = lines[j + k].split()
                elements.append((etype, [int(v) for v in parts[1:]]))
        j += count
    return nodes, elements
