"""Minimal gmsh .msh reader (ASCII, formats 2.2 and 4.1).

The reference consumes small gmsh grids in its tests/examples
(test/polydeal/t2.msh, t3.msh, input_grids/square.msh, the 3D piston
mesh).  Supports the element types the framework meshes cover:
quad(3), hexahedron(5), triangle(2), tetrahedron(4).

Boundary ids: codimension-1 elements (lines in 2D; triangles/quads in
3D) are matched by node set against the mesh's boundary faces and their
physical tag (v2.2 first tag; v4.1 entity physical tag from $Entities,
falling back to the entity tag) becomes the face boundary id — the
deal.II `GridIn` boundary-id semantics the reference relies on for
per-id boundary conditions (examples/3D_piston.cc).

Node ordering translation: gmsh quads/hexes are corner-cycled
(0,1,2,3 counterclockwise); our FineMesh uses the bit convention
(0=(0,0), 1=(1,0), 2=(0,1), 3=(1,1)) — remapped on read.
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_msh"]

# gmsh element type -> (n_nodes, our mesh kind)
_LINE, _TRI, _QUAD, _TET, _HEX = 1, 2, 3, 4, 5
_N_NODES = {_LINE: 2, _TRI: 3, _QUAD: 4, _TET: 4, _HEX: 8}
# gmsh corner cycle -> bit-convention order
_REORDER = {
    _QUAD: [0, 1, 3, 2],
    _HEX: [0, 1, 3, 2, 4, 5, 7, 6],
    _TRI: [0, 1, 2],
    _TET: [0, 1, 2, 3],
}
_DIM = {_LINE: 1, _TRI: 2, _QUAD: 2, _TET: 3, _HEX: 3}


def read_msh(path: str):
    """Returns a FineMesh (quads/hexes) or SimplexMesh (tris/tets), with
    face boundary ids populated from codim-1 physical groups."""
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
        cells = [conn for t, conn, _tag in elements if t in types]
        if cells:
            etype = types[0]
            break
    else:
        raise ValueError("no supported volume elements in mesh")

    conn = np.asarray(cells, dtype=np.int64)[:, _REORDER[etype]]
    dim = _DIM[etype]
    # gmsh node ids may be sparse: compact them
    used = np.unique(conn)
    remap = np.full(used.max() + 1, -1, dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    verts = nodes[used][:, :dim]

    # codim-1 facets with tags -> boundary-id lookup by node set
    facet_types = {2: (_LINE,), 3: (_QUAD, _TRI)}[dim]
    facet_ids = {}
    for t, cn, tag in elements:
        if t in facet_types and tag is not None:
            ids = np.asarray(cn, dtype=np.int64)
            if (ids <= used.max()).all() and (remap[ids] >= 0).all():
                facet_ids[tuple(sorted(remap[ids].tolist()))] = int(tag)

    if etype in (_TRI, _TET):
        from polydeal_tpu.mesh.simplex import SimplexMesh

        mesh = SimplexMesh(dim=dim, vertices=verts,
                           cells=remap[conn].astype(np.int32))
    else:
        from polydeal_tpu.mesh.fine_mesh import FineMesh

        mesh = FineMesh(dim=dim, vertices=verts,
                        cells=remap[conn].astype(np.int32))
    if facet_ids and hasattr(mesh, "face_vertex_ids"):
        fv = mesh.face_vertex_ids()  # [n_c, n_faces, nvf]
        on_b = mesh.neighbors < 0
        out = np.full(on_b.shape, -1, dtype=np.int32)
        bc, bf = np.where(on_b)
        for c, f in zip(bc, bf):
            out[c, f] = facet_ids.get(
                tuple(sorted(fv[c, f].tolist())), 0)
        mesh.face_boundary_id = out
    return mesh


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
        tag = int(parts[3]) if n_tags >= 1 else None
        conn = [int(v) for v in parts[3 + n_tags:]]
        elements.append((etype, conn, tag))
    return nodes, elements


def _read_v4(lines):
    # $Entities: map (dim, entityTag) -> first physical tag (if any)
    phys = {}
    if "$Entities" in lines:
        j = lines.index("$Entities") + 1
        npt, ncv, nsf, nvl = (int(x) for x in lines[j].split())
        j += 1
        counts = (npt, ncv, nsf, nvl)
        for edim in range(4):
            for _ in range(counts[edim]):
                parts = lines[j].split()
                j += 1
                tag = int(parts[0])
                # points: tag x y z numPhys ...; others: tag 6 bbox floats
                base = 4 if edim == 0 else 7
                if len(parts) > base:
                    n_phys = int(parts[base])
                    if n_phys >= 1:
                        phys[(edim, tag)] = int(parts[base + 1])

    i = lines.index("$Nodes") + 1
    hdr = lines[i].split()
    n_blocks = int(hdr[0])
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
        edim, etag, etype, count = (int(x) for x in bh[:4])
        tag = phys.get((edim, etag), etag)
        j += 1
        for k in range(count):
            if etype in _N_NODES:
                parts = lines[j + k].split()
                elements.append((etype, [int(v) for v in parts[1:]], tag))
        j += count
    return nodes, elements
