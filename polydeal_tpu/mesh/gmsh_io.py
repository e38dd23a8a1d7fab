"""Minimal gmsh .msh reader (formats 2.2 and 4.1, ASCII and BINARY).

The reference consumes small gmsh grids in its tests/examples
(test/polydeal/t2.msh, t3.msh, input_grids/square.msh, the 3D piston
mesh) through deal.II ``GridIn``, which also accepts gmsh's binary
encodings.  Supports the element types the framework meshes cover:
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
    with open(path, "rb") as fh:
        raw = fh.read()
    # $MeshFormat line: "version file_type data_size"; file_type 1 = binary
    k0 = raw.index(b"$MeshFormat")
    fmt = raw[k0:raw.index(b"\n", k0 + 12) + 40].split(b"\n")[1].split()
    version = float(fmt[0])
    binary = int(fmt[1]) == 1
    if binary:
        if version >= 4.0:
            nodes, elements = _read_v4_bin(raw)
        else:
            nodes, elements = _read_v2_bin(raw)
    else:
        lines = raw.decode()
        lines = lines.split("\n")
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


# ---------------------------------------------------------------------------
# binary payload parsing.  gmsh binary files keep ASCII section markers
# ($Nodes ... $EndNodes) with little-endian binary payloads between them;
# the endianness-check int written after the format line is verified.


class _Cursor:
    def __init__(self, raw: bytes, pos: int = 0):
        self.raw, self.pos = raw, pos

    def seek_after(self, tag: bytes):
        self.pos = self.raw.index(tag, self.pos) + len(tag)
        # consume the trailing newline of the marker line
        self.pos = self.raw.index(b"\n", self.pos) + 1

    def line(self) -> bytes:
        end = self.raw.index(b"\n", self.pos)
        out = self.raw[self.pos:end]
        self.pos = end + 1
        return out

    def ints(self, n, size=4):
        dt = np.dtype("<i4") if size == 4 else np.dtype("<i8")
        out = np.frombuffer(self.raw, dt, count=n, offset=self.pos)
        self.pos += n * size
        return out.astype(np.int64)

    def doubles(self, n):
        out = np.frombuffer(self.raw, np.dtype("<f8"), count=n,
                            offset=self.pos)
        self.pos += n * 8
        return out


def _check_endianness(raw: bytes):
    c = _Cursor(raw)
    c.seek_after(b"$MeshFormat")
    c.line()  # "version 1 data_size"
    one = c.ints(1)[0]
    if one != 1:
        raise ValueError(
            "big-endian gmsh binary files are not supported "
            f"(endianness marker {one})")


def _read_v2_bin(raw: bytes):
    """Binary v2.2: nodes = int32 tag + 3 float64; elements grouped by
    (type, count, n_tags) int32 headers."""
    _check_endianness(raw)
    c = _Cursor(raw)
    c.seek_after(b"$Nodes")
    n_nodes = int(c.line())
    rec = np.frombuffer(c.raw, np.dtype([("tag", "<i4"), ("xyz", "<f8", 3)]),
                        count=n_nodes, offset=c.pos)
    c.pos += n_nodes * (4 + 24)
    nodes = np.zeros((int(rec["tag"].max()) + 1, 3))
    nodes[rec["tag"]] = rec["xyz"]

    c.seek_after(b"$Elements")
    n_el = int(c.line())
    elements = []
    read = 0
    while read < n_el:
        etype, count, n_tags = (int(v) for v in c.ints(3))
        n_nod = _N_NODES.get(etype)
        skip_n = _BIN_V2_NNODES.get(etype)
        if n_nod is None and skip_n is None:
            raise ValueError(
                f"unsupported element type {etype} in binary v2 mesh")
        stride = 1 + n_tags + (n_nod if n_nod is not None else skip_n)
        block = c.ints(count * stride).reshape(count, stride)
        if n_nod is not None:
            for row in block:
                tag = int(row[1]) if n_tags >= 1 else None
                elements.append((etype, row[1 + n_tags:].tolist(), tag))
        read += count
    return nodes, elements


# node counts for element types we skip but must stride over in v2 binary
_BIN_V2_NNODES = {15: 1, 8: 3, 9: 6, 11: 10, 16: 8, 17: 20}


def _read_v4_bin(raw: bytes):
    """Binary v4.1: size_t(8) counts/tags, int32 entity headers."""
    _check_endianness(raw)
    phys = {}
    if b"$Entities" in raw:
        c = _Cursor(raw)
        c.seek_after(b"$Entities")
        counts = c.ints(4, 8)
        for edim in range(4):
            for _ in range(int(counts[edim])):
                tag = int(c.ints(1)[0])
                c.doubles(3 if edim == 0 else 6)
                n_phys = int(c.ints(1, 8)[0])
                ptags = c.ints(n_phys)
                if n_phys >= 1:
                    phys[(edim, tag)] = int(ptags[0])
                if edim > 0:
                    n_bnd = int(c.ints(1, 8)[0])
                    c.ints(n_bnd)

    c = _Cursor(raw)
    c.seek_after(b"$Nodes")
    n_blocks, _n_nodes, _mn, max_tag = (int(v) for v in c.ints(4, 8))
    nodes = np.zeros((max_tag + 1, 3))
    for _ in range(n_blocks):
        c.ints(3)  # entityDim, entityTag, parametric
        count = int(c.ints(1, 8)[0])
        tags = c.ints(count, 8)
        xyz = c.doubles(3 * count).reshape(count, 3)
        nodes[tags] = xyz

    c.seek_after(b"$Elements")
    n_blocks = int(c.ints(1, 8)[0])
    c.ints(3, 8)  # numElements, min, max
    elements = []
    for _ in range(n_blocks):
        edim, etag, etype = (int(v) for v in c.ints(3))
        count = int(c.ints(1, 8)[0])
        n_nod = _N_NODES.get(etype, _BIN_V2_NNODES.get(etype))
        if n_nod is None:
            raise ValueError(f"unsupported element type {etype} "
                             "in binary v4 mesh")
        block = c.ints(count * (1 + n_nod), 8).reshape(count, 1 + n_nod)
        tag = phys.get((edim, etag), etag)
        if etype in _N_NODES:
            for row in block:
                elements.append((etype, row[1:].tolist(), tag))
    return nodes, elements
