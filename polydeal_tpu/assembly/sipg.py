"""SIPG (symmetric interior penalty DG) assembly on polytopal meshes.

Array rebuild of the reference's assembly path
(``PolyUtils::assemble_dg_matrix`` + ``assemble_local_jumps_and_averages``,
reference include/poly_utils.h:1870-2195).  The reference loops polytopes
and fine faces with nested (i, j, q) scalar loops through FEValues; here
each piece is one batched einsum over the materialized tables — the MXU
sees [n_cells, q, n_b] × [n_cells, q, n_b] contractions:

  volume   a(u,v) = ∫ ∇u·∇v          -> per-cell einsum, segment-sum by poly
  interior faces: the M11/M12/M21/M22 jump/average blocks at fine-face
  granularity, merged per polytope pair by segment-sum
  boundary faces: Nitsche-type weak Dirichlet terms

Penalty: gamma = penalty_constant / h_F with
penalty_constant = 10 (p + dim)(p + 1) and h_F the diameter (bbox
diagonal) of the smaller-id polytope — matching the reference
(poly_utils.h:2017-2019, 2057) so iteration counts and errors are directly
comparable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from polydeal_tpu.handler import AgglomerationHandler
from polydeal_tpu.sparse import BlockMatrix

__all__ = [
    "default_penalty_constant",
    "VolumeTables",
    "FaceTables",
    "build_volume_tables",
    "build_face_tables",
    "assemble_sipg_matrix",
    "assemble_rhs",
    "mass_matrix",
    "project",
]


def default_penalty_constant(degree: int, dim: int) -> float:
    """10 (p + dim)(p + 1), cf. reference poly_utils.h:2017-2019."""
    return 10.0 * (degree + dim) * (degree + 1)


def dirichlet_face_mask(ah, dirichlet_ids) -> np.ndarray:
    """Static bool mask over ah.faces.boundary() rows: True = Dirichlet.

    ``dirichlet_ids=None`` means Dirichlet everywhere (the historical
    default); otherwise only faces whose boundary id is listed get the
    Nitsche terms — the per-id boundary handling of the reference
    (utils.h:1647-1659 Neumann no-op, examples/3D_piston.cc)."""
    fb = ah.faces.boundary()
    if dirichlet_ids is None:
        return np.ones(fb.n_faces, dtype=bool)
    bid = (fb.boundary_id if fb.boundary_id is not None
           else np.zeros(fb.n_faces, dtype=np.int32))
    return np.isin(bid, np.asarray(list(dirichlet_ids)))


@jax.tree_util.register_pytree_node_class
@dataclass
class VolumeTables:
    """Dense per-fine-cell shape tables in the owning polytope's basis."""

    B: jnp.ndarray  # [n_c, q, n_b] values
    G: jnp.ndarray  # [n_c, q, n_b, dim] REAL-space gradients
    w: jnp.ndarray  # [n_c, q] JxW
    x: jnp.ndarray  # [n_c, q, dim] real points
    cell2poly: np.ndarray  # [n_c] static

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (self.B, self.G, self.w, self.x), (wrap_static(self.cell2poly),)

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        return cls(*children, unwrap_static(aux[0]))


@jax.tree_util.register_pytree_node_class
@dataclass
class FaceTables:
    """Shape tables at interface quadrature points.

    For interior faces both sides are present (suffix 0 = poly_in,
    1 = poly_out); for boundary faces only side 0.
    """

    B0: jnp.ndarray  # [n_f, qf, n_b]
    G0: jnp.ndarray  # [n_f, qf, n_b, dim]
    B1: jnp.ndarray | None
    G1: jnp.ndarray | None
    w: jnp.ndarray  # [n_f, qf]
    n: jnp.ndarray  # [n_f, qf, dim]
    x: jnp.ndarray  # [n_f, qf, dim] real points
    h_f: jnp.ndarray  # [n_f]
    poly_in: np.ndarray  # static
    poly_out: np.ndarray | None  # static

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (
            (self.B0, self.G0, self.B1, self.G1, self.w, self.n, self.x,
             self.h_f),
            (wrap_static(self.poly_in), wrap_static(self.poly_out)),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        return cls(*children, unwrap_static(aux[0]), unwrap_static(aux[1]))


def build_volume_tables(ah: AgglomerationHandler, dtype=jnp.float64,
                        basis=None) -> VolumeTables:
    """Shape tables for ``basis`` (default: the handler's own) at the
    handler's composite quadrature — the hook mixed/vector spaces use to
    evaluate several bases on one polytopal mesh (reference FESystem
    paths, darcy_stokes.cc:602-606)."""
    basis = basis or ah.basis
    pts = jnp.asarray(ah.cell_qpoints_unit, dtype=dtype)
    B = basis.eval(pts).astype(dtype)
    Gu = basis.grad(pts).astype(dtype)
    ext = jnp.asarray(ah.extents[ah.cell2poly], dtype=dtype)  # [n_c, dim]
    G = Gu / ext[:, None, None, :]
    return VolumeTables(
        B=B,
        G=G,
        w=jnp.asarray(ah.cell_qweights, dtype=dtype),
        x=jnp.asarray(ah.cell_qpoints_real, dtype=dtype),
        cell2poly=ah.cell2poly,
    )


def build_face_tables(ah: AgglomerationHandler, dtype=jnp.float64,
                      basis=None, h_scale: str = "diameter"):
    """Returns (interior: FaceTables, boundary: FaceTables).

    ``h_scale='orthogonal'`` replaces the penalty length h_f (polytope
    bbox diameter by default) with the face-orthogonal depth
    (reference's optional CGAL h_perp, poly_utils.h:399-513) — sharper
    penalties on stretched/distorted agglomerates;
    ``h_scale='orthogonal_exact'`` uses the exact ray-shooting variant
    (value parity with the reference's CGAL numbers)."""
    basis = basis or ah.basis
    faces = ah.faces
    if h_scale in ("orthogonal", "orthogonal_exact"):
        from polydeal_tpu.metrics import face_h_orthogonal

        import dataclasses

        method = "exact" if h_scale == "orthogonal_exact" else "sampled"
        faces = dataclasses.replace(
            faces, h_f=face_h_orthogonal(ah, method=method))
    elif h_scale != "diameter":
        raise ValueError(f"unknown h_scale: {h_scale}")
    out = []
    for part, both_sides in ((faces.interior(), True), (faces.boundary(), False)):
        p_in = part.poly_in
        pts_in = jnp.asarray(part.points_in, dtype=dtype)
        B0 = basis.eval(pts_in).astype(dtype)
        G0 = basis.grad(pts_in).astype(dtype)
        ext0 = jnp.asarray(ah.extents[p_in], dtype=dtype)
        G0 = G0 / ext0[:, None, None, :]
        if both_sides:
            p_out = part.poly_out
            pts_out = jnp.asarray(part.points_out, dtype=dtype)
            B1 = basis.eval(pts_out).astype(dtype)
            G1 = basis.grad(pts_out).astype(dtype)
            ext1 = jnp.asarray(ah.extents[p_out], dtype=dtype)
            G1 = G1 / ext1[:, None, None, :]
        else:
            p_out, B1, G1 = None, None, None
        out.append(
            FaceTables(
                B0=B0, G0=G0, B1=B1, G1=G1,
                w=jnp.asarray(part.weights, dtype=dtype),
                n=jnp.asarray(part.normals, dtype=dtype),
                x=jnp.asarray(part.points_real, dtype=dtype),
                h_f=jnp.asarray(part.h_f, dtype=dtype),
                poly_in=p_in,
                poly_out=p_out,
            )
        )
    return out[0], out[1]


def _interior_blocks(ft: FaceTables, penalty_constant: float):
    """The four SIPG jump/average blocks per interior fine face.

    Sign conventions follow the reference kernel exactly
    (poly_utils.h:1870-1926); normal points outward from poly_in.
    """
    gamma = (penalty_constant / ft.h_f)[:, None]  # [n_f, 1]
    gn0 = jnp.einsum("fqid,fqd->fqi", ft.G0, ft.n)
    gn1 = jnp.einsum("fqid,fqd->fqi", ft.G1, ft.n)
    w = ft.w
    wg = w * gamma

    def blk(a, b, wgt):
        return jnp.einsum("fqi,fqj,fq->fij", a, b, wgt)

    M11 = -0.5 * blk(gn0, ft.B0, w) - 0.5 * blk(ft.B0, gn0, w) + blk(ft.B0, ft.B0, wg)
    M12 = 0.5 * blk(gn0, ft.B1, w) - 0.5 * blk(ft.B0, gn1, w) - blk(ft.B0, ft.B1, wg)
    M21 = -0.5 * blk(gn1, ft.B0, w) + 0.5 * blk(ft.B1, gn0, w) - blk(ft.B1, ft.B0, wg)
    M22 = 0.5 * blk(gn1, ft.B1, w) + 0.5 * blk(ft.B1, gn1, w) + blk(ft.B1, ft.B1, wg)
    return M11, M12, M21, M22


def _boundary_block(fb: FaceTables, penalty_constant: float):
    """Weak-Dirichlet boundary block (full-weight terms,
    poly_utils.h:2065-2082)."""
    gamma = (penalty_constant / fb.h_f)[:, None]
    gn = jnp.einsum("fqid,fqd->fqi", fb.G0, fb.n)
    w = fb.w
    Mb = (
        -jnp.einsum("fqi,fqj,fq->fij", fb.B0, gn, w)
        - jnp.einsum("fqi,fqj,fq->fij", gn, fb.B0, w)
        + jnp.einsum("fqi,fqj,fq->fij", fb.B0, fb.B0, w * gamma)
    )
    return Mb


def assemble_sipg_matrix(
    ah: AgglomerationHandler,
    penalty_constant: float | None = None,
    include_boundary: bool = True,
    dtype=jnp.float64,
    vol: VolumeTables | None = None,
    faces: tuple[FaceTables, FaceTables] | None = None,
    dirichlet_ids=None,
) -> BlockMatrix:
    """Assemble the SIPG Laplace matrix as a BlockMatrix.

    ``include_boundary=False`` drops the boundary Nitsche terms — the
    configuration of the reference's "SIPG annihilates linears" sanity
    tests (test/polydeal/poisson_sanity_check_01.cc pattern).
    """
    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    if vol is None:
        vol = build_volume_tables(ah, dtype)
    if faces is None:
        faces = build_face_tables(ah, dtype)
    fi, fb = faces
    P, nb = ah.n_poly, ah.n_basis

    # volume: per-cell stiffness, reduced onto polytopes
    A_cell = jnp.einsum("cqid,cqjd,cq->cij", vol.G, vol.G, vol.w)
    A_diag = jax.ops.segment_sum(A_cell, jnp.asarray(vol.cell2poly), num_segments=P)

    rows = [np.arange(P)]
    cols = [np.arange(P)]
    datas = []

    if fi.poly_in.shape[0] > 0:
        M11, M12, M21, M22 = _interior_blocks(fi, penalty_constant)
        f_in = jnp.asarray(fi.poly_in)
        f_out = jnp.asarray(fi.poly_out)
        A_diag = A_diag + jax.ops.segment_sum(M11, f_in, num_segments=P)
        A_diag = A_diag + jax.ops.segment_sum(M22, f_out, num_segments=P)
        # merge off-diagonal blocks per unique polytope pair (static ids)
        key = fi.poly_in.astype(np.int64) * P + fi.poly_out
        pairs, pair_id = np.unique(key, return_inverse=True)
        pin = (pairs // P).astype(np.int64)
        pout = (pairs % P).astype(np.int64)
        M12m = jax.ops.segment_sum(M12, jnp.asarray(pair_id), num_segments=pairs.shape[0])
        M21m = jax.ops.segment_sum(M21, jnp.asarray(pair_id), num_segments=pairs.shape[0])
        rows += [pin, pout]
        cols += [pout, pin]
        datas += [M12m, M21m]

    if include_boundary and fb.poly_in.shape[0] > 0:
        sel = np.where(dirichlet_face_mask(ah, dirichlet_ids))[0]
        if sel.shape[0]:
            fbd = FaceTables(B0=fb.B0[sel], G0=fb.G0[sel], B1=None, G1=None,
                             w=fb.w[sel], n=fb.n[sel], x=fb.x[sel],
                             h_f=fb.h_f[sel], poly_in=fb.poly_in[sel],
                             poly_out=None)
            Mb = _boundary_block(fbd, penalty_constant)
            A_diag = A_diag + jax.ops.segment_sum(
                Mb, jnp.asarray(fbd.poly_in), num_segments=P
            )

    data = jnp.concatenate([A_diag] + datas, axis=0)
    return BlockMatrix.from_blocks(
        np.concatenate(rows), np.concatenate(cols), data, P
    )


def transpose_tables(vol: VolumeTables, faces):
    """Entity-LAST copies of the shape tables for the banded assembly.

    Standard tables are [entity, q, nb(, dim)] — their tiny trailing dims
    tile-pad 32x on TPU, so reading them dominates assembly.  This
    one-time relayout (run it at setup, outside the hot loop) feeds
    ``assemble_sipg_banded`` lane-aligned operands: [q, nb(, dim), entity].
    """
    fi, fb = faces

    def t3(a):  # [F, q, i] -> [q, i, F]
        return None if a is None else jnp.transpose(a, (1, 2, 0))

    def t4(a):  # [F, q, i, d] -> [q, i, d, F]
        return None if a is None else jnp.transpose(a, (1, 2, 3, 0))

    def t2(a):  # [F, q] -> [q, F]
        return None if a is None else a.T

    # numeric arrays only — the static index arrays travel separately
    # (dict pytree leaves get traced under jit, and slot computation needs
    # them concrete)
    vol_t = dict(B=t3(vol.B), G=t4(vol.G), w=t2(vol.w))
    fi_t = dict(B0=t3(fi.B0), G0=t4(fi.G0), B1=t3(fi.B1), G1=t4(fi.G1),
                w=t2(fi.w), n=t4(fi.n[:, :, None, :])[:, 0], h_f=fi.h_f)
    fb_t = dict(B0=t3(fb.B0), G0=t4(fb.G0), w=t2(fb.w),
                n=t4(fb.n[:, :, None, :])[:, 0], h_f=fb.h_f)
    static = dict(cell2poly=vol.cell2poly, poly_in=fi.poly_in,
                  poly_out=fi.poly_out, poly_b=fb.poly_in)
    return vol_t, fi_t, fb_t, static


def assemble_sipg_banded_t(
    ah: AgglomerationHandler,
    vol_t: dict,
    fi_t: dict,
    fb_t: dict,
    static: dict,
    offsets: np.ndarray,
    penalty_constant: float | None = None,
):
    """Banded SIPG assembly over entity-last tables (see
    :func:`transpose_tables`) — every operand and intermediate is
    lane-aligned; this is the hot-path assembly for repeated
    (time-stepping) use."""
    from polydeal_tpu.sparse import BlockBanded

    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    P, nb = ah.n_poly, ah.n_basis
    pin = static["poly_in"].astype(np.int64)
    pout = static["poly_out"].astype(np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_off = offsets.shape[0]
    o0 = int(np.searchsorted(offsets, 0))
    s_vol = o0 * P + static["cell2poly"].astype(np.int64)
    s_m11 = o0 * P + pin
    s_m22 = o0 * P + pout
    s_m12 = np.searchsorted(offsets, pout - pin) * P + pin
    s_m21 = np.searchsorted(offsets, pin - pout) * P + pout
    slots = [s_vol, s_m11, s_m12, s_m21, s_m22]
    has_b = static["poly_b"].shape[0] > 0
    if has_b:
        slots.append(o0 * P + static["poly_b"].astype(np.int64))
    seg = jnp.asarray(np.concatenate(slots))

    gamma_i = penalty_constant / fi_t["h_f"]  # [F]
    gn0 = jnp.einsum("qidf,qdf->qif", fi_t["G0"], fi_t["n"])
    gn1 = jnp.einsum("qidf,qdf->qif", fi_t["G1"], fi_t["n"])
    w = fi_t["w"]
    wg = w * gamma_i[None, :]

    def blk(a, b, wgt):
        return jnp.einsum("qif,qjf,qf->ijf", a, b, wgt)

    B0, B1 = fi_t["B0"], fi_t["B1"]
    vol_v = jnp.einsum("qidc,qjdc,qc->ijc", vol_t["G"], vol_t["G"],
                       vol_t["w"])
    m11 = -0.5 * blk(gn0, B0, w) - 0.5 * blk(B0, gn0, w) + blk(B0, B0, wg)
    m12 = 0.5 * blk(gn0, B1, w) - 0.5 * blk(B0, gn1, w) - blk(B0, B1, wg)
    m21 = -0.5 * blk(gn1, B0, w) + 0.5 * blk(B1, gn0, w) - blk(B1, B0, wg)
    m22 = 0.5 * blk(gn1, B1, w) + 0.5 * blk(B1, gn1, w) + blk(B1, B1, wg)
    vals = [vol_v, m11, m12, m21, m22]
    if has_b:
        gamma_b = penalty_constant / fb_t["h_f"]
        gnb = jnp.einsum("qidf,qdf->qif", fb_t["G0"], fb_t["n"])
        Bb, wb = fb_t["B0"], fb_t["w"]
        mb = (-blk(Bb, gnb, wb) - blk(gnb, Bb, wb)
              + blk(Bb, Bb, wb * gamma_b[None, :]))
        vals.append(mb)
    allv = jnp.concatenate(vals, axis=-1)
    pieces = [
        [
            jax.ops.segment_sum(allv[i, j], seg,
                                num_segments=n_off * P).reshape(n_off, 1, 1, P)
            for j in range(nb)
        ]
        for i in range(nb)
    ]
    data = jnp.concatenate(
        [jnp.concatenate(row, axis=2) for row in pieces], axis=1
    )
    return BlockBanded(data=data, offsets=offsets, n_block_cols=P)


# stats of the most recent build_banded_groups call (observability for
# the shard-local setup path; read by tests/tools)
last_setup_stats: dict = {}


def _lane_put(device_mesh, dtype):
    """Materializer for entity-last (lane-major) setup tables.

    Takes a BUILDER ``f(lo, hi) -> np.ndarray`` producing the lane slab
    ``[..., hi - lo]`` of a table whose global lane count is ``P``.

    With ``device_mesh`` (a jax.sharding.Mesh) the table is built ONE
    LANE SLAB AT A TIME on host and ``device_put`` per shard
    (``jax.make_array_from_single_device_arrays``): neither host RAM nor
    any replica's HBM ever holds a global table — host peak scales as
    1/n_dev of the padded-table bytes, the analogue of the reference's
    rank-local setup (source/agglomeration_handler.cc:85-87,1026-1091).
    Without a mesh, the whole table is built in one call on the default
    device (single-chip path, unchanged)."""
    if device_mesh is None:

        def put1(build, P):
            a = jnp.asarray(build(0, P), dtype=dtype)
            last_setup_stats["max_host_slab_bytes"] = max(
                last_setup_stats.get("max_host_slab_bytes", 0),
                a.size * a.dtype.itemsize)
            return a

        return put1
    from jax.sharding import NamedSharding, PartitionSpec

    axis = device_mesh.axis_names[0]
    devs = list(device_mesh.devices.flat)
    n_dev = len(devs)

    def put(build, P):
        assert P % n_dev == 0, (P, n_dev)
        per = P // n_dev
        shards = []
        np_dtype = np.dtype(jnp.zeros(0, dtype=dtype).dtype.name)
        for i, dev in enumerate(devs):
            slab = np.asarray(build(i * per, (i + 1) * per),
                              dtype=np_dtype)
            last_setup_stats["max_host_slab_bytes"] = max(
                last_setup_stats.get("max_host_slab_bytes", 0), slab.nbytes)
            shards.append(jax.device_put(slab, dev))
        gshape = shards[0].shape[:-1] + (P,)
        spec = PartitionSpec(*([None] * (len(gshape) - 1)), axis)
        return jax.make_array_from_single_device_arrays(
            gshape, NamedSharding(device_mesh, spec), shards)

    return put


def build_banded_groups(ah: AgglomerationHandler, offsets: np.ndarray,
                        dtype=jnp.float64, basis=None, dirichlet_ids=None,
                        device_mesh=None):
    """Slot-padded tables: the scatter-AND-gather-free banded assembly
    inputs.

    TPU has no fast random scatter or gather, so the reduction
    "entity values -> band slots" must be a *dense* operation.  The fix
    is to pad at the source: group interior faces by (offset, poly_in)
    into [P, C_o] tables (C_o = max faces a polytope pair contributes),
    boundary faces by polytope, and cells by polytope.  Assembly then is
    einsum + sum-over-C + jnp.roll:

      * m12 of group o lands directly at band row +o (poly_in-indexed);
      * m21 lands at row -o after a lane roll by +o (poly_out = poly_in
        + o, and the wrapped lanes are zero because no face wraps);
      * m11/m22 accumulate into the diagonal row (m22 rolled);
      * volume/boundary groups add to the diagonal directly.

    Padded rows carry zero weights (and h_f = 1), so they contribute
    exact zeros.  All tables are entity-LAST for lane alignment.
    Returns a pytree dict to pass to :func:`assemble_sipg_banded_direct`
    as a jit argument.
    """
    from polydeal_tpu.utils.grouping import padded_group_lists

    basis = basis or ah.basis
    P = ah.n_poly
    ft = ah.faces
    offsets = np.asarray(offsets, dtype=np.int64)
    last_setup_stats.clear()
    last_setup_stats["n_dev"] = (
        1 if device_mesh is None else int(device_mesh.devices.size))
    put = _lane_put(device_mesh, dtype)

    def face_group(rows: np.ndarray, by: np.ndarray):
        """Padded entity-last tables of the face rows, grouped by `by`.

        Only the IN-side unit points are stored: the OUT-side points are
        the same physical points pulled back into the neighbor's box —
        an affine map of pts_in from (lo, ext) of both sides, computed
        in-program by the assembly (saves one [C, q, d, P] table per
        group: ~25% of the face-table bytes, ~1.8 GB at 8.4M DoF).

        Every table is expressed as a lane-slab builder consumed by the
        ``put`` materializer — the sharded path never holds a global
        [C, q, d, P] numpy array on host."""
        members, _ = padded_group_lists(by, P) if rows.size else (
            np.full((P, 1), -1, dtype=np.int64), None)
        mask = members >= 0
        safe = np.where(mask, rows[np.maximum(members, 0)], 0)
        C = members.shape[1]

        def b_pts(lo, hi):  # [C, q, d, hi-lo]
            s, m = safe[lo:hi], mask[lo:hi]
            pts = ft.points_in
            out = pts[s.reshape(-1)].reshape(hi - lo, C, *pts.shape[1:])
            out = np.where(m.reshape(hi - lo, C, 1, 1), out, 0.5)
            return np.transpose(out, (1, 2, 3, 0))

        def b_w(lo, hi):  # [C, q, hi-lo]
            s, m = safe[lo:hi], mask[lo:hi]
            w = ft.weights[s.reshape(-1)].reshape(hi - lo, C, -1)
            return np.transpose(np.where(m[:, :, None], w, 0.0), (1, 2, 0))

        def b_n(lo, hi):  # [C, q, d, hi-lo]
            s = safe[lo:hi]
            return np.transpose(
                ft.normals[s.reshape(-1)].reshape(
                    hi - lo, C, *ft.normals.shape[1:]), (1, 2, 3, 0))

        def b_hf(lo, hi):  # [C, hi-lo]
            return np.where(mask[lo:hi], ft.h_f[safe[lo:hi]], 1.0).T

        return dict(
            w=put(b_w, P),
            n=put(b_n, P),
            h_f=put(b_hf, P),
            pts_in=put(b_pts, P),
        )

    interior = ~ft.is_boundary
    off_of = np.where(interior, ft.poly_out - ft.poly_in, 0)
    groups = {}
    pos_offsets = [int(o) for o in offsets if o > 0]
    for o in pos_offsets:
        rows = np.where(interior & (off_of == o))[0]
        if rows.size:
            groups[o] = face_group(rows, ft.poly_in[rows])
    b_rows = np.where(ft.is_boundary)[0][dirichlet_face_mask(ah, dirichlet_ids)]
    bdry = face_group(b_rows, ft.poly_in[b_rows]) if b_rows.size else None

    # volume: padded cells per polytope, entity-last (slab builders)
    members = ah.poly2cells  # [P, Cc]
    maskc = members >= 0
    safe_v = np.maximum(members, 0)
    Cc = members.shape[1]

    def bv_pts(lo, hi):
        s, m = safe_v[lo:hi], maskc[lo:hi]
        upts = ah.cell_qpoints_unit[s.reshape(-1)].reshape(
            hi - lo, Cc, *ah.cell_qpoints_unit.shape[1:])
        upts = np.where(m[:, :, None, None], upts, 0.5)
        return np.transpose(upts, (1, 2, 3, 0))

    def bv_w(lo, hi):
        s, m = safe_v[lo:hi], maskc[lo:hi]
        wv = ah.cell_qweights[s.reshape(-1)].reshape(hi - lo, Cc, -1)
        return np.transpose(np.where(m[:, :, None], wv, 0.0), (1, 2, 0))

    vol = dict(pts=put(bv_pts, P), w=put(bv_w, P))
    ext_t = put(lambda lo, hi: ah.extents[lo:hi].T, P)  # [dim, P]
    lo_t = put(lambda lo, hi: ah.bbox_lo[lo:hi].T, P)  # [dim, P]
    return dict(groups=groups, bdry=bdry, vol=vol, ext_t=ext_t, lo_t=lo_t)


def assemble_rhs_direct(ah: AgglomerationHandler, tables: dict, f_fn,
                        g_fn=None, penalty_constant: float | None = None,
                        basis=None):
    """RHS over the slot-padded tables — entity-last einsums, zero
    scatters (the standard-layout assemble_rhs tile-pads its [c, q, nb]
    tables and segment-sums by polytope: ~10 ms at 1M DoF vs ~1 ms
    here).  Same mathematics: ∫ f v + Dirichlet Nitsche data terms."""
    basis = basis or ah.basis
    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    P, nb = ah.n_poly, ah.n_basis
    ext_t, lo_t = tables["ext_t"], tables["lo_t"]

    def real_pts(unit):  # [C, q, d, P] -> [C, q, P, d] real coords
        r = lo_t[None, None] + unit * ext_t[None, None]
        return jnp.moveaxis(r, 2, -1)

    vol = tables["vol"]
    B = basis.eval_t(vol["pts"])  # [C, q, nb, P]
    fv = f_fn(real_pts(vol["pts"]))  # [C, q, P]
    r = jnp.einsum("cqip,cqp,cqp->ip", B, vol["w"], fv)

    g = tables["bdry"]
    if g_fn is not None and g is not None:
        Bb = basis.eval_t(g["pts_in"])
        Gb = basis.grad_t(g["pts_in"]) / ext_t[None, None, None]
        gn = jnp.einsum("cqidp,cqdp->cqip", Gb, g["n"])
        gamma = penalty_constant / g["h_f"]  # [C, P]
        gv = g_fn(real_pts(g["pts_in"]))  # [C, q, P]
        r = r + jnp.einsum(
            "cqip,cqp,cqp->ip",
            Bb * gamma[:, None, None, :] - gn, g["w"], gv)
    return r.T.reshape(-1)



def _pad_lane_tables(tables, pad: int):
    """Zero-pad the lane (last) dim of the slot-padded tables by ``pad``
    so the Pallas kernels see a multiple-of-128 lane count.  Padded
    lanes carry zero weights/normals (their blocks vanish), midpoint
    unit coordinates, and unit h_f/extents (finite gamma and inverse
    extents — no inf*0 NaNs)."""
    if pad == 0:
        return tables, tables["ext_t"], tables["lo_t"]

    def pl_(a, fill):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, widths, constant_values=fill)

    def pad_group(g):
        return dict(w=pl_(g["w"], 0.0), n=pl_(g["n"], 0.0),
                    h_f=pl_(g["h_f"], 1.0), pts_in=pl_(g["pts_in"], 0.5))

    padded = dict(
        groups={o: pad_group(g) for o, g in tables["groups"].items()},
        bdry=None if tables["bdry"] is None
        else pad_group(tables["bdry"]),
        vol=dict(pts=pl_(tables["vol"]["pts"], 0.5),
                 w=pl_(tables["vol"]["w"], 0.0)),
    )
    # padded lanes: unit extents (finite inverses) and zero box origins
    return padded, pl_(tables["ext_t"], 1.0), pl_(tables["lo_t"], 0.0)


def _emit_packed(pieces, offsets, plan, oid):
    """BlockPacked directly from the per-offset [nb, nb, P] band pieces
    — never materializes the dense band (n_off rows: ~5 GB at 8.4M DoF
    and 37 offsets) nor pays the separate to_packed pass over it.

    Identical selection semantics to BlockBanded.to_packed: each slot
    row holds, per lane, the block of whichever of the slot's offsets is
    active there (conflict-free by construction)."""
    from polydeal_tpu.sparse import BlockPacked

    nb = pieces[0].shape[0]
    P = pieces[0].shape[-1]
    K, R_pad = plan.K, plan.R_pad
    by_off = {int(o): pc for o, pc in zip(offsets, pieces)}
    packed_k = []
    for k in range(K):
        acc = jnp.zeros((nb, nb, P), dtype=pieces[0].dtype)
        for o_idx in plan.slots[k]:
            mask = (oid[k] == o_idx)[None, None, :]
            acc = jnp.where(mask, by_off[plan.offsets[o_idx]], acc)
        packed_k.append(acc)
    slabs = []
    for i in range(nb):
        slab = jnp.concatenate([pk[i] for pk in packed_k], axis=0)
        if R_pad != K * nb:
            slab = jnp.concatenate(
                [slab, jnp.zeros((R_pad - K * nb, P), dtype=slab.dtype)],
                axis=0)
        slabs.append(slab)
    return BlockPacked(data_i=jnp.concatenate(slabs, axis=0), oid=oid,
                       plan=plan, far_data=None, far_rows=None,
                       far_cols=None)


def _emit_banded(pieces, offsets, nb, P, layout):
    """Final banded container from per-offset [nb, nb, P] pieces.

    layout='imajor' emits the Pallas SpMV layout directly (rows
    (i, k, j), 8-aligned i-slabs) without ever materializing the o-major
    band — at 10^7 DoF the duplicate copy is ~1 GB and was the HBM
    high-water mark."""
    from polydeal_tpu.sparse import BlockBanded

    if layout == "imajor":
        n_off = offsets.shape[0]
        R = n_off * nb
        R_pad = -(-R // 8) * 8
        slabs = []
        for i in range(nb):
            slab = jnp.concatenate([pc[i] for pc in pieces], axis=0)
            if R_pad != R:
                slab = jnp.concatenate(
                    [slab, jnp.zeros((R_pad - R, P), dtype=slab.dtype)],
                    axis=0)
            slabs.append(slab)
        data_i = jnp.concatenate(slabs, axis=0)
        empty = jnp.zeros((n_off, nb, nb, 0), dtype=data_i.dtype)
        return BlockBanded(data=empty, offsets=offsets, n_block_cols=P,
                           data_i=data_i)
    data = jnp.stack(pieces, axis=0)
    return BlockBanded(data=data, offsets=offsets, n_block_cols=P)


def assemble_sipg_banded_direct(
    ah: AgglomerationHandler,
    tables: dict,
    offsets: np.ndarray,
    penalty_constant: float | None = None,
    basis=None,
    use_pallas: bool | None = None,
    layout: str = "omajor",
    interpret: bool = False,
    pack_plan=None,
    pack_oid=None,
):
    """Banded SIPG assembly over slot-padded tables (see
    :func:`build_banded_groups`) — pure einsum/sum/roll, no scatters or
    gathers anywhere.  Measured ~100x faster than segment-sum / gather
    reductions on TPU at 10^6 DoF (which run at <1% of HBM bandwidth).

    On TPU (dgp basis, f32 tables) the face/volume block computation
    runs in Pallas kernels (ops/sipg_kernels.py) that keep basis
    evaluation and the q-contractions in registers — the XLA einsum
    lowering materializes [nb,nb,q,P] broadcast intermediates at ~8% of
    bandwidth.  General agglomerations (C > 1 fine entities per slot,
    e.g. the R-tree hierarchy) accumulate inside the kernels; lane
    counts not divisible by 128 are zero-padded for the kernel calls
    and sliced back.  ``interpret=True`` forces the Pallas path in
    interpreter mode (CPU parity tests)."""
    import jax as _jax

    from polydeal_tpu.sparse import BlockBanded

    basis = basis or ah.basis
    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    P, nb = ah.n_poly, ah.n_basis
    offsets = np.asarray(offsets, dtype=np.int64)
    ext_t = tables["ext_t"]  # [dim, P]
    lo_t = tables["lo_t"]  # [dim, P]

    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"
    kernels_on = (
        (use_pallas or interpret)
        and ah.family == "dgp"
        and jnp.zeros(0, dtype=tables["vol"]["w"].dtype).dtype
        == jnp.float32
    )
    # per-kernel VMEM feasibility at the minimum lane tile (128) and a
    # single-entity C chunk — the kernels split large C across an inner
    # accumulating grid dimension (ops/sipg_kernels._chunk_plan), so only
    # a basis too big even for (T=128, Cc=1) falls back to the XLA
    # einsums (whose broadcast intermediates OOM HBM at p>=2 scale)
    vol_pal = bdry_pal = False
    face_pal = {o: False for o in tables["groups"]}
    if kernels_on:
        from polydeal_tpu.ops.sipg_kernels import (
            _boundary_lane_cost,
            _face_lane_cost,
            _pick_tile,
            _volume_lane_cost,
        )

        fits = lambda c: _pick_tile(128, c) is not None
        vol_pal = fits(_volume_lane_cost(
            nb, ah.dim, tables["vol"]["w"].shape[1], 1))
        face_pal = {
            o: fits(_face_lane_cost(nb, ah.dim, g["w"].shape[1], 1))
            for o, g in tables["groups"].items()
        }
        gb = tables["bdry"]
        bdry_pal = (gb is not None and fits(_boundary_lane_cost(
            nb, ah.dim, gb["w"].shape[1], 1)))

    tab_p = ext_p = lo_p = None
    P_pad = -(-P // 128) * 128
    sl = (...,) if P_pad == P else (Ellipsis, slice(0, P))
    if vol_pal or bdry_pal or any(face_pal.values()):
        tab_p, ext_p, lo_p = _pad_lane_tables(tables, P_pad - P)

    def eval_tables(pts):
        """pts [C, q, d, P] -> B [C, q, nb, P], G [C, q, nb, d, P] via
        the lane-minor basis recurrences (Basis.eval_t/grad_t) — no
        intermediate ever has a tiny trailing dim."""
        return basis.eval_t(pts), basis.grad_t(pts)

    def real_grad(G, ext):  # ext [dim, P]
        return G / ext[None, None, None, :, :]

    def pts_out_of(g, o, lo, ext):
        """OUT-side unit points from the IN-side table: the same
        physical points pulled back into the neighbor's bounding box
        (poly_out = poly_in + o, so its box params are lane rolls).
        Padded/wrapped lanes produce arbitrary-but-finite points whose
        contributions vanish against the zero weights."""
        x = lo[None, None] + g["pts_in"] * ext[None, None]
        lo_o = jnp.roll(lo, -o, axis=1)
        ext_o = jnp.roll(ext, -o, axis=1)
        return (x - lo_o[None, None]) / ext_o[None, None]

    # volume: sum over padded cells
    if vol_pal:
        from polydeal_tpu.ops.sipg_kernels import volume_blocks_pallas

        diag = volume_blocks_pallas(
            tab_p["vol"], ext_p, ah.degree, ah.dim,
            interpret=interpret).reshape(nb, nb, P_pad)[sl]
    else:
        Bv, Gv = eval_tables(tables["vol"]["pts"])
        Gv = real_grad(Gv, ext_t)
        wv = tables["vol"]["w"]  # [Cc, q, P]
        diag = jnp.einsum("cqidp,cqjdp,cqp->ijp", Gv, Gv, wv)

    rows = {int(o): None for o in offsets}
    for o, g in tables["groups"].items():
        if face_pal[o]:
            from polydeal_tpu.ops.sipg_kernels import face_group_blocks_pallas

            m11, m12, m21, m22 = (
                m.reshape(nb, nb, P_pad)[sl]
                for m in face_group_blocks_pallas(
                    tab_p["groups"][o], ext_p, lo_p, o, ah.degree, ah.dim,
                    penalty_constant, interpret=interpret))
        else:
            B0, G0u = eval_tables(g["pts_in"])
            B1, G1u = eval_tables(pts_out_of(g, o, lo_t, ext_t))
            # side 0 gradients scale by poly_in extents (P-aligned);
            # side 1 by poly_out = P + o extents: roll the lanes by -o
            G0 = real_grad(G0u, ext_t)
            G1 = real_grad(G1u, jnp.roll(ext_t, -o, axis=1))
            n, w = g["n"], g["w"]
            gamma = penalty_constant / g["h_f"]  # [C, P]
            gn0 = jnp.einsum("cqidp,cqdp->cqip", G0, n)
            gn1 = jnp.einsum("cqidp,cqdp->cqip", G1, n)
            wg = w * gamma[:, None, :]

            def blk(a, b, wgt):
                return jnp.einsum("cqip,cqjp,cqp->ijp", a, b, wgt)

            m11 = (-0.5 * blk(gn0, B0, w) - 0.5 * blk(B0, gn0, w)
                   + blk(B0, B0, wg))
            m12 = (0.5 * blk(gn0, B1, w) - 0.5 * blk(B0, gn1, w)
                   - blk(B0, B1, wg))
            m21 = (-0.5 * blk(gn1, B0, w) + 0.5 * blk(B1, gn0, w)
                   - blk(B1, B0, wg))
            m22 = (0.5 * blk(gn1, B1, w) + 0.5 * blk(B1, gn1, w)
                   + blk(B1, B1, wg))
        diag = diag + m11 + jnp.roll(m22, o, axis=-1)
        rows[o] = m12 if rows[o] is None else rows[o] + m12
        m21r = jnp.roll(m21, o, axis=-1)
        rows[-o] = m21r if rows[-o] is None else rows[-o] + m21r

    if bdry_pal:
        from polydeal_tpu.ops.sipg_kernels import boundary_blocks_pallas

        diag = diag + boundary_blocks_pallas(
            tab_p["bdry"], ext_p, ah.degree, ah.dim, penalty_constant,
            interpret=interpret).reshape(nb, nb, P_pad)[sl]
    else:
        diag = diag + _boundary_band_xla(ah, tables, penalty_constant,
                                         basis, ext_t, nb, P)

    zero = jnp.zeros((nb, nb, P), dtype=diag.dtype)
    pieces = [diag if o == 0 else (rows[int(o)] if rows[int(o)] is not None
                                   else zero)
              for o in offsets]
    if pack_plan is not None:
        # emit the packed format directly (ops/packed.py) — skips the
        # dense band and its separate to_packed pass entirely
        return _emit_packed(pieces, offsets, pack_plan, pack_oid)
    return _emit_banded(pieces, offsets, nb, P, layout)


def assemble_mass_banded_direct(ah: AgglomerationHandler, tables: dict,
                                coeff_fn=None, basis=None):
    """Block-diagonal mass matrix over the slot-padded tables, in the
    band-row layout [nb, nb, P] (add it to a band's offset-0 row).

    The monodomain per-level operator is sigma*K + c*M
    (reference utils.h:1128-1137); this keeps the whole level assembly
    on the lane-aligned direct path.
    """
    basis = basis or ah.basis
    vol = tables["vol"]
    B = basis.eval_t(vol["pts"])  # [C, q, nb, P]
    w = vol["w"]
    if coeff_fn is not None:
        ext_t, lo_t = tables["ext_t"], tables["lo_t"]
        r = lo_t[None, None] + vol["pts"] * ext_t[None, None]
        w = w * coeff_fn(jnp.moveaxis(r, 2, -1))
    return jnp.einsum("cqip,cqjp,cqp->ijp", B, B, w)


def _boundary_band_xla(ah, tables, penalty_constant, basis, ext_t, nb, P):
    """Boundary Nitsche contribution to the diagonal band row (XLA
    einsums — boundary face counts are a surface term, too small to be
    worth a kernel)."""
    if tables["bdry"] is None:
        return jnp.zeros((nb, nb, P), dtype=tables["vol"]["w"].dtype)
    g = tables["bdry"]
    Bb = basis.eval_t(g["pts_in"])
    Gb = basis.grad_t(g["pts_in"]) / ext_t[None, None, None, :, :]
    n, w = g["n"], g["w"]
    gamma = penalty_constant / g["h_f"]
    gnb = jnp.einsum("cqidp,cqdp->cqip", Gb, n)
    wg = w * gamma[:, None, :]
    return (-jnp.einsum("cqip,cqjp,cqp->ijp", Bb, gnb, w)
            - jnp.einsum("cqip,cqjp,cqp->ijp", gnb, Bb, w)
            + jnp.einsum("cqip,cqjp,cqp->ijp", Bb, Bb, wg))


def banded_gather_maps(ah: AgglomerationHandler, static: dict,
                       offsets: np.ndarray):
    """Static scatter-free reduction maps for the banded assembly.

    The segment-sum formulation of :func:`assemble_sipg_banded_t`
    scatter-adds ~nb² × n_entities scalars — measured at ~500 ms for the
    1M-DoF bench (scatters serialize on TPU).  This inverts the map once
    on the host: for each band offset o, ``maps[o]`` is a padded
    [P, C_o] gather of the entity indices contributing to slot (o, p).
    Assembly then is einsum + gather + masked sum — no scatters at all.

    Entity stream order (must match the value concatenation):
    volume cells, m11 faces, m12, m21, m22, boundary faces.
    """
    from polydeal_tpu.utils.grouping import padded_group_lists

    P = ah.n_poly
    pin = static["poly_in"].astype(np.int64)
    pout = static["poly_out"].astype(np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    o0 = int(np.searchsorted(offsets, 0))
    n_fi = pin.shape[0]
    n_c = static["cell2poly"].shape[0]
    base_m11 = n_c
    base_m12 = base_m11 + n_fi
    base_m21 = base_m12 + n_fi
    base_m22 = base_m21 + n_fi
    base_b = base_m22 + n_fi

    okey = [[] for _ in range(offsets.shape[0])]  # entity ids per offset
    opoly = [[] for _ in range(offsets.shape[0])]
    def put(o_idx, polys, base):
        for oi in np.unique(o_idx):
            m = o_idx == oi
            okey[oi].append(np.where(m)[0] + base)
            opoly[oi].append(polys[m])

    put(np.full(n_c, o0), static["cell2poly"].astype(np.int64), 0)
    put(np.full(n_fi, o0), pin, base_m11)
    put(np.searchsorted(offsets, pout - pin), pin, base_m12)
    put(np.searchsorted(offsets, pin - pout), pout, base_m21)
    put(np.full(n_fi, o0), pout, base_m22)
    if static["poly_b"].shape[0]:
        pb = static["poly_b"].astype(np.int64)
        put(np.full(pb.shape[0], o0), pb, base_b)

    maps = []
    for k in range(offsets.shape[0]):
        if okey[k]:
            ents = np.concatenate(okey[k])
            pols = np.concatenate(opoly[k])
            # group entity ids by target polytope; pad with entity 0 and
            # a zero mask (members indexes into `ents`)
            members, _ = padded_group_lists(pols, P)
            mask = members >= 0
            safe = ents[np.where(mask, members, 0)]
            maps.append((safe, mask.astype(np.float64)))
        else:
            maps.append((np.zeros((P, 1), dtype=np.int64),
                         np.zeros((P, 1))))
    return maps


def assemble_sipg_banded_gather(
    ah: AgglomerationHandler,
    vol_t: dict,
    fi_t: dict,
    fb_t: dict,
    static: dict,
    offsets: np.ndarray,
    maps=None,
    penalty_constant: float | None = None,
):
    """Scatter-free banded SIPG assembly (gather formulation).

    Same mathematics as :func:`assemble_sipg_banded_t` but the reduction
    into band slots runs as static padded gathers + masked sums (see
    :func:`banded_gather_maps`) — measured ~50x faster than the
    scatter-add path on TPU at 10^6 DoF.
    """
    import jax.numpy as jnp
    from polydeal_tpu.sparse import BlockBanded

    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    P, nb = ah.n_poly, ah.n_basis
    offsets = np.asarray(offsets, dtype=np.int64)
    if maps is None:
        maps = banded_gather_maps(ah, static, offsets)

    gamma_i = penalty_constant / fi_t["h_f"]
    gn0 = jnp.einsum("qidf,qdf->qif", fi_t["G0"], fi_t["n"])
    gn1 = jnp.einsum("qidf,qdf->qif", fi_t["G1"], fi_t["n"])
    w = fi_t["w"]
    wg = w * gamma_i[None, :]

    def blk(a, b, wgt):
        return jnp.einsum("qif,qjf,qf->ijf", a, b, wgt)

    B0, B1 = fi_t["B0"], fi_t["B1"]
    vol_v = jnp.einsum("qidc,qjdc,qc->ijc", vol_t["G"], vol_t["G"],
                       vol_t["w"])
    m11 = -0.5 * blk(gn0, B0, w) - 0.5 * blk(B0, gn0, w) + blk(B0, B0, wg)
    m12 = 0.5 * blk(gn0, B1, w) - 0.5 * blk(B0, gn1, w) - blk(B0, B1, wg)
    m21 = -0.5 * blk(gn1, B0, w) + 0.5 * blk(B1, gn0, w) - blk(B1, B0, wg)
    m22 = 0.5 * blk(gn1, B1, w) + 0.5 * blk(B1, gn1, w) + blk(B1, B1, wg)
    vals = [vol_v, m11, m12, m21, m22]
    if static["poly_b"].shape[0]:
        gamma_b = penalty_constant / fb_t["h_f"]
        gnb = jnp.einsum("qidf,qdf->qif", fb_t["G0"], fb_t["n"])
        Bb, wb = fb_t["B0"], fb_t["w"]
        vals.append(-blk(Bb, gnb, wb) - blk(gnb, Bb, wb)
                    + blk(Bb, Bb, wb * gamma_b[None, :]))
    allv = jnp.concatenate(vals, axis=-1)  # [nb, nb, E]

    pieces = []
    for k in range(offsets.shape[0]):
        idx, mask = maps[k]
        idxj = jnp.asarray(idx.reshape(-1))
        mj = jnp.asarray(mask, dtype=allv.dtype)
        row = [
            [
                jnp.einsum(
                    "pc,pc->p",
                    allv[i, j][idxj].reshape(idx.shape), mj,
                ).reshape(1, 1, 1, P)
                for j in range(nb)
            ]
            for i in range(nb)
        ]
        pieces.append(jnp.concatenate(
            [jnp.concatenate(r, axis=2) for r in row], axis=1))
    data = jnp.concatenate(pieces, axis=0)
    return BlockBanded(data=data, offsets=offsets, n_block_cols=P)


def assemble_sipg_banded(
    ah: AgglomerationHandler,
    offsets: np.ndarray | None = None,
    penalty_constant: float | None = None,
    include_boundary: bool = True,
    dtype=jnp.float64,
    vol: VolumeTables | None = None,
    faces: tuple[FaceTables, FaceTables] | None = None,
):
    """Assemble the SIPG matrix DIRECTLY in the banded block layout.

    Produces a :class:`BlockBanded` [n_off, nb, nb, P] without ever
    materializing a [nnz, nb, nb] array: each of the nb² block components
    is one scalar segment-sum into the [n_off * P] slot space — all
    intermediates lane-aligned (the [*, nb, nb] layouts tile-pad 32× on
    TPU and made the COO path 50× slower than the math costs).

    ``offsets`` fixes the band structure (pass a superset for reuse across
    assemblies); by default it is derived from the mesh.
    """
    from polydeal_tpu.sparse import BlockBanded

    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    if vol is None:
        vol = build_volume_tables(ah, dtype)
    if faces is None:
        faces = build_face_tables(ah, dtype)
    fi, fb = faces
    P, nb = ah.n_poly, ah.n_basis

    pin = fi.poly_in.astype(np.int64)
    pout = fi.poly_out.astype(np.int64)
    if offsets is None:
        offsets = np.unique(np.concatenate([
            pout - pin, pin - pout, np.zeros(1, dtype=np.int64)]))
    offsets = np.asarray(offsets, dtype=np.int64)
    n_off = offsets.shape[0]
    o0 = int(np.searchsorted(offsets, 0))
    oidx12 = np.searchsorted(offsets, pout - pin)
    oidx21 = np.searchsorted(offsets, pin - pout)

    # static slot ids in the [n_off * P] band space
    s_vol = o0 * P + vol.cell2poly.astype(np.int64)
    s_m11 = o0 * P + pin
    s_m22 = o0 * P + pout
    s_m12 = oidx12 * P + pin
    s_m21 = oidx21 * P + pout
    slots = [s_vol, s_m11, s_m12, s_m21, s_m22]
    if include_boundary and fb.poly_in.shape[0]:
        slots.append(o0 * P + fb.poly_in.astype(np.int64))
    seg = jnp.asarray(np.concatenate(slots))

    # per-entity block values with the entity axis LAST (lane-aligned)
    gamma_i = (penalty_constant / fi.h_f)[:, None]
    gn0 = jnp.einsum("fqid,fqd->fqi", fi.G0, fi.n)
    gn1 = jnp.einsum("fqid,fqd->fqi", fi.G1, fi.n)
    w, wg = fi.w, fi.w * gamma_i

    def blk(a, b, wgt):
        return jnp.einsum("fqi,fqj,fq->ijf", a, b, wgt)

    vol_v = jnp.einsum("cqid,cqjd,cq->ijc", vol.G, vol.G, vol.w)
    m11 = -0.5 * blk(gn0, fi.B0, w) - 0.5 * blk(fi.B0, gn0, w) + blk(fi.B0, fi.B0, wg)
    m12 = 0.5 * blk(gn0, fi.B1, w) - 0.5 * blk(fi.B0, gn1, w) - blk(fi.B0, fi.B1, wg)
    m21 = -0.5 * blk(gn1, fi.B0, w) + 0.5 * blk(fi.B1, gn0, w) - blk(fi.B1, fi.B0, wg)
    m22 = 0.5 * blk(gn1, fi.B1, w) + 0.5 * blk(fi.B1, gn1, w) + blk(fi.B1, fi.B1, wg)
    vals = [vol_v, m11, m12, m21, m22]
    if include_boundary and fb.poly_in.shape[0]:
        gamma_b = (penalty_constant / fb.h_f)[:, None]
        gnb = jnp.einsum("fqid,fqd->fqi", fb.G0, fb.n)
        mb = (-jnp.einsum("fqi,fqj,fq->ijf", fb.B0, gnb, fb.w)
              - jnp.einsum("fqi,fqj,fq->ijf", gnb, fb.B0, fb.w)
              + jnp.einsum("fqi,fqj,fq->ijf", fb.B0, fb.B0,
                           fb.w * gamma_b))
        vals.append(mb)
    allv = jnp.concatenate(vals, axis=-1)  # [nb, nb, n_entities]

    # 16 scalar segment-sums (NOT a vmap: XLA lays the vmapped
    # [nb, nb, n_off*P] scatter output with a minor tiny axis, tile-padding
    # it 32x and OOMing at ~10M slots)
    pieces = [
        [
            jax.ops.segment_sum(allv[i, j], seg,
                                num_segments=n_off * P).reshape(n_off, 1, 1, P)
            for j in range(nb)
        ]
        for i in range(nb)
    ]
    # assemble [n_off, nb, nb, P] by concatenation (a trailing transpose
    # would leave the jit OUTPUT in a permuted physical layout, making the
    # downstream solver's rolls/einsums ~17x slower)
    data = jnp.concatenate(
        [jnp.concatenate(row, axis=2) for row in pieces], axis=1
    )
    return BlockBanded(data=data, offsets=offsets, n_block_cols=P)


def assemble_rhs(
    ah: AgglomerationHandler,
    f_fn,
    g_fn=None,
    penalty_constant: float | None = None,
    dtype=jnp.float64,
    vol: VolumeTables | None = None,
    faces: tuple[FaceTables, FaceTables] | None = None,
    dirichlet_ids=None,
    neumann_fn=None,
) -> jnp.ndarray:
    """RHS vector: ∫ f v + boundary consistency/penalty terms for the
    Dirichlet datum g: ∫_Γ_D (-∇v·n + gamma v) g, plus the Neumann term
    ∫_Γ_N g_N v on non-Dirichlet faces.

    ``f_fn`` / ``g_fn`` map [..., dim] real coordinates to [...] values
    (jax-traceable); ``neumann_fn(x, n)`` is the flux datum ∂u/∂n = g_N.
    ``g_fn=None`` means homogeneous Dirichlet; ``dirichlet_ids=None``
    means every boundary face is Dirichlet.
    """
    if penalty_constant is None:
        penalty_constant = default_penalty_constant(ah.degree, ah.dim)
    if vol is None:
        vol = build_volume_tables(ah, dtype)
    if faces is None:
        faces = build_face_tables(ah, dtype)
    _, fb = faces
    P, nb = ah.n_poly, ah.n_basis

    fvals = f_fn(vol.x)  # [n_c, q]
    r_cell = jnp.einsum("cqi,cq,cq->ci", vol.B, vol.w, fvals)
    rhs = jax.ops.segment_sum(r_cell, jnp.asarray(vol.cell2poly), num_segments=P)

    if fb.poly_in.shape[0] > 0:
        dmask = dirichlet_face_mask(ah, dirichlet_ids)
        sel = np.where(dmask)[0]
        if g_fn is not None and sel.shape[0]:
            gvals = g_fn(fb.x[sel])  # [k, qf]
            gamma = (penalty_constant / fb.h_f[sel])[:, None]
            gn = jnp.einsum("fqid,fqd->fqi", fb.G0[sel], fb.n[sel])
            r_face = jnp.einsum("fqi,fq,fq->fi",
                                fb.B0[sel] * gamma[..., None] - gn,
                                fb.w[sel], gvals)
            rhs = rhs + jax.ops.segment_sum(
                r_face, jnp.asarray(fb.poly_in[sel]), num_segments=P
            )
        neu = np.where(~dmask)[0]
        if neumann_fn is not None and neu.shape[0]:
            gN = neumann_fn(fb.x[neu], fb.n[neu])  # [k, qf]
            r_face = jnp.einsum("fqi,fq,fq->fi", fb.B0[neu], fb.w[neu], gN)
            rhs = rhs + jax.ops.segment_sum(
                r_face, jnp.asarray(fb.poly_in[neu]), num_segments=P
            )
    return rhs.reshape(-1)


def mass_matrix(
    ah: AgglomerationHandler,
    coeff_fn=None,
    dtype=jnp.float64,
    vol: VolumeTables | None = None,
) -> BlockMatrix:
    """Block-diagonal mass matrix ∫ c(x) u v (c = 1 by default)."""
    if vol is None:
        vol = build_volume_tables(ah, dtype)
    P = ah.n_poly
    w = vol.w if coeff_fn is None else vol.w * coeff_fn(vol.x)
    M_cell = jnp.einsum("cqi,cqj,cq->cij", vol.B, vol.B, w)
    M = jax.ops.segment_sum(M_cell, jnp.asarray(vol.cell2poly), num_segments=P)
    return BlockMatrix(M, np.arange(P), np.arange(P), P, P)


def project(
    ah: AgglomerationHandler,
    fn,
    dtype=jnp.float64,
    vol: VolumeTables | None = None,
) -> jnp.ndarray:
    """L2 projection of ``fn`` onto the polytopal DG space.

    Exact for polynomials of degree <= p; the analogue of the reference's
    interpolation of exact solutions in its sanity/exactness tests.
    """
    if vol is None:
        vol = build_volume_tables(ah, dtype)
    P = ah.n_poly
    M = mass_matrix(ah, dtype=dtype, vol=vol).data  # [P, nb, nb]
    fvals = fn(vol.x)
    b_cell = jnp.einsum("cqi,cq,cq->ci", vol.B, vol.w, fvals)
    b = jax.ops.segment_sum(b_cell, jnp.asarray(vol.cell2poly), num_segments=P)
    coeffs = jnp.linalg.solve(M, b[..., None])[..., 0]
    return coeffs.reshape(-1)
