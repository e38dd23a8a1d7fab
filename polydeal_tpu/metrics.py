"""Polytopal mesh quality metrics.

Rebuild of ``PolyUtils::compute_quality_metrics`` (reference
include/poly_utils.h:708-855; printed by examples/metrics.cc:311-356).
The reference uses CGAL for exact inscribed/circumscribed circles; here
the circle radii are computed from the materialized quadrature (host
numpy, sampling-accurate): inscribed radius = min distance from the
polytope's volume-centroid to its boundary quadrature points,
circumscribed radius = max distance to boundary points.  The
box/coverage factor is exact (composite measure / bbox volume).

Also ``compute_h_orthogonal`` (reference poly_utils.h:399-513, CGAL ray
shooting): the depth of the polytope behind each polytopal face, taken as
the max distance of the polytope's quadrature points behind the face
plane along its mean normal.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compute_quality_metrics", "compute_h_orthogonal",
           "face_h_orthogonal"]


def face_h_orthogonal(handler) -> np.ndarray:
    """Per-face-ROW orthogonal length scale [n_f] for penalty scaling.

    Vectorized variant of :func:`compute_h_orthogonal` at fine-face
    granularity: for each face row, the depth of the owning polytope(s)
    behind the face plane along the face's mean normal; interior rows
    take the min of the two sides (the sharper penalty).  Wire into the
    assembly via ``build_face_tables(..., h_scale='orthogonal')`` —
    the optional penalty scaling of reference poly_utils.h:399-513.
    """
    ft = handler.faces
    pts = handler.vol_points_real  # [P, Q, dim]
    w = ft.weights  # [n_f, q]
    nbar = (w[..., None] * ft.normals).sum(axis=1)
    nbar /= np.maximum(np.linalg.norm(nbar, axis=-1, keepdims=True), 1e-300)
    xbar = (w[..., None] * ft.points_real).sum(axis=1) \
        / np.maximum(w.sum(axis=1), 1e-300)[:, None]
    # depth of side polytope behind the plane: max_q (xbar - x_q) . nbar
    d_in = np.einsum("fqd,fd->fq",
                     xbar[:, None, :] - pts[ft.poly_in], nbar).max(axis=1)
    h = d_in
    interior = ft.poly_out >= 0
    if interior.any():
        p_out = np.maximum(ft.poly_out, 0)
        d_out = np.einsum(
            "fqd,fd->fq", pts[p_out] - xbar[:, None, :], nbar).max(axis=1)
        h = np.where(interior, np.minimum(d_in, d_out), d_in)
    return np.maximum(h, 1e-12)


def compute_quality_metrics(handler) -> dict:
    """Per-polytope metric arrays + their means.

    Returns dict with: uniformity_factor (diameter / (2 r_circumscribed)),
    circle_ratio (r_inscribed / r_circumscribed), box_ratio
    (measure / bbox volume), coverage = mean box_ratio.
    """
    P = handler.n_poly
    # centroid from the composite quadrature
    w = handler.vol_weights  # [P, Q]
    x = handler.vol_points_real  # [P, Q, dim]
    measure = w.sum(axis=1)
    centroid = (w[..., None] * x).sum(axis=1) / measure[:, None]

    # boundary quadrature points of each polytope (interior+boundary faces)
    ft = handler.faces
    r_in = np.full(P, np.inf)
    r_out = np.zeros(P)

    def upd(poly_ids, pts):
        d = np.linalg.norm(pts - centroid[poly_ids][:, None, :], axis=-1)
        np.minimum.at(r_in, poly_ids, d.min(axis=1))
        np.maximum.at(r_out, poly_ids, d.max(axis=1))

    fb, fi = ft.boundary(), ft.interior()
    if fb.n_faces:
        upd(fb.poly_in, fb.points_real)
    if fi.n_faces:
        upd(fi.poly_in, fi.points_real)
        upd(fi.poly_out, fi.points_real)

    box_ratio = measure / handler.volumes
    circle_ratio = r_in / r_out
    uniformity = handler.diameters / (2.0 * r_out)
    return dict(
        uniformity_factor=uniformity,
        circle_ratio=circle_ratio,
        box_ratio=box_ratio,
        mean_uniformity=float(uniformity.mean()),
        mean_circle_ratio=float(circle_ratio.mean()),
        mean_box_ratio=float(box_ratio.mean()),
        coverage=float(measure.sum() / handler.volumes.sum()),
    )


def compute_h_orthogonal(handler) -> dict:
    """h_perp per polytopal face: {(poly_in, poly_out) -> depth}.

    For each polytopal face (grouped fine faces), the mean unit normal n̄
    and face centroid x̄ define the face plane; h_perp = max over the
    polytope's volume quadrature points of (x̄ - x)·n̄ — how deep the
    polytope extends behind the face (reference's orthogonal diameter for
    penalty scaling, poly_utils.h:420-497; boundary faces keyed with
    poly_out = -1)."""
    ft = handler.faces
    pts = handler.vol_points_real  # [P, Q, dim]
    key = ft.poly_in.astype(np.int64) * (handler.n_poly + 1) + (
        ft.poly_out.astype(np.int64) % (handler.n_poly + 1))
    uniq, inv = np.unique(key, return_inverse=True)
    out = {}
    for u_idx, u in enumerate(uniq):
        sel = inv == u_idx
        w = ft.weights[sel].reshape(-1)
        n = ft.normals[sel].reshape(-1, handler.dim)
        x = ft.points_real[sel].reshape(-1, handler.dim)
        nbar = (w[:, None] * n).sum(axis=0)
        nbar /= max(np.linalg.norm(nbar), 1e-300)
        xbar = (w[:, None] * x).sum(axis=0) / w.sum()
        p_in = int(ft.poly_in[sel][0])
        p_out = int(ft.poly_out[sel][0])
        depth = np.max((xbar[None, :] - pts[p_in]) @ nbar)
        out[(p_in, p_out)] = float(depth)
    return out
