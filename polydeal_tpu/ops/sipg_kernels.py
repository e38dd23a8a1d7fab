"""Pallas TPU kernels for SIPG banded assembly.

The XLA lowering of the face-block einsums ("cqip,cqjp,cqp->ijp")
materializes [nb, nb, q, P]-sized broadcast intermediates and runs at
~8% of HBM bandwidth (measured: 152 ms for the 1M-DoF bench assembly
whose ideal traffic is ~2 ms).  These kernels compute the Legendre basis
AND the SIPG blocks entirely in registers, streaming only geometry in
and band rows out.

Data model per face group (see ``assembly.sipg.build_banded_groups``):
C fine faces per (offset, polytope) slot (C = 1 on structured meshes;
general R-tree/METIS agglomerations have C > 1) — the kernels accumulate
over a static C loop, so only the [C, q, T] input slabs scale with C
while the basis/block working set stays fixed.  All in-kernel tensors
are [q, T] lane slabs (q in sublanes, polytopes in lanes), so every VPU
op runs at full width; the (i, j) block loops are static unrolls over
the basis exponent table.  Lane counts P that are not multiples of 128
are zero-padded by the caller (padded lanes carry zero weights, unit
h_f/extents) and sliced back after the call.

Reference parity: the four jump/average blocks match
``PolyUtils::assemble_local_jumps_and_averages`` (reference
include/poly_utils.h:1870-1926) with penalty gamma/h_f.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["face_group_blocks_pallas", "volume_blocks_pallas"]


def _legendre_slabs(x_dims, degree, jnp):
    """Per-dim 1D Legendre value/derivative slabs.

    x_dims: list over dim of [q, T] slabs (unit coords).  Returns
    (vals, ders): vals[d][k] is an [q, T] slab of sqrt(2k+1) P_k(2x-1).
    """
    scale = np.sqrt(2.0 * np.arange(degree + 1) + 1.0)
    vals, ders = [], []
    for x in x_dims:
        t = 2.0 * x - 1.0
        v = [jnp.ones_like(x)]
        dv = [jnp.zeros_like(x)]
        if degree >= 1:
            v.append(t)
            dv.append(jnp.ones_like(x))
        for k in range(1, degree):
            v.append(((2 * k + 1) * t * v[k] - k * v[k - 1]) / (k + 1))
            dv.append(dv[k - 1] + (2 * k + 1) * v[k])
        vals.append([v[k] * float(scale[k]) for k in range(degree + 1)])
        ders.append([dv[k] * (2.0 * float(scale[k]))
                     for k in range(degree + 1)])
    return vals, ders


def _basis_slabs(pts, E, degree, inv_ext, jnp):
    """B[i] [q,T] values and G[i][d] [q,T] REAL gradients for every basis
    function i of the exponent table E, given pts[d] [q,T] unit coords
    and inv_ext[d] [1?, T] reciprocal bbox extents."""
    dim = len(pts)
    vals, ders = _legendre_slabs(pts, degree, jnp)
    B, G = [], []
    for i in range(E.shape[0]):
        b = vals[0][E[i, 0]]
        for d in range(1, dim):
            b = b * vals[d][E[i, d]]
        B.append(b)
        gi = []
        for e in range(dim):
            g = None
            for d in range(dim):
                t = (ders if d == e else vals)[d][E[i, d]]
                g = t if g is None else g * t
            gi.append(g * inv_ext[e])
        G.append(gi)
    return B, G


def _pick_tile(P, bytes_per_lane, budget=5 * 2**20):
    """Largest power-of-two lane tile whose live slab footprint (values,
    gradients, outputs — all [*, T] f32, double-buffered by Mosaic) fits
    the VMEM budget."""
    t = 2048
    while t >= 128:
        if P % t == 0 and bytes_per_lane * t <= budget:
            return t
        t //= 2
    return None


def _chunk_plan(P, cost_of_c, C, c_chunk=None):
    """(T, Cc): lane tile + C-chunk size fitting the VMEM budget.

    The kernels' VMEM footprint is C-linear (Mosaic keeps the per-c
    slabs live), so large face groups — coarse R-tree levels have C up
    to ~dozens of fine faces per (offset, polytope) slot, more at p>=2
    where q grows — cannot run the whole C loop in one grid step.  The
    C loop is split across an inner grid dimension that ACCUMULATES
    into the output block (revisited consecutively, so Mosaic keeps it
    resident); this keeps every group on the Pallas path instead of
    falling back to the XLA einsums, whose [nb,nb,q,C,P] broadcast
    intermediates OOM HBM at p=2 coarse levels (measured 28.6G).
    Returns (None, None) only if even (T=128, Cc=1) does not fit.

    An explicit ``c_chunk`` (test/bench knob) is honored verbatim: if it
    does not fit the VMEM cost model the call raises instead of silently
    halving, so callers always exercise the chunk size they asked for."""
    if C < 1:
        raise ValueError(
            f"empty face/volume group (C={C}): the kernel grid would be "
            "empty and the output buffer uninitialized")
    if c_chunk is not None:
        Cc = int(c_chunk)
        T = _pick_tile(P, cost_of_c(Cc))
        if T is None:
            raise ValueError(
                f"explicit c_chunk={Cc} does not fit the VMEM budget at "
                f"P={P} (per-lane cost {cost_of_c(Cc)} B)")
        return T, Cc
    Cc = max(int(C), 1)
    while True:
        T = _pick_tile(P, cost_of_c(Cc))
        if T is not None or Cc == 1:
            return T, (Cc if T is not None else None)
        Cc = -(-Cc // 2)


def _pad_c(arrs, C, Cc):
    """Zero-pad the leading C axis to a multiple of Cc (padded entries
    carry zero weights, so their contributions vanish identically)."""
    import jax.numpy as jnp

    n_c = -(-C // Cc)
    pad = n_c * Cc - C
    if pad == 0:
        return arrs, n_c
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], n_c


def _face_lane_cost(nb, dim, q, C=1):
    """Per-lane f32 bytes live in the face kernel.  Measured on v5e:
    Mosaic double-buffers the [C, ...] inputs and does NOT reuse the
    per-c basis/normal-derivative slabs across the C loop (observed
    ~3.9k f32/lane for C=16, nb=4, dim=3, q=4 — matching this model),
    so every term scales with C.  The unrolled (i, j) block loop also
    keeps [q, T] product temporaries live across the 4 jump/average
    blocks (observed 34.9k BYTES/lane at nb=10, dim=3, q=9, C=1 — a
    scoped-vmem OOM at the tile the C/nb-linear terms alone pick — the
    gap matches 8 f32 per nb^2*q)."""
    return 4 * (2 * C * (3 * dim * q + q + 1)   # pts/n/w/gamma, dbl-buf
                + C * 2 * nb * (1 + dim) * q    # B, G both sides, per c
                + C * 2 * nb * q                # gn0, gn1 per c
                + 4 * nb * nb                   # four accumulator blocks
                + 8 * nb * nb * q               # block-loop temporaries
                + 2 * dim)                      # inv extents


@functools.partial(
    __import__("jax").jit,
    static_argnames=("degree", "dim", "q", "C", "penalty", "interpret",
                     "c_chunk"),
)
def _face_group_impl(pts_in, pts_out, w, n, gamma, inv_ext_in, inv_ext_out,
                     degree, dim, q, C, penalty, interpret, c_chunk=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polydeal_tpu.fem.basis import _complete_exponents

    E = _complete_exponents(dim, degree)
    nb = E.shape[0]
    P = w.shape[-1]
    T, Cc = _chunk_plan(P, lambda c: _face_lane_cost(nb, dim, q, c), C,
                        c_chunk)
    if T is None:
        raise ValueError(
            f"face kernel infeasible: no lane tile fits VMEM at "
            f"nb={nb}, dim={dim}, q={q}, C={C}, P={P}")
    (pts_in, pts_out, w, n, gamma), n_c = _pad_c(
        [pts_in, pts_out, w, n, gamma], C, Cc)
    gamma = gamma[:, None, :]  # [C, 1, P] — see the kernel comment

    def kernel(pi_ref, po_ref, w_ref, n_ref, g_ref, ei_ref, eo_ref,
               m11_ref, m12_ref, m21_ref, m22_ref):
        iei = [ei_ref[d:d + 1, :] for d in range(dim)]  # [1, T]
        ieo = [eo_ref[d:d + 1, :] for d in range(dim)]
        acc = [[[None] * nb for _ in range(nb)] for _ in range(4)]
        for c in range(Cc):
            wq = w_ref[c]  # [q, T]
            gam = g_ref[c]  # [1, T] (gamma ships [C, 1, P]: a (Cc, T)
            # block would violate Mosaic's 8-sublane rule when Cc < C —
            # first hit at p=2 coarse levels where the C loop chunks)
            pin = [pi_ref[c, :, d, :] for d in range(dim)]  # each [q, T]
            pout = [po_ref[c, :, d, :] for d in range(dim)]
            nrm = [n_ref[c, :, d, :] for d in range(dim)]
            B0, G0 = _basis_slabs(pin, E, degree, iei, jnp)
            B1, G1 = _basis_slabs(pout, E, degree, ieo, jnp)
            gn0 = [sum(G0[i][d] * nrm[d] for d in range(dim))
                   for i in range(nb)]
            gn1 = [sum(G1[i][d] * nrm[d] for d in range(dim))
                   for i in range(nb)]

            def dotq(a, b, extra=None):
                prod = a * b * wq if extra is None else a * b * (wq * extra)
                return jnp.sum(prod, axis=0, keepdims=True)  # [1, T]

            def add(k, i, j, term):
                acc[k][i][j] = term if acc[k][i][j] is None \
                    else acc[k][i][j] + term

            for i in range(nb):
                for j in range(nb):
                    add(0, i, j,
                        -0.5 * dotq(gn0[i], B0[j])
                        - 0.5 * dotq(B0[i], gn0[j])
                        + dotq(B0[i], B0[j], gam))
                    add(1, i, j,
                        0.5 * dotq(gn0[i], B1[j])
                        - 0.5 * dotq(B0[i], gn1[j])
                        - dotq(B0[i], B1[j], gam))
                    add(2, i, j,
                        -0.5 * dotq(gn1[i], B0[j])
                        + 0.5 * dotq(B1[i], gn0[j])
                        - dotq(B1[i], B0[j], gam))
                    add(3, i, j,
                        0.5 * dotq(gn1[i], B1[j])
                        + 0.5 * dotq(B1[i], gn1[j])
                        + dotq(B1[i], B1[j], gam))
        outs = (m11_ref, m12_ref, m21_ref, m22_ref)
        cstep = pl.program_id(1)
        for k in range(4):
            blk = jnp.concatenate(
                [acc[k][i][j] for i in range(nb) for j in range(nb)],
                axis=0)  # [nb*nb, T]
            o_ref = outs[k]

            @pl.when(cstep == 0)
            def _init(o_ref=o_ref, blk=blk):
                o_ref[:, :] = blk

            @pl.when(cstep != 0)
            def _accum(o_ref=o_ref, blk=blk):
                o_ref[:, :] = o_ref[:, :] + blk

    # inner grid dim = C chunks: the output block index ignores it, so
    # the block stays VMEM-resident across the consecutive revisits
    grid = (P // T, n_c)
    vm = pltpu.VMEM
    spec2 = lambda rows: pl.BlockSpec((rows, T), lambda t, c: (0, t),
                                      memory_space=vm)
    spec4 = pl.BlockSpec((Cc, q, dim, T), lambda t, c: (c, 0, 0, t),
                         memory_space=vm)
    spec3 = pl.BlockSpec((Cc, q, T), lambda t, c: (c, 0, t),
                         memory_space=vm)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb * nb, P), jnp.float32)
            for _ in range(4)),
        grid=grid,
        in_specs=[
            spec4, spec4, spec3, spec4,
            pl.BlockSpec((Cc, 1, T), lambda t, c: (c, 0, t),
                         memory_space=vm),
            spec2(dim), spec2(dim),
        ],
        out_specs=tuple(spec2(nb * nb) for _ in range(4)),
        interpret=interpret,
    )(pts_in, pts_out, w, n, gamma, inv_ext_in, inv_ext_out)
    return out


def face_group_blocks_pallas(group, ext_t, lo_t, offset, degree, dim,
                             penalty_constant, *, interpret=False,
                             c_chunk=None):
    """(m11, m12, m21, m22) each [nb*nb, P] for one face group.

    group: the dict from build_banded_groups (tables [C, q, d, P] /
    [C, q, P]; padded rows carry zero weights); ext_t/lo_t [dim, P]
    polytope box extents/origins (poly_in-aligned); the poly_out box
    params are lane rolls by -offset, and the OUT-side unit points are
    computed here from pts_in (the tables no longer ship them).
    """
    import jax.numpy as jnp

    C, q = group["w"].shape[0], group["w"].shape[1]
    pts_in = group["pts_in"].astype(jnp.float32)   # [C, q, d, P]
    ext32 = ext_t.astype(jnp.float32)
    lo32 = lo_t.astype(jnp.float32)
    x_phys = lo32[None, None] + pts_in * ext32[None, None]
    pts_out = ((x_phys - jnp.roll(lo32, -offset, axis=1)[None, None])
               / jnp.roll(ext32, -offset, axis=1)[None, None])
    n = group["n"].astype(jnp.float32)
    w = group["w"].astype(jnp.float32)
    gamma = (penalty_constant / group["h_f"]).astype(jnp.float32)  # [C, P]
    inv_in = (1.0 / ext_t).astype(jnp.float32)
    inv_out = jnp.roll(inv_in, -offset, axis=1)
    return _face_group_impl(pts_in, pts_out, w, n, gamma, inv_in, inv_out,
                            degree, dim, q, C, float(penalty_constant),
                            interpret, c_chunk)


def _boundary_lane_cost(nb, dim, q, C=1):
    """Per-lane f32 bytes live in the boundary kernel (C-scaled like
    :func:`_face_lane_cost` — Mosaic keeps per-c slabs live)."""
    return 4 * (2 * C * ((dim + 1) * q + dim * q + 1)
                + C * (nb * (1 + dim) * q + nb * q)
                # one output block, 3 products per (i, j) — scaled from
                # the face kernel's measured 8 f32/nb^2*q over 4 blocks
                + 2 * nb * nb * q
                + nb * nb + dim)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("degree", "dim", "q", "C", "interpret", "c_chunk"),
)
def _boundary_impl(pts, w, n, gamma, inv_ext, degree, dim, q, C, interpret,
                   c_chunk=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polydeal_tpu.fem.basis import _complete_exponents

    E = _complete_exponents(dim, degree)
    nb = E.shape[0]
    P = w.shape[-1]
    T, Cc = _chunk_plan(P, lambda c: _boundary_lane_cost(nb, dim, q, c), C,
                        c_chunk)
    if T is None:
        raise ValueError(
            f"boundary kernel infeasible: no lane tile fits VMEM at "
            f"nb={nb}, dim={dim}, q={q}, C={C}, P={P}")
    (pts, w, n, gamma), n_c = _pad_c([pts, w, n, gamma], C, Cc)
    gamma = gamma[:, None, :]  # [C, 1, P]: a (Cc, T) block would break
    # Mosaic's 8-sublane rule when Cc < C (see _face_group_impl)

    def kernel(p_ref, w_ref, n_ref, g_ref, e_ref, out_ref):
        iex = [e_ref[d:d + 1, :] for d in range(dim)]
        acc = [[None] * nb for _ in range(nb)]
        for c in range(Cc):
            pc = [p_ref[c, :, d, :] for d in range(dim)]  # [q, T]
            nc = [n_ref[c, :, d, :] for d in range(dim)]
            wq = w_ref[c]  # [q, T]
            gam = g_ref[c]  # [1, T]
            B, G = _basis_slabs(pc, E, degree, iex, jnp)
            gn = [sum(G[i][d] * nc[d] for d in range(dim))
                  for i in range(nb)]
            for i in range(nb):
                for j in range(nb):
                    term = jnp.sum(
                        (-B[i] * gn[j] - gn[i] * B[j]
                         + gam * B[i] * B[j]) * wq,
                        axis=0, keepdims=True)
                    acc[i][j] = term if acc[i][j] is None \
                        else acc[i][j] + term
        blk = jnp.concatenate(
            [acc[i][j] for i in range(nb) for j in range(nb)], axis=0)
        cstep = pl.program_id(1)

        @pl.when(cstep == 0)
        def _init():
            out_ref[:, :] = blk

        @pl.when(cstep != 0)
        def _accum():
            out_ref[:, :] = out_ref[:, :] + blk

    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * nb, P), jnp.float32),
        grid=(P // T, n_c),
        in_specs=[
            pl.BlockSpec((Cc, q, dim, T), lambda t, c: (c, 0, 0, t),
                         memory_space=vm),
            pl.BlockSpec((Cc, q, T), lambda t, c: (c, 0, t),
                         memory_space=vm),
            pl.BlockSpec((Cc, q, dim, T), lambda t, c: (c, 0, 0, t),
                         memory_space=vm),
            pl.BlockSpec((Cc, 1, T), lambda t, c: (c, 0, t),
                         memory_space=vm),
            pl.BlockSpec((dim, T), lambda t, c: (0, t), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((nb * nb, T), lambda t, c: (0, t),
                               memory_space=vm),
        interpret=interpret,
    )(pts, w, n, gamma, inv_ext)


def boundary_blocks_pallas(group, ext_t, degree, dim, penalty_constant, *,
                           interpret=False, c_chunk=None):
    """Boundary Nitsche diagonal blocks [nb*nb, P] over the padded
    boundary group ([C, q, ..., P] tables; padded rows carry zero w)."""
    import jax.numpy as jnp

    C, q = group["w"].shape[0], group["w"].shape[1]
    pts = group["pts_in"].astype(jnp.float32)  # [C, q, d, P]
    w = group["w"].astype(jnp.float32)
    n = group["n"].astype(jnp.float32)
    gamma = (penalty_constant / group["h_f"]).astype(jnp.float32)  # [C, P]
    inv = (1.0 / ext_t).astype(jnp.float32)
    return _boundary_impl(pts, w, n, gamma, inv, degree, dim, q, C,
                          interpret, c_chunk)


def _volume_lane_cost(nb, dim, q, C=1):
    """Per-lane f32 bytes live in the volume kernel (C-scaled like
    :func:`_face_lane_cost` — Mosaic keeps per-c slabs live)."""
    return 4 * (2 * C * (dim * q + q) + C * nb * (1 + dim) * q
                # block-loop temporaries (see _face_lane_cost; one block)
                + 2 * nb * nb * q
                + nb * nb + dim)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("degree", "dim", "q", "C", "interpret", "c_chunk"),
)
def _volume_impl(pts, w, inv_ext, degree, dim, q, C, interpret,
                 c_chunk=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polydeal_tpu.fem.basis import _complete_exponents

    E = _complete_exponents(dim, degree)
    nb = E.shape[0]
    P = w.shape[-1]
    T, Cc = _chunk_plan(P, lambda c: _volume_lane_cost(nb, dim, q, c), C,
                        c_chunk)
    if T is None:
        raise ValueError(
            f"volume kernel infeasible: no lane tile fits VMEM at "
            f"nb={nb}, dim={dim}, q={q}, C={C}, P={P} "
            "(P not divisible by 128?)")
    (pts, w), n_c = _pad_c([pts, w], C, Cc)

    def kernel(p_ref, w_ref, e_ref, out_ref):
        iex = [e_ref[d:d + 1, :] for d in range(dim)]
        acc = [[None] * nb for _ in range(nb)]
        for c in range(Cc):
            wq = w_ref[c]  # [q, T]
            pts_ = [p_ref[c, :, d, :] for d in range(dim)]
            _, G = _basis_slabs(pts_, E, degree, iex, jnp)
            for i in range(nb):
                for j in range(nb):
                    term = jnp.sum(
                        sum(G[i][d] * G[j][d] for d in range(dim)) * wq,
                        axis=0, keepdims=True)
                    acc[i][j] = term if acc[i][j] is None \
                        else acc[i][j] + term
        blk = jnp.concatenate(
            [acc[i][j] for i in range(nb) for j in range(nb)], axis=0)
        cstep = pl.program_id(1)

        @pl.when(cstep == 0)
        def _init():
            out_ref[:, :] = blk

        @pl.when(cstep != 0)
        def _accum():
            out_ref[:, :] = out_ref[:, :] + blk

    vm = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * nb, P), jnp.float32),
        grid=(P // T, n_c),
        in_specs=[
            pl.BlockSpec((Cc, q, dim, T), lambda t, c: (c, 0, 0, t),
                         memory_space=vm),
            pl.BlockSpec((Cc, q, T), lambda t, c: (c, 0, t),
                         memory_space=vm),
            pl.BlockSpec((dim, T), lambda t, c: (0, t), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((nb * nb, T), lambda t, c: (0, t),
                               memory_space=vm),
        interpret=interpret,
    )(pts, w, inv_ext)
    return out


def volume_blocks_pallas(vol, ext_t, degree, dim, *, interpret=False,
                         c_chunk=None):
    """Stiffness diagonal blocks [nb*nb, P] for the padded volume group
    ([C, q, d, P] tables; padded cells carry zero weights)."""
    import jax.numpy as jnp

    C, q = vol["w"].shape[0], vol["w"].shape[1]
    pts = vol["pts"].astype(jnp.float32)  # [C, q, d, P]
    w = vol["w"].astype(jnp.float32)
    inv = (1.0 / ext_t).astype(jnp.float32)
    return _volume_impl(pts, w, inv, degree, dim, q, C, interpret, c_chunk)
