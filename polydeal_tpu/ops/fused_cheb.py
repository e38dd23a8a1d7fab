"""Fused Chebyshev-step Pallas kernels — SpMV + smoother updates in one pass.

The V-cycle's Chebyshev smoothing is the dominant cost of the flagship
solve (reference examples/agglo_amg.cc:1282-1337 smooths with deal.II
PreconditionChebyshev; here each smoothing step is one SpMV plus a chain
of vector updates).  Composed as separate XLA ops, each step costs

    y = A x                 (Pallas SpMV: band stream + x views)
    r = b - y; z = dinv*r;  d' = c1 d + c2 z;  x' = x + d'

where the four elementwise ops re-stream b/y/dinv/d/x from HBM and pay
per-op dispatch latency (measured on v5e at the 1M-DoF leaf level:
0.34 ms per step vs 0.154 ms for the SpMV alone — the vector traffic
and dispatch double the cost; on tiny coarse levels the dispatch chain
IS the cost).  These kernels fuse the whole step into the SpMV's
epilogue: per lane tile the window reduction produces y, and the same
VMEM-resident registers immediately compute

    d' = c1 * d + c2 * dinv * (b - y)        x' = x + d'

writing (x', d') directly — the only extra HBM traffic over a bare SpMV
is streaming b/d/dinv once and writing d' (the x tile is already
resident as the center window view).

Three modes per format (packed / banded i-major):
  step      (x, d)   -> (x', d')   the generic recurrence step
  step0     (x,)     -> (x', d')   first step (d' = c2 dinv (b - A x))
  residual  (x,)     -> b - A x    the post-smoothing residual

The window construction (funnel shifts from aligned views of the
T-padded x, pre-rolled copies for |offset| > T) and the i-major slab
reduction are identical to ops/banded.py / ops/packed.py — see there
for the layout contract.  Accumulation is f32 (f64 under interpret for
CPU-parity tests); the Chebyshev scalars arrive via SMEM so they can be
traced values (the smoothing interval comes from on-device eigenvalue
estimates).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "packed_cheb_step_t",
    "packed_residual_t",
    "banded_cheb_step_t",
    "banded_residual_t",
    "packed_cheb_step_t_halo",
    "banded_cheb_step_t_halo",
    "packed_residual_t_halo",
    "banded_residual_t_halo",
]


def _acc_t(x):
    import jax.numpy as jnp

    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def _window_fn(jnp, jax, pltpu, tiles, far_ref, far_idx, T, nb, acc_t):
    """window(off) -> [nb, T] shifted x view (shared funnel-shift logic).

    Single-roll funnel: select the source tile per lane FIRST
    (c[l] = b[l] for l < r else a[l]), then one rotate — w = roll(c, T-r)
    reads a[l+r] for l < T-r and b[l+r-T] above, the desired window.
    Halves the rotate count vs rolling both tiles (the packed kernel is
    VPU-bound on window construction at 37 offsets)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, T), 1)

    def window(off):
        if off in far_idx:
            return far_ref[far_idx[off]].astype(acc_t)
        q, r = divmod(off, T)  # q in {-1, 0, 1}
        a = tiles[q + 1][:, :].astype(acc_t)
        if r == 0:
            return a
        b = tiles[q + 2][:, :].astype(acc_t)
        c = jnp.where(lane < r, b, a)
        return pltpu.roll(c, T - r, axis=1)

    return window


def _reduce_y(jnp, d_ref, Xg, nb, R_pad, T, acc_t):
    """y[i] = sum over the i-th [R_pad, T] slab of data * Xg."""
    rows = []
    for i in range(nb):
        Di = d_ref[i * R_pad:(i + 1) * R_pad, :].astype(acc_t)
        rows.append(jnp.sum(Di * Xg, axis=0, keepdims=True))
    return jnp.concatenate(rows, axis=0)  # [nb, T]


def _epilogue(mode, out_refs, y, cur_ref, vec_refs, scal_ref, acc_t):
    """Common fused tail: consume y [nb, T] per mode."""
    if mode == "residual":
        (b_ref,) = vec_refs
        out_refs[0][:, :] = b_ref[:, :].astype(acc_t) - y
        return
    x = cur_ref[:, :].astype(acc_t)
    c1 = scal_ref[0, 0]
    c2 = scal_ref[0, 1]
    if mode == "step0":
        b_ref, dinv_ref = vec_refs
        d_new = c2 * (dinv_ref[:, :].astype(acc_t)
                      * (b_ref[:, :].astype(acc_t) - y))
    else:  # "step"
        b_ref, d_ref, dinv_ref = vec_refs
        d_new = (c1 * d_ref[:, :].astype(acc_t)
                 + c2 * (dinv_ref[:, :].astype(acc_t)
                         * (b_ref[:, :].astype(acc_t) - y)))
    out_refs[0][:, :] = x + d_new
    out_refs[1][:, :] = d_new


@functools.partial(
    __import__("jax").jit,
    static_argnames=("plan", "mode", "interpret", "tile"),
)
def _packed_fused_impl(data_i, oid, xpad, xfar, vecs, scal, plan, mode,
                       interpret, tile=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polydeal_tpu.ops.packed import pick_tile_packed

    nb, K = plan.nb, plan.K
    R_pad = plan.R_pad
    P = data_i.shape[-1]
    T = tile if tile is not None else pick_tile_packed(
        P, nb * R_pad, data_i.dtype.itemsize)
    assert T is not None and P % T == 0
    far = [o for o in plan.offsets if abs(o) > T]
    far_idx = {o: k for k, o in enumerate(far)}
    acc_t = _acc_t(xpad)
    n_vec = len(vecs)

    def kernel(*refs):
        prev_ref, cur_ref, next_ref, far_ref, oid_ref, d_ref = refs[:6]
        vec_refs = refs[6:6 + n_vec]
        k = 6 + n_vec
        scal_ref = None
        if mode != "residual":
            scal_ref = refs[k]
            k += 1
        out_refs = refs[k:]
        window = _window_fn(jnp, jax, pltpu, [prev_ref, cur_ref, next_ref],
                            far_ref, far_idx, T, nb, acc_t)
        parts = []
        for kk in range(K):
            ok = oid_ref[kk:kk + 1, :]
            acc = jnp.zeros((nb, T), dtype=acc_t)
            for o_idx in plan.slots[kk]:
                acc = jnp.where(ok == o_idx, window(plan.offsets[o_idx]),
                                acc)
            parts.append(acc)
        Xg = jnp.concatenate(parts, axis=0)
        if R_pad != K * nb:
            Xg = jnp.concatenate(
                [Xg, jnp.zeros((R_pad - K * nb, T), dtype=Xg.dtype)], axis=0)
        y = _reduce_y(jnp, d_ref, Xg, nb, R_pad, T, acc_t)
        _epilogue(mode, out_refs, y, cur_ref, vec_refs, scal_ref, acc_t)

    vm = pltpu.VMEM

    def xspec(shift):
        return pl.BlockSpec((nb, T), lambda t, s=shift: (0, t + s),
                            memory_space=vm)

    def vspec():
        return pl.BlockSpec((nb, T), lambda t: (0, t), memory_space=vm)

    in_specs = [
        xspec(0), xspec(1), xspec(2),
        pl.BlockSpec((max(len(far), 1), nb, T), lambda t: (0, 0, t),
                     memory_space=vm),
        pl.BlockSpec((K, T), lambda t: (0, t), memory_space=vm),
        pl.BlockSpec((nb * R_pad, T), lambda t: (0, t), memory_space=vm),
    ] + [vspec() for _ in range(n_vec)]
    args = [xpad, xpad, xpad, xfar, oid, data_i, *vecs]
    if mode != "residual":
        in_specs.append(pl.BlockSpec((1, 2), lambda t: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(scal)
    if mode == "residual":
        out_shape = jax.ShapeDtypeStruct((nb, P), acc_t)
        out_specs = vspec()
    else:
        out_shape = (jax.ShapeDtypeStruct((nb, P), acc_t),
                     jax.ShapeDtypeStruct((nb, P), acc_t))
        out_specs = (vspec(), vspec())
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(P // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("offsets_t", "nb", "mode", "interpret", "tile"),
)
def _banded_fused_impl(data_i, xpad, xfar, vecs, scal, offsets_t, nb, mode,
                       interpret, tile=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from polydeal_tpu.ops.banded import pick_tile

    offsets = offsets_t
    n_off = len(offsets)
    n_rows, P = data_i.shape
    R = n_off * nb
    R_pad = n_rows // nb
    T = tile if tile is not None else pick_tile(
        P, n_rows, data_i.dtype.itemsize)
    assert T is not None and P % T == 0
    far = [o for o in offsets if abs(o) > T]
    far_idx = {o: k for k, o in enumerate(far)}
    acc_t = _acc_t(xpad)
    n_vec = len(vecs)

    def kernel(*refs):
        prev_ref, cur_ref, next_ref, far_ref, d_ref = refs[:5]
        vec_refs = refs[5:5 + n_vec]
        k = 5 + n_vec
        scal_ref = None
        if mode != "residual":
            scal_ref = refs[k]
            k += 1
        out_refs = refs[k:]
        window = _window_fn(jnp, jax, pltpu, [prev_ref, cur_ref, next_ref],
                            far_ref, far_idx, T, nb, acc_t)
        Xg = jnp.concatenate([window(o) for o in offsets], axis=0)  # [R, T]
        if R_pad != R:
            Xg = jnp.concatenate(
                [Xg, jnp.zeros((R_pad - R, T), dtype=Xg.dtype)], axis=0)
        y = _reduce_y(jnp, d_ref, Xg, nb, R_pad, T, acc_t)
        _epilogue(mode, out_refs, y, cur_ref, vec_refs, scal_ref, acc_t)

    vm = pltpu.VMEM

    def xspec(shift):
        return pl.BlockSpec((nb, T), lambda t, s=shift: (0, t + s),
                            memory_space=vm)

    def vspec():
        return pl.BlockSpec((nb, T), lambda t: (0, t), memory_space=vm)

    in_specs = [
        xspec(0), xspec(1), xspec(2),
        pl.BlockSpec((max(len(far), 1), nb, T), lambda t: (0, 0, t),
                     memory_space=vm),
        pl.BlockSpec((n_rows, T), lambda t: (0, t), memory_space=vm),
    ] + [vspec() for _ in range(n_vec)]
    args = [xpad, xpad, xpad, xfar, data_i, *vecs]
    if mode != "residual":
        in_specs.append(pl.BlockSpec((1, 2), lambda t: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(scal)
    if mode == "residual":
        out_shape = jax.ShapeDtypeStruct((nb, P), acc_t)
        out_specs = vspec()
    else:
        out_shape = (jax.ShapeDtypeStruct((nb, P), acc_t),
                     jax.ShapeDtypeStruct((nb, P), acc_t))
        out_specs = (vspec(), vspec())
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(P // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)


def _prep_x(xt, T, offsets):
    """Padded x + pre-rolled far copies (the SpMV wrappers' contract)."""
    import jax.numpy as jnp

    acc_t = _acc_t(xt)
    xin = xt.astype(acc_t)
    xpad = jnp.pad(xin, ((0, 0), (T, T)))
    far = [o for o in offsets if abs(o) > T]
    if far:
        xfar = jnp.stack([jnp.roll(xin, -o, axis=1) for o in far], axis=0)
    else:
        xfar = jnp.zeros((1,) + xin.shape, dtype=acc_t)
    return xpad, xfar, acc_t


def packed_cheb_step_t(data_i, oid, plan, xt, dvec, b, dinv, c1, c2, *,
                       interpret: bool = False):
    """One fused Chebyshev step on the packed format:
    d' = c1*d + c2*dinv*(b - A x);  x' = x + d'.   ``dvec=None`` is the
    first step (c1 ignored).  Returns (x', d') in xt's dtype."""
    import jax.numpy as jnp

    from polydeal_tpu.ops.packed import pick_tile_packed

    nb = plan.nb
    P = data_i.shape[-1]
    T = pick_tile_packed(P, nb * plan.R_pad, data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    xpad, xfar, acc_t = _prep_x(xt, T, plan.offsets)
    scal = jnp.stack([jnp.asarray(c1), jnp.asarray(c2)]).reshape(1, 2)
    scal = scal.astype(acc_t)
    if dvec is None:
        vecs = (b.astype(acc_t), dinv.astype(acc_t))
        mode = "step0"
    else:
        vecs = (b.astype(acc_t), dvec.astype(acc_t), dinv.astype(acc_t))
        mode = "step"
    x2, d2 = _packed_fused_impl(data_i, oid, xpad, xfar, vecs, scal, plan,
                                mode, interpret)
    return x2.astype(xt.dtype), d2.astype(xt.dtype)


def packed_residual_t(data_i, oid, plan, xt, b, *, interpret: bool = False):
    """Fused r = b - A x on the packed format."""
    from polydeal_tpu.ops.packed import pick_tile_packed

    nb = plan.nb
    P = data_i.shape[-1]
    T = pick_tile_packed(P, nb * plan.R_pad, data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    xpad, xfar, acc_t = _prep_x(xt, T, plan.offsets)
    r = _packed_fused_impl(data_i, oid, xpad, xfar, (b.astype(acc_t),),
                           None, plan, "residual", interpret)
    return r.astype(xt.dtype)


def banded_cheb_step_t(data_i, offsets, nb: int, xt, dvec, b, dinv, c1, c2,
                       *, interpret: bool = False):
    """One fused Chebyshev step on the banded i-major format."""
    import jax.numpy as jnp

    from polydeal_tpu.ops.banded import pick_tile

    offsets = tuple(int(o) for o in np.asarray(offsets))
    P = data_i.shape[1]
    T = pick_tile(P, data_i.shape[0], data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    xpad, xfar, acc_t = _prep_x(xt, T, offsets)
    scal = jnp.stack([jnp.asarray(c1), jnp.asarray(c2)]).reshape(1, 2)
    scal = scal.astype(acc_t)
    if dvec is None:
        vecs = (b.astype(acc_t), dinv.astype(acc_t))
        mode = "step0"
    else:
        vecs = (b.astype(acc_t), dvec.astype(acc_t), dinv.astype(acc_t))
        mode = "step"
    x2, d2 = _banded_fused_impl(data_i, xpad, xfar, vecs, scal, offsets, nb,
                                mode, interpret)
    return x2.astype(xt.dtype), d2.astype(xt.dtype)


def banded_residual_t(data_i, offsets, nb: int, xt, b, *,
                      interpret: bool = False):
    """Fused r = b - A x on the banded i-major format."""
    from polydeal_tpu.ops.banded import pick_tile

    offsets = tuple(int(o) for o in np.asarray(offsets))
    P = data_i.shape[1]
    T = pick_tile(P, data_i.shape[0], data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    xpad, xfar, acc_t = _prep_x(xt, T, offsets)
    r = _banded_fused_impl(data_i, xpad, xfar, (b.astype(acc_t),), None,
                           offsets, nb, "residual", interpret)
    return r.astype(xt.dtype)


# ---------------------------------------------------------------------------
# Sharded-slab (halo) variants: ``x_ext`` [nb, per + 2T] carries REAL halo
# lanes from the ring ppermutes (parallel/banded.py _halo_x) — exactly the
# layout the kernels' padded-x specs expect, so the impls are reused
# verbatim; every offset must satisfy |o| <= T (no global rolls on a
# shard), and the vectors/outputs are LOCAL [nb, per] slabs.  These make
# each sharded Chebyshev step ONE kernel dispatch, matching the host
# smoother's fused path (the n_dev=1 gap was measured at 1.9x with the
# unfused sharded smoother).


def _prep_x_halo(x_ext, T, offsets, nb, P):
    import jax.numpy as jnp

    offsets = tuple(int(o) for o in np.asarray(offsets))
    assert x_ext.shape[-1] == P + 2 * T, "halo width must equal the tile"
    assert all(abs(o) <= T for o in offsets), "far offset on a shard"
    acc_t = _acc_t(x_ext)
    xin = x_ext.astype(acc_t)
    xfar = jnp.zeros((1, nb, P), dtype=acc_t)
    return offsets, xin, xfar, acc_t


def _scal_vecs(c1, c2, dvec, b, dinv, acc_t):
    import jax.numpy as jnp

    scal = jnp.stack([jnp.asarray(c1, dtype=acc_t),
                      jnp.asarray(c2, dtype=acc_t)]).reshape(1, 2)
    if dvec is None:
        return scal, (b.astype(acc_t), dinv.astype(acc_t)), "step0"
    return scal, (b.astype(acc_t), dvec.astype(acc_t),
                  dinv.astype(acc_t)), "step"


def banded_cheb_step_t_halo(data_i, offsets, nb: int, x_ext, dvec, b, dinv,
                            c1, c2, *, tile: int, interpret: bool = False):
    """One fused Chebyshev step on a banded i-major SHARD SLAB."""
    P = data_i.shape[1]
    offsets, xin, xfar, acc_t = _prep_x_halo(x_ext, tile, offsets, nb, P)
    scal, vecs, mode = _scal_vecs(c1, c2, dvec, b, dinv, acc_t)
    x2, d2 = _banded_fused_impl(data_i, xin, xfar, vecs, scal, offsets, nb,
                                mode, interpret, tile=tile)
    return x2.astype(b.dtype), d2.astype(b.dtype)


def banded_residual_t_halo(data_i, offsets, nb: int, x_ext, b, *,
                           tile: int, interpret: bool = False):
    """Fused r = b - A x on a banded i-major shard slab."""
    P = data_i.shape[1]
    offsets, xin, xfar, acc_t = _prep_x_halo(x_ext, tile, offsets, nb, P)
    r = _banded_fused_impl(data_i, xin, xfar, (b.astype(acc_t),), None,
                           offsets, nb, "residual", interpret, tile=tile)
    return r.astype(b.dtype)


def packed_cheb_step_t_halo(data_i, oid, plan, x_ext, dvec, b, dinv,
                            c1, c2, *, tile: int, interpret: bool = False):
    """One fused Chebyshev step on a packed SHARD SLAB.  With a far
    block-COO tail the caller must pre-subtract it from ``b``
    (b_eff = b - A_far x): the in-kernel y covers the near window only."""
    nb = plan.nb
    P = data_i.shape[-1]
    offsets, xin, xfar, acc_t = _prep_x_halo(x_ext, tile, plan.offsets, nb, P)
    scal, vecs, mode = _scal_vecs(c1, c2, dvec, b, dinv, acc_t)
    x2, d2 = _packed_fused_impl(data_i, oid, xin, xfar, vecs, scal, plan,
                                mode, interpret, tile=tile)
    return x2.astype(b.dtype), d2.astype(b.dtype)


def packed_residual_t_halo(data_i, oid, plan, x_ext, b, *, tile: int,
                           interpret: bool = False):
    """Fused r = b - A_near x on a packed shard slab (caller adds the far
    tail's contribution)."""
    nb = plan.nb
    P = data_i.shape[-1]
    offsets, xin, xfar, acc_t = _prep_x_halo(x_ext, tile, plan.offsets, nb, P)
    r = _packed_fused_impl(data_i, oid, xin, xfar, (b.astype(acc_t),),
                           None, plan, "residual", interpret, tile=tile)
    return r.astype(b.dtype)
