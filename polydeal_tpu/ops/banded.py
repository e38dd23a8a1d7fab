"""Pallas TPU kernel for the banded block SpMV — the hot op of every
solver in the framework.

The banded block format (see ``polydeal_tpu.sparse.BlockBanded``) stores
the DG system matrix as ``data[o, i, j, p]`` multiplying
``x[j, p + offsets[o]]`` — the TPU-native recast of the reference's
Trilinos SpMV (reference source/agglomeration_handler.cc:910-1022 builds
the sparsity; Trilinos/Epetra performs the SpMV).  The XLA lowering of
the shifted-einsum formulation tops out near ~12% of HBM bandwidth
(measured v5e: 96 GB/s f32, 35 GB/s bf16 — the tiny n_b sublane axis
tile-pads 2–4x and every offset becomes a separate fusion over y).  This
kernel streams the matrix data exactly once at full DMA bandwidth with
the whole x vector resident in VMEM.

Lane alignment: Mosaic only allows 128-aligned dynamic lane slices, but
band offsets are arbitrary (±1, ±m, ±m², …).  Each shifted window is
therefore assembled from two ALIGNED tile loads combined with one iota
select and ONE lane rotate (`pltpu.roll`) — a single-roll funnel shift:
``off = q*T + r`` →  ``w = roll(select(lane < r, b, a), T - r)``
with a, b the tiles at t+q and t+q+1 (w[l] = a[l+r] below T-r and
b[l+r-T] above).

Layout contract: data flattened to [n_off*nb*nb, P] (row-major over
(o, i, j)); x in the transposed lane-aligned layout [nb, P]; f32
accumulation regardless of data dtype.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["banded_matvec_t_pallas", "pick_tile", "pallas_supported"]


def pick_tile(P: int, n_rows: int, itemsize: int,
              vmem_budget: int = 4 * 2**20) -> int | None:
    """Largest power-of-two lane tile T (multiple of 128) dividing P such
    that the double-buffered data block fits the VMEM budget."""
    t = 4096
    while t >= 128:
        if P % t == 0 and 2 * n_rows * t * itemsize <= vmem_budget:
            return t
        t //= 2
    return None


def _halo(offsets, T: int) -> int:
    H = max(max(abs(int(o)) for o in offsets), 1)
    return -(-H // T) * T  # round up to a whole number of tiles


def pallas_supported(P: int, n_off: int, nb: int, max_off: int,
                     itemsize: int) -> bool:
    """The i-major kernel streams x tile-by-tile (far offsets as
    pre-rolled copies), so the only requirement is a valid lane tile."""
    return pick_tile(P, n_off * nb * nb, itemsize) is not None


@functools.partial(
    __import__("jax").jit,
    static_argnames=("offsets_t", "nb", "interpret", "tile"),
)
def _banded_matvec_imajor_impl(data_i, xpad, xfar, offsets_t, nb,
                               interpret, tile=None):
    """i-major kernel: data_i [nb * n_off * nb, P], rows ordered
    (i, k, j).  Per tile the shifted x windows are built ONCE and stacked
    into Xg [n_off*nb, T]; each output row i is then a single
    full-sublane elementwise multiply + sublane reduction against the
    contiguous slab of data — ~3.5x fewer VPU ops than the per-(k,i)
    formulation, which was compute-bound.

    Scalability: x is NOT kept resident in VMEM.  ``xpad`` (x padded by
    one tile on each side) streams as three aligned tile blocks
    (prev/cur/next) from which NEAR windows (|off| <= T) are funnel-
    shifted; offsets reaching further arrive as pre-rolled copies in
    ``xfar`` [n_far, nb, P] (cheap XLA rolls of the small x vector),
    streamed one tile at a time.  VMEM per tile is O(T) regardless of P.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = offsets_t
    n_off = len(offsets)
    n_rows, P = data_i.shape
    R = n_off * nb
    R_pad = n_rows // nb  # 8-aligned slab height (see with_imajor)
    # an explicit ``tile`` pins T (sharded halo contract: the halo width
    # is chosen once for ALL dtypes of a level, so the bf16 smoother
    # copy must not derive a different T than the f32 band)
    T = tile if tile is not None else pick_tile(
        P, n_rows, data_i.dtype.itemsize)
    assert T is not None and P % T == 0
    far = [o for o in offsets if abs(o) > T]
    far_idx = {o: k for k, o in enumerate(far)}

    def kernel(prev_ref, cur_ref, next_ref, far_ref, d_ref, out_ref):
        tiles = [prev_ref, cur_ref, next_ref]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, T), 1)

        def window(off):
            if off in far_idx:
                return far_ref[far_idx[off]]
            q, r = divmod(off, T)  # q in {-1, 0} (or 0 with r=0)
            a = tiles[q + 1][:, :]
            if r == 0:
                return a
            b = tiles[q + 2][:, :]
            # single-roll funnel: select the source tile per lane, then
            # ONE rotate — w[l] = a[l+r] for l < T-r, b[l+r-T] above
            c = jnp.where(lane < r, b, a)
            return pltpu.roll(c, T - r, axis=1)

        Xg = jnp.concatenate([window(o) for o in offsets], axis=0)  # [R, T]
        if R_pad != R:
            Xg = jnp.concatenate(
                [Xg, jnp.zeros((R_pad - R, T), dtype=Xg.dtype)], axis=0)
        rows = []
        for i in range(nb):
            Di = d_ref[i * R_pad:(i + 1) * R_pad, :].astype(jnp.float32)
            rows.append(jnp.sum(Di * Xg, axis=0, keepdims=True))
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    grid = (P // T,)
    vm = pltpu.VMEM

    def xspec(shift):
        return pl.BlockSpec((nb, T), lambda t, s=shift: (0, t + s),
                            memory_space=vm)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, P), jnp.float32),
        grid=grid,
        in_specs=[
            xspec(0), xspec(1), xspec(2),  # prev/cur/next tiles of xpad
            pl.BlockSpec((max(len(far), 1), nb, T),
                         lambda t: (0, 0, t), memory_space=vm),
            pl.BlockSpec((n_rows, T), lambda t: (0, t), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((nb, T), lambda t: (0, t),
                               memory_space=vm),
        interpret=interpret,
    )(xpad, xpad, xpad, xfar, data_i)


def banded_matvec_t_imajor(data_i, offsets, nb: int, xt, *,
                           interpret: bool = False):
    """Pallas banded SpMV over the i-major flattened data
    [nb*n_off*nb, P] (row (i, k, j)); xt [nb, P]."""
    import jax.numpy as jnp

    offsets = tuple(int(o) for o in np.asarray(offsets))
    P = data_i.shape[1]
    T = pick_tile(P, data_i.shape[0], data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    x32 = xt.astype(jnp.float32)
    xpad = jnp.pad(x32, ((0, 0), (T, T)))
    far = [o for o in offsets if abs(o) > T]
    if far:
        xfar = jnp.stack([jnp.roll(x32, -o, axis=1) for o in far], axis=0)
    else:
        xfar = jnp.zeros((1,) + x32.shape, dtype=jnp.float32)
    y = _banded_matvec_imajor_impl(data_i, xpad, xfar, offsets, nb,
                                   interpret)
    return y.astype(xt.dtype)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("offsets_t", "nb", "interpret"),
)
def _banded_matvec_impl(data2, xpad, offsets_t, nb, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offsets = offsets_t
    n_off = len(offsets)
    n_rows, P = data2.shape
    T = pick_tile(P, n_rows, data2.dtype.itemsize)
    assert T is not None
    Hp = _halo(offsets, T)

    def kernel(x_ref, d_ref, out_ref):
        t = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, T), 1)

        def window(off):
            """[nb, T] slice of x starting at lane t*T + off (+halo),
            from two aligned tile loads + a single-roll funnel shift."""
            q, r = divmod(off, T)
            a = x_ref[:, pl.ds((t + q) * T + Hp, T)]
            if r == 0:
                return a
            b = x_ref[:, pl.ds((t + q + 1) * T + Hp, T)]
            c = jnp.where(lane < r, b, a)
            return pltpu.roll(c, T - r, axis=1)

        rows = []
        for i in range(nb):
            acc = None
            for k in range(n_off):
                xw = window(offsets[k])
                r0 = (k * nb + i) * nb
                d = d_ref[r0:r0 + nb, :].astype(jnp.float32)  # [nb, T]
                contrib = jnp.sum(d * xw, axis=0, keepdims=True)
                acc = contrib if acc is None else acc + contrib
            rows.append(acc)
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    grid = (P // T,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, P), jnp.float32),
        grid=grid,
        in_specs=[
            # the whole padded x stays resident in VMEM across tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, T), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, T), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpad, data2)
    return out


def banded_matvec_t_pallas(data, offsets: np.ndarray, xt, *,
                           interpret: bool = False):
    """y[i, p] = sum_{o,j} data[o,i,j,p] * x[j, p + offsets[o]].

    ``data`` [n_off, nb, nb, P] (any float dtype — accumulation is f32),
    ``xt`` [nb, P].  Out-of-range column indices read zero-padded halo
    values; the stored zero blocks at boundary rows make that exact
    (same contract as the roll-based XLA path in BlockBanded.matvec_t).
    """
    import jax.numpy as jnp

    n_off, nb, _, P = data.shape
    offsets = tuple(int(o) for o in np.asarray(offsets))
    n_rows = n_off * nb * nb
    T = pick_tile(P, n_rows, data.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    Hp = _halo(offsets, T)
    xpad = jnp.pad(xt.astype(jnp.float32), ((0, 0), (Hp, Hp)))
    data2 = data.reshape(n_rows, P)
    y = _banded_matvec_impl(data2, xpad, offsets, nb, interpret)
    return y.astype(xt.dtype)


def banded_tile(P: int, n_off: int, nb: int, itemsize: int = 4) -> int | None:
    """Lane tile of the i-major kernel for these sizes (= sharded halo).

    Uses the i-major row count nb * R_pad (R_pad = n_off*nb rounded up
    to 8 sublanes) so the choice matches what banded_matvec_t_halo
    derives from data_i.shape[0]."""
    R_pad = -(-n_off * nb // 8) * 8
    return pick_tile(P, nb * R_pad, itemsize)


def banded_matvec_t_halo(data_i, offsets, nb: int, x_ext, *,
                         interpret: bool = False, tile: int | None = None):
    """Sharded-slab i-major banded SpMV: ``x_ext`` [nb, per + 2T] carries
    real halo lanes from neighbor shards instead of zero padding; every
    offset must satisfy |o| <= T (no pre-rolled far copies — rolls are
    global and would be wrong on a shard).

    ``tile`` pins T explicitly: a sharded caller picks ONE halo width
    per level and must pass it here for every data dtype it applies
    (a bf16 smoother copy would otherwise derive a larger T from its
    smaller itemsize and fail the halo-width check)."""
    import jax.numpy as jnp

    offsets = tuple(int(o) for o in np.asarray(offsets))
    P = data_i.shape[1]
    T = tile if tile is not None else pick_tile(
        P, data_i.shape[0], data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this per-shard P"
    assert x_ext.shape[-1] == P + 2 * T, "halo width must equal the tile"
    assert all(abs(o) <= T for o in offsets), "far offset on a shard"
    xin = x_ext if x_ext.dtype == jnp.float64 else x_ext.astype(jnp.float32)
    xfar = jnp.zeros((1,) + xin[:, :P].shape, dtype=jnp.float32)
    y = _banded_matvec_imajor_impl(data_i, xin, xfar, offsets, nb,
                                   interpret, tile=T)
    return y.astype(x_ext.dtype)
