"""Pallas TPU kernel for the PACKED banded block SpMV — the wide-offset
(general R-tree / R3MG) hot path.

The space-filling-curve polytope ordering of the STR hierarchy produces
~6 dim distinct band offsets per level (37 in 3D at the leaf) but every
*lane* (block row) touches at most 2 dim + 1 of them, so the dense banded
layout (``BlockBanded``: one [nb, nb, P] row per offset) streams ~5x more
matrix data than exists.  This format packs each lane's nonzero blocks
into K slots:

  * slots are a greedy CONFLICT COLORING of the offsets — two offsets
    conflict iff they co-occur on some lane; the ± axis-distance families
    of an SFC ordering are independent sets, so K = max row degree
    (7 in 3D) and the per-slot offset lists together cover each offset
    exactly once;
  * ``data_i`` [nb * R_pad, P] stores the packed blocks i-major (rows
    (i, k, j), R_pad = K*nb rounded to 16 sublanes) so each output row i
    reduces one contiguous slab — the layout of ops/banded.py;
  * ``oid`` [K, P] int32 says which offset index slot k holds at lane p
    (-1 = inactive; the stored block is zero there).

The kernel keeps the whole x vector RESIDENT in VMEM (x is [nb, P] —
4 MB at 10^6 DoF, far under the ~16 MB budget) and builds each shifted
window from two modularly-indexed aligned tiles + a funnel shift; per
slot, the window is chosen per-lane by comparing the streamed ``oid``
tile against the slot's static offset list.  Values selected from a
wrapped (out-of-range) window position are always masked out: an active
(o, p) pair has a real in-range neighbor by construction.

Streaming cost per lane: K*nb*nb matrix values + K int32 + 2*nb vector
values — within ~12% of the information-theoretic minimum for this
sparsity, independent of the offset count.

Replaces (with ops/banded.py) the reference's Trilinos SpMV on the
R3MG hierarchy (reference examples/agglo_amg.cc:1408-1420,
source/agglomeration_handler.cc:910-1022).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

__all__ = ["PackPlan", "build_pack_plan", "packed_matvec_t",
           "packed_supported", "pick_tile_packed"]


@dataclass(frozen=True)
class PackPlan:
    """Static packing metadata (host-built, cheaply hashable).

    offsets: sorted distinct band offsets (tuple of int).
    slots:   tuple over slots of tuples of offset INDICES (into offsets).
    """

    offsets: tuple
    slots: tuple
    P: int
    nb: int

    @property
    def K(self) -> int:
        return len(self.slots)

    @property
    def R_pad(self) -> int:
        return -(-self.K * self.nb // 16) * 16


def choose_near_limit(P: int, nb: int, K_bound: int = 8,
                      itemsize: int = 4) -> int:
    """The lane-tile size T the kernel will use — and therefore the
    near/far offset split: |o| <= T is served by the prev/cur/next
    funnel-shift windows; |o| > T blocks (rare: the SFC ordering's
    block-crossing tail, <1% of lanes) go to the block-COO side term."""
    R_pad = -(-K_bound * nb // 16) * 16
    t = 4096
    while t >= 128:
        if P % t == 0 and nb * R_pad * t * itemsize <= 2 * 2**20:
            return t
        t //= 2
    return 128


def build_pack_plan(src: np.ndarray, dst: np.ndarray, P: int, nb: int,
                    offsets: np.ndarray | None = None,
                    near_limit: int | None = None):
    """Color the offsets of the directed block sparsity into
    conflict-free slots, optionally splitting off a far block-COO tail.

    src/dst: block row/col ids of the off-diagonal nonzero blocks (one
    direction suffices — the transpose direction and the diagonal are
    added here).

    ``near_limit``: -1 colors ALL offsets into slots (far offsets are
    then served in-kernel from pre-rolled x copies — the single-chip
    fast path); a positive value splits |o| > near_limit into the
    block-COO tail (required on shards, where global rolls are invalid);
    None picks the kernel's default tile.

    Returns (plan, oid, far_rows, far_cols):
      plan      static PackPlan over the colored offsets,
      oid       [K, P] int32 (-1 = inactive slot at that lane),
      far_rows/far_cols [n_far] int64, sorted by (offset, row) — the
                order to_packed extracts far blocks in.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    # unique directed pairs, both directions, plus the diagonal
    key = np.unique(np.concatenate([src * P + dst, dst * P + src]))
    ua, ub = key // P, key % P
    rows = np.concatenate([ua, np.arange(P, dtype=np.int64)])
    offs = np.concatenate([ub - ua, np.zeros(P, dtype=np.int64)])

    if near_limit is None:
        near_limit = choose_near_limit(P, nb)
    if near_limit < 0:
        far = np.zeros(offs.shape[0], dtype=bool)
    else:
        far = np.abs(offs) > near_limit
    forder = np.lexsort((rows[far], offs[far]))
    far_rows = rows[far][forder]
    far_cols = far_rows + offs[far][forder]
    rows, offs = rows[~far], offs[~far]

    all_offsets = (np.unique(offs) if offsets is None
                   else np.asarray(offsets, dtype=np.int64))
    if near_limit >= 0:
        all_offsets = all_offsets[np.abs(all_offsets) <= near_limit]
    oidx = np.searchsorted(all_offsets, offs)
    assert (all_offsets[oidx] == offs).all(), "offsets must cover sparsity"
    n_o = all_offsets.shape[0]

    # conflict graph: offsets sharing a lane
    order = np.lexsort((oidx, rows))
    r_s, i_s = rows[order], oidx[order]
    conflict = np.zeros((n_o, n_o), dtype=bool)
    breaks = np.flatnonzero(np.diff(r_s)) + 1
    for r in np.split(i_s, breaks):
        conflict[np.ix_(r, r)] = True
    np.fill_diagonal(conflict, False)

    counts = np.bincount(oidx, minlength=n_o)
    slot_of = np.full(n_o, -1, dtype=np.int64)
    for o in np.argsort(-counts, kind="stable"):
        used = set(slot_of[conflict[o]]) - {-1}
        s = 0
        while s in used:
            s += 1
        slot_of[o] = s
    K = int(slot_of.max()) + 1
    slots = tuple(
        tuple(int(i) for i in np.flatnonzero(slot_of == k)) for k in range(K)
    )
    oid = np.full((K, P), -1, dtype=np.int32)
    oid[slot_of[oidx], rows] = oidx.astype(np.int32)
    plan = PackPlan(offsets=tuple(int(o) for o in all_offsets), slots=slots,
                    P=P, nb=nb)
    return plan, oid, far_rows, far_cols


def pick_tile_packed(P: int, n_rows: int, itemsize: int,
                     budget: int = 2 * 2**20) -> int | None:
    t = 4096
    while t >= 128:
        if P % t == 0 and n_rows * t * itemsize <= budget:
            return t
        t //= 2
    return None


def packed_supported(P: int, nb: int, K: int, itemsize: int) -> bool:
    if P % 128 != 0:
        return False
    R_pad = -(-K * nb // 16) * 16
    return pick_tile_packed(P, nb * R_pad, itemsize) is not None


@functools.partial(
    __import__("jax").jit,
    static_argnames=("plan", "interpret", "tile"),
)
def _packed_matvec_impl(data_i, oid, xpad, xfar, plan: PackPlan, interpret,
                        tile=None):
    """Packed kernel: near offsets (|o| <= T) come from the prev/cur/next
    aligned tiles of the T-padded x (the static streaming structure of
    ops/banded.py — the resident-x modular-indexing variant compiled and
    ran 100x slower); far offsets come from pre-rolled copies in ``xfar``
    [n_far, nb, P], streamed one tile at a time."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, K = plan.nb, plan.K
    R_pad = plan.R_pad
    P = data_i.shape[-1]
    # explicit ``tile`` pins T (sharded halo contract — see banded.py)
    T = tile if tile is not None else pick_tile_packed(
        P, nb * R_pad, data_i.dtype.itemsize)
    assert T is not None and P % T == 0
    far = [o for o in plan.offsets if abs(o) > T]
    far_idx = {o: k for k, o in enumerate(far)}
    # windows/slot-selects run in the x dtype (bf16 x halves the padded/
    # rolled copies' HBM traffic, which rivals the band's at wide
    # offsets); products accumulate in f32 (f64 in interpret/CPU parity)
    acc_t = jnp.float32 if xpad.dtype == jnp.bfloat16 else xpad.dtype

    def kernel(prev_ref, cur_ref, next_ref, far_ref, oid_ref, d_ref,
               out_ref):
        tiles = [prev_ref, cur_ref, next_ref]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, T), 1)

        def window(off):
            # tiles arrive in the x dtype (bf16 halves the HBM traffic of
            # the padded/rolled copies); convert to the f32 accumulator
            # dtype ON LOAD — Mosaic has no 16-bit lane rotate, and the
            # convert is a VPU op on VMEM-resident data (free vs HBM)
            if off in far_idx:
                return far_ref[far_idx[off]].astype(acc_t)
            q, r = divmod(off, T)  # q in {-1, 0, 1}
            a = tiles[q + 1][:, :].astype(acc_t)
            if r == 0:
                return a
            b = tiles[q + 2][:, :].astype(acc_t)
            # single-roll funnel: select source per lane, ONE rotate
            # (w[l] = a[l+r] below T-r, b[l+r-T] above — the kernel is
            # VPU-bound on window construction at wide offset counts)
            c = jnp.where(lane < r, b, a)
            return pltpu.roll(c, T - r, axis=1)

        parts = []
        for k in range(K):
            ok = oid_ref[k:k + 1, :]  # [1, T] int32, broadcasts over nb
            acc = jnp.zeros((nb, T), dtype=acc_t)
            for o_idx in plan.slots[k]:
                acc = jnp.where(ok == o_idx, window(plan.offsets[o_idx]),
                                acc)
            parts.append(acc)
        Xg = jnp.concatenate(parts, axis=0)  # [K*nb, T]
        if R_pad != K * nb:
            Xg = jnp.concatenate(
                [Xg, jnp.zeros((R_pad - K * nb, T), dtype=Xg.dtype)], axis=0)
        rows = []
        for i in range(nb):
            Di = d_ref[i * R_pad:(i + 1) * R_pad, :].astype(acc_t)
            rows.append(jnp.sum(Di * Xg, axis=0, keepdims=True))
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    vm = pltpu.VMEM

    def xspec(shift):
        return pl.BlockSpec((nb, T), lambda t, s=shift: (0, t + s),
                            memory_space=vm)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, P), acc_t),
        grid=(P // T,),
        in_specs=[
            xspec(0), xspec(1), xspec(2),  # prev/cur/next tiles of xpad
            pl.BlockSpec((max(len(far), 1), nb, T), lambda t: (0, 0, t),
                         memory_space=vm),
            pl.BlockSpec((K, T), lambda t: (0, t), memory_space=vm),
            pl.BlockSpec((nb * R_pad, T), lambda t: (0, t),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec((nb, T), lambda t: (0, t), memory_space=vm),
        interpret=interpret,
    )(xpad, xpad, xpad, xfar, oid, data_i)


def packed_matvec_t(data_i, oid, plan: PackPlan, xt, *,
                    interpret: bool = False):
    """Packed SpMV: y[i, p] = sum_{k,j} data_i[(i,k,j), p] *
    x[j, p + offsets[oid[k,p]]] (inactive slots contribute zero).
    xt [nb, P] any float dtype; accumulation is f32 for f32/bf16 inputs,
    f64 for f64 (interpret/CPU parity — TPU Pallas has no f64).

    Plans colored with near_limit=-1 may hold far offsets (|o| > tile):
    their windows are pre-rolled x copies (global rolls — single-chip
    only; the sharded path repacks with an explicit near/far split and
    adds the far block-COO term in sparse.BlockPacked.matvec_t)."""
    import jax.numpy as jnp

    nb = plan.nb
    P = data_i.shape[-1]
    T = pick_tile_packed(P, nb * plan.R_pad, data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this P"
    # bf16 x stays bf16 end-to-end (the padded/rolled copies' traffic
    # rivals the band's; accumulation inside the kernel is still f32)
    xin = (xt if xt.dtype in (jnp.float64, jnp.bfloat16)
           else xt.astype(jnp.float32))
    xpad = jnp.pad(xin, ((0, 0), (T, T)))
    far = [o for o in plan.offsets if abs(o) > T]
    if far:
        xfar = jnp.stack([jnp.roll(xin, -o, axis=1) for o in far], axis=0)
    else:
        xfar = jnp.zeros((1,) + xin.shape, dtype=xin.dtype)
    y = _packed_matvec_impl(data_i, oid, xpad, xfar, plan, interpret)
    return y.astype(xt.dtype)


def packed_tile(P: int, nb: int, K: int, itemsize: int = 4) -> int | None:
    """The lane tile T the kernel will pick for these sizes — also the
    halo width a sharded caller must provide."""
    R_pad = -(-K * nb // 16) * 16
    return pick_tile_packed(P, nb * R_pad, itemsize)


def packed_matvec_t_halo(data_i, oid, plan: PackPlan, x_ext, *,
                         interpret: bool = False, tile: int | None = None):
    """Sharded-slab variant: ``x_ext`` [nb, per + 2T] carries REAL halo
    lanes (from neighboring shards, via ppermute) where the unsharded
    path pads zeros — the kernel is bitwise the same.  The zero blocks
    stored at rows whose neighbor is outside the global range make the
    ring-wrapped halo values exact, mirroring the roll contract of
    BlockBanded.matvec_t."""
    import jax.numpy as jnp

    nb = plan.nb
    P = data_i.shape[-1]
    # ``tile`` pins T (one halo width per sharded level across all data
    # dtypes — see banded_matvec_t_halo)
    T = tile if tile is not None else pick_tile_packed(
        P, nb * plan.R_pad, data_i.dtype.itemsize)
    assert T is not None, "no valid lane tile for this per-shard P"
    assert x_ext.shape[-1] == P + 2 * T, "halo width must equal the tile"
    assert all(abs(o) <= T for o in plan.offsets), \
        "far offset in a sharded plan (repack with an explicit split)"
    xin = (x_ext if x_ext.dtype in (jnp.float64, jnp.bfloat16)
           else x_ext.astype(jnp.float32))
    xfar = jnp.zeros((1,) + xin[:, :P].shape, dtype=xin.dtype)
    y = _packed_matvec_impl(data_i, oid, xin, xfar, plan, interpret, tile=T)
    return y.astype(x_ext.dtype)
