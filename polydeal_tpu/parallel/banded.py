"""Sharded multigrid-CG over the FAST (banded / packed) level layout.

The flat-COO ``ShardedSystem`` (parallel/sharding.py) is
correctness-grade: segment-sum SpMV and scatter-add restriction — the
patterns measured ~30x below HBM bandwidth on TPU.  This module shards
the production solver instead, keeping every level in the lane-aligned
transposed layout and running the SAME Pallas kernels on each shard's
slab:

  * polytope lanes are split into ``n_dev`` contiguous slabs (the STR /
    lexicographic orderings are spatially coherent, so contiguous =
    geometrically local — the analogue of the reference's rank-local
    agglomeration, reference examples/agglo_amg.cc:1030-1085);
  * the banded/packed kernels read x through prev/cur/next lane tiles,
    so a shard needs exactly T halo lanes per side: two ring
    ``ppermute``s per SpMV (comm per matvec = 2 * T * nb * 4 bytes,
    independent of the slab size) — the TPU recast of the reference's
    per-SpMV ghost exchange (source/agglomeration_handler.cc:531-618);
  * ring wrap-around at the global edges is EXACT because boundary rows
    store zero blocks for out-of-range offsets (the same contract that
    makes jnp.roll correct in sparse.BlockBanded.matvec_t);
  * the packed format's far block-COO tail (offsets beyond the kernel
    window, <1% of blocks) exchanges only the specific halo lanes it
    needs, via the per-delta send lists of
    parallel.sharding.build_halo_exchange;
  * transfers between sharded levels are communication-free: the STR
    hierarchy's children are contiguous id runs, so a parent's children
    never straddle a slab boundary (uniform fanout C divides the slab);
  * below ``n_sharded`` levels the V-cycle runs REPLICATED: one
    all_gather at the boundary, then every shard redundantly executes
    the (tiny) coarse levels — the standard coarse-grid treatment, and
    the analogue of the reference's replicated coarse direct solve
    (include/utils.h:286-350).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from polydeal_tpu.parallel.sharding import build_halo_exchange
from polydeal_tpu.solvers.multigrid import Multigrid
from polydeal_tpu.sparse import BlockBanded, BlockPacked

__all__ = ["ShardedBandedSystem"]


@dataclass
class _SLevel:
    """Static per-level metadata (host side)."""

    kind: str  # 'packed' | 'banded'
    per: int  # lanes per shard
    T: int  # halo width == kernel tile (or XLA window bound)
    lo: float
    hi: float
    use_kernel: bool
    plan: object | None = None  # PackPlan (packed kind)
    offsets: tuple | None = None  # (banded kind)
    nb: int = 0
    # far COO halo structure (packed kind only)
    has_far: bool = False
    deltas: tuple = ()
    n_sends: tuple = ()
    nnz_far_per: int = 0
    # transfer INTO this level from the coarser one (self = fine side)
    uniform_C: int = 0
    grid_shape_loc: tuple | None = None
    has_lo: bool = False  # low-precision smoother copies present
    # per-level smoother schedule (resolved from Multigrid's int-or-tuple)
    deg: int = 3
    ns: int = 5


def _halo_bound(ell: "BlockPacked", per: int, on_tpu: bool) -> int | None:
    """Widest halo a shard of ``per`` lanes can provide for this pack."""
    from polydeal_tpu.ops.packed import packed_tile

    if on_tpu and per % 128 == 0:
        T = packed_tile(per, ell.plan.nb, ell.plan.K,
                        ell.data_i.dtype.itemsize)
        if T is not None:
            return min(T, per)
    return per


def _shard_ready(ell, per: int, on_tpu: bool):
    """Repack a BlockPacked whose plan holds offsets beyond the shard
    halo: full-coloring packs serve far offsets from GLOBAL pre-rolled x
    copies, which are invalid on a slab — rebuild with an explicit
    near/far split (far tail -> block-COO halo exchange)."""
    if not isinstance(ell, BlockPacked):
        return ell
    bound = _halo_bound(ell, per, on_tpu)
    if max(abs(o) for o in ell.plan.offsets) <= bound:
        return ell
    from polydeal_tpu.ops.packed import build_pack_plan

    assert ell.far_data is None, (
        "cannot repack a pack that already has an explicit far tail")
    src, dst = ell.sparsity_pairs()
    plan2, oid2, frows, fcols = build_pack_plan(
        src, dst, ell.n_block_rows, ell.plan.nb, near_limit=bound)
    # direct slot remap — never materializes the dense band (whose
    # n_off rows would transiently cost 5x+ the pack in HBM at the
    # wide-offset levels this path exists for)
    return jax.jit(lambda e, o: e.repack(plan2, o, frows, fcols))(
        ell, jnp.asarray(oid2))


def _tile_for(ell, per: int, on_tpu: bool):
    """(T, use_kernel): halo width and whether the Pallas kernel runs.
    For BlockPacked the plan must already fit the shard (_shard_ready)."""
    if isinstance(ell, BlockPacked):
        from polydeal_tpu.ops.packed import packed_tile

        near_max = max(abs(o) for o in ell.plan.offsets)
        if on_tpu and per % 128 == 0:
            T = packed_tile(per, ell.plan.nb, ell.plan.K,
                            ell.data_i.dtype.itemsize)
            if T is not None and near_max <= T:
                return T, True
        T = near_max
        return (T, False) if T <= per else (None, False)
    # BlockBanded
    from polydeal_tpu.ops.banded import banded_tile

    n_off = ell.offsets.shape[0]
    nb = ell.n_basis
    max_off = int(np.abs(ell.offsets).max()) if ell.offsets.size else 1
    if on_tpu and per % 128 == 0:
        T = banded_tile(per, n_off, nb, ell.data.dtype.itemsize)
        if T is not None and max_off <= T:
            return T, True
    T = max(max_off, 1)
    return (T, False) if T <= per else (None, False)


class ShardedBandedSystem:
    """SPMD MG-CG over banded/packed levels (see module docstring).

    Usage::

        mg = build_multigrid(handlers, parents, A, level_assembly='banded')
        ss = ShardedBandedSystem.from_multigrid(mg, mesh)
        x, iters, res = ss.solve_cg(b)
    """

    def __init__(self, mesh, levels, params, rep_mg, nb, n_true_rows,
                 chebyshev_degree, n_smooth, lo_vec=None,
                 fused_smoother=None):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.levels = levels  # list[_SLevel], COARSEST-sharded .. finest
        self.params = params  # list[dict], aligned with levels
        self.rep_mg = rep_mg  # Multigrid over the replicated bottom levels
        self.nb = nb
        self.n_true_rows = n_true_rows
        self.chebyshev_degree = chebyshev_degree
        self.n_smooth = n_smooth
        # fused Chebyshev-step kernels inside the shard_map smoother
        # (ops/fused_cheb.py halo variants): None = auto (engages where
        # the level's Pallas kernel runs, i.e. on TPU), False = off.
        # Matches the host Multigrid.fused_smoother policy.
        self.fused_smoother = fused_smoother
        # V-cycle VECTOR dtype (None = operator dtype).  Mirrors
        # Multigrid's precond_dtype policy: smoothing vectors (and hence
        # the halo exchanges) run low-precision even where the level
        # keeps an f32 band (packed kernels take bf16 x with f32 data).
        self.lo_vec = lo_vec

    # ------------------------------------------------------------------
    @classmethod
    def from_multigrid(cls, mg: Multigrid, mesh: Mesh,
                       min_sharded_lanes: int | None = None
                       ) -> "ShardedBandedSystem":
        n_dev = int(mesh.devices.size)
        on_tpu = mesh.devices.reshape(-1)[0].platform == "tpu"
        if min_sharded_lanes is None:
            min_sharded_lanes = 4 * n_dev
        n_lv = mg.n_levels

        # decide the sharded prefix (finest downward); packed levels with
        # far-in-slot plans are repacked for the shard halo on the fly
        repacked = {}
        sharded = []  # level indices (in mg numbering), finest first
        for l in range(n_lv - 1, 0, -1):
            ell = mg.ells[l]
            if not isinstance(ell, (BlockBanded, BlockPacked)):
                break
            P_l = ell.n_block_rows
            if P_l % n_dev != 0 or P_l < min_sharded_lanes:
                break
            per = P_l // n_dev
            ell = _shard_ready(ell, per, on_tpu)
            repacked[l] = ell
            T, _ = _tile_for(ell, per, on_tpu)
            if T is None:
                break
            t = mg.transfers[l - 1]
            if t._uniform_C:
                if per % t._uniform_C != 0:
                    break
            elif t.grid_shape is not None:
                # local fine grid (g0/n, g1, ...) must coarsen in-shard
                if t.grid_shape[0] % (2 * n_dev) != 0:
                    break
            else:
                break  # general transfer: not localizable
            sharded.append(l)
        sharded = sharded[::-1]  # coarsest-sharded .. finest
        if not sharded:
            raise ValueError(
                "no level is shardable over this mesh (need banded/packed "
                "levels with n_dev-divisible lane counts)")
        k0 = sharded[0]  # levels [k0, n_lv) sharded; [0, k0) replicated

        levels, params = [], []
        for l in sharded:
            ell = repacked.get(l, mg.ells[l])
            P_l = ell.n_block_rows
            per = P_l // n_dev
            T, use_kernel = _tile_for(ell, per, on_tpu)
            lo = float(mg.los[l]) if mg.los[l] is not None else 0.0
            hi = float(mg.his[l]) if mg.his[l] is not None else 1.0
            t = mg.transfers[l - 1]
            lv = _SLevel(
                kind="packed" if isinstance(ell, BlockPacked) else "banded",
                per=per, T=T, lo=lo, hi=hi, use_kernel=use_kernel,
                nb=ell.n_basis,
                uniform_C=t._uniform_C,
                grid_shape_loc=None,
                deg=(mg.chebyshev_degree[l]
                     if isinstance(mg.chebyshev_degree, tuple)
                     else mg.chebyshev_degree),
                ns=(mg.n_smooth[l] if isinstance(mg.n_smooth, tuple)
                    else mg.n_smooth),
            )
            pl_ = {}
            if isinstance(ell, BlockPacked):
                lv.plan = ell.plan
                pl_["data_i"] = ell.data_i
                pl_["oid"] = ell.oid
                if ell.far_rows is not None and ell.far_rows.size:
                    lv.has_far = True
                    cls._build_far(lv, pl_, ell, per, n_dev)
            else:
                lv.offsets = tuple(int(o) for o in ell.offsets)
                if use_kernel:
                    src = (ell if ell.data_i is not None
                           else jax.jit(lambda e: e.with_imajor())(ell))
                    pl_["data_i"] = src.data_i
                else:
                    pl_["band"] = ell.data
            dinv = mg.dinvs_t[l]
            pl_["dinv"] = (dinv if dinv.ndim == 2
                           else dinv.reshape(-1, ell.n_basis).T)
            # low-precision smoother copies (the preconditioner may be
            # inexact — same policy as Multigrid.setup's precond_dtype).
            # When the mg level kept full precision (e.g. packed levels,
            # where the bf16 kernel measured slower), skip the copy — a
            # same-dtype duplicate costs HBM and buys nothing.
            if mg.lo_ells is not None:
                lo_dt = (mg.lo_ells[l].data_i.dtype
                         if hasattr(mg.lo_ells[l], "data_i")
                         and mg.lo_ells[l].data_i is not None
                         else mg.lo_ells[l].data.dtype)
                cur_dt = (pl_["data_i"].dtype if "data_i" in pl_
                          else pl_["band"].dtype)
                if lo_dt != cur_dt:
                    if "data_i" in pl_:
                        pl_["lo_data_i"] = pl_["data_i"].astype(lo_dt)
                    elif "band" in pl_:
                        pl_["lo_band"] = pl_["band"].astype(lo_dt)
                    lv.has_lo = True
            # transfer into this level (from the coarser sharded level,
            # or from the replicated boundary — localized either way)
            if t.grid_shape is not None:
                g = t.grid_shape
                lv.grid_shape_loc = (g[0] // n_dev,) + tuple(g[1:])
                lv.uniform_C = 0
            pl_["Et"] = (t._Et if t._Et is not None
                         else jnp.moveaxis(t.E, 0, -1))
            levels.append(lv)
            params.append(pl_)

        # replicated bottom: a sub-Multigrid over levels [0, k0).  The
        # lo (precond_dtype) copies are sliced through so the replicated
        # levels smooth in the SAME precision as the host cycle — the
        # sharded and unsharded preconditioners must be numerically
        # identical for the iteration-parity invariant to hold
        rep = Multigrid(
            matrices=mg.matrices[:k0],
            transfers=mg.transfers[: max(k0 - 1, 0)],
            n_smooth=mg.n_smooth,
            chebyshev_degree=mg.chebyshev_degree,
            coarse_lu=mg.coarse_lu,
            ells=mg.ells[:k0],
            dinvs_t=mg.dinvs_t[:k0],
            los=mg.los[:k0],
            his=mg.his[:k0],
            lo_ells=(mg.lo_ells[:k0] if mg.lo_ells is not None else None),
            lo_dinvs=(mg.lo_dinvs[:k0] if mg.lo_dinvs is not None
                      else None),
        )
        fine = mg.ells[-1]
        return cls(mesh, levels, params, rep,
                   nb=fine.n_basis, n_true_rows=fine.n_block_rows,
                   chebyshev_degree=mg.chebyshev_degree,
                   n_smooth=mg.n_smooth,
                   lo_vec=(mg.lo_dinvs[-1].dtype
                           if mg.lo_dinvs is not None else None),
                   fused_smoother=mg.fused_smoother)

    @staticmethod
    def _build_far(lv: _SLevel, pl_: dict, ell: BlockPacked, per: int,
                   n_dev: int):
        """Shard the far block-COO tail by row owner; per-delta halo send
        lists for the remote columns (reference ghost-DoF machinery,
        agglomeration_handler.cc:1026-1091, recast as static lists)."""
        rows = np.asarray(ell.far_rows)
        cols = np.asarray(ell.far_cols)
        owner = rows // per
        counts = np.bincount(owner, minlength=n_dev)
        nnz_per = max(int(counts.max()), 1)
        nb = ell.n_basis
        fdata = np.zeros((n_dev, nnz_per, nb, nb),
                         dtype=np.asarray(ell.far_data).dtype)
        flrows = np.zeros((n_dev, nnz_per), dtype=np.int32)
        fcols = np.zeros((n_dev, nnz_per), dtype=np.int64)
        fd_host = np.asarray(ell.far_data)
        for d in range(n_dev):
            idx = np.where(owner == d)[0]
            k = idx.shape[0]
            fdata[d, :k] = fd_host[idx]
            flrows[d, :k] = rows[idx] - d * per
            fcols[d, :k] = cols[idx]
            fcols[d, k:] = d * per  # padding: local col, zero data
        remap, deltas, n_sends, sends = build_halo_exchange(
            fcols, per, n_dev)
        lv.deltas, lv.n_sends = deltas, n_sends
        lv.nnz_far_per = nnz_per
        pl_["fdata"] = jnp.asarray(fdata.reshape(n_dev * nnz_per, nb, nb))
        pl_["flrows"] = jnp.asarray(flrows.reshape(-1))
        pl_["fcols"] = jnp.asarray(remap.reshape(-1).astype(np.int32))
        for t, send in enumerate(sends):
            pl_[f"fsend{t}"] = jnp.asarray(send.reshape(-1))

    # ------------------------------------------------------------------
    @property
    def n_dev(self) -> int:
        return int(self.mesh.devices.size)

    def comm_bytes_per_spmv(self, dtype_bytes: int = 4) -> list:
        """Per-level ppermute bytes one SpMV moves per device: 2 ring
        sends of T halo lanes x nb rows (+ the far block-COO sends where
        present).  The recorded analogue of the reference's MPI ghost
        traffic (SURVEY §2 parallelism); asserted ∝ halo in
        tests/test_sharding.py::test_halo_comm_volume."""
        out = []
        for lv in self.levels:
            ring = 2 * lv.T * (lv.nb or self.nb) * dtype_bytes
            far = (sum(lv.n_sends) * (lv.nb or self.nb) * dtype_bytes
                   if lv.has_far else 0)
            out.append(dict(kind=lv.kind, per=lv.per, T=lv.T,
                            ring_bytes=ring, far_bytes=far))
        return out

    def _specs(self):
        """PartitionSpec tree for self.params: lane-major arrays shard on
        the LAST axis; far-COO arrays on the first."""
        ax = self.axis
        out = []
        for pl_ in self.params:
            spec = {}
            for k, v in pl_.items():
                if k.startswith(("fdata", "flrows", "fcols", "fsend")):
                    spec[k] = P(ax, *([None] * (v.ndim - 1)))
                else:
                    spec[k] = P(*([None] * (v.ndim - 1)), ax)
            out.append(spec)
        return out

    # ---- per-shard primitives (arrays below are LOCAL slabs) ----------
    def _halo_x(self, lv: _SLevel, x_loc):
        """[nb, per + 2T]: real halo lanes from ring neighbors."""
        n, ax = self.n_dev, self.axis
        T = lv.T
        if n == 1:
            # identity collective: plain slices keep XLA fusion intact
            lh = x_loc[:, lv.per - T:]
            rh = x_loc[:, :T]
        else:
            lh = jax.lax.ppermute(x_loc[:, lv.per - T:], ax,
                                  [(j, (j + 1) % n) for j in range(n)])
            rh = jax.lax.ppermute(x_loc[:, :T], ax,
                                  [(j, (j - 1) % n) for j in range(n)])
        return jnp.concatenate([lh, x_loc, rh], axis=1)

    def _matvec(self, lv: _SLevel, pl_, x_loc, lo: bool = False):
        x_ext = self._halo_x(lv, x_loc)
        if lv.kind == "packed":
            y = self._near_matvec(lv, pl_, x_ext, lo)
            if lv.has_far:
                # far tail stays f32 (tiny data; not worth a lo copy);
                # cast its contribution back so a bf16 sweep (lo_vec)
                # is not silently promoted to f32 by the addition
                y = y + self._far_matvec(lv, pl_, x_loc).astype(y.dtype)
            return y
        return self._near_matvec(lv, pl_, x_ext, lo)

    def _near_matvec(self, lv: _SLevel, pl_, x_ext, lo: bool = False):
        lo = lo and lv.has_lo
        key_i = "lo_data_i" if lo and "lo_data_i" in pl_ else "data_i"
        key_b = "lo_band" if lo and "lo_band" in pl_ else "band"
        if lv.kind == "packed":
            if lv.use_kernel:
                from polydeal_tpu.ops.packed import packed_matvec_t_halo

                # tile=lv.T: the halo width was chosen ONCE per level
                # (from the operator dtype); the lo (bf16) copy must use
                # the same T, not derive a larger one from its itemsize
                return packed_matvec_t_halo(pl_[key_i], pl_["oid"],
                                            lv.plan, x_ext, tile=lv.T)
            # XLA windows over the halo-extended slab (static slices —
            # no wrap, matching the ring-halo contract)
            T, per, nb = lv.T, lv.per, lv.nb
            plan = lv.plan
            oid = pl_["oid"]
            acc_t = x_ext.dtype
            y = jnp.zeros((nb, per), dtype=acc_t)
            R_pad = plan.R_pad
            di = pl_[key_i]
            for k in range(plan.K):
                sel = jnp.zeros((nb, per), dtype=acc_t)
                for o_idx in plan.slots[k]:
                    o = plan.offsets[o_idx]
                    w = jax.lax.dynamic_slice_in_dim(x_ext, T + o, per, 1)
                    sel = jnp.where(oid[k][None, :] == o_idx, w, sel)
                for i in range(nb):
                    for j in range(nb):
                        row = di[i * R_pad + k * nb + j]
                        y = y.at[i].add(row.astype(acc_t) * sel[j])
            return y
        # banded
        if lv.use_kernel:
            from polydeal_tpu.ops.banded import banded_matvec_t_halo

            return banded_matvec_t_halo(pl_[key_i], np.asarray(lv.offsets),
                                        lv.nb, x_ext, tile=lv.T)
        T, per = lv.T, lv.per
        band = pl_[key_b]
        y = jnp.zeros((lv.nb, per), dtype=x_ext.dtype)
        for k, o in enumerate(lv.offsets):
            w = jax.lax.dynamic_slice_in_dim(x_ext, T + o, per, 1)
            y = y + jnp.einsum("ijp,jp->ip", band[k].astype(x_ext.dtype), w)
        return y

    def _far_matvec(self, lv: _SLevel, pl_, x_loc):
        """Far block-COO tail: ship only the halo lanes each shard needs
        (per-delta send lists), then gather + reduce locally."""
        n, ax = self.n_dev, self.axis
        xb = x_loc.T  # [per, nb]
        segs = [xb]
        for t, delta in enumerate(lv.deltas):
            buf = xb[pl_[f"fsend{t}"]]
            segs.append(jax.lax.ppermute(
                buf, ax, [(j, (j + delta) % n) for j in range(n)]))
        xg = jnp.concatenate(segs, axis=0)
        # the far tail computes in the BAND dtype (f32): tiny data, and
        # the unsharded BlockPacked.matvec_t keeps f32 accumulation for
        # it — casting down would silently diverge from the host path
        fdata = pl_["fdata"]
        prod = jnp.einsum("kij,kj->ki",
                          fdata, xg[pl_["fcols"]].astype(fdata.dtype))
        yb = jax.ops.segment_sum(prod, pl_["flrows"],
                                 num_segments=lv.per)
        return yb.T

    def _dot(self, a, b):
        return jax.lax.psum(jnp.vdot(a, b), self.axis)

    def _fused_on(self, lv: _SLevel, dtype) -> bool:
        """Fused halo Chebyshev kernels engage where the level's Pallas
        kernel runs (TPU), unless explicitly disabled — the host
        Multigrid._fused_ok policy applied to the sharded slab."""
        import jax.numpy as jnp

        if self.fused_smoother is False or not lv.use_kernel:
            return False
        return dtype in (jnp.float32, jnp.float64)

    def _fused_step(self, lv: _SLevel, pl_, b_loc, dinv):
        """step_fn(x, d, c1, c2) for ChebyshevSmoother: halo exchange +
        ONE fused Pallas dispatch (SpMV + Jacobi + recurrence updates) —
        the sharded analogue of the host fused smoother; the n_dev=1
        overhead vs the host path was measured 1.9x with the unfused
        per-op smoother."""
        interpret = jax.default_backend() != "tpu"
        lo_key = ("lo_data_i" if lv.has_lo and "lo_data_i" in pl_
                  else "data_i")
        if lv.kind == "banded":
            from polydeal_tpu.ops.fused_cheb import banded_cheb_step_t_halo

            def step_fn(x, d, c1, c2):
                x_ext = self._halo_x(lv, x)
                return banded_cheb_step_t_halo(
                    pl_[lo_key], np.asarray(lv.offsets), lv.nb, x_ext, d,
                    b_loc, dinv, c1, c2, tile=lv.T, interpret=interpret)
        else:
            from polydeal_tpu.ops.fused_cheb import packed_cheb_step_t_halo

            def step_fn(x, d, c1, c2):
                b_eff = b_loc
                if lv.has_far:
                    # the kernel's in-register y covers the near window
                    # only — fold the far block-COO tail into b
                    b_eff = b_loc - self._far_matvec(
                        lv, pl_, x).astype(b_loc.dtype)
                x_ext = self._halo_x(lv, x)
                return packed_cheb_step_t_halo(
                    pl_[lo_key], pl_["oid"], lv.plan, x_ext, d, b_eff,
                    dinv, c1, c2, tile=lv.T, interpret=interpret)

        return step_fn

    def _smooth(self, lv: _SLevel, pl_, b_loc, x_loc, x_is_zero=False):
        from polydeal_tpu.solvers.chebyshev import ChebyshevSmoother

        dinv = pl_["dinv"].astype(b_loc.dtype)  # keep the sweep's dtype
        sm = ChebyshevSmoother(
            A=lambda v: self._matvec(lv, pl_, v, lo=True),
            Minv=lambda r: dinv * r,
            lo=lv.lo, hi=lv.hi, degree=lv.deg,
            step_fn=(self._fused_step(lv, pl_, b_loc, dinv)
                     if self._fused_on(lv, b_loc.dtype) else None))
        for s in range(lv.ns):
            x_loc = sm(b_loc, x_loc, x_is_zero=(x_is_zero and s == 0))
        return x_loc

    def _residual_loc(self, lv: _SLevel, pl_, b_loc, x_loc):
        """r = b - A x, fused on the kernel path (full-precision band,
        matching the host Multigrid._residual policy)."""
        if self._fused_on(lv, b_loc.dtype):
            interpret = jax.default_backend() != "tpu"
            x_ext = self._halo_x(lv, x_loc)
            if lv.kind == "banded":
                from polydeal_tpu.ops.fused_cheb import banded_residual_t_halo

                return banded_residual_t_halo(
                    pl_["data_i"], np.asarray(lv.offsets), lv.nb, x_ext,
                    b_loc, tile=lv.T, interpret=interpret)
            from polydeal_tpu.ops.fused_cheb import packed_residual_t_halo

            r = packed_residual_t_halo(pl_["data_i"], pl_["oid"], lv.plan,
                                       x_ext, b_loc, tile=lv.T,
                                       interpret=interpret)
            if lv.has_far:
                r = r - self._far_matvec(lv, pl_, x_loc).astype(r.dtype)
            return r
        return b_loc - self._matvec(lv, pl_, x_loc)

    def _restrict_loc(self, lv: _SLevel, pl_, r_loc):
        """Transfer fine->coarse inside the shard (children of one parent
        never straddle a slab: STR contiguity)."""
        nb = lv.nb
        t = jnp.einsum("ijp,ip->jp", pl_["Et"], r_loc)
        if lv.grid_shape_loc is not None:
            g = lv.grid_shape_loc
            dim = len(g)
            shape = (nb,) + tuple(v for s in g for v in (s // 2, 2))
            tt = t.reshape(shape)
            return tt.sum(axis=tuple(2 + 2 * ax for ax in range(dim))
                          ).reshape(nb, -1)
        C = lv.uniform_C
        return t.reshape(nb, lv.per // C, C).sum(axis=2)

    def _prolong_loc(self, lv: _SLevel, pl_, xc_loc):
        nb = lv.nb
        if lv.grid_shape_loc is not None:
            g = lv.grid_shape_loc
            dim = len(g)
            cg = (g[0] // 2,) + tuple(s // 2 for s in g[1:])
            u = xc_loc.reshape((nb,) + cg)
            for ax in range(dim):
                u = jnp.repeat(u, 2, axis=1 + ax)
            rep = u.reshape(nb, -1)
        else:
            C = lv.uniform_C
            rep = jnp.broadcast_to(
                xc_loc[:, :, None],
                (nb, lv.per // C, C)).reshape(nb, -1)
        return jnp.einsum("ijp,jp->ip", pl_["Et"], rep)

    def _cycle(self, lv_params, rep_mg, li: int, b_loc):
        """V-cycle over the sharded levels; li indexes self.levels."""
        lv = self.levels[li]
        pl_ = lv_params[li]
        if self.lo_vec is not None:
            b_loc = b_loc.astype(self.lo_vec)
        x = jnp.zeros_like(b_loc)
        # x_is_zero: A·0 = 0 exactly (also in fp), so the shortcut keeps
        # bit-parity with the host pre-smoother while saving one SpMV
        x = self._smooth(lv, pl_, b_loc, x, x_is_zero=True)
        r = self._residual_loc(lv, pl_, b_loc, x)
        rc_loc = self._restrict_loc(lv, pl_, r)
        if li > 0:
            xc = self._cycle(lv_params, rep_mg, li - 1, rc_loc)
        else:
            # boundary: gather the (small) coarse rhs, run the replicated
            # bottom V-cycle redundantly on every shard, slice back
            if self.n_dev == 1:
                rc_full = rc_loc
            else:
                rc_full = jax.lax.all_gather(rc_loc, self.axis, axis=1,
                                             tiled=True)
            if rep_mg.n_levels:
                top = rep_mg.n_levels - 1
                if (rc_full.ndim == 2 and top > 0
                        and not rep_mg._is_t(top)):
                    # replicated top level cannot run the transposed
                    # layout (e.g. a BlockELL fallback level): flatten
                    # for the host cycle, transpose back after
                    nbt = rc_full.shape[0]
                    xc_flat = rep_mg._cycle(top, rc_full.T.reshape(-1))
                    xc_full = xc_flat.reshape(-1, nbt).T
                else:
                    xc_full = rep_mg._cycle(top, rc_full)
            else:
                xc_full = rc_full
            if self.n_dev == 1:
                xc = xc_full
            else:
                i = jax.lax.axis_index(self.axis)
                per_c = rc_loc.shape[1]
                xc = jax.lax.dynamic_slice_in_dim(xc_full, i * per_c,
                                                  per_c, 1)
        # the f32 transfer einsum upcasts the correction — drop back to
        # the smoothing dtype so the POST-smooth also runs low-precision
        x = (x + self._prolong_loc(lv, pl_, xc)).astype(b_loc.dtype)
        x = self._smooth(lv, pl_, b_loc, x)
        return x

    # ------------------------------------------------------------------
    def v_cycle(self, b):
        """One sharded V-cycle (the CG preconditioner M) on a flat rhs.

        Exposed for testing/inspection — ``solve_cg`` fuses the cycle
        into its CG loop.  Notably this compiles WITHOUT a while_loop:
        XLA:CPU's bf16 emulation makes bf16-heavy while-loop bodies
        pathologically slow to compile, so CPU tests certify the bf16
        preconditioner through this entry point instead of a full solve.
        """
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = "v_cycle"
        if key not in cache:
            n_levels = len(self.levels)
            rep_specs = jax.tree.map(lambda _: P(), self.rep_mg)
            nb = self.nb

            @partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(P(self.axis), self._specs(), rep_specs),
                out_specs=P(self.axis),
                check_vma=False,
            )
            def run(b_flat, lv, rep_mg):
                b_loc = b_flat.reshape(-1, nb).T
                y = self._cycle(lv, rep_mg, n_levels - 1, b_loc)
                return y.astype(b_loc.dtype).T.reshape(-1)

            cache[key] = jax.jit(run)
        return cache[key](jnp.asarray(b), self.params, self.rep_mg)

    def solve_cg(self, b, rtol: float = 1e-9, maxiter: int = 100,
                 precondition: bool = True):
        """SPMD MG-CG in the transposed lane-aligned layout throughout.
        b: flat [n_dofs]; returns (x flat, iterations, residual)."""
        x, k, res = self.solve_cg_async(b, rtol, maxiter, precondition)
        return x, int(k[0]), float(res[0])

    def solve_cg_async(self, b, rtol: float = 1e-9, maxiter: int = 100,
                       precondition: bool = True):
        """Like :meth:`solve_cg` but returns DEVICE arrays
        (x, k [1], res [1]) with no host synchronization — the timing
        path: over a tunneled device, the two scalar host reads in
        solve_cg cost more than a V-cycle each."""
        run = self._compiled(rtol, maxiter, precondition)
        return run(jnp.asarray(b), self.params, self.rep_mg)

    def _compiled(self, rtol, maxiter, precondition):
        """Jitted shard_map program, cached per solver configuration
        (rebuilding it per call would re-trace and re-compile)."""
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        key = (rtol, maxiter, precondition)
        if key in cache:
            return cache[key]
        fine = self.levels[-1]
        n_levels = len(self.levels)
        rep_specs = jax.tree.map(lambda _: P(), self.rep_mg)

        nb = self.nb

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(self.axis), self._specs(), rep_specs),
            out_specs=(P(self.axis), P(), P()),
            # pallas_call inside shard_map cannot express varying-mesh-
            # axes metadata on its out_shape; disable the vma checker
            check_vma=False,
        )
        def run(b_flat, lv, rep_mg):
            # layout conversion INSIDE the program (block rows are
            # shard-local, so the flat chunk reshapes locally)
            b_loc = b_flat.reshape(-1, nb).T
            fine_pl = lv[-1]

            def Aop(v):
                return self._matvec(fine, fine_pl, v)

            def M(r):
                if not precondition:
                    return r
                # CG itself stays full-precision; only the (inexact)
                # preconditioner runs in lo_vec
                return self._cycle(lv, rep_mg, n_levels - 1, r
                                   ).astype(r.dtype)

            x = jnp.zeros_like(b_loc)
            r = b_loc
            z = M(r)
            p = z
            rz = self._dot(r, z)
            tol = rtol * jnp.sqrt(self._dot(b_loc, b_loc))

            def cond(st):
                x, r, p, rz, k = st
                return (jnp.sqrt(self._dot(r, r)) > tol) & (k < maxiter)

            def body(st):
                x, r, p, rz, k = st
                Ap = Aop(p)
                alpha = rz / self._dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M(r)
                rz_new = self._dot(r, z)
                p = z + (rz_new / rz) * p
                return (x, r, p, rz_new, k + 1)

            x, r, p, rz, k = jax.lax.while_loop(
                cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
            return (x.T.reshape(-1), k[None],
                    jnp.sqrt(self._dot(r, r))[None])

        cache[key] = jax.jit(run)
        return cache[key]
