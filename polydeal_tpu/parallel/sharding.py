"""Multi-chip domain decomposition over a jax device mesh.

TPU-native replacement for the reference's MPI layer (SURVEY §2
"Parallelism & distributed-communication components"):

  MPI rank                      -> device along the 'd' mesh axis
  rank-local agglomeration      -> contiguous polytope row ranges
                                   (the STR R-tree ordering is spatially
                                   coherent, so contiguous = local)
  ghost-polytope metadata exchange (Utilities::MPI::some_to_some,
   agglomeration_handler.cc:1026-1091) -> nothing at runtime: the face
                                   table is global and static; the only
                                   runtime communication is collectives
  interface value exchange (exchange_interface_values, :531-618)
                                -> precomputed HALO exchange: per-shard
                                   send lists gathered at setup from the
                                   static sparsity; at SpMV time each
                                   shard ppermutes only its halo rows to
                                   the shards that need them (comm volume
                                   per SpMV ∝ halo size, not n_global)
  Trilinos SpMV + MPI reductions-> sharded block SpMV + psum

Everything executes inside a single ``shard_map`` region so the whole
Krylov/V-cycle iteration is one SPMD program with XLA-scheduled ICI
collectives — no per-iteration host involvement (the reference pays an
MPI ghost exchange per SpMV).

Sharding rule: every per-level array (nonzero blocks, local row ids,
global col ids, diagonal inverse, transfer blocks, parent ids) is passed
into the shard_map as an explicit argument with PartitionSpec('d') —
values captured by closure would be broadcast, not sharded.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from polydeal_tpu.sparse import BlockMatrix

__all__ = ["make_mesh", "shard_block_matrix", "ShardedSystem"]


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def _pad_rows(P_: int, n_dev: int) -> int:
    per = -(-P_ // n_dev)
    return per * n_dev


@dataclass
class ShardedMatrix:
    """Row-sharded block matrix, flat layout with equal per-shard counts.

    Arrays are globally shaped [n_dev * nnz_per, ...]; sharded with
    PartitionSpec('d') each device sees its own [nnz_per, ...] slice.
    ``lrows`` are row ids local to the shard; ``cols`` are global block
    column ids (resolved against the all-gathered vector).
    """

    data: jnp.ndarray  # [n_dev*nnz_per, nb, nb]
    lrows: jnp.ndarray  # [n_dev*nnz_per] int32
    cols: jnp.ndarray  # [n_dev*nnz_per] int32 global
    rows_per_shard: int
    n_rows_pad: int
    n_dev: int

    @property
    def n_basis(self):
        return self.data.shape[-1]


def shard_block_matrix(A: BlockMatrix, n_dev: int) -> ShardedMatrix:
    """Partition block rows into n_dev contiguous chunks, pad to equal
    per-shard nonzero counts (zero blocks are harmless in SpMV)."""
    P_pad = _pad_rows(A.n_block_rows, n_dev)
    per = P_pad // n_dev
    shard_of = np.minimum(A.rows // per, n_dev - 1)
    counts = np.bincount(shard_of, minlength=n_dev)
    nnz_per = int(counts.max()) if counts.size else 1
    nb = A.data.shape[-1]
    data = np.zeros((n_dev, nnz_per, nb, nb), dtype=np.asarray(A.data).dtype)
    lrows = np.zeros((n_dev, nnz_per), dtype=np.int32)
    cols = np.zeros((n_dev, nnz_per), dtype=np.int32)
    Ad = np.asarray(A.data)
    for d in range(n_dev):
        idx = np.where(shard_of == d)[0]
        k = idx.shape[0]
        data[d, :k] = Ad[idx]
        lrows[d, :k] = A.rows[idx] - d * per
        cols[d, :k] = A.cols[idx]
        # padding entries: zero data at (local row 0, SHARD-LOCAL col) —
        # local so they never induce spurious halo traffic
        cols[d, k:] = d * per
    return ShardedMatrix(
        data=jnp.asarray(data.reshape(n_dev * nnz_per, nb, nb)),
        lrows=jnp.asarray(lrows.reshape(-1)),
        cols=jnp.asarray(cols.reshape(-1)),
        rows_per_shard=per,
        n_rows_pad=P_pad,
        n_dev=n_dev,
    )


def _pad_vec(x, n_rows_pad: int, nb: int):
    xb = np.asarray(x).reshape(-1, nb)
    out = np.zeros((n_rows_pad, nb), dtype=xb.dtype)
    out[: xb.shape[0]] = xb
    return out


@dataclass
class ShardedLevel:
    """Static metadata of one MG level (arrays live in the params tree)."""

    rows_per_shard: int
    n_rows_pad: int
    lo: float
    hi: float
    has_transfer: bool
    # halo exchange structure (static): shard j sends its rows
    # params["send{t}"] to shard (j + deltas[t]) % n_dev; the receiver's
    # remapped cols index [local rows | halo seg 0 | halo seg 1 | ...]
    deltas: tuple = ()
    n_sends: tuple = ()
    # transfers are shard-nested (parent of every local fine row lives in
    # the local coarse chunk) -> restrict/prolong are communication-free
    nested_transfer: bool = False


def build_halo_exchange(cols: np.ndarray, per: int, n_dev: int):
    """Static halo metadata from the sharded sparsity.

    The TPU-native replacement for the reference's ghost machinery
    (setup_ghost_polytopes + exchange_interface_values, reference
    source/agglomeration_handler.cc:1026-1091,531-618): compute once, on
    the host, exactly which rows each shard must ship to which neighbor;
    runtime communication is one ppermute per neighbor distance carrying
    only those rows.

    cols: [n_dev, nnz_per] global block-column ids per shard.
    Returns (remapped_cols [n_dev, nnz_per], deltas, sends) with sends a
    list (per delta) of [n_dev, n_send] LOCAL row indices to ship.
    """
    cols = np.asarray(cols)
    owner = cols // per
    # per-shard sorted unique remote cols, grouped by cyclic distance
    need = []
    deltas = set()
    for d in range(n_dev):
        remote = np.unique(cols[d][owner[d] != d])
        need.append(remote)
        # delta = (needer - owner) mod n_dev, matching the send routing
        # dst = (sender + delta) below (the previous (owner - needer)
        # orientation only worked because SIPG sparsity is structurally
        # symmetric, closing the delta set under negation)
        deltas.update(((d - remote // per) % n_dev).tolist())
    deltas = tuple(sorted(int(x) for x in deltas))
    sends = []
    recv_maps = [{} for _ in range(n_dev)]  # global col -> halo slot
    halo_off = [per] * n_dev
    for delta in deltas:
        lists = []
        for j in range(n_dev):
            dst = (j + delta) % n_dev
            mine = need[dst][need[dst] // per == j]
            lists.append(np.sort(mine) - j * per)
        n_send = max((len(x) for x in lists), default=0)
        n_send = max(n_send, 1)
        send = np.zeros((n_dev, n_send), dtype=np.int32)
        for j in range(n_dev):
            send[j, : len(lists[j])] = lists[j]
            dst = (j + delta) % n_dev
            for pos, lr in enumerate(lists[j]):
                recv_maps[dst][j * per + int(lr)] = halo_off[dst] + pos
        for d in range(n_dev):
            halo_off[d] += n_send
        sends.append(send)
    remap = np.empty_like(cols, dtype=np.int32)
    for d in range(n_dev):
        local = owner[d] == d
        remap[d] = np.where(local, cols[d] - d * per, 0)
        for k in np.where(~local)[0]:
            remap[d, k] = recv_maps[d][int(cols[d, k])]
    return remap, deltas, tuple(s.shape[1] for s in sends), sends


class ShardedSystem:
    """Sharded multigrid-CG solver built from a host-side Multigrid.

    Usage:
        mg = build_multigrid(handlers, parents, A)      # host/1-chip setup
        ss = ShardedSystem.from_multigrid(mg, mesh)
        x, iters, res = ss.solve_cg(b)                   # SPMD on the mesh
    """

    def __init__(self, mesh: Mesh, levels, params, coarse_lu, n_true_rows,
                 chebyshev_degree: int = 3, n_smooth: int = 5):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.levels = levels  # list[ShardedLevel], coarse -> fine
        self.params = params  # list[dict of global arrays]
        self.coarse_lu = coarse_lu  # replicated closure capture (small)
        self.n_true_rows = n_true_rows
        self.chebyshev_degree = chebyshev_degree
        self.n_smooth = n_smooth

    # ------------------------------------------------------------------
    @classmethod
    def from_multigrid(cls, mg, mesh: Mesh) -> "ShardedSystem":
        n_dev = mesh.devices.size
        levels, params = [], []
        for li, A in enumerate(mg.matrices):
            nb = A.data.shape[-1]
            SA = shard_block_matrix(A, n_dev)
            diag = np.asarray(A.diagonal()).reshape(-1, nb)
            dinv = np.ones((SA.n_rows_pad, nb), dtype=diag.dtype)
            dinv[: diag.shape[0]] = 1.0 / diag
            lo, hi = ((0.0, 1.0) if mg.los[li] is None
                      else (float(mg.los[li]), float(mg.his[li])))
            cols2d = np.asarray(SA.cols).reshape(n_dev, -1)
            remap, deltas, n_sends, sends = build_halo_exchange(
                cols2d, SA.rows_per_shard, n_dev)
            levels.append(
                ShardedLevel(
                    rows_per_shard=SA.rows_per_shard,
                    n_rows_pad=SA.n_rows_pad,
                    lo=lo,
                    hi=hi,
                    has_transfer=False,
                    deltas=deltas,
                    n_sends=n_sends,
                )
            )
            pl = dict(data=SA.data, lrows=SA.lrows,
                      cols=jnp.asarray(remap.reshape(-1)),
                      dinv=jnp.asarray(dinv))
            for t, send in enumerate(sends):
                pl[f"send{t}"] = jnp.asarray(send.reshape(-1))
            params.append(pl)
        for li, t in enumerate(mg.transfers):
            lvl = levels[li + 1]
            per_f = lvl.rows_per_shard
            per_c = levels[li].rows_per_shard
            nb = t.E.shape[-1]
            E = np.zeros((lvl.n_rows_pad, nb, nb), dtype=np.asarray(t.E).dtype)
            E[: t.E.shape[0]] = np.asarray(t.E)
            par = np.zeros(lvl.n_rows_pad, dtype=np.int32)
            par[: t.parent.shape[0]] = np.asarray(t.parent)
            # padded fine rows carry zero E blocks -> scatter zeros: harmless
            lvl.has_transfer = True
            params[li + 1]["E"] = jnp.asarray(E)
            # shard-nestedness: parent of every REAL local fine row lives
            # in the local coarse chunk -> transfers are communication-free
            r = np.arange(t.parent.shape[0])
            nested = bool(
                ((np.asarray(t.parent) // per_c) == (r // per_f)).all())
            lvl.nested_transfer = nested
            if nested:
                shard = np.arange(lvl.n_rows_pad) // per_f
                ploc = np.clip(par - shard * per_c, 0, per_c - 1)
                params[li + 1]["parent_local"] = jnp.asarray(
                    ploc.astype(np.int32))
                # padded inverse map for the gather-based restrict
                # (scatter .at[].add is the slow path on TPU): children
                # of each LOCAL coarse row, as LOCAL fine indices
                from polydeal_tpu.utils.grouping import padded_group_lists

                lab = ploc + shard * per_c  # global coarse row per fine
                members, _ = padded_group_lists(
                    lab, levels[li].n_rows_pad)
                mask = members >= 0
                local = np.where(
                    mask,
                    members - (np.arange(levels[li].n_rows_pad)
                               // per_c)[:, None] * per_f, 0)
                params[li + 1]["children"] = jnp.asarray(
                    local.astype(np.int32))
                params[li + 1]["children_mask"] = jnp.asarray(
                    mask.astype(np.asarray(t.E).dtype))
            else:
                params[li + 1]["parent"] = jnp.asarray(par)
        cdense = np.asarray(mg.matrices[0].to_dense())
        nb0 = mg.matrices[0].data.shape[-1]
        Pc_pad = levels[0].n_rows_pad * nb0
        full = np.eye(Pc_pad, dtype=cdense.dtype)
        full[: cdense.shape[0], : cdense.shape[1]] = cdense
        coarse_lu = jax.scipy.linalg.lu_factor(jnp.asarray(full))
        # this fallback path smooths every level identically; a per-level
        # schedule collapses to its finest entry (the dominant level)
        deg = mg.chebyshev_degree
        ns = mg.n_smooth
        return cls(mesh, levels, params, coarse_lu,
                   n_true_rows=mg.matrices[-1].n_block_rows,
                   chebyshev_degree=deg[-1] if isinstance(deg, tuple) else deg,
                   n_smooth=ns[-1] if isinstance(ns, tuple) else ns)

    def _in_specs(self):
        """PartitionSpec tree matching self.params: everything sharded."""
        return [
            {k: P(self.axis) for k in p} for p in self.params
        ]

    # ---- per-shard primitives (arrays below are LOCAL shards) ---------
    @property
    def n_dev(self) -> int:
        return self.mesh.devices.size

    def _halo_gather(self, lvl: ShardedLevel, pl, x_loc):
        """[per + n_halo, nb] = local rows followed by halo segments —
        one ppermute per neighbor distance, carrying only halo rows."""
        if not lvl.deltas:
            return x_loc
        n = self.n_dev
        segs = [x_loc]
        for t, delta in enumerate(lvl.deltas):
            buf = x_loc[pl[f"send{t}"]]
            perm = [(j, (j + delta) % n) for j in range(n)]
            segs.append(jax.lax.ppermute(buf, self.axis, perm))
        return jnp.concatenate(segs, axis=0)

    def _matvec(self, pl, lvl: ShardedLevel, x_loc):
        xg = self._halo_gather(lvl, pl, x_loc)
        y = jnp.einsum("kij,kj->ki", pl["data"], xg[pl["cols"]])
        return jax.ops.segment_sum(y, pl["lrows"],
                                   num_segments=lvl.rows_per_shard)

    def _dot(self, a, b):
        return jax.lax.psum(jnp.vdot(a, b), self.axis)

    def _smooth(self, lvl: ShardedLevel, pl, b_loc, x_loc):
        theta = 0.5 * (lvl.hi + lvl.lo)
        delta = 0.5 * (lvl.hi - lvl.lo)
        sigma = theta / delta
        dinv = pl["dinv"]
        for _ in range(self.n_smooth):
            r = b_loc - self._matvec(pl, lvl, x_loc)
            d = dinv * r / theta
            x_loc = x_loc + d
            rho_old = 1.0 / sigma
            for _ in range(self.chebyshev_degree - 1):
                rho = 1.0 / (2.0 * sigma - rho_old)
                r = b_loc - self._matvec(pl, lvl, x_loc)
                z = dinv * r
                d = (rho * rho_old) * d + (2.0 * rho / delta) * z
                x_loc = x_loc + d
                rho_old = rho
        return x_loc

    def _restrict(self, fine_pl, fine: ShardedLevel, coarse: ShardedLevel,
                  r_loc):
        contrib = jnp.einsum("pij,pi->pj", fine_pl["E"], r_loc)
        if fine.nested_transfer:
            # parents are shard-local, zero comm; the reduction is a
            # PADDED GATHER over each coarse row's children (a scatter
            # .at[].add would be the documented-slow TPU path)
            ch = fine_pl["children"]  # [per_c, C] local fine indices
            mask = fine_pl["children_mask"].astype(contrib.dtype)
            return jnp.einsum("cm,cmj->cj", mask, contrib[ch])
        partial_sum = jnp.zeros((coarse.n_rows_pad, contrib.shape[-1]),
                                dtype=contrib.dtype)
        partial_sum = partial_sum.at[fine_pl["parent"]].add(contrib)
        partial_sum = jax.lax.psum(partial_sum, self.axis)
        i = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice_in_dim(
            partial_sum, i * coarse.rows_per_shard, coarse.rows_per_shard
        )

    def _prolong(self, fine_pl, fine: ShardedLevel, xc_loc):
        if fine.nested_transfer:
            return jnp.einsum("pij,pj->pi", fine_pl["E"],
                              xc_loc[fine_pl["parent_local"]])
        xc_full = jax.lax.all_gather(xc_loc, self.axis, tiled=True)
        return jnp.einsum("pij,pj->pi", fine_pl["E"], xc_full[fine_pl["parent"]])

    def _coarse_solve(self, b_loc):
        b_full = jax.lax.all_gather(b_loc, self.axis, tiled=True)
        x = jax.scipy.linalg.lu_solve(self.coarse_lu, b_full.reshape(-1))
        xb = x.reshape(b_full.shape)
        i = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice_in_dim(xb, i * b_loc.shape[0],
                                            b_loc.shape[0])

    def _v_cycle(self, lv_params, level: int, b_loc):
        if level == 0:
            return self._coarse_solve(b_loc)
        lvl = self.levels[level]
        pl = lv_params[level]
        x = jnp.zeros_like(b_loc)
        x = self._smooth(lvl, pl, b_loc, x)
        r = b_loc - self._matvec(pl, lvl, x)
        rc = self._restrict(pl, lvl, self.levels[level - 1], r)
        xc = self._v_cycle(lv_params, level - 1, rc)
        x = x + self._prolong(pl, lvl, xc)
        x = self._smooth(lvl, pl, b_loc, x)
        return x

    # ------------------------------------------------------------------
    def solve_cg(self, b, rtol: float = 1e-9, maxiter: int = 100,
                 precondition: bool = True):
        """SPMD MG-CG solve.  b is a flat [n_dofs] array; returns
        (x [n_dofs], iterations, residual)."""
        fine = self.levels[-1]
        nb = self.params[-1]["data"].shape[-1]
        b_pad = jnp.asarray(_pad_vec(b, fine.n_rows_pad, nb))
        n_levels = len(self.levels)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(self.axis), self._in_specs()),
            out_specs=(P(self.axis), P(), P()),
        )
        def run(b_loc, lv):
            fine_pl = lv[-1]

            def Aop(v):
                return self._matvec(fine_pl, fine, v)

            def M(r):
                return (self._v_cycle(lv, n_levels - 1, r)
                        if precondition else r)

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
                cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32))
            )
            return x, k[None], jnp.sqrt(self._dot(r, r))[None]

        x, k, res = jax.jit(run)(b_pad, self.params)
        x = np.asarray(x).reshape(-1)[: self.n_true_rows * nb]
        return jnp.asarray(x), int(k[0]), float(res[0])
