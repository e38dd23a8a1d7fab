"""Block-sparse matrices with dense n_b × n_b blocks.

The DG system matrix on a polytopal mesh is block-regular: every nonzero
is an n_b×n_b dense block at (polytope row, polytope col) — diagonal
blocks plus one block per directed polytopal interface.  This replaces the
reference's Trilinos ``SparseMatrix`` + sparsity machinery (reference
source/agglomeration_handler.cc:910-1022) with a structure XLA maps
straight onto the MXU: SpMV = gather + batched small matmul + segment-sum.

Block index arrays are *static* (host numpy, sorted by row at build time);
only ``data`` is a traced device array, so jitted solvers treat the
sparsity as compile-time constant.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockMatrix", "BlockELL", "BlockBanded", "BlockPacked"]


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockMatrix:
    """Sorted block-COO matrix: data[k] sits at block (rows[k], cols[k])."""

    data: jnp.ndarray  # [nnz, n_b, n_b]
    rows: np.ndarray  # [nnz] static
    cols: np.ndarray  # [nnz] static
    n_block_rows: int
    n_block_cols: int

    # -- pytree plumbing (data is traced; indices are static aux) --------
    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (self.data,), (
            wrap_static(self.rows),
            wrap_static(self.cols),
            self.n_block_rows,
            self.n_block_cols,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        rows, cols, nbr, nbc = aux
        return cls(children[0], unwrap_static(rows), unwrap_static(cols), nbr, nbc)

    # --------------------------------------------------------------------
    @property
    def n_basis(self) -> int:
        return self.data.shape[-1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_block_rows * self.data.shape[1],
                self.n_block_cols * self.data.shape[2])

    @classmethod
    def from_blocks(cls, rows, cols, data, n_block_rows, n_block_cols=None):
        """Build from possibly-duplicated block entries: merges duplicates
        and sorts by (row, col) on the host."""
        if n_block_cols is None:
            n_block_cols = n_block_rows
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        key = rows * n_block_cols + cols
        uniq, inv = np.unique(key, return_inverse=True)
        merged = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(inv),
                                     num_segments=uniq.shape[0])
        return cls(
            data=merged,
            rows=(uniq // n_block_cols).astype(np.int64),
            cols=(uniq % n_block_cols).astype(np.int64),
            n_block_rows=n_block_rows,
            n_block_cols=n_block_cols,
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A @ x with x flat [n_cols] or blocked [n_block_cols, n_b]."""
        nb_r, nb_c = self.data.shape[1], self.data.shape[2]
        xb = x.reshape(self.n_block_cols, nb_c)
        gathered = xb[self.cols]  # [nnz, n_b_c]
        prod = jnp.einsum("kij,kj->ki", self.data, gathered)
        yb = jax.ops.segment_sum(prod, self.rows, num_segments=self.n_block_rows)
        return yb.reshape(-1) if x.ndim == 1 else yb

    def __matmul__(self, x):
        return self.matvec(x)

    def diag_blocks(self) -> jnp.ndarray:
        """[n_block_rows, n_b, n_b] diagonal blocks (zero if absent)."""
        mask = self.rows == self.cols
        idx = np.where(mask)[0]
        out = jnp.zeros((self.n_block_rows, self.data.shape[1], self.data.shape[2]),
                        dtype=self.data.dtype)
        return out.at[self.rows[idx]].set(self.data[idx])

    def diagonal(self) -> jnp.ndarray:
        """Flat main diagonal [n_rows]."""
        d = self.diag_blocks()
        return jnp.diagonal(d, axis1=1, axis2=2).reshape(-1)

    def to_dense(self) -> jnp.ndarray:
        nb_r, nb_c = self.data.shape[1], self.data.shape[2]
        out = jnp.zeros((self.n_block_rows, nb_r, self.n_block_cols, nb_c),
                        dtype=self.data.dtype)
        out = out.at[self.rows, :, self.cols, :].add(self.data)
        return out.reshape(self.n_block_rows * nb_r, self.n_block_cols * nb_c)

    def transpose(self) -> "BlockMatrix":
        order = np.lexsort((self.rows, self.cols))
        return BlockMatrix(
            data=jnp.swapaxes(self.data[order], 1, 2),
            rows=self.cols[order],
            cols=self.rows[order],
            n_block_rows=self.n_block_cols,
            n_block_cols=self.n_block_rows,
        )

    @property
    def T(self) -> "BlockMatrix":
        return self.transpose()

    def scale(self, alpha) -> "BlockMatrix":
        return BlockMatrix(self.data * alpha, self.rows, self.cols,
                           self.n_block_rows, self.n_block_cols)

    def banded_offsets(self) -> np.ndarray:
        return np.unique(self.cols - self.rows)

    def to_banded(self, max_offsets: int = 96) -> "BlockBanded | None":
        """Convert to the banded block format if the column-offset set is
        small (space-filling-curve orderings give O(few dozen) offsets).

        Returns None when the matrix has more than ``max_offsets`` distinct
        offsets — caller should fall back to ELL.  The scatter runs on the
        HOST: doing it in XLA materializes a [nnz, nb, nb] tile-padded
        intermediate (32x memory) that OOMs at ~10M blocks.
        """
        off = self.cols - self.rows
        uniq = np.unique(off)
        if uniq.shape[0] > max_offsets:
            return None
        nb = self.data.shape[-1]
        P = self.n_block_rows
        oidx = np.searchsorted(uniq, off)
        data = np.zeros((uniq.shape[0], nb, nb, P),
                        dtype=np.asarray(self.data).dtype)
        data[oidx, :, :, self.rows] = np.asarray(self.data)
        return BlockBanded(data=jnp.asarray(data),
                           offsets=uniq.astype(np.int64),
                           n_block_cols=self.n_block_cols)

    def to_banded_device(self, max_offsets: int = 96) -> "BlockBanded | None":
        """Banded conversion that runs ON DEVICE via a static gather map
        (no host round trip, no scatter): banded[o,i,j,p] =
        data[src[o,p], i, j] with src precomputed from the static
        sparsity.  Component-wise gathers keep every intermediate
        lane-aligned."""
        off = self.cols - self.rows
        uniq = np.unique(off)
        if uniq.shape[0] > max_offsets:
            return None
        nb_r, nb_c = self.data.shape[1], self.data.shape[2]
        P = self.n_block_rows
        n_off = uniq.shape[0]
        oidx = np.searchsorted(uniq, off)
        src = np.zeros((n_off, P), dtype=np.int64)
        mask = np.zeros((n_off, P), dtype=np.asarray(self.data).dtype
                        if not isinstance(self.data, jnp.ndarray)
                        else self.data.dtype)
        src[oidx, self.rows] = np.arange(self.rows.shape[0])
        mask[oidx, self.rows] = 1.0
        srcj = jnp.asarray(src.reshape(-1))
        maskj = jnp.asarray(mask.reshape(-1))
        pieces = [
            [
                (self.data[:, i, j][srcj] * maskj).reshape(n_off, 1, 1, P)
                for j in range(nb_c)
            ]
            for i in range(nb_r)
        ]
        # concatenate instead of stack+transpose: keeps the physical
        # layout canonical (P minor) in the jit output
        data = jnp.concatenate(
            [jnp.concatenate(row, axis=2) for row in pieces], axis=1
        )
        return BlockBanded(data=data, offsets=uniq.astype(np.int64),
                           n_block_cols=self.n_block_cols)

    def to_ell(self) -> "BlockELL":
        """Convert to block-ELL (fixed nonzeros per row).

        TPU-native SpMV layout: scatter-free.  DG flux sparsity is
        near-regular (diagonal + one block per polytopal neighbor), so row
        padding is small (pad blocks are zero, pointing at column 0).
        """
        counts = np.bincount(self.rows, minlength=self.n_block_rows)
        K = int(counts.max()) if counts.size else 1
        nb_r, nb_c = self.data.shape[1], self.data.shape[2]
        # position of each entry within its row (rows are sorted)
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos = np.arange(self.rows.shape[0]) - starts[self.rows]
        cols = np.zeros((self.n_block_rows, K), dtype=np.int32)
        cols[self.rows, pos] = self.cols
        data = jnp.zeros((self.n_block_rows, K, nb_r, nb_c),
                         dtype=self.data.dtype)
        data = data.at[self.rows, pos].set(self.data)
        return BlockELL(data=data, cols=cols,
                        n_block_cols=self.n_block_cols)

    def add(self, other: "BlockMatrix") -> "BlockMatrix":
        """Structural sum (merges sparsity patterns)."""
        assert self.n_block_rows == other.n_block_rows
        assert self.n_block_cols == other.n_block_cols
        rows = np.concatenate([self.rows, other.rows])
        cols = np.concatenate([self.cols, other.cols])
        data = jnp.concatenate([self.data, other.data], axis=0)
        return BlockMatrix.from_blocks(rows, cols, data,
                                       self.n_block_rows, self.n_block_cols)


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockELL:
    """Block-ELL matrix: every row holds exactly K n_b×n_b blocks.

    The scatter-free SpMV layout for TPU: y = einsum over a gathered
    [P, K, n_b] window of x — all dense, fully fused by XLA, no
    segment/scatter ops in the hot loop.  Padding blocks are zero and
    point at column 0.
    """

    data: jnp.ndarray  # [P, K, n_b, n_b]
    cols: np.ndarray  # [P, K] static int32
    n_block_cols: int

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (self.data,), (wrap_static(self.cols), self.n_block_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        return cls(children[0], unwrap_static(aux[0]), aux[1])

    @property
    def n_block_rows(self) -> int:
        return self.data.shape[0]

    @property
    def shape(self):
        return (self.data.shape[0] * self.data.shape[2],
                self.n_block_cols * self.data.shape[3])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nb_c = self.data.shape[3]
        xb = x.reshape(self.n_block_cols, nb_c)
        xg = xb[self.cols]  # [P, K, nb_c]
        yb = jnp.einsum("pkij,pkj->pi", self.data, xg)
        return yb.reshape(-1) if x.ndim == 1 else yb

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        P, K = self.cols.shape
        rows = np.arange(P)[:, None]
        is_diag = self.cols == rows  # [P, K]
        d = jnp.einsum("pk,pkii->pi", jnp.asarray(is_diag, self.data.dtype),
                       self.data)
        return d.reshape(-1)


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockBanded:
    """Banded block matrix: data[o, i, j, p] multiplies x[p + offsets[o], j].

    The TPU speed-of-light SpMV layout: the polytope axis P is LAST, so
    every array is lane-aligned (no (8,128) tile padding of tiny n_b×n_b
    blocks — the layout that makes block-ELL run at ~1% of HBM bandwidth),
    and the column access is a static *shift* (jnp.roll over lanes), not a
    gather.  Wrapped-around values are annihilated by the zero blocks
    stored at rows lacking that offset.  Valid whenever the distinct
    column-offset count is small — guaranteed ~(2dim+1) under the STR
    polytope ordering.
    """

    data: jnp.ndarray  # [n_off, nb, nb, P]
    offsets: np.ndarray  # [n_off] static int64
    n_block_cols: int
    # optional i-major flattened copy [nb*n_off*nb, P] (rows (i, k, j)):
    # the layout of the Pallas SpMV kernel (polydeal_tpu/ops/banded.py),
    # which streams matrix data at full HBM bandwidth.  Built by
    # with_imajor(); matvec_t uses it automatically on TPU.
    data_i: jnp.ndarray | None = None

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (self.data, self.data_i), (wrap_static(self.offsets),
                                          self.n_block_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        return cls(children[0], unwrap_static(aux[0]), aux[1], children[1])

    def with_imajor(self, drop_omajor: bool = False) -> "BlockBanded":
        """Attach the i-major copy used by the Pallas SpMV hot path.

        Each output row i owns a [R, P] slab (R = n_off*nb) padded to a
        multiple of 8 sublanes — Mosaic requires sublane slices at
        8-aligned offsets (f32).

        ``drop_omajor=True`` replaces ``data`` with a zero-length view
        (shape metadata kept, bytes freed) — use when only the Pallas
        matvec will run on this instance: at 10^7 DoF the duplicated
        band is ~1 GB of HBM."""
        n_off, nb = self.data.shape[0], self.data.shape[1]
        R = n_off * nb
        R_pad = -(-R // 8) * 8
        di = jnp.transpose(self.data, (1, 0, 2, 3)).reshape(nb, R, -1)
        if R_pad != R:
            di = jnp.pad(di, ((0, 0), (0, R_pad - R), (0, 0)))
        keep = self.data[:, :, :, :0] if drop_omajor else self.data
        return BlockBanded(keep, self.offsets, self.n_block_cols,
                           di.reshape(nb * R_pad, -1))

    def _pallas_ok(self) -> bool:
        import jax

        from polydeal_tpu.ops.banded import pallas_supported

        if self.data_i is None or jax.default_backend() != "tpu":
            return False
        n_off, nb = self.data.shape[0], self.data.shape[1]
        return pallas_supported(
            self.n_block_rows, n_off, nb,
            int(np.abs(self.offsets).max()) if self.offsets.size else 1,
            self.data.dtype.itemsize)

    @property
    def n_block_rows(self) -> int:
        # the o-major copy may be a zero-length view (drop_omajor)
        if self.data.shape[-1] == 0 and self.data_i is not None:
            return self.data_i.shape[-1]
        return self.data.shape[-1]

    @property
    def n_basis(self) -> int:
        return self.data.shape[1]

    @property
    def shape(self):
        nb = self.data.shape[1]
        return (self.n_block_rows * nb, self.n_block_cols * nb)

    def matvec_t(self, xt: jnp.ndarray) -> jnp.ndarray:
        """Transposed-layout SpMV: xt [nb, P] -> [nb, P].

        The zero-copy hot path: operands stay lane-aligned end to end —
        keep solver state in this layout to avoid the [P, nb] tile-padded
        round trips (each costs more than the SpMV itself)."""
        if self._pallas_ok():
            from polydeal_tpu.ops.banded import banded_matvec_t_imajor

            return banded_matvec_t_imajor(self.data_i, self.offsets,
                                          self.data.shape[1], xt)
        if self.data.shape[-1] == 0 and self.data_i is not None:
            # o-major copy was dropped (drop_omajor / layout='imajor')
            # and Pallas is unavailable (non-TPU backend): run the
            # i-major kernel in interpret mode rather than einsumming
            # over the zero-length o-major view (a shape error)
            from polydeal_tpu.ops.banded import banded_matvec_t_imajor

            return banded_matvec_t_imajor(self.data_i, self.offsets,
                                          self.data.shape[1], xt,
                                          interpret=True)
        y = jnp.zeros_like(xt)
        for k, o in enumerate(self.offsets):
            xs = jnp.roll(xt, -int(o), axis=1) if o != 0 else xt
            y = y + jnp.einsum("ijp,jp->ip", self.data[k], xs)
        return y

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nb = self.data.shape[1]
        P = self.data.shape[-1]
        xt = x.reshape(P, nb).T  # [nb, P]
        y = self.matvec_t(xt)
        return y.T.reshape(-1) if x.ndim == 1 else y.T

    def fused_cheb_ok(self) -> bool:
        """Fused smoothing needs the i-major copy + a valid lane tile."""
        if self.data_i is None:
            return False
        from polydeal_tpu.ops.banded import pick_tile

        return pick_tile(self.n_block_rows, self.data_i.shape[0],
                         self.data_i.dtype.itemsize) is not None

    def cheb_step_t(self, xt, dvec, b, dinv, c1, c2, *,
                    interpret: bool = False):
        """Fused Chebyshev step (ops/fused_cheb.py):
        d' = c1*d + c2*dinv*(b - A x); x' = x + d'.  dvec=None = first
        step.  Transposed [nb, P] layout throughout."""
        from polydeal_tpu.ops.fused_cheb import banded_cheb_step_t

        return banded_cheb_step_t(self.data_i, self.offsets, self.n_basis,
                                  xt, dvec, b, dinv, c1, c2,
                                  interpret=interpret)

    def residual_t(self, xt, b, *, interpret: bool = False):
        """Fused r = b - A x in the transposed layout."""
        from polydeal_tpu.ops.fused_cheb import banded_residual_t

        return banded_residual_t(self.data_i, self.offsets, self.n_basis,
                                 xt, b, interpret=interpret)

    def __matmul__(self, x):
        return self.matvec(x)

    def to_dense(self) -> jnp.ndarray:
        """Dense matrix (use on small/coarse levels only)."""
        P, nb = self.n_block_rows, self.n_basis
        out = jnp.zeros((P, nb, P, nb), dtype=self.data.dtype)
        for k, o in enumerate(self.offsets):
            o = int(o)
            p = np.arange(max(0, -o), min(P, P - o))
            if p.size:
                blocks = jnp.moveaxis(self.data[k][:, :, p], -1, 0)
                out = out.at[p, :, p + o, :].add(blocks)
        return out.reshape(P * nb, P * nb)

    def diagonal_t(self) -> jnp.ndarray:
        """Diagonal in transposed layout [nb, P]."""
        k0 = int(np.searchsorted(self.offsets, 0))
        nb = self.data.shape[1]
        if self.data.shape[-1] == 0 and self.data_i is not None:
            # o-major copy dropped (drop_omajor): read the i-major rows
            # (i, k0, i) instead of silently returning a 0-length view
            if k0 >= self.offsets.shape[0] or self.offsets[k0] != 0:
                return jnp.zeros((nb, self.data_i.shape[-1]),
                                 dtype=self.data_i.dtype)
            R_pad = self.data_i.shape[0] // nb
            return jnp.stack([self.data_i[i * R_pad + k0 * nb + i]
                              for i in range(nb)], axis=0)
        if k0 >= self.offsets.shape[0] or self.offsets[k0] != 0:
            return jnp.zeros((nb, self.data.shape[-1]), dtype=self.data.dtype)
        return jnp.stack([self.data[k0, i, i, :] for i in range(nb)], axis=0)

    def diag_blocks(self) -> jnp.ndarray:
        """[P, nb, nb] diagonal blocks (block-Jacobi input)."""
        k0 = int(np.searchsorted(self.offsets, 0))
        nb, P = self.data.shape[1], self.n_block_rows
        if k0 >= self.offsets.shape[0] or self.offsets[k0] != 0:
            return jnp.zeros((P, nb, nb), dtype=self.data.dtype)
        if self.data.shape[-1] == 0 and self.data_i is not None:
            R_pad = self.data_i.shape[0] // nb
            blk = jnp.stack(
                [jnp.stack([self.data_i[i * R_pad + k0 * nb + j]
                            for j in range(nb)], axis=0)
                 for i in range(nb)], axis=0)  # [nb, nb, P]
            return jnp.moveaxis(blk, -1, 0)
        return jnp.moveaxis(self.data[k0], -1, 0)

    def add_to_diagonal_band(self, blocks_t: jnp.ndarray) -> "BlockBanded":
        """New BlockBanded with ``blocks_t`` [nb, nb, P] added to the
        offset-0 band row (e.g. a scaled mass matrix)."""
        k0 = int(np.searchsorted(self.offsets, 0))
        assert self.offsets[k0] == 0, "band has no diagonal row"
        data = self.data.at[k0].add(blocks_t.astype(self.data.dtype))
        # any i-major copy is stale after the update — drop it
        return BlockBanded(data, self.offsets, self.n_block_cols, None)

    def diagonal(self) -> jnp.ndarray:
        k0 = int(np.searchsorted(self.offsets, 0))
        if k0 >= self.offsets.shape[0] or self.offsets[k0] != 0:
            return jnp.zeros(self.shape[0], dtype=self.data.dtype)
        if self.data.shape[-1] == 0 and self.data_i is not None:
            return self.diagonal_t().T.reshape(-1)
        nb = self.data.shape[1]
        d = jnp.stack([self.data[k0, i, i, :] for i in range(nb)], axis=1)
        return d.reshape(-1)  # [P, nb] -> flat

    def to_packed(self, plan, oid, far_rows=None,
                  far_cols=None) -> "BlockPacked":
        """Pack the wide band into the per-lane K-slot format (see
        ops/packed.py): jit-safe — ``oid`` [K, P] int32 is a device
        array; masks are computed in-graph, never baked as constants.

        The dense band stores one [nb, nb, P] row per offset even though
        each lane touches only ~2dim+1 of the n_off offsets; packing
        recovers the wasted SpMV bandwidth (5.3x at the 3D R-tree leaf
        level).  ``far_rows/far_cols`` (from ops.packed.build_pack_plan)
        are the |offset| > T tail, extracted as block-COO.
        """
        nb = self.data.shape[1]
        P = self.n_block_rows
        K, R_pad = plan.K, plan.R_pad
        # per-slot masked selection of band rows (offsets in one slot are
        # conflict-free: at most one is active per lane)
        slabs = []  # i-major rows (i, k, j)
        packed_k = []
        for k in range(K):
            acc = jnp.zeros((nb, nb, P), dtype=self.data.dtype)
            for o_idx in plan.slots[k]:
                o = plan.offsets[o_idx]
                b_idx = int(np.searchsorted(self.offsets, o))
                assert self.offsets[b_idx] == o, "plan offset not in band"
                mask = (oid[k] == o_idx)[None, None, :]
                acc = jnp.where(mask, self.data[b_idx], acc)
            packed_k.append(acc)
        for i in range(nb):
            slab = jnp.concatenate([pk[i] for pk in packed_k], axis=0)
            if R_pad != K * nb:
                slab = jnp.concatenate(
                    [slab, jnp.zeros((R_pad - K * nb, P),
                                     dtype=slab.dtype)], axis=0)
            slabs.append(slab)
        data_i = jnp.concatenate(slabs, axis=0)  # [nb*R_pad, P]
        far_data = None
        if far_rows is not None and far_rows.size:
            foffs = far_cols - far_rows  # sorted by (offset, row)
            chunks = []
            for o in np.unique(foffs):
                b_idx = int(np.searchsorted(self.offsets, o))
                assert self.offsets[b_idx] == o, "far offset not in band"
                rows_o = far_rows[foffs == o]
                chunks.append(jnp.moveaxis(
                    self.data[b_idx][:, :, rows_o], -1, 0))
            far_data = jnp.concatenate(chunks, axis=0)  # [n_far, nb, nb]
        return BlockPacked(data_i=data_i, oid=oid, plan=plan,
                           far_data=far_data, far_rows=far_rows,
                           far_cols=far_cols)


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockPacked:
    """Per-lane packed banded block matrix (see ops/packed.py).

    ``data_i`` [nb * R_pad, P] i-major packed slabs; ``oid`` [K, P]
    int32 device array (which offset each slot holds per lane, -1 =
    inactive); ``plan`` static coloring metadata; far_* the block-COO
    tail of offsets beyond the kernel window (<1% of blocks under an
    SFC ordering).
    """

    data_i: jnp.ndarray
    oid: jnp.ndarray
    plan: object  # ops.packed.PackPlan (static)
    far_data: jnp.ndarray | None = None  # [n_far, nb, nb]
    far_rows: np.ndarray | None = None  # static
    far_cols: np.ndarray | None = None  # static

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static

        return (self.data_i, self.oid, self.far_data), (
            self.plan, wrap_static(self.far_rows),
            wrap_static(self.far_cols))

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static

        return cls(children[0], children[1], aux[0], children[2],
                   unwrap_static(aux[1]), unwrap_static(aux[2]))

    @property
    def data(self):  # dtype carrier
        return self.data_i

    @property
    def n_basis(self) -> int:
        return self.plan.nb

    @property
    def n_block_rows(self) -> int:
        return self.data_i.shape[-1]

    @property
    def n_block_cols(self) -> int:
        return self.data_i.shape[-1]

    @property
    def shape(self):
        n = self.plan.nb * self.data_i.shape[-1]
        return (n, n)

    def astype(self, dtype) -> "BlockPacked":
        fd = None if self.far_data is None else self.far_data.astype(dtype)
        return BlockPacked(self.data_i.astype(dtype), self.oid, self.plan,
                           fd, self.far_rows, self.far_cols)

    def repack(self, plan2, oid2, far_rows=None,
               far_cols=None) -> "BlockPacked":
        """Re-slot under a new plan (e.g. a tighter near/far split for a
        sharded halo) WITHOUT materializing the dense band: each new slot
        row is a masked per-lane selection of the old slot row holding
        the same offset, and the far tail gathers old rows directly.
        Memory stays O(pack) — the to_banded() round-trip would allocate
        the n_off-row dense band (5x+ the pack at wide-offset levels).

        Requires a full-coloring source (no existing far tail); the new
        plan's offsets must be a subset of the old plan's (same
        sparsity, re-split)."""
        assert self.far_data is None, (
            "repack expects a full-coloring source pack")
        plan1 = self.plan
        nb, P = plan1.nb, self.n_block_rows
        R1, R2 = plan1.R_pad, plan2.R_pad
        K2 = plan2.K
        old_slot = {}
        for k1, idxs in enumerate(plan1.slots):
            for o_idx in idxs:
                old_slot[plan1.offsets[o_idx]] = k1
        di = self.data_i

        def _old_block(o):
            """[nb, nb, P] old rows (i, k1(o), j): holds THE block of
            offset o wherever o is active at a lane (other lanes carry a
            sibling offset's block — masked by the caller)."""
            k1 = old_slot[o]
            return jnp.stack(
                [jax.lax.dynamic_slice_in_dim(di, i * R1 + k1 * nb, nb, 0)
                 for i in range(nb)], axis=0)

        packed_k = []
        for k2 in range(K2):
            acc = jnp.zeros((nb, nb, P), dtype=di.dtype)
            for o2_idx in plan2.slots[k2]:
                o = plan2.offsets[o2_idx]
                mask = (oid2[k2] == o2_idx)[None, None, :]
                acc = jnp.where(mask, _old_block(o), acc)
            packed_k.append(acc)
        slabs = []
        for i in range(nb):
            slab = jnp.concatenate([pk[i] for pk in packed_k], axis=0)
            if R2 != K2 * nb:
                slab = jnp.concatenate(
                    [slab, jnp.zeros((R2 - K2 * nb, P),
                                     dtype=slab.dtype)], axis=0)
            slabs.append(slab)
        data_i2 = jnp.concatenate(slabs, axis=0)
        far_data = None
        if far_rows is not None and far_rows.size:
            foffs = np.asarray(far_cols) - np.asarray(far_rows)
            chunks = []
            for o in np.unique(foffs):  # (offset, row) order — matches
                rows_o = np.asarray(far_rows)[foffs == o]  # to_packed
                blk = _old_block(int(o))
                chunks.append(jnp.moveaxis(blk[:, :, rows_o], -1, 0))
            far_data = jnp.concatenate(chunks, axis=0)
        return BlockPacked(data_i2, oid2, plan2, far_data,
                           far_rows, far_cols)

    def matvec_t(self, xt: jnp.ndarray) -> jnp.ndarray:
        from polydeal_tpu.ops.packed import packed_matvec_t

        interpret = jax.default_backend() != "tpu"
        y = packed_matvec_t(self.data_i, self.oid, self.plan, xt,
                            interpret=interpret)
        if self.far_data is not None and self.far_rows.size:
            # far tail: tiny block-COO (gather + segment-sum in the flat
            # layout; <1% of blocks so layout conversions are cheap)
            acc = xt.dtype if xt.dtype == jnp.float64 else jnp.float32
            g = xt.T.astype(acc)[jnp.asarray(self.far_cols)]  # [n_far, nb]
            prod = jnp.einsum("kij,kj->ki", self.far_data.astype(acc), g)
            yb = jax.ops.segment_sum(prod, jnp.asarray(self.far_rows),
                                     num_segments=xt.shape[-1])
            y = y + yb.T.astype(y.dtype)
        return y

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        nb = self.plan.nb
        P = self.data_i.shape[-1]
        xt = x.reshape(P, nb).T
        y = self.matvec_t(xt)
        return y.T.reshape(-1) if x.ndim == 1 else y.T

    def fused_cheb_ok(self) -> bool:
        """Fused smoothing covers full-coloring packs only (an explicit
        far block-COO tail would be missing from the kernel's A-apply)."""
        from polydeal_tpu.ops.packed import pick_tile_packed

        return self.far_data is None and pick_tile_packed(
            self.n_block_rows, self.plan.nb * self.plan.R_pad,
            self.data_i.dtype.itemsize) is not None

    def cheb_step_t(self, xt, dvec, b, dinv, c1, c2, *,
                    interpret: bool = False):
        """Fused Chebyshev step (ops/fused_cheb.py) — see
        BlockBanded.cheb_step_t."""
        from polydeal_tpu.ops.fused_cheb import packed_cheb_step_t

        return packed_cheb_step_t(self.data_i, self.oid, self.plan, xt,
                                  dvec, b, dinv, c1, c2,
                                  interpret=interpret)

    def residual_t(self, xt, b, *, interpret: bool = False):
        """Fused r = b - A x in the transposed layout."""
        from polydeal_tpu.ops.fused_cheb import packed_residual_t

        return packed_residual_t(self.data_i, self.oid, self.plan, xt, b,
                                 interpret=interpret)

    def __matmul__(self, x):
        return self.matvec(x)

    def to_banded(self) -> "BlockBanded":
        """Exact unpack back to the dense band (per-slot masked
        expansion).  Used by the sharded builder to REPACK with an
        explicit near/far split when this pack's plan holds far offsets
        (their global-roll windows are invalid on shards)."""
        assert self.far_data is None, "unpack with an explicit far tail"
        plan = self.plan
        nb, R_pad, P = plan.nb, plan.R_pad, self.data_i.shape[-1]
        rows = []
        for o_idx in range(len(plan.offsets)):
            (k,) = [s for s, sl in enumerate(plan.slots) if o_idx in sl]
            mask = (self.oid[k] == o_idx)[None, None, :]
            blk = jnp.stack(
                [jnp.stack([self.data_i[i * R_pad + k * nb + j]
                            for j in range(nb)], axis=0)
                 for i in range(nb)], axis=0)  # [nb, nb, P]
            rows.append(jnp.where(mask, blk, 0.0))
        return BlockBanded(
            data=jnp.stack(rows, axis=0),
            offsets=np.asarray(plan.offsets, dtype=np.int64),
            n_block_cols=self.n_block_cols)

    def sparsity_pairs(self):
        """(src, dst) directed block pairs of this pack (host numpy),
        including any explicit far tail — enough to rebuild a plan."""
        oid = np.asarray(self.oid)
        offs = np.asarray(self.plan.offsets)
        ks, ps = np.nonzero(oid >= 0)
        src = ps.astype(np.int64)
        dst = src + offs[oid[ks, ps]]
        if self.far_rows is not None and self.far_rows.size:
            src = np.concatenate([src, np.asarray(self.far_rows)])
            dst = np.concatenate([dst, np.asarray(self.far_cols)])
        keep = src != dst
        return src[keep], dst[keep]

    def diagonal_t(self) -> jnp.ndarray:
        """[nb, P].  Offset 0 is present on every lane, so it conflicts
        with every other offset and the coloring necessarily gives it a
        slot of its own — the diagonal is a static row read."""
        plan = self.plan
        o0 = plan.offsets.index(0)
        (s0,) = [k for k, s in enumerate(plan.slots) if o0 in s]
        assert plan.slots[s0] == (o0,), "offset 0 must be alone in its slot"
        nb, R_pad = plan.nb, plan.R_pad
        return jnp.concatenate(
            [self.data_i[i * R_pad + s0 * nb + i][None, :]
             for i in range(nb)], axis=0)

    def diagonal(self) -> jnp.ndarray:
        return self.diagonal_t().T.reshape(-1)
