"""Smoothed-aggregation algebraic multigrid (the AMG comparison arm).

The reference compares its polytopal multigrid (R3MG) against Trilinos
ML/AMG on the same assembled SIPG system
(``/root/reference/examples/agglo_amg.cc:1473-1530``, the ``CHECK_AMG``
branch).  Trilinos has no JAX equivalent, so this module implements the
same algorithm family from scratch: Vanek-style smoothed aggregation
[Vanek, Mandel, Brezina 1996] built purely from the assembled matrix —
no geometry, no agglomeration hierarchy.

Design split (mirrors the rest of the package):

- **Setup on host** (numpy/scipy): strength graph, greedy aggregation,
  tentative prolongator from near-null-space candidates (batched QR per
  aggregate), prolongator smoothing, Galerkin triple products.  The
  reference's AMG setup is likewise a host-side Trilinos call; setup
  cost is not the benchmarked quantity.
- **Solve on device** (jit): every level's operator and prolongator is a
  :class:`~polydeal_tpu.sparse.BlockMatrix` (block-COO SpMV), smoothing
  is the shared :class:`ChebyshevSmoother` with point-Jacobi, the coarse
  solve is an explicit dense inverse (one MXU matmul — see
  ``Multigrid.coarse_lu``).  The whole V-cycle and the CG around it jit
  into one XLA program.

Aggregation runs on the **block graph** (one node per polytope at the
finest level, per aggregate below; edge strength = Frobenius norm of the
off-diagonal block) — the standard SA treatment of systems with known
dof blocking.  ``nullspace`` carries the near-null-space candidates:
1 column (the constant — ML's default; cf.
``FE_AggloDGP::get_constant_modes``,
``/root/reference/source/fe_agglodgp.cc:270-280``) or several (e.g. the
per-block modal identity, which enriches the coarse space — useful on
DG systems where constants-only SA coarsens the dof count by
(2^dim * n_basis) at once).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from polydeal_tpu.solvers.cg import CGResult, cg_solve
from polydeal_tpu.solvers.chebyshev import ChebyshevSmoother
from polydeal_tpu.sparse import BlockMatrix

__all__ = ["AMG", "build_amg", "constant_nullspace", "block_nullspace"]


def constant_nullspace(ah) -> np.ndarray:
    """[n_dofs, 1] coefficients of the constant function 1 in the
    handler's basis — the near-null-space of the SIPG Laplacian.

    Basis-agnostic: solves the least-squares fit of 1 at sample points
    (modal Legendre -> e_0 / phi_0, since only the first mode is
    constant; nodal DGQ -> all-ones).
    """
    nb = ah.n_basis
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(2 * nb + 4, ah.dim))
    Bm = np.asarray(ah.basis.eval(jnp.asarray(pts)))  # [n_pts, nb]
    v, *_ = np.linalg.lstsq(Bm, np.ones(Bm.shape[0]), rcond=None)
    v[np.abs(v) < 1e-10 * np.max(np.abs(v))] = 0.0
    return np.tile(v, ah.n_poly)[:, None]


def block_nullspace(ah) -> np.ndarray:
    """[n_dofs, n_basis] per-block identity candidates: the coarse space
    keeps every modal component per aggregate (richer than constants;
    the algebraic cousin of the geometric injection
    ``Utils::fill_injection_matrix``, reference ``utils.h:190-239``)."""
    nb = ah.n_basis
    return np.tile(np.eye(nb), (ah.n_poly, 1))


def _strength_graph(M, nb: int, theta: float):
    """CSR (indptr, indices) of strong off-diagonal block connections of
    a scipy CSR matrix viewed in nb x nb blocks:
    ||A_ij||_F >= theta * sqrt(||A_ii||_F ||A_jj||_F)."""
    import scipy.sparse as sp

    bsr = M.tobsr((nb, nb))
    n = M.shape[0] // nb
    fro = np.linalg.norm(bsr.data.reshape(bsr.data.shape[0], -1), axis=1)
    indptr, indices = bsr.indptr, bsr.indices
    rows = np.repeat(np.arange(n), np.diff(indptr))
    cols = indices
    diag = np.zeros(n)
    on_diag = rows == cols
    diag[rows[on_diag]] = fro[on_diag]
    off = ~on_diag
    keep = fro[off] >= theta * np.sqrt(
        np.maximum(diag[rows[off]] * diag[cols[off]], 1e-300))
    g = sp.csr_matrix(
        (np.ones(int(keep.sum())), (rows[off][keep], cols[off][keep])),
        shape=(n, n))
    g = (g + g.T).tocsr()  # symmetrize
    return g.indptr, g.indices


def _aggregate(indptr: np.ndarray, indices: np.ndarray, n: int) -> np.ndarray:
    """Vanek greedy aggregation on the strength graph -> label per node.

    Pass 1: untouched nodes whose strong neighborhood is untouched seed
    an aggregate with that whole neighborhood.  Pass 2: remaining nodes
    join an adjacent aggregate.  Pass 3: leftovers form their own.

    Native C++ (csrc ``pd_sa_aggregate``) when available — the greedy
    passes are inherently sequential and interpreter-bound at 10^5+
    nodes; the numpy loop below is the exact-semantics fallback.
    """
    from polydeal_tpu import native

    lab = native.sa_aggregate(indptr, indices)
    if lab is not None:
        return lab
    label = np.full(n, -1, dtype=np.int64)
    n_agg = 0
    for i in range(n):
        if label[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if np.all(label[nbrs] == -1):
            label[i] = n_agg
            label[nbrs] = n_agg
            n_agg += 1
    for i in range(n):
        if label[i] != -1:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        tagged = nbrs[label[nbrs] != -1]
        if tagged.size:
            label[i] = label[tagged[0]]
    for i in range(n):
        if label[i] == -1:
            label[i] = n_agg
            n_agg += 1
    return label


def _tentative(full_label: np.ndarray, B: np.ndarray, n_agg: int):
    """Tentative prolongator from candidates: per aggregate, reduced QR
    of the aggregate's rows of B (batched over aggregates with padding).
    Returns (P_hat CSR [N, n_agg*nc], B_coarse [n_agg*nc, nc])."""
    import scipy.sparse as sp

    N, nc = B.shape
    order = np.argsort(full_label, kind="stable")
    counts = np.bincount(full_label, minlength=n_agg)
    m_max = int(counts.max())
    starts = np.zeros(n_agg + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # padded member table [n_agg, m_max] (pad = repeat of slot 0: its Q
    # rows are overwritten by the mask below)
    pad = np.zeros((n_agg, m_max), dtype=np.int64)
    mask = np.zeros((n_agg, m_max), dtype=bool)
    ar = np.arange(m_max)
    mask[:] = ar[None, :] < counts[:, None]
    flat_pos = np.minimum(starts[:-1, None] + ar[None, :], N - 1)
    pad = order[flat_pos]
    Bp = B[pad] * mask[:, :, None]  # [n_agg, m_max, nc]
    Q, R = np.linalg.qr(Bp)  # reduced: Q [n_agg, m_max, nc], R [nc, nc]
    # zero-padded rows of Bp give zero rows of Q when R is nonsingular
    rows = pad[mask].repeat(nc)
    cols = ((np.arange(n_agg) * nc)[:, None, None]
            + np.arange(nc)[None, None, :])
    cols = np.broadcast_to(cols, Q.shape)[mask].reshape(-1)
    vals = Q[mask].reshape(-1)
    P_hat = sp.csr_matrix((vals, (rows, cols)), shape=(N, n_agg * nc))
    B_coarse = R.reshape(n_agg * nc, nc)
    return P_hat, B_coarse


def _csr_to_block(M, bs: int, dtype) -> BlockMatrix:
    """Device BlockMatrix (bs x bs blocks) from a scipy CSR."""
    bsr = M.tobsr((bs, bs))
    rows = np.repeat(np.arange(M.shape[0] // bs), np.diff(bsr.indptr))
    return BlockMatrix.from_blocks(
        rows, bsr.indices, jnp.asarray(bsr.data, dtype=dtype),
        n_block_rows=M.shape[0] // bs, n_block_cols=M.shape[1] // bs)


@jax.tree_util.register_pytree_node_class
@dataclass
class AMG:
    """Device-side SA-AMG V-cycle (use :func:`build_amg` to construct).

    Levels are ordered coarse -> fine like :class:`Multigrid`; ``Ps[l]``
    prolongates level l <- level l-1 (None at l=0), [lo, hi] is the
    Chebyshev target interval of the Jacobi-preconditioned spectrum.
    """

    As: list
    Ps: list
    Pts: list
    dinvs: list
    los: list
    his: list
    coarse_inv: jnp.ndarray
    chebyshev_degree: int = 3
    n_smooth: int = 1

    def tree_flatten(self):
        dyn = (self.As, self.Ps, self.Pts, self.dinvs, self.coarse_inv)
        return dyn, (tuple(self.los), tuple(self.his),
                     self.chebyshev_degree, self.n_smooth)

    @classmethod
    def tree_unflatten(cls, aux, dyn):
        los, his, deg, ns = aux
        As, Ps, Pts, dinvs, cinv = dyn
        return cls(As, Ps, Pts, dinvs, list(los), list(his), cinv,
                   chebyshev_degree=deg, n_smooth=ns)

    @property
    def n_levels(self) -> int:
        return len(self.As)

    def _smoother(self, level):
        A, dinv = self.As[level], self.dinvs[level]
        return ChebyshevSmoother(
            A=A.matvec, Minv=lambda r, d=dinv: d * r,
            lo=self.los[level], hi=self.his[level],
            degree=self.chebyshev_degree)

    def _cycle(self, level: int, b: jnp.ndarray) -> jnp.ndarray:
        if level == 0:
            return (self.coarse_inv @ b.astype(self.coarse_inv.dtype)
                    ).astype(b.dtype)
        sm = self._smoother(level)
        x = jnp.zeros_like(b)
        for _ in range(self.n_smooth):
            x = sm(b, x)
        r = b - self.As[level].matvec(x)
        rc = self.Pts[level].matvec(r)
        x = x + self.Ps[level].matvec(self._cycle(level - 1, rc))
        for _ in range(self.n_smooth):
            x = sm(b, x)
        return x

    def v_cycle(self, b: jnp.ndarray) -> jnp.ndarray:
        return self._cycle(self.n_levels - 1, b)

    def solve_cg(self, b: jnp.ndarray, rtol: float = 1e-9,
                 maxiter: int = 300) -> CGResult:
        # self enters as a pytree ARGUMENT of a module-level cached jit:
        # closure capture would inline every level matrix as a
        # compile-time constant, and a fresh jax.jit(lambda) per call
        # would re-compile the whole program on every solve
        return _amg_solve_cg(self, b, rtol, maxiter)


@functools.partial(jax.jit, static_argnames=("rtol", "maxiter"))
def _amg_solve_cg(amg: AMG, b, rtol: float, maxiter: int) -> CGResult:
    return cg_solve(amg.As[-1].matvec, b, M=amg.v_cycle,
                    rtol=rtol, maxiter=maxiter)


def build_amg(
    A: BlockMatrix,
    nullspace: np.ndarray | None = None,
    theta: float = 0.02,
    omega_scale: float = 4.0 / 3.0,
    coarse_max: int = 800,
    max_levels: int = 12,
    chebyshev_degree: int = 4,
    n_smooth: int = 2,
    smoothing_range: float = 15.0,
) -> AMG:
    """Host-side SA-AMG setup on an assembled block matrix.

    Parity target: the Trilinos-ML preconditioner the reference
    benchmarks against (``agglo_amg.cc:1473-1530``) — smoothed
    aggregation with Chebyshev smoothing and drop tolerance ``theta``.
    ``nullspace`` is [n_dofs] or [n_dofs, nc] (default all-ones —
    correct for nodal bases; use :func:`constant_nullspace` /
    :func:`block_nullspace` for modal spaces).
    """
    import scipy.sparse as sp

    dtype = A.data.dtype
    fine_block = A
    M = _to_csr(A)
    if nullspace is None:
        B = np.ones((M.shape[0], 1))
    else:
        B = np.asarray(nullspace, dtype=np.float64)
        if B.ndim == 1:
            B = B[:, None]
    if B.shape[0] != M.shape[0]:
        raise ValueError(
            f"nullspace has {B.shape[0]} rows for {M.shape[0]} dofs")
    nc = B.shape[1]
    if nc > A.n_basis:
        raise ValueError(
            f"{nc} candidates exceed the fine block size {A.n_basis}")

    host_As = [M]
    host_Ps = []
    host_lams = []  # lam_max(D^-1 A) per host level, reused for Chebyshev
    nb_cur = A.n_basis
    while (host_As[-1].shape[0] > coarse_max
           and len(host_As) < max_levels):
        Mcur = host_As[-1]
        n_nodes = Mcur.shape[0] // nb_cur
        indptr, indices = _strength_graph(Mcur, nb_cur, theta)
        label = _aggregate(indptr, indices, n_nodes)
        n_agg = int(label.max()) + 1
        if n_agg >= n_nodes:  # aggregation stalled (diagonal matrix)
            break
        P_hat, B = _tentative(np.repeat(label, nb_cur), B, n_agg)
        # smooth: P = (I - omega D^-1 A) P_hat, omega = omega_scale/lam
        dinv = 1.0 / Mcur.diagonal()
        DA = sp.diags(dinv) @ Mcur
        lam = _power_lambda_max(DA)
        host_lams.append(lam)
        P = (P_hat - (omega_scale / lam) * (DA @ P_hat)).tocsr()
        Mc = (P.T @ Mcur @ P).tocsr()
        Mc.eliminate_zeros()
        host_As.append(Mc)
        host_Ps.append(P)
        nb_cur = nc  # every coarser level has nc dofs per aggregate

    # ---- device build (coarse -> fine) --------------------------------
    As, Ps, Pts, dinvs, los, his = [], [], [], [], [], []
    n_lv = len(host_As)
    coarse_inv = None
    for l in range(n_lv):
        h = n_lv - 1 - l  # host level index (0 = fine)
        hA = host_As[h]
        if l == n_lv - 1:
            As.append(fine_block)  # keep the fast block SpMV on the fine level
        else:
            As.append(_csr_to_block(hA, nc, dtype))
        d = hA.diagonal()
        dinvs.append(jnp.asarray(1.0 / d, dtype=dtype))
        if l == 0:
            # the coarsest level is solved directly — its Chebyshev
            # interval is never used (placeholder keeps lists aligned)
            los.append(0.0)
            his.append(1.0)
        else:
            lam = host_lams[h]  # computed during coarsening, reused here
            los.append(float(lam) / smoothing_range)
            his.append(float(lam) * 1.1)
        if l == 0:
            Ps.append(None)
            Pts.append(None)
            coarse_inv = jnp.asarray(
                np.linalg.inv(np.asarray(hA.todense())), dtype=dtype)
        else:
            hP = host_Ps[n_lv - 1 - l]
            Ps.append(_csr_to_block(hP, 1, dtype))
            Pts.append(_csr_to_block(hP.T.tocsr(), 1, dtype))
    return AMG(As, Ps, Pts, dinvs, los, his, coarse_inv,
               chebyshev_degree=chebyshev_degree, n_smooth=n_smooth)


def _to_csr(A: BlockMatrix):
    import scipy.sparse as sp

    nb = A.n_basis
    data = np.asarray(A.data, dtype=np.float64)
    order = np.lexsort((A.cols, A.rows))  # BSR needs row-sorted entries
    rows, cols, data = A.rows[order], A.cols[order], data[order]
    indptr = np.searchsorted(rows, np.arange(A.n_block_rows + 1))
    return sp.bsr_matrix(
        (data, cols, indptr),
        shape=(A.n_block_rows * nb, A.n_block_cols * nb)).tocsr()


def _power_lambda_max(M, iters: int = 30) -> float:
    n = M.shape[0]
    v = np.sin(np.arange(1, n + 1, dtype=np.float64))
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = M @ v
        lam = float(np.linalg.norm(w))
        v = w / max(lam, 1e-300)
    return lam
