"""Polytopal (agglomerated) multigrid — the R3MG method, TPU-native.

Rebuild of the reference's multilevel stack (reference
include/multigrid_amg.h, include/utils.h:95-270, source/multigrid_amg.cc,
examples/agglo_amg.cc:1089-1414) with the pointer/Trilinos machinery
replaced by three array facts:

1. **Transfers are block-diagonal-by-parent.**  Every fine polytope has
   exactly one coarse parent (the R-tree hierarchy), so the injection
   matrix P of the reference (``Utils::fill_injection_matrix``,
   utils.h:95-270) is one dense n_b×n_b block per fine polytope:
   prolongation = gather(parent) + batched matmul; restriction =
   batched matmulᵀ + segment-sum.  No sparse matrix needed.

2. **Embeddings are exact.**  A coarse-bbox polynomial restricted to a
   child bbox is still a degree-p polynomial (affine∘affine), so the
   block E_c solves M_ref E_c = R_c with R_c computed by Gauss quadrature
   — exact, and the identity M_ref = I holds for the orthonormal modal
   basis.  This also covers the reference's "last embedding" to the
   background DG space (poly_utils.h:1469-1634): the finest level is just
   the trivial agglomeration (one cell per polytope).

3. **Galerkin products collapse to segment-sums.**  A_c(I,J) =
   Σ_{parent(i)=I, parent(j)=J} E_iᵀ A_ij E_j — a batched triple matmul
   over the fine level's nonzero blocks merged by parent pair, replacing
   the reference's Trilinos mmult/Tmmult chains
   (multigrid_amg.h:274-305).

The V-cycle (Chebyshev pre/post smoothing, dense LU coarse solve) is one
jitted function; CG preconditioned with it is the flagship solve
(examples/agglo_amg.cc:1408-1414).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from polydeal_tpu.fem.quadrature import tensor_gauss
from polydeal_tpu.handler import AgglomerationHandler
from polydeal_tpu.sparse import BlockMatrix
from polydeal_tpu.solvers.chebyshev import ChebyshevSmoother, estimate_lambda_max
from polydeal_tpu.solvers.cg import cg_solve, CGResult

__all__ = [
    "build_structured_hierarchy",
    "build_embedding",
    "galerkin_coarsen",
    "Transfer",
    "Multigrid",
    "build_rtree_hierarchy",
    "relabel_band_minimizing",
    "detect_grid_shapes",
    "maybe_pack_level",
    "build_field_block_multigrid",
]


def build_embedding(
    coarse: AgglomerationHandler,
    fine: AgglomerationHandler,
    parent: np.ndarray,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """E [n_fine_poly, n_b, n_b]: coefficients of each coarse basis
    function expressed in the child's basis (exact polynomial embedding).

    prolong: u_f[c] = E[c] @ u_c[parent[c]].

    The reference-cell mass matrix M of the child basis is GEOMETRY-
    INDEPENDENT (identity up to round-off for the orthonormal modal
    basis), so its inverse is computed once on host in f64 and applied
    as one einsum.  This deliberately avoids a batched
    ``jnp.linalg.solve([Pf, nb, nb])`` on TPU: at nb=20 (p=3, 3D) with
    Pf >= 32768, XLA's batched LuDecomposition silently returned NaN in
    f32 (found by the round-5 p=3 bench — every transfer came out NaN
    while the same solve at nb<=10 or small Pf was fine).
    """
    import jax

    basis = fine.basis
    nb = basis.n_basis
    pts_np, wts_np = tensor_gauss(fine.dim, fine.degree + 1)
    # concrete (host) evaluation even when called under jit: pts are
    # compile-time constants
    with jax.ensure_compile_time_eval():
        Bc = np.asarray(basis.eval(jnp.asarray(pts_np)), np.float64)
    Mnp = np.einsum("qi,qk,q->ik", Bc, Bc, wts_np)
    Minv = jnp.asarray(np.linalg.inv(Mnp), dtype=dtype)

    pts = jnp.asarray(pts_np, dtype=dtype)
    wts = jnp.asarray(wts_np, dtype=dtype)
    # affine child-unit -> parent-unit map
    s = jnp.asarray(fine.extents[np.arange(fine.n_poly)]
                    / coarse.extents[parent], dtype=dtype)  # [Pf, dim]
    o = jnp.asarray((fine.bbox_lo - coarse.bbox_lo[parent])
                    / coarse.extents[parent], dtype=dtype)
    parent_pts = o[:, None, :] + s[:, None, :] * pts[None, :, :]  # [Pf, Q, dim]

    B_child = basis.eval(pts).astype(dtype)  # [Q, nb]
    B_par = basis.eval(parent_pts).astype(dtype)  # [Pf, Q, nb]

    R = jnp.einsum("qi,pqj,q->pij", B_child, B_par, wts)
    return jnp.einsum("ik,pkj->pij", Minv, R)


def galerkin_coarsen(
    A_fine: BlockMatrix, E: jnp.ndarray, parent: np.ndarray, n_coarse: int
) -> BlockMatrix:
    """A_c = Pᵀ A_f P via the one-parent-per-row structure of P."""
    rows_c = parent[A_fine.rows]
    cols_c = parent[A_fine.cols]
    data_c = jnp.einsum(
        "kia,kij,kjb->kab", E[A_fine.rows], A_fine.data, E[A_fine.cols]
    )
    return BlockMatrix.from_blocks(rows_c, cols_c, data_c, n_coarse)


@jax.tree_util.register_pytree_node_class
@dataclass
class Transfer:
    """Two-level transfer: fine polytopes -> coarse parents.

    Restriction is scatter-free: a padded children gather map (children of
    one parent are consecutive under the STR ordering, so padding is nil
    for uniform fanout) — scatters are pathologically slow on TPU.
    """

    E: jnp.ndarray  # [P_f, nb, nb]
    parent: np.ndarray  # [P_f] static
    n_coarse: int
    children: np.ndarray = None  # [P_c, C] static, -1 padded
    _cmask: np.ndarray = None

    _uniform_C: int = 0  # >0: parent == arange(P_f)//C (STR fast path)
    _Et: jnp.ndarray = None  # [nb, nb, P_f] lane-aligned E for fast path
    grid_shape: tuple | None = None  # fine-level block grid (lex order):
    # structured fast path — transfers become reshape-sum over 2^dim
    # blocks, keeping LEXICOGRAPHIC ordering (7 banded offsets) instead of
    # SFC ranks (37 offsets, 5x SpMV bandwidth)
    _gather_t: bool = False  # general lane-gather t-layout path (arbitrary
    # parent maps, e.g. the band-minimizing per-level relabeling): prolong
    # gathers the parent lane, restrict gathers the padded children lanes
    # and mask-sums — no scatters, stays in the [nb, P] layout

    def tree_flatten(self):
        from polydeal_tpu.utils.static import wrap_static as W

        return (self.E, self._Et), (
            W(self.parent), self.n_coarse, W(self.children),
            W(self._cmask), self._uniform_C, self.grid_shape,
            self._gather_t,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        from polydeal_tpu.utils.static import unwrap_static as U

        obj = cls.__new__(cls)
        obj.E, obj._Et = children
        obj.parent = U(aux[0])
        obj.n_coarse = aux[1]
        obj.children = U(aux[2])
        obj._cmask = U(aux[3])
        obj._uniform_C = aux[4]
        obj.grid_shape = aux[5]
        obj._gather_t = aux[6] if len(aux) > 6 else False
        return obj

    def __post_init__(self):
        if self.children is None:
            from polydeal_tpu.utils.grouping import padded_group_lists

            parent = np.asarray(self.parent)
            ch, counts = padded_group_lists(parent, self.n_coarse)
            self.children = ch
            self._cmask = (ch >= 0).astype(np.float64)
            # fast path: uniform contiguous children (always true for the
            # STR hierarchy on uniform grids): transfers become pure
            # reshape/broadcast in P-last layout — no gathers, no scatters
            C = int(counts[0]) if counts.size else 0
            if C > 0 and (counts == C).all() and np.array_equal(
                    parent, np.arange(parent.shape[0]) // C):
                self._uniform_C = C
            elif self.grid_shape is None:
                self._gather_t = True
            if (self._uniform_C or self.grid_shape is not None
                    or self._gather_t):
                self._Et = jnp.moveaxis(self.E, 0, -1)  # [nb, nb, P_f]

    @property
    def t_fast(self) -> bool:
        """Whether a lane-aligned [nb, P] transfer path exists."""
        return (self._uniform_C > 0 or self.grid_shape is not None
                or self._gather_t)

    def prolong_t(self, uct: jnp.ndarray) -> jnp.ndarray:
        """[nb, P_c] -> [nb, P_f] in the lane-aligned transposed layout."""
        nb = self.E.shape[-1]
        if self.grid_shape is not None:
            g = self.grid_shape  # fine block grid, lex (axis 0 slowest)
            dim = len(g)
            cg = tuple(s // 2 for s in g)
            u = uct.reshape((nb,) + cg)
            # broadcast each coarse block to its 2^dim children
            for ax in range(dim):
                u = jnp.repeat(u, 2, axis=1 + ax)
            rep = u.reshape(nb, -1)
            return jnp.einsum("ijp,jp->ip", self._Et, rep)
        if self._uniform_C:
            C = self._uniform_C
            rep = jnp.broadcast_to(uct[:, :, None],
                                   (nb, self.n_coarse, C)).reshape(nb, -1)
            return jnp.einsum("ijp,jp->ip", self._Et, rep)
        if self._gather_t:
            rep = uct[:, jnp.asarray(self.parent)]  # [nb, P_f] lane gather
            return jnp.einsum("ijp,jp->ip", self._Et, rep)
        uf = self.prolong(uct.T.reshape(-1))
        return uf.reshape(-1, nb).T

    def restrict_t(self, rft: jnp.ndarray) -> jnp.ndarray:
        """[nb, P_f] -> [nb, P_c]."""
        nb = self.E.shape[-1]
        if self.grid_shape is not None:
            g = self.grid_shape
            dim = len(g)
            t = jnp.einsum("ijp,ip->jp", self._Et, rft)  # [nb, P_f]
            shape = (nb,) + tuple(v for s in g for v in (s // 2, 2))
            t = t.reshape(shape)
            t = t.sum(axis=tuple(2 + 2 * ax for ax in range(dim)))
            return t.reshape(nb, -1)
        if self._uniform_C:
            C = self._uniform_C
            t = jnp.einsum("ijp,ip->jp", self._Et, rft)  # [nb, P_f]
            return t.reshape(nb, self.n_coarse, C).sum(axis=2)
        if self._gather_t:
            t = jnp.einsum("ijp,ip->jp", self._Et, rft)  # [nb, P_f]
            ch = np.maximum(self.children, 0)  # [P_c, C] static
            g = t[:, jnp.asarray(ch.reshape(-1))]
            g = g.reshape(nb, *ch.shape)
            mask = jnp.asarray(self._cmask, dtype=g.dtype)
            return (g * mask[None]).sum(axis=2)
        rc = self.restrict(rft.T.reshape(-1))
        return rc.reshape(-1, nb).T

    def prolong(self, u_c: jnp.ndarray) -> jnp.ndarray:
        nb = self.E.shape[-1]
        if self._uniform_C or self.grid_shape is not None:
            uct = u_c.reshape(self.n_coarse, nb).T
            return self.prolong_t(uct).T.reshape(-1)
        uc = u_c.reshape(self.n_coarse, nb)
        uf = jnp.einsum("pij,pj->pi", self.E, uc[jnp.asarray(self.parent)])
        return uf.reshape(-1)

    def restrict(self, r_f: jnp.ndarray) -> jnp.ndarray:
        nb = self.E.shape[-1]
        if self._uniform_C or self.grid_shape is not None:
            return self.restrict_t(r_f.reshape(-1, nb).T).T.reshape(-1)
        rf = r_f.reshape(-1, nb)
        contrib = jnp.einsum("pij,pi->pj", self.E, rf)  # [P_f, nb]
        ch = np.maximum(self.children, 0)
        mask = jnp.asarray(self._cmask, dtype=contrib.dtype)
        rc = jnp.einsum("pc,pcj->pj", mask, contrib[ch])
        return rc.reshape(-1)


def relabel_band_minimizing(c2p: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Relabel polytope ids to a pseudo-lexicographic (sliced) order of
    their centroids, minimizing the number of distinct banded-SpMV offsets.

    The STR leaf-rank (space-filling-curve) ordering of the R-tree
    hierarchy gives ~6*dim distinct band offsets in the assembled SIPG
    matrix (37 in 3D) because index distance does not track geometric
    distance across subtree boundaries; the packed SpMV kernel is
    VPU-bound on per-offset window construction, so offsets cost time
    even when each lane touches only 2*dim+1 of them.  Sorting each
    level's polytopes by sliced-lexicographic centroid order (the STR
    tiling rule applied once, globally, with one polytope per group)
    restores index locality per axis: on a uniform m^dim tiling this IS
    the lexicographic order (exactly 2*dim+1 offsets, matching the
    structured fast path), and on distorted/unstructured meshes it
    degrades gracefully.  Children of one parent are no longer
    contiguous, so transfers use the lane-gather path
    (:class:`Transfer` ``_gather_t``) — two gathers per level per
    V-cycle vs ~4x cheaper smoothing SpMVs, a large net win (measured
    on v5e: the 1M-DoF rtree flagship matches the structured path).
    """
    from polydeal_tpu.agglomeration.rtree import str_tile

    c2p = np.asarray(c2p)
    n_poly = int(c2p.max()) + 1
    counts = np.bincount(c2p, minlength=n_poly).astype(np.float64)
    cent = np.stack([
        np.bincount(c2p, weights=centers[:, d], minlength=n_poly) / counts
        for d in range(centers.shape[1])
    ], axis=1)
    rank = str_tile(cent, n_poly)  # one polytope per group = a permutation
    return rank[c2p].astype(np.int32)


def detect_grid_shapes(handlers, parents) -> list | None:
    """Detect grid-reshape-compatible transfers in a relabeled hierarchy.

    After :func:`relabel_band_minimizing`, a quasi-uniform mesh's levels
    land in exact lexicographic order and every parent map equals the
    canonical 2x-coarsening grid pattern; the reshape-sum transfer
    (:class:`Transfer` ``grid_shape``) then replaces the lane-gather path
    (TPU lane gathers at 1M lanes cost more than the 30 extra band
    offsets they were meant to remove — measured on v5e).  Purely
    structural: compares each parent array against the candidate pattern
    and returns ``None`` when any level disagrees (distorted or
    non-power-of-two meshes fall back to the gather path).

    Returns a list shaped like ``build_structured_hierarchy``'s
    ``grid_shapes`` (entry l = fine-level grid of transfer l), or None.
    """
    dim = handlers[0].dim
    shapes = []
    for l, parent in enumerate(parents):
        P_f = handlers[l + 1].n_poly
        P_c = handlers[l].n_poly
        m = round(P_f ** (1.0 / dim))
        if m**dim != P_f or m % 2 or (m // 2) ** dim != P_c:
            return None
        ids = np.arange(P_f)
        coords = []
        rem = ids
        for d in range(dim):
            stride = m ** (dim - 1 - d)
            coords.append(rem // stride)
            rem = rem % stride
        pat = np.zeros(P_f, dtype=np.int64)
        for d in range(dim):
            pat = pat * (m // 2) + coords[d] // 2
        if not np.array_equal(np.asarray(parent), pat):
            return None
        shapes.append((m,) * dim)
    return shapes


def build_rtree_hierarchy(
    mesh,
    rtree,
    extraction_levels: list[int],
    degree: int = 1,
    family: str = "dgp",
    include_fine_dg: bool = True,
    n_quad: int | None = None,
    relabel: str | None = None,
):
    """Handlers + parent maps for a chain of R-tree extraction levels.

    The analogue of ``PolyUtils::construct_agglomerated_levels`` (reference
    poly_utils.h:1761-1862).  ``extraction_levels`` is coarse-to-fine; when
    ``include_fine_dg`` the trivial agglomeration (one cell per polytope)
    is appended as the finest level, subsuming the reference's
    fill_interpolation_matrix embedding into the background DG space.

    ``relabel='lex'`` renumbers every level's polytopes in sliced-
    lexicographic centroid order (:func:`relabel_band_minimizing`),
    collapsing the SFC ordering's ~6*dim banded offsets to ~2*dim+1 —
    the agglomerates (and hence the MG method and iteration counts) are
    unchanged, only their ids move.  Transfers then run on the
    lane-gather path instead of the contiguous-chunk fast path.

    Returns (handlers, parents): parents[l] maps level-(l+1) polytopes to
    level-l polytopes.
    """
    levels = sorted(extraction_levels)
    c2ps = [rtree.extract_agglomerates(l) for l in levels]
    if include_fine_dg:
        # trivial agglomeration numbered by the STR *leaf rank* (not mesh
        # order) so the finest transfer is also a contiguous uniform
        # chunking — keeps the whole hierarchy on the TPU fast path
        c2ps.append(rtree.extract_agglomerates(rtree.n_levels - 1))
    if relabel == "lex":
        centers = np.asarray(mesh.cell_centers())
        c2ps = [relabel_band_minimizing(c2p, centers) for c2p in c2ps]
    elif relabel is not None:
        raise ValueError(f"unknown relabel scheme: {relabel!r}")
    handlers = [
        AgglomerationHandler(mesh, c2p, degree=degree, family=family, n_quad=n_quad)
        for c2p in c2ps
    ]
    parents = []
    for l in range(len(c2ps) - 1):
        fine_c2p, coarse_c2p = c2ps[l + 1], c2ps[l]
        n_f = int(fine_c2p.max()) + 1
        parent = np.full(n_f, -1, dtype=np.int64)
        parent[fine_c2p] = coarse_c2p  # every cell agrees: nested hierarchy
        assert (parent >= 0).all()
        parents.append(parent)
    return handlers, parents


def build_structured_hierarchy(
    mesh,
    n: int,
    degree: int = 1,
    family: str = "dgp",
    coarsest_side: int = 2,
    n_quad: int | None = None,
):
    """Structured fast path: lexicographic block agglomeration on a
    hyper_cube mesh (n cells per side, power of two).

    Keeps every level in LEXICOGRAPHIC order so the banded SpMV has
    exactly 2*dim+1 offsets (the SFC rank ordering has ~37 in 3D — 5x the
    bandwidth), while transfers use the reshape-sum structured fast path
    (Transfer.grid_shape).  This is the geometric-multigrid analogue of
    the reference's R-tree hierarchy for regular grids; use
    build_rtree_hierarchy for unstructured/irregular meshes.

    Returns (handlers, parents, grid_shapes) — feed to build_multigrid via
    the transfers it constructs internally (or use directly).
    """
    dim = mesh.dim
    assert n & (n - 1) == 0 and n >= 2, "n must be a power of two"
    assert mesh.n_cells == n**dim
    sides = []
    s = coarsest_side
    while s <= n:
        sides.append(s)
        s *= 2
    # cell coords in lex order (axis 0 slowest)
    ids = np.arange(n**dim)
    coords = []
    rem = ids
    for d in range(dim):
        stride = n ** (dim - 1 - d)
        coords.append(rem // stride)
        rem = rem % stride
    coords = np.stack(coords, axis=1)  # [n_cells, dim]

    c2ps = []
    for m in sides:
        b = n // m
        bc = coords // b  # block coords
        lex = np.zeros(ids.shape[0], dtype=np.int64)
        for d in range(dim):
            lex = lex * m + bc[:, d]
        c2ps.append(lex.astype(np.int32))
    handlers = [
        AgglomerationHandler(mesh, c2p, degree=degree, family=family,
                             n_quad=n_quad)
        for c2p in c2ps
    ]
    parents = []
    grid_shapes = []
    for li in range(len(sides) - 1):
        m = sides[li + 1]  # fine side
        pf = np.arange(m**dim)
        fc = []
        rem = pf
        for d in range(dim):
            stride = m ** (dim - 1 - d)
            fc.append(rem // stride)
            rem = rem % stride
        par = np.zeros(m**dim, dtype=np.int64)
        for d in range(dim):
            par = par * (m // 2) + fc[d] // 2
        parents.append(par)
        grid_shapes.append((m,) * dim)
    return handlers, parents, grid_shapes


class _ById:
    """Identity-keyed static wrapper (pytree aux for host-side objects)."""

    __slots__ = ("obj",)

    def __init__(self, obj):
        self.obj = obj

    def __hash__(self):
        return id(self.obj)

    def __eq__(self, other):
        return isinstance(other, _ById) and other.obj is self.obj


@jax.tree_util.register_pytree_node_class
class MatrixFreeLevel:
    """A matrix-free operator as an MG level (the reference's flagship
    composition: MatrixFree finest operator over matrix-based coarse
    levels, examples/agglo_amg.cc:1105-1110, multigrid_amg.h:309-398).

    Quacks like the assembled level entries: ``matvec``, ``diagonal``,
    ``n_basis``; no ``matvec_t``, so the V-cycle runs this level in the
    flat layout and switches to the lane-aligned transposed layout on
    the assembled coarse levels."""

    def __init__(self, op, diag):
        self.op = op  # e.g. MatrixFreeLaplace
        self.diag = diag  # [n] device array (dtype defines level dtype)

    @property
    def n_basis(self):
        return self.op.n_basis

    @property
    def data(self):  # dtype carrier only
        return self.diag

    @property
    def shape(self):
        n = self.op.n_poly * self.op.n_basis
        return (n, n)

    def matvec(self, x):
        return self.op.apply(x)

    def diagonal(self):
        return self.diag

    def tree_flatten(self):
        return (self.op.geom, self.diag), (_ById(self.op),)

    @classmethod
    def tree_unflatten(cls, aux, children):
        import copy

        op = copy.copy(aux[0].obj)
        op.geom = children[0]
        obj = cls.__new__(cls)
        obj.op = op
        obj.diag = children[1]
        return obj


@jax.tree_util.register_pytree_node_class
@dataclass
class Multigrid:
    """V-cycle over Galerkin-coarsened block matrices.

    levels[0] is the coarsest.  Mirrors the reference's flagship solver
    composition (agglo_amg.cc:1278-1414): Chebyshev(degree)+point-Jacobi
    smoothers on every level, a direct solve at the bottom
    (Utils::MGCoarseDirect -> dense LU here), wrapped as a preconditioner
    for CG.
    """

    matrices: list  # list[BlockMatrix], coarse -> fine
    transfers: list  # list[Transfer], transfers[l]: level l <- l+1
    # int = same everywhere, or a per-level tuple (coarsest first, entry
    # 0 unused — level 0 is the direct solve).  Coarse levels are
    # latency-bound, not bandwidth-bound: cheaper smoothing there cuts
    # the V-cycle's sequential small-op chain at near-zero iteration cost.
    n_smooth: int | tuple = 5
    chebyshev_degree: int | tuple = 3
    # coarse direct solve (Utils::MGCoarseDirect analogue).  A 2-tuple
    # (lu, piv) applies lu_solve (two TRIANGULAR solves — sequential and
    # latency-bound on TPU: ~6 ms at 2048 dofs); a 1-tuple (Ainv,) stores
    # the explicit dense inverse and applies ONE matmul (MXU-friendly,
    # ~us at the same size).  The inverse is exact enough for a
    # preconditioner component at any coarse size we use; pick via
    # Multigrid.setup(coarse_solver='inv'|'lu').
    coarse_lu: tuple | None = None
    ells: list = field(default_factory=list)  # Banded/ELL per level (hot SpMV)
    dinvs_t: list = field(default_factory=list)  # [nb,P] per level (or flat)
    los: list = field(default_factory=list)  # smoothing interval lo per level
    his: list = field(default_factory=list)
    # optional low-precision copies for the PRECONDITIONER only.  Two
    # independent knobs (measured on v5e, 1M-DoF 3D SIPG to 1e-8):
    #   precond_dtype — the MATRIX band copies.  The band is the
    #     dominant SpMV traffic (nb*n_off*nb rows vs nb vector rows), so
    #     bf16 here halves smoother bandwidth at no iteration cost
    #     (24 iters, same as f32).
    #   vector_dtype — the smoothing VECTORS (Chebyshev recurrence,
    #     residuals inside the cycle).  bf16 here saves only the x-side
    #     traffic but costs 2-3x the CG iterations (55-96 vs 20-24) —
    #     a large net loss; keep None (= operator dtype) unless a
    #     specific level mix proves otherwise.
    lo_ells: list | None = None
    lo_dinvs: list | None = None
    # fused Chebyshev smoothing (ops/fused_cheb.py): None = auto (TPU
    # backend + supporting level format), True = force (interpret-mode
    # kernels on CPU — tests), False = composed-op smoothing only
    fused_smoother: bool | None = None
    # NOTE (negative result, round 4): smoothing with a NEAR-ONLY
    # operator (dropping the SFC ordering's |offset| > tile couplings
    # from the smoother to skip their pre-rolled x windows, ~40% of the
    # packed SpMV's HBM traffic) was built and measured — it DIVERGES.
    # The "far" blocks are full-strength SIPG face couplings of
    # geometric neighbors that are far only in index space: dropping
    # them leaves unsmoothable interface modes (CG stalls at O(1)
    # residual), diagonal compensation restores positive definiteness
    # but not smoothing (still stalls), and flexible CG does not help.
    # The smoother must see every face coupling; low precision
    # (precond_dtype) is the legitimate traffic lever.

    def tree_flatten(self):
        dyn = (self.matrices, self.transfers, self.coarse_lu, self.ells,
               self.dinvs_t, self.los, self.his, self.lo_ells,
               self.lo_dinvs)
        return dyn, (self.n_smooth, self.chebyshev_degree,
                     self.fused_smoother)

    @classmethod
    def tree_unflatten(cls, aux, dyn):
        obj = cls.__new__(cls)
        (obj.matrices, obj.transfers, obj.coarse_lu, obj.ells,
         obj.dinvs_t, obj.los, obj.his, obj.lo_ells, obj.lo_dinvs) = dyn
        obj.n_smooth, obj.chebyshev_degree = aux[:2]
        obj.fused_smoother = aux[2] if len(aux) > 2 else None
        return obj

    def _fused_ok(self, A, b, dinv=None) -> bool:
        """Fused-kernel eligibility for this level operator + layout."""
        if self.fused_smoother is False or b.ndim != 2:
            return False
        if dinv is not None and dinv.ndim != 2:
            return False
        if b.dtype not in (jnp.float32, jnp.float64):
            return False
        if not (hasattr(A, "fused_cheb_ok") and A.fused_cheb_ok()):
            return False
        return (self.fused_smoother is True
                or jax.default_backend() == "tpu")

    def _residual(self, A, x, b):
        """r = b - A x, via the fused Pallas kernel when eligible."""
        if self._fused_ok(A, b):
            return A.residual_t(
                x, b, interpret=jax.default_backend() != "tpu")
        mv = A.matvec_t if b.ndim == 2 else A.matvec
        return b - mv(x)

    @classmethod
    def setup(
        cls,
        matrices: list,
        transfers: list,
        chebyshev_degree: int | tuple = 3,
        n_smooth: int | tuple = 5,
        smoothing_range: float = 15.0,
        precond_dtype=None,
        vector_dtype=None,
        fine_op=None,
        coarse_solver: str = "lu",
        fused_smoother: bool | None = None,
    ) -> "Multigrid":
        """``fine_op`` (a matrix-free operator with apply/diagonal, e.g.
        MatrixFreeLaplace) replaces the finest assembled level; pass
        ``matrices`` for the coarse levels only in that case.

        ``chebyshev_degree`` / ``n_smooth`` accept a per-level sequence
        (coarsest first, one entry per level; entry 0 is unused).

        ``precond_dtype`` makes low-precision MATRIX copies for the
        smoother's SpMV (the band dominates traffic — bf16 is free in
        iterations); ``vector_dtype`` additionally runs the smoothing
        VECTORS low-precision (measured 2-3x the CG iterations on v5e —
        see the field comment; default None keeps vectors at the
        operator dtype)."""
        n_lv = len(matrices) + (1 if fine_op is not None else 0)

        def _norm(v, name):
            if isinstance(v, int):
                return v
            v = tuple(int(x) for x in v)
            if len(v) != n_lv:
                raise ValueError(
                    f"{name} schedule has {len(v)} entries for {n_lv} levels")
            return v

        chebyshev_degree = _norm(chebyshev_degree, "chebyshev_degree")
        n_smooth = _norm(n_smooth, "n_smooth")
        # banded conversion on device via static gather maps (the naive
        # in-XLA scatter tile-pads a [nnz, nb, nb] intermediate 32x and
        # OOMs at scale; host conversion costs seconds at 10^6 rows);
        # then ONE jitted program for eigenvalue estimates + coarse LU.
        from polydeal_tpu.sparse import BlockBanded as _BB
        from polydeal_tpu.sparse import BlockPacked as _BP

        ells = [
            A if isinstance(A, (_BB, _BP))  # pre-banded/packed
            else (jax.jit(lambda A=A: A.to_banded_device())()
                  if A.banded_offsets().shape[0] <= 96 else A.to_ell())
            for A in matrices
        ]
        # attach the i-major copy driving the Pallas SpMV on big levels
        # (small levels are latency-bound — kernel launch would lose)
        from polydeal_tpu.sparse import BlockBanded

        def _imaj(e):
            if (isinstance(e, BlockBanded)
                    and e.data.shape[-1] >= 32768
                    and e.data.shape[-1] % 128 == 0):
                return jax.jit(lambda x: x.with_imajor())(e)
            return e

        ells = [_imaj(e) for e in ells]
        if fine_op is not None:
            import copy

            _op = copy.copy(fine_op)

            def _diag(geom):
                _op.geom = geom  # geometry as traced ARG, not constants
                return _op.diagonal()

            diag = jax.jit(_diag)(fine_op.geom)
            ells.append(MatrixFreeLevel(fine_op, diag))

        @jax.jit
        def _numeric_setup(ells, A0):
            lams = []
            for Ae in ells[1:]:
                inv = 1.0 / Ae.diagonal()
                lams.append(
                    estimate_lambda_max(
                        Ae.matvec, lambda r: inv * r, Ae.shape[0], iters=25,
                        dtype=Ae.data.dtype,
                    )
                )
            if coarse_solver == "inv":
                lu = (jnp.linalg.inv(A0.to_dense()),)
            else:
                lu = jax.scipy.linalg.lu_factor(A0.to_dense())
            dinvs = [None] + [
                (1.0 / Ae.diagonal_t() if hasattr(Ae, "diagonal_t")
                 else 1.0 / Ae.diagonal()) for Ae in ells[1:]
            ]
            return lams, lu, dinvs

        lams, coarse_lu, dinvs = _numeric_setup(ells, matrices[0])
        los = [None] + [lam / smoothing_range for lam in lams]
        his = [None] + [1.2 * lam for lam in lams]
        lo_ells = lo_dinvs = None
        if precond_dtype is not None:

            def _lo(e):
                if isinstance(e, BlockBanded):
                    lo = BlockBanded(e.data.astype(precond_dtype),
                                     e.offsets, e.n_block_cols)
                    return _imaj(lo)
                return type(e)(data=e.data.astype(precond_dtype),
                               cols=e.cols, n_block_cols=e.n_block_cols)

            # Matrix-free levels stay f32; packed levels reuse the f32
            # operator OBJECT: the packed kernel is VPU-bound on its
            # wide-offset window construction (measured on v5e: bf16
            # band = f32 band time), so a low-precision copy buys no
            # time and costs a duplicate band in HBM.
            # The identity cases must bypass jit: jit re-materializes its
            # output, which would silently duplicate the band in HBM.
            lo_ells = [e if isinstance(e, (MatrixFreeLevel, _BP))
                       else jax.jit(_lo)(e) for e in ells]
            # lo_dinvs carries the smoothing VECTOR dtype: _cycle casts b
            # to it, and the sharded builder reads its dtype as lo_vec
            vdt = vector_dtype
            lo_dinvs = [None] + [
                d if vdt is None else d.astype(vdt) for d in dinvs[1:]]
        elif vector_dtype is not None:
            lo_ells = list(ells)
            lo_dinvs = [None] + [d.astype(vector_dtype)
                                 for d in dinvs[1:]]
        return cls(
            matrices=matrices,
            transfers=transfers,
            n_smooth=n_smooth,
            chebyshev_degree=chebyshev_degree,
            coarse_lu=coarse_lu,
            ells=ells,
            dinvs_t=dinvs,
            los=los,
            his=his,
            lo_ells=lo_ells,
            lo_dinvs=lo_dinvs,
            fused_smoother=fused_smoother,
        )

    @property
    def n_levels(self) -> int:
        return len(self.ells)

    def _nb(self, level: int) -> int:
        e = self.ells[level]
        return e.n_basis if hasattr(e, "n_basis") else e.data.shape[-1]

    def _is_t(self, level: int) -> bool:
        t_ok = level == 0 or self.transfers[level - 1].t_fast
        return hasattr(self.ells[level], "matvec_t") and t_ok

    def _to_t(self, level: int, b_flat: jnp.ndarray):
        return b_flat.reshape(-1, self._nb(level)).T

    def _cycle(self, level: int, b) -> jnp.ndarray:
        """b is [nb, P] when the level supports the transposed layout
        (banded operator + uniform transfer), flat otherwise; layout
        conversions happen only at mixed-level boundaries."""
        if level == 0:
            bl = b.astype(self.coarse_lu[0].dtype)
            if len(self.coarse_lu) == 1:  # explicit inverse: one matmul
                solve = lambda v: self.coarse_lu[0] @ v
            else:
                solve = lambda v: jax.scipy.linalg.lu_solve(self.coarse_lu, v)
            if b.ndim == 2:
                x = solve(bl.T.reshape(-1))
                return x.reshape(-1, b.shape[0]).T.astype(b.dtype)
            return solve(bl).astype(b.dtype)
        use_lo = self.lo_ells is not None
        A = (self.lo_ells if use_lo else self.ells)[level]
        is_t = b.ndim == 2
        if use_lo:
            # smoothing vectors run in the VECTOR dtype (lo_dinvs carries
            # it; = the operator dtype unless vector_dtype was set).  A
            # bf16 vector sweep saves the x-side traffic (0.36 vs 0.58 ms
            # per 1M-DoF packed SpMV on v5e) but was measured to cost
            # 2-3x the CG iterations — the matrix-copy dtype
            # (precond_dtype) is where low precision pays.
            b = b.astype(self.lo_dinvs[level].dtype)
        mv = A.matvec_t if is_t else A.matvec
        dinv = (self.lo_dinvs if use_lo else self.dinvs_t)[level]
        if not is_t and dinv.ndim == 2:
            dinv = dinv.T.reshape(-1)
        deg = (self.chebyshev_degree[level]
               if isinstance(self.chebyshev_degree, tuple)
               else self.chebyshev_degree)
        ns = (self.n_smooth[level] if isinstance(self.n_smooth, tuple)
              else self.n_smooth)
        step_fn = None
        if self._fused_ok(A, b, dinv):
            interp = jax.default_backend() != "tpu"
            # b is bound by closure: every sm(b, ...) call below passes
            # the same level rhs
            step_fn = (lambda xx, dd, c1, c2: A.cheb_step_t(
                xx, dd, b, dinv, c1, c2, interpret=interp))
        sm = ChebyshevSmoother(A=mv, Minv=lambda r, d=dinv: d * r,
                               lo=self.los[level], hi=self.his[level],
                               degree=deg, step_fn=step_fn)
        x = jnp.zeros_like(b)
        first = True
        for _ in range(ns):
            x = sm(b, x, x_is_zero=first)  # pre-smooth starts from zero
            first = False
        r = self._residual(A, x, b)
        t = self.transfers[level - 1]
        down_t = self._is_t(level - 1) and t.t_fast
        if is_t:
            rc = t.restrict_t(r) if down_t else self._from_t_restrict(t, r)
        else:
            rc = t.restrict(r)
            if down_t:
                rc = self._to_t(level - 1, rc)
        xc = self._cycle(level - 1, rc)
        if is_t:
            x = x + (t.prolong_t(xc) if xc.ndim == 2
                     else self._to_t(level, t.prolong(xc.reshape(-1))))
        else:
            xcf = xc.T.reshape(-1) if xc.ndim == 2 else xc
            x = x + t.prolong(xcf)
        # the f32 transfer einsum upcasts the correction — drop back to
        # the smoothing dtype so the POST-smooth also runs low-precision
        x = x.astype(b.dtype)
        for _ in range(ns):
            x = sm(b, x)
        return x

    def _from_t_restrict(self, t, r_t):
        rc = t.restrict(r_t.T.reshape(-1))
        return rc

    def fmg_guess(self, b) -> jnp.ndarray:
        """Full-multigrid initial guess: restrict b to every level, solve
        the coarsest directly, then prolong upward applying one V-cycle
        defect correction per level.  Costs ~2 fine V-cycles and starts
        CG several orders of magnitude closer, typically a net win in
        iterations (``solve_cg(fmg=True)``).  The reference runs plain
        V-cycle-preconditioned CG (examples/agglo_amg.cc:1408-1420);
        FMG is an improvement over it, off by default for parity.

        ``b`` is in the FINE level's layout ([nb, P] transposed when the
        fine level supports it, flat otherwise), as inside solve_cg."""
        top = self.n_levels - 1
        bs = [None] * self.n_levels
        bs[top] = b
        for level in range(top, 0, -1):
            bl = bs[level]
            t = self.transfers[level - 1]
            down_t = self._is_t(level - 1) and t.t_fast
            if bl.ndim == 2:
                rc = (t.restrict_t(bl) if down_t
                      else self._from_t_restrict(t, bl))
            else:
                rc = t.restrict(bl)
                if down_t:
                    rc = self._to_t(level - 1, rc)
            bs[level - 1] = rc
        x = self._cycle(0, bs[0])
        for level in range(1, self.n_levels):
            t = self.transfers[level - 1]
            bl = bs[level]
            if bl.ndim == 2:
                x = (t.prolong_t(x) if x.ndim == 2
                     else self._to_t(level, t.prolong(x)))
            else:
                x = t.prolong(x.T.reshape(-1) if x.ndim == 2 else x)
            # one V-cycle defect correction; the residual uses the TRUE
            # (full-precision) level operator, like CG's outer loop
            A = self.ells[level]
            x = x.astype(bl.dtype)
            r = self._residual(A, x, bl)
            x = x + self._cycle(level, r).astype(x.dtype)
        return x

    def v_cycle(self, b: jnp.ndarray) -> jnp.ndarray:
        """One V-cycle on the finest level (use as CG preconditioner).
        The output is cast back to ``b``'s dtype: with ``precond_dtype``
        the cycle smooths in low precision internally."""
        top = self.n_levels - 1
        if self._is_t(top):
            bt = self._to_t(top, b)
            return self._cycle(top, bt).astype(b.dtype).T.reshape(-1)
        return self._cycle(top, b).astype(b.dtype)

    def solve_cg(self, b: jnp.ndarray, rtol: float = 1e-9,
                 maxiter: int = 200, fmg: bool = False) -> CGResult:
        """MG-preconditioned CG; runs entirely in the lane-aligned
        transposed layout when the fine level supports it.  With
        ``fmg=True`` CG starts from a full-multigrid initial guess
        (see :meth:`fmg_guess`) instead of zero."""
        top = self.n_levels - 1
        A = self.ells[top]
        if self._is_t(top):
            bt = self._to_t(top, b)
            x0 = self.fmg_guess(bt) if fmg else None
            res = cg_solve(A.matvec_t, bt, x0=x0,
                           M=lambda r: self._cycle(top, r).astype(r.dtype),
                           rtol=rtol, maxiter=maxiter)
            return CGResult(x=res.x.T.reshape(-1), iterations=res.iterations,
                            residual=res.residual)
        x0 = self.fmg_guess(b) if fmg else None
        return cg_solve(A.matvec, b, x0=x0, M=self.v_cycle,
                        rtol=rtol, maxiter=maxiter)


def maybe_pack_level(h, A, pack: bool | None = None, min_P: int = 4096,
                     near_limit: int | None = None, device_mesh=None):
    """Convert a wide-offset BlockBanded level to the per-lane packed
    format (sparse.BlockPacked / ops/packed.py) when profitable.

    The SFC (R-tree leaf-rank) polytope ordering gives ~6*dim distinct
    band offsets while every lane touches <= 2*dim + 1; the dense band
    then streams ~n_off/K times the necessary matrix data per SpMV.
    ``pack=None`` packs automatically on TPU; ``pack=True`` forces
    (interpret-mode kernel on CPU — tests only); ``pack=False`` disables.
    """
    from polydeal_tpu.ops.packed import build_pack_plan, packed_supported
    from polydeal_tpu.sparse import BlockBanded, BlockPacked

    if pack is False or not isinstance(A, BlockBanded):
        return A
    if pack is None and jax.default_backend() != "tpu":
        return A
    P, nb = A.n_block_rows, A.n_basis
    if (pack is None and P < min_P) or P % 128 != 0:
        return A
    ft = h.faces
    interior = ~ft.is_boundary
    # default: FULL coloring (near_limit=-1) — far offsets are served
    # in-kernel from pre-rolled x copies on a single chip; the sharded
    # builder repacks with an explicit split when needed
    plan, oid, frows, fcols = build_pack_plan(
        ft.poly_in[interior], ft.poly_out[interior], P, nb,
        offsets=A.offsets,
        near_limit=-1 if near_limit is None else near_limit)
    n_off = A.offsets.shape[0]
    if pack is None and plan.K + 2 >= n_off:
        return A  # narrow band: the roll/i-major kernel is already tight
    if not packed_supported(P, nb, plan.K, A.data.dtype.itemsize):
        return A
    if device_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        oid_dev = jax.device_put(
            oid, NamedSharding(device_mesh,
                               _P(None, device_mesh.axis_names[0])))
    else:
        oid_dev = jnp.asarray(oid)
    return jax.jit(lambda a, o: a.to_packed(plan, o, frows, fcols))(
        A, oid_dev)


def build_multigrid(
    handlers: list,
    parents: list,
    A_fine: BlockMatrix,
    chebyshev_degree: int | tuple = 3,
    n_smooth: int | tuple = 5,
    smoothing_range: float = 20.0,
    mode: str = "direct",
    grid_shapes: list | None = None,
    precond_dtype=None,
    vector_dtype=None,
    dtype=jnp.float64,
    matfree_fine: bool = False,
    level_assembly: str = "tables",
    pack: bool | None = None,
    pack_near_limit: int | None = None,
    device_mesh=None,
    coarse_solver: str = "lu",
    fused_smoother: bool | None = None,
) -> Multigrid:
    """Assemble the full MG preconditioner from a handler chain and the
    finest-level matrix.

    ``matfree_fine=True`` composes a MATRIX-FREE finest operator
    (MatrixFreeLaplace, geometry-only memory) over assembled coarse
    levels — the reference's flagship composition
    (examples/agglo_amg.cc:1105-1110, multigrid_amg.h:309-398); A_fine
    may then be None.  Requires mode='direct'.

    mode='galerkin' coarsens A_fine algebraically (A_l = Pᵀ A_{l+1} P),
    the reference's AmgProjector scheme (multigrid_amg.h:274-305) — an
    *inherited* bilinear form whose coarse penalty stays at the fine-mesh
    scale, giving mildly level-dependent convergence.

    mode='direct' (default) re-assembles SIPG on every polytopal level so
    the penalty scales with the coarse h — the *non-inherited* form with
    near level-independent iteration counts (measured here: 7/11/14/16
    iters over 3-6 levels vs 7/13/21+ inherited).  The reference cannot do
    this cheaply because each level assembly walks FEValues; for us it is
    the same batched einsum per level.
    """
    from polydeal_tpu.assembly.sipg import (
        assemble_sipg_matrix,
        build_volume_tables,
        build_face_tables,
    )

    fine_op = None
    if matfree_fine:
        assert mode == "direct", "matfree_fine requires mode='direct'"
        from polydeal_tpu.assembly.matfree import MatrixFreeLaplace

        fine_op = MatrixFreeLaplace(handlers[-1], dtype=dtype)

    if mode == "direct" and level_assembly == "banded":
        from polydeal_tpu.assembly.sipg import (
            assemble_sipg_banded_direct,
            build_banded_groups,
        )

        matrices = []
        for li, h in enumerate(handlers[:-1]):
            ft = h.faces
            interior = ~ft.is_boundary
            diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
            offs = np.unique(np.concatenate(
                [diffs, -diffs, np.zeros(1, dtype=np.int64)]))
            # shard-local setup: tables (and hence the assembled band)
            # are placed lane-sharded when a device mesh is given and
            # the level divides evenly
            dm = (device_mesh if device_mesh is not None
                  and h.n_poly % device_mesh.devices.size == 0 else None)
            groups = build_banded_groups(h, offs, dtype, device_mesh=dm)
            A_l = jax.jit(
                lambda t, h=h, offs=offs: assemble_sipg_banded_direct(
                    h, t, offsets=offs, use_pallas=(
                        False if dm is not None else None)))(groups)
            # the coarsest level stays banded: the coarse LU needs
            # to_dense, and its P is tiny anyway
            matrices.append(A_l if li == 0 else maybe_pack_level(
                h, A_l, pack, near_limit=pack_near_limit, device_mesh=dm))
            del groups
        if not (matfree_fine or A_fine is None):
            matrices.append(maybe_pack_level(handlers[-1], A_fine, pack,
                                             near_limit=pack_near_limit))

        @jax.jit
        def _embed():
            return [
                build_embedding(handlers[l], handlers[l + 1], parents[l],
                                dtype=dtype)
                for l in range(len(handlers) - 1)
            ]

        Es = _embed()
    elif mode == "direct":
        # one jitted program builds every coarse-level matrix and all
        # embeddings; per-level quadrature tables come in as arguments so
        # they aren't baked into the executable as constants
        tables = [
            (build_volume_tables(h, dtype), build_face_tables(h, dtype))
            for h in handlers[:-1]
        ]

        @jax.jit
        def _build(tabs, Af):
            mats = [
                assemble_sipg_matrix(h, dtype=dtype, vol=v, faces=fc)
                for h, (v, fc) in zip(handlers[:-1], tabs)
            ] + ([] if Af is None else [Af])
            Es = [
                build_embedding(handlers[l], handlers[l + 1], parents[l],
                                dtype=dtype)
                for l in range(len(handlers) - 1)
            ]
            return mats, Es

        matrices, Es = _build(tables, None if matfree_fine else A_fine)
    elif mode == "galerkin":

        @jax.jit
        def _build(Af):
            Es = [
                build_embedding(handlers[l], handlers[l + 1], parents[l],
                                dtype=dtype)
                for l in range(len(handlers) - 1)
            ]
            mats = [Af]
            for l in range(len(handlers) - 2, -1, -1):
                mats.insert(0, galerkin_coarsen(mats[0], Es[l], parents[l],
                                                handlers[l].n_poly))
            return mats, Es

        matrices, Es = _build(A_fine)
    else:
        raise ValueError(f"unknown multigrid mode: {mode}")
    transfers = [
        Transfer(E=Es[l], parent=parents[l], n_coarse=handlers[l].n_poly,
                 grid_shape=None if grid_shapes is None else grid_shapes[l])
        for l in range(len(handlers) - 1)
    ]
    return Multigrid.setup(matrices, transfers,
                           chebyshev_degree=chebyshev_degree,
                           n_smooth=n_smooth, smoothing_range=smoothing_range,
                           precond_dtype=precond_dtype,
                           vector_dtype=vector_dtype, fine_op=fine_op,
                           coarse_solver=coarse_solver,
                           fused_smoother=fused_smoother)


def _field_block_matrix(space, op, name, ah, nb, d, dtype):
    """[BlockMatrix] the (name, name) diagonal block of ``op`` scattered
    onto ``ah``'s full polytope set, identity-extended outside the
    field's subdomain (see build_field_block_multigrid)."""
    f = space.fields[name]
    rows_l, cols_l, data = op.finalize()[(name, name)]
    gp = np.asarray(f.polys)
    rows, cols = gp[rows_l], gp[cols_l]
    data = data.astype(dtype)
    act = np.zeros(ah.n_poly, dtype=bool)
    act[gp] = True
    ext = np.nonzero(~act)[0]
    blocks, r_all, c_all = [data], [rows], [cols]
    if ext.size:
        diag = data[rows_l == cols_l]
        scale = jnp.trace(diag, axis1=1, axis2=2).mean() / f.block
        eye = scale * jnp.eye(f.block, dtype=dtype)
        blocks.append(jnp.broadcast_to(eye, (ext.size, f.block, f.block)))
        r_all.append(ext)
        c_all.append(ext)
    return BlockMatrix.from_blocks(
        np.concatenate(r_all), np.concatenate(c_all),
        jnp.concatenate(blocks, axis=0), ah.n_poly), act


def build_field_block_multigrid(
    space,
    op,
    name: str,
    handlers: list,
    parents: list,
    chebyshev_degree: int | tuple = 3,
    n_smooth: int | tuple = 5,
    smoothing_range: float = 20.0,
    dtype=jnp.float64,
    coarse_solver: str = "lu",
    level_ops: list | None = None,
) -> Multigrid:
    """Galerkin R3MG built from the coupled operator's ACTUAL
    (``name``, ``name``) diagonal block.

    Where :func:`build_multigrid` re-assembles a scalar SIPG proxy on
    every level, this extracts the field's diagonal block from the
    assembled :class:`~polydeal_tpu.assembly.mixed.MixedOperator` —
    including its interface terms (e.g. the BJS tangential coupling of
    darcy_stokes, reference examples/darcy_stokes.cc:1560-1637) and the
    subdomain's true boundary conditions (Neumann where the coupled
    system is Neumann) — scatters it onto the full polytope set of a
    degree-matched geometric hierarchy (polytopes outside the field's
    subdomain get scaled identity blocks, so the extended matrix stays
    SPD and the V-cycle acts as a scaled identity there), and
    Galerkin-coarsens it through the exact polynomial embeddings
    (the reference's AmgProjector scheme, multigrid_amg.h:274-305).

    Vector fields (``n_components > 1``) expand each scalar embedding to
    ``blockdiag(E, ..., E)`` matching the field's component-major block
    layout, so the velocity block of a Stokes system — dense across
    components on BJS interface faces — is coarsened exactly.

    ``handlers``/``parents``: a hierarchy whose FINEST level's polytope
    ordering matches the coupled system's global polytope ids and whose
    basis equals the field's (same degree/family).

    ``level_ops``: optional [(space_l, op_l)] aligned with ``handlers`` —
    coupled systems RE-ASSEMBLED on each level handler; the field block
    is then extracted per level (level-correct SIPG penalties) instead
    of Galerkin-coarsened from the finest (which inherits the fine
    penalty and degrades under refinement).  The last entry should be
    the fine (space, op) pair itself.
    """
    f = space.fields[name]
    ah = handlers[-1]
    nb = ah.n_basis
    d = f.n_components
    assert f.basis.n_basis == nb, (
        f"hierarchy basis ({nb}) must match field '{name}' "
        f"({f.basis.n_basis})")

    def _embeddings():
        Es = []
        for l in range(len(handlers) - 1):
            E = build_embedding(handlers[l], handlers[l + 1], parents[l],
                                dtype=dtype)
            if d > 1:  # component-major block expansion
                E = jnp.einsum("de,pij->pdiej", jnp.eye(d, dtype=dtype),
                               E).reshape(E.shape[0], d * nb, d * nb)
            Es.append(E)
        return Es

    if level_ops is not None:
        # RE-DISCRETIZED levels: extract the field's true block from a
        # coupled system assembled on EACH level handler (level-correct
        # SIPG penalties).  Galerkin-inherited SIPG keeps the FINE
        # penalty ~1/h_fine on every coarse level, which over-penalizes
        # the jumps and degrades the smoother as the mesh refines
        # (measured: the u-block V-cycle CG grows 15/26/36 over n=8/16/32
        # Galerkin-inherited vs near-flat re-discretized — the same
        # reason the scalar flagship MG re-assembles per level).
        assert len(level_ops) == len(handlers)
        Es = _embeddings()
        mats = []
        act = None
        for l, (sp_l, op_l) in enumerate(level_ops):
            A_l, a_l = _field_block_matrix(sp_l, op_l, name, handlers[l],
                                           nb, d, dtype)
            mats.append(A_l)
            if l == len(handlers) - 1:
                act = a_l
    else:
        A_fine, act = _field_block_matrix(space, op, name, ah, nb, d,
                                          dtype)

        @jax.jit
        def _build(A):
            Es = _embeddings()
            mats = [A]
            for l in range(len(handlers) - 2, -1, -1):
                mats.insert(0, galerkin_coarsen(mats[0], Es[l], parents[l],
                                                handlers[l].n_poly))
            return mats, Es

        mats, Es = _build(A_fine)

    # Neumann-block coarse deflation: a field block whose subdomain has
    # no Dirichlet boundary (the pD block of darcy_stokes — reference
    # darcy_stokes.cc imposes flux BCs on the Darcy side) is singular on
    # the per-component constants.  The Galerkin-coarsened matrices keep
    # that nullspace exactly (the embeddings reproduce constants), so
    # the coarse dense LU is numerically singular and the V-cycle blows
    # up.  Deflate: A_0 += sigma * Z Z^T with Z the (normalized)
    # per-component constant vectors supported on the field's coarse
    # polytopes — the standard rank-d fix that makes the coarse solve a
    # bounded pseudo-inverse on range(A) (the coupled GMRES handles the
    # constant direction through the off-diagonal coupling).
    n0 = handlers[0].n_poly
    bs = f.block
    D0 = np.asarray(jax.jit(lambda m: m.to_dense())(mats[0]))
    w = np.linalg.eigvalsh(0.5 * (D0 + D0.T))
    if w[0] < 1e-10 * w[-1]:
        # field membership at the coarsest level (the subdomain is
        # hierarchy-aligned: every coarse poly is fully in or out)
        a = act
        for l in range(len(handlers) - 2, -1, -1):
            ac = np.zeros(handlers[l].n_poly, dtype=bool)
            ac[np.asarray(parents[l])[np.nonzero(a)[0]]] = True
            a = ac
        # coefficients of the constant function 1 in the (shared) basis
        basis = handlers[0].basis
        pts, wts = tensor_gauss(handlers[0].dim, handlers[0].degree + 1)
        B = np.asarray(basis.eval(jnp.asarray(pts, dtype=dtype)))
        wq = np.asarray(wts)
        c0 = np.linalg.solve(np.einsum("qi,qj,q->ij", B, B, wq),
                             B.T @ wq)
        Z = np.zeros((n0, d, nb, d))
        for comp in range(d):
            Z[a, comp, :, comp] = c0
        Z = Z.reshape(n0 * bs, d)
        Z /= np.linalg.norm(Z, axis=0, keepdims=True)
        sigma = np.trace(D0) / D0.shape[0]
        D = D0 + sigma * (Z @ Z.T)
        ri = np.repeat(np.arange(n0), n0)
        ci = np.tile(np.arange(n0), n0)
        data0 = jnp.asarray(
            D.reshape(n0, bs, n0, bs).transpose(0, 2, 1, 3).reshape(
                n0 * n0, bs, bs), dtype=dtype)
        mats[0] = BlockMatrix.from_blocks(ri, ci, data0, n0)

    transfers = [
        Transfer(E=Es[l], parent=parents[l], n_coarse=handlers[l].n_poly)
        for l in range(len(handlers) - 1)
    ]
    return Multigrid.setup(mats, transfers, chebyshev_degree=chebyshev_degree,
                           n_smooth=n_smooth, smoothing_range=smoothing_range,
                           coarse_solver=coarse_solver)
