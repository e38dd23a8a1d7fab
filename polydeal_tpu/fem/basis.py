"""Discontinuous polynomial bases on the unit reference cell [0,1]^dim.

Two families, mirroring the reference's FE choices:

* :class:`LegendreDGP` — the complete polynomial space P_p spanned by
  products of shifted Legendre polynomials, L2-orthonormal on [0,1]^dim,
  first function constant.  This is the TPU-native equivalent of the
  reference's ``FE_AggloDGP`` (cf. reference include/fe_agglodgp.h:31-73,
  source/fe_agglodgp.cc:27-55) — but instead of a deal.II FiniteElement
  class it is a pair of vectorized evaluation routines producing dense
  shape tables that feed batched einsum/MXU contractions.

* :class:`TensorDGQ` — the tensor space Q_p with a nodal Lagrange basis on
  Gauss–Lobatto points (parity with deal.II ``FE_DGQ`` paths used by
  ``distribute_agglomerated_dofs``, reference
  source/agglomeration_handler.cc:326-379).

Evaluation works on arbitrary (possibly traced) jnp arrays so basis tables
can be built inside jitted programs; degree and dim are static.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from math import comb

import jax.numpy as jnp
import numpy as np

__all__ = ["Basis", "LegendreDGP", "TensorDGQ", "make_basis"]


def _legendre_1d_all(x, degree):
    """Orthonormal shifted Legendre values/derivatives on [0,1].

    Returns (vals, ders), each of shape x.shape + (degree+1,).
    L_k(x) = sqrt(2k+1) * P_k(2x-1); exact recurrences, traceable.
    """
    t = 2.0 * x - 1.0
    vals = [jnp.ones_like(x)]
    ders = [jnp.zeros_like(x)]  # dP_k/dt
    if degree >= 1:
        vals.append(t)
        ders.append(jnp.ones_like(x))
    for k in range(1, degree):
        # (k+1) P_{k+1} = (2k+1) t P_k - k P_{k-1}
        vals.append(((2 * k + 1) * t * vals[k] - k * vals[k - 1]) / (k + 1))
        # P'_{k+1}(t) = P'_{k-1}(t) + (2k+1) P_k(t)
        ders.append(ders[k - 1] + (2 * k + 1) * vals[k])
    scale = np.sqrt(2.0 * np.arange(degree + 1) + 1.0)
    V = jnp.stack(vals, axis=-1) * scale
    # d/dx = 2 d/dt
    D = jnp.stack(ders, axis=-1) * (2.0 * scale)
    return V, D


def _complete_exponents(dim: int, degree: int) -> np.ndarray:
    """Multi-indices alpha with |alpha| <= degree, graded ordering.

    The first index is (0,...,0) so basis function 0 is the constant mode
    (parity with reference fe_agglodgp.cc:270-280 ``get_constant_modes``).
    """
    exps = []
    for total in range(degree + 1):
        for alpha in itertools.product(range(total + 1), repeat=dim):
            if sum(alpha) == total:
                exps.append(alpha)
    return np.asarray(exps, dtype=np.int32)


def _tensor_exponents(dim: int, degree: int) -> np.ndarray:
    """All multi-indices with max entry <= degree (Q_p space)."""
    exps = list(itertools.product(range(degree + 1), repeat=dim))
    return np.asarray(exps, dtype=np.int32)


@dataclass(frozen=True)
class Basis:
    """Abstract basis: dense evaluation of all shape functions."""

    dim: int
    degree: int

    @property
    def n_basis(self) -> int:  # pragma: no cover - overridden
        raise NotImplementedError

    def eval(self, points):  # pragma: no cover - overridden
        raise NotImplementedError

    def grad(self, points):  # pragma: no cover - overridden
        raise NotImplementedError

    def eval_with_grad(self, points):
        return self.eval(points), self.grad(points)

    # -- entity-LAST (transposed) evaluation -------------------------
    # points [..., dim, P] -> values [..., nb, P] / grads
    # [..., nb, dim, P].  The lane axis P stays minor throughout so no
    # intermediate ever has a tiny trailing dim (which tile-pads up to
    # 32x on TPU).  Generic fallback transposes; LegendreDGP overrides
    # with a natively P-minor recurrence.
    def eval_t(self, points):
        import jax.numpy as jnp

        p = jnp.moveaxis(points, -2, -1)  # [..., P, dim]
        return jnp.moveaxis(self.eval(p), -2, -1)

    def grad_t(self, points):
        import jax.numpy as jnp

        p = jnp.moveaxis(points, -2, -1)
        return jnp.moveaxis(self.grad(p), -3, -1)  # [..., nb, dim, P]


@dataclass(frozen=True)
class LegendreDGP(Basis):
    """Complete polynomial space P_p, orthonormal modal Legendre basis."""

    @property
    def exponents(self) -> np.ndarray:
        return _complete_exponents(self.dim, self.degree)

    @property
    def n_basis(self) -> int:
        return comb(self.degree + self.dim, self.dim)

    def _tables(self, points):
        points = jnp.asarray(points)
        V, D = _legendre_1d_all(points, self.degree)  # [..., dim, deg+1]
        return V, D

    def eval(self, points):
        """points [..., dim] -> values [..., n_basis]."""
        V, _ = self._tables(points)
        E = self.exponents  # [n_b, dim]
        out = jnp.ones(V.shape[:-2] + (E.shape[0],), dtype=V.dtype)
        for d in range(self.dim):
            out = out * V[..., d, :][..., E[:, d]]
        return out

    def grad(self, points):
        """points [..., dim] -> gradients [..., n_basis, dim]."""
        V, D = self._tables(points)
        E = self.exponents
        comps = []
        for e in range(self.dim):
            g = jnp.ones(V.shape[:-2] + (E.shape[0],), dtype=V.dtype)
            for d in range(self.dim):
                tab = D if d == e else V
                g = g * tab[..., d, :][..., E[:, d]]
            comps.append(g)
        return jnp.stack(comps, axis=-1)

    def _tables_t(self, points):
        """points [..., dim, P] -> per-dim LISTS of [..., P] value/deriv
        arrays (the recurrence runs directly on lane-minor arrays —
        never stacking a tiny minor axis)."""
        deg = self.degree
        scale = np.sqrt(2.0 * np.arange(deg + 1) + 1.0)
        vals, ders = [], []
        for d in range(self.dim):
            x = points[..., d, :]
            t = 2.0 * x - 1.0
            v = [jnp.ones_like(x)]
            dv = [jnp.zeros_like(x)]
            if deg >= 1:
                v.append(t)
                dv.append(jnp.ones_like(x))
            for k in range(1, deg):
                v.append(((2 * k + 1) * t * v[k] - k * v[k - 1]) / (k + 1))
                dv.append(dv[k - 1] + (2 * k + 1) * v[k])
            vals.append([v[k] * scale[k] for k in range(deg + 1)])
            ders.append([dv[k] * (2.0 * scale[k]) for k in range(deg + 1)])
        return vals, ders

    def eval_t(self, points):
        """points [..., dim, P] -> [..., nb, P], lane axis P minor."""
        vals, _ = self._tables_t(points)
        E = self.exponents
        out = []
        for i in range(E.shape[0]):
            g = vals[0][E[i, 0]]
            for d in range(1, self.dim):
                g = g * vals[d][E[i, d]]
            out.append(g)
        return jnp.stack(out, axis=-2)

    def grad_t(self, points):
        """points [..., dim, P] -> [..., nb, dim, P]."""
        vals, ders = self._tables_t(points)
        E = self.exponents
        rows = []
        for i in range(E.shape[0]):
            comps = []
            for e in range(self.dim):
                g = None
                for d in range(self.dim):
                    tab = ders if d == e else vals
                    t = tab[d][E[i, d]]
                    g = t if g is None else g * t
                comps.append(g)
            rows.append(jnp.stack(comps, axis=-2))  # [..., dim, P]
        return jnp.stack(rows, axis=-3)  # [..., nb, dim, P]


def _gauss_lobatto_01(n: int) -> np.ndarray:
    """n Gauss–Lobatto points on [0,1] (n >= 2), or midpoint for n == 1."""
    if n == 1:
        return np.array([0.5])
    if n == 2:
        return np.array([0.0, 1.0])
    # interior points are roots of P'_{n-1}
    c = np.zeros(n)
    c[-1] = 1.0
    dleg = np.polynomial.legendre.Legendre(c).deriv()
    interior = np.sort(dleg.roots())
    pts = np.concatenate([[-1.0], interior, [1.0]])
    return 0.5 * (pts + 1.0)


@dataclass(frozen=True)
class TensorDGQ(Basis):
    """Tensor space Q_p, nodal Lagrange basis on Gauss–Lobatto points."""

    _coeffs: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        nodes = _gauss_lobatto_01(self.degree + 1)
        # monomial coefficients of each 1D Lagrange polynomial:
        # columns of inv(Vandermonde)
        V = np.vander(nodes, N=self.degree + 1, increasing=True)
        object.__setattr__(self, "_coeffs", np.linalg.inv(V))  # [deg+1(node), ? ]

    @property
    def exponents(self) -> np.ndarray:
        return _tensor_exponents(self.dim, self.degree)

    @property
    def n_basis(self) -> int:
        return (self.degree + 1) ** self.dim

    def _lagrange_1d_all(self, x):
        """1D Lagrange values/derivs at x: shapes x.shape + (deg+1,)."""
        x = jnp.asarray(x)
        n = self.degree + 1
        powers = jnp.stack([x**k for k in range(n)], axis=-1)  # [..., n]
        dpowers = jnp.stack(
            [k * x ** max(k - 1, 0) if k > 0 else jnp.zeros_like(x) for k in range(n)],
            axis=-1,
        )
        C = jnp.asarray(self._coeffs)  # [power, node]
        return powers @ C, dpowers @ C

    def eval(self, points):
        points = jnp.asarray(points)
        V, _ = self._lagrange_1d_all(points)  # [..., dim, n1d]
        E = self.exponents
        out = jnp.ones(V.shape[:-2] + (E.shape[0],), dtype=V.dtype)
        for d in range(self.dim):
            out = out * V[..., d, :][..., E[:, d]]
        return out

    def grad(self, points):
        points = jnp.asarray(points)
        V, D = self._lagrange_1d_all(points)
        E = self.exponents
        comps = []
        for e in range(self.dim):
            g = jnp.ones(V.shape[:-2] + (E.shape[0],), dtype=V.dtype)
            for d in range(self.dim):
                tab = D if d == e else V
                g = g * tab[..., d, :][..., E[:, d]]
            comps.append(g)
        return jnp.stack(comps, axis=-1)


def make_basis(family: str, dim: int, degree: int) -> Basis:
    family = family.lower()
    if family in ("dgp", "agglodgp", "legendre", "fe_agglodgp"):
        return LegendreDGP(dim, degree)
    if family in ("dgq", "fe_dgq"):
        return TensorDGQ(dim, degree)
    raise ValueError(f"unknown basis family: {family}")
