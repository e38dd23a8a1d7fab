"""Restarted (F)GMRES — the Krylov solver for the nonsymmetric coupled
systems (Stokes–Darcy, Oseen).

The reference solves these with a sparse direct factorization
(SparseDirectUMFPACK, reference examples/darcy_stokes.cc:1688-1696);
dense/direct paths exist here too, but at scale the TPU-native solve is
right-preconditioned restarted GMRES whose entire restart cycle is one
jitted program: the Arnoldi loop is a ``lax.fori_loop`` over a fixed
Krylov basis buffer with Givens rotations carried in registers, so no
host round trips occur inside a cycle.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["gmres_solve", "GMRESResult"]


class GMRESResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # total inner iterations
    residual: jnp.ndarray


def _givens(a, b):
    r = jnp.hypot(a, b)
    safe = jnp.where(r > 0, r, 1.0)
    return jnp.where(r > 0, a / safe, 1.0), jnp.where(r > 0, b / safe, 0.0)


def gmres_solve(
    A: Callable,
    b: jnp.ndarray,
    M: Callable | None = None,
    x0: jnp.ndarray | None = None,
    restart: int = 50,
    rtol: float = 1e-8,
    max_restarts: int = 40,
) -> GMRESResult:
    """Right-preconditioned GMRES(restart) on A x = b.

    ``M`` is the (possibly nonlinear-in-precision) right preconditioner
    applied as A M(v) — flexible in the FGMRES sense because the Z basis
    is stored explicitly.
    """
    if M is None:
        M = lambda v: v
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.linalg.norm(b)
    tol = rtol * bnorm
    m = restart

    def cycle(state):
        x, total_it, _ = state
        r = b - A(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=dtype)
        Z = jnp.zeros((m, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        V = V.at[0].set(r / jnp.where(beta > 0, beta, 1.0))

        def arnoldi(j, carry):
            V, Z, H, cs, sn, g, done_at = carry
            z = M(V[j])
            w = A(z)
            # classical Gram-Schmidt with one reorthogonalization pass
            # (CGS2): a single projection loses orthogonality on
            # ill-conditioned systems; the second pass restores it to
            # machine precision (rows > j of V are zero -> harmless)
            h = V @ w  # [m+1]
            w = w - h @ V
            h2 = V @ w
            w = w - h2 @ V
            h = h + h2
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.where(hj1 > 0, hj1, 1.0))
            Z = Z.at[j].set(z)
            col = h.at[j + 1].set(hj1)[: m + 1]
            # apply previous Givens rotations to the new column
            def rot(i, c):
                ci, si = cs[i], sn[i]
                hi, hi1 = c[i], c[i + 1]
                c = c.at[i].set(ci * hi + si * hi1)
                c = c.at[i + 1].set(-si * hi + ci * hi1)
                return c

            col = jax.lax.fori_loop(0, j, rot, col)
            ci, si = _givens(col[j], col[j + 1])
            col = col.at[j].set(ci * col[j] + si * col[j + 1])
            col = col.at[j + 1].set(0.0)
            cs = cs.at[j].set(ci)
            sn = sn.at[j].set(si)
            gj = g[j]
            g = g.at[j].set(ci * gj)
            g = g.at[j + 1].set(-si * gj)
            H = H.at[:, j].set(col[: m + 1])
            # first inner iteration at which the residual |g[j+1]| meets
            # the tolerance — the honest iteration count (the loop still
            # runs the full cycle; results are unchanged)
            done_at = jnp.minimum(
                done_at, jnp.where(jnp.abs(g[j + 1]) <= tol, j + 1, m))
            return V, Z, H, cs, sn, g, done_at

        V, Z, H, cs, sn, g, done_at = jax.lax.fori_loop(
            0, m, arnoldi,
            (V, Z, H, cs, sn, g, jnp.asarray(m, jnp.int32)))
        # back-substitution on the m x m upper-triangular H (columns past
        # convergence have ~0 diagonals and contribute ~0 — guarded)
        def back(i_rev, y):
            i = m - 1 - i_rev
            num = g[i] - H[i] @ y
            safe = jnp.where(jnp.abs(H[i, i]) > 1e-30, H[i, i], 1.0)
            yi = jnp.where(jnp.abs(H[i, i]) > 1e-30, num / safe, 0.0)
            return y.at[i].set(yi)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dtype=dtype))
        x = x + y @ Z
        res = jnp.abs(g[m])
        return x, total_it + done_at, res

    def cond(state):
        _, total_it, res = state
        return (res > tol) & (total_it < max_restarts * m)

    state = (x, jnp.asarray(0), jnp.asarray(jnp.inf, dtype=dtype))
    x, it, res = jax.lax.while_loop(cond, cycle, state)
    return GMRESResult(x=x, iterations=it, residual=res)
