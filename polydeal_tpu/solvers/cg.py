"""Preconditioned conjugate gradients, jit-compatible.

The reference solves with deal.II ``SolverCG`` over Trilinos vectors
(e.g. examples/agglo_amg.cc:1408-1414); here CG is a single
``lax.while_loop`` whose body is one fused XLA program — operator apply,
preconditioner, and the two reductions — so the whole Krylov iteration
lives on-device with no host round trips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cg_solve", "block_jacobi_preconditioner", "jacobi_preconditioner"]


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32 scalar
    residual: jnp.ndarray  # final |r|_2


def jacobi_preconditioner(diagonal: jnp.ndarray) -> Callable:
    inv = 1.0 / diagonal
    return lambda r: inv * r


def block_jacobi_preconditioner(diag_blocks: jnp.ndarray) -> Callable:
    """M^{-1} from the n_b×n_b diagonal blocks (factorized once)."""
    n_poly, nb, _ = diag_blocks.shape
    inv = jnp.linalg.inv(diag_blocks)

    def apply(r):
        rb = r.reshape(n_poly, nb)
        return jnp.einsum("pij,pj->pi", inv, rb).reshape(-1)

    return apply


def cg_solve(
    A: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    M: Callable | None = None,
    rtol: float = 1e-9,
    atol: float = 0.0,
    maxiter: int = 1000,
) -> CGResult:
    """Preconditioned CG on A x = b; A and M are linear callables.

    Stops when |r| <= max(rtol*|b|, atol).  Runs entirely under jit.
    """
    if M is None:
        M = lambda r: r
    if x0 is None:  # zero guess: r0 = b, no operator apply needed
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - A(x0)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)

    def cond(state):
        x, r, p, rz, k = state
        return (jnp.linalg.norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        Ap = A(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0, dtype=jnp.int32))
    )
    return CGResult(x=x, iterations=k, residual=jnp.linalg.norm(r))
