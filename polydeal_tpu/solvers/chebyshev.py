"""Chebyshev polynomial smoother with point-Jacobi preconditioning.

The reference smooths with deal.II ``PreconditionChebyshev`` (degree 3,
point-Jacobi diagonal; examples/agglo_amg.cc:1282-1337).  Here the smoother
is a fixed-degree preconditioned Chebyshev semi-iteration — a short chain
of SpMVs, fully fused under jit, no host control flow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["estimate_lambda_max", "ChebyshevSmoother"]


def estimate_lambda_max(A: Callable, Minv: Callable, n: int, iters: int = 20,
                        dtype=jnp.float64) -> jnp.ndarray:
    """Power iteration estimate of lambda_max(M^{-1} A).

    The analogue of the eigenvalue estimation deal.II performs inside
    PreconditionChebyshev; a deterministic start vector keeps the whole
    setup reproducible.
    """
    # deterministic pseudo-random start (no RNG dependency)
    v = jnp.sin(jnp.arange(1, n + 1, dtype=dtype))
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = Minv(A(v))
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = Minv(A(v))
    return jnp.vdot(v, w)


@dataclass
class ChebyshevSmoother:
    """Degree-k Chebyshev iteration targeting the interval [lo, hi] of the
    preconditioned spectrum (standard three-term recurrence).

    ``step_fn(x, d, c1, c2) -> (x', d')`` is an optional FUSED step
    implementing ``d' = c1*d + c2*Minv(b - A x); x' = x + d'`` with b
    bound by the caller (the Pallas fused-Chebyshev kernels,
    ops/fused_cheb.py) — one kernel dispatch per step instead of an SpMV
    plus a chain of elementwise ops.  ``d=None`` marks the first step
    (c1 unused).

    ``x_is_zero=True`` on call skips the first operator apply
    (A·0 = 0): the pre-smoother always starts from zero, so this saves
    one SpMV per level per V-cycle."""

    A: Callable
    Minv: Callable
    lo: float | jnp.ndarray
    hi: float | jnp.ndarray
    degree: int = 3
    step_fn: Callable | None = None

    def __call__(self, b: jnp.ndarray, x: jnp.ndarray,
                 x_is_zero: bool = False) -> jnp.ndarray:
        theta = 0.5 * (self.hi + self.lo)
        delta = 0.5 * (self.hi - self.lo)
        sigma = theta / delta

        # the recurrence scalars stay full-precision, but are CAST to the
        # vector dtype before touching the vectors: an f32 scalar would
        # silently promote a bf16 sweep to f32 (dtype promotion), undoing
        # the low-precision smoother's bandwidth saving
        def cast(s):
            return jnp.asarray(s).astype(b.dtype)

        if self.step_fn is not None:
            if x_is_zero:  # d = Minv(b)/theta, x = 0 + d: elementwise only
                d = self.Minv(b) * cast(1.0 / theta)
                x = d
            else:
                x, d = self.step_fn(x, None, 0.0, 1.0 / theta)
            rho_old = 1.0 / sigma
            for _ in range(self.degree - 1):
                rho = 1.0 / (2.0 * sigma - rho_old)
                x, d = self.step_fn(x, d, rho * rho_old, 2.0 * rho / delta)
                rho_old = rho
            return x

        r = b if x_is_zero else b - self.A(x)
        z = self.Minv(r)
        d = z * cast(1.0 / theta)
        x = x + d if not x_is_zero else d
        rho_old = 1.0 / sigma
        for _ in range(self.degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = b - self.A(x)
            z = self.Minv(r)
            d = cast(rho * rho_old) * d + cast(2.0 * rho / delta) * z
            x = x + d
            rho_old = rho
        return x
