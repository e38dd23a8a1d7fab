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
    preconditioned spectrum (standard three-term recurrence)."""

    A: Callable
    Minv: Callable
    lo: float | jnp.ndarray
    hi: float | jnp.ndarray
    degree: int = 3

    def __call__(self, b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        theta = 0.5 * (self.hi + self.lo)
        delta = 0.5 * (self.hi - self.lo)
        sigma = theta / delta

        # the recurrence scalars stay full-precision, but are CAST to the
        # vector dtype before touching the vectors: an f32 scalar would
        # silently promote a bf16 sweep to f32 (dtype promotion), undoing
        # the low-precision smoother's bandwidth saving
        def cast(s):
            return jnp.asarray(s).astype(b.dtype)

        r = b - self.A(x)
        z = self.Minv(r)
        d = z * cast(1.0 / theta)
        x = x + d
        rho_old = 1.0 / sigma
        for _ in range(self.degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = b - self.A(x)
            z = self.Minv(r)
            d = cast(rho * rho_old) * d + cast(2.0 * rho / delta) * z
            x = x + d
            rho_old = rho
        return x
