"""Vector DG Stokes tests (foundation for the reference's
darcy_stokes/oseen family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import agglomerate_by_partition
from polydeal_tpu.models.stokes import (
    solve_stokes_dense,
    velocity_errors,
    divergence_norm,
)


def make_handler(n, degree, n_agg):
    m = pd.hyper_cube(2, n)
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors, n_agg)
    return pd.AgglomerationHandler(m, c2p, degree=degree)


def test_stokes_exact_linear_flow():
    """u = (y, x) (divergence-free, harmonic), p = 0: reproduced to
    machine precision (velocity space contains it, f = 0)."""
    ah = make_handler(4, 1, 4)
    u_ex = lambda x: jnp.stack([x[..., 1], x[..., 0]], axis=-1)
    f = lambda x: jnp.zeros_like(x)
    U, P, meta = solve_stokes_dense(ah, f, u_ex)
    assert velocity_errors(ah, meta, U, u_ex) < 1e-12
    assert divergence_norm(ah, meta, U) < 1e-12


def _manufactured():
    """Divergence-free u from a stream function + pressure; f via autodiff."""

    def psi(x):
        return jnp.sin(jnp.pi * x[0]) ** 2 * jnp.sin(jnp.pi * x[1]) ** 2

    def u_point(x):
        g = jax.grad(psi)(x)
        return jnp.array([g[1], -g[0]])

    def p_point(x):
        return jnp.sin(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1])

    def f_point(x):
        lap = jnp.trace(jax.jacfwd(jax.jacfwd(u_point))(x), axis1=1, axis2=2)
        return -lap + jax.grad(p_point)(x)

    def vmapped(fn, out_dim):
        def apply(xs):
            flat = xs.reshape(-1, xs.shape[-1])
            vals = jax.vmap(fn)(flat)
            return vals.reshape(xs.shape[:-1] + ((out_dim,) if out_dim > 1 else ()))

        return apply

    return vmapped(u_point, 2), vmapped(f_point, 2)


def test_stokes_manufactured_convergence():
    """Velocity error decreases under refinement for the stream-function
    manufactured solution (nonzero pressure: exercises B/Bᵀ signs)."""
    u_fn, f_fn = _manufactured()
    errs = []
    for n, n_agg in ((8, 16), (16, 64)):
        ah = make_handler(n, 2, n_agg)
        U, P, meta = solve_stokes_dense(ah, f_fn, u_fn)
        errs.append(velocity_errors(ah, meta, U, u_fn))
    # measured: 0.31 -> 0.034 (rate ~3.2, optimal for p=2)
    assert errs[1] < 0.2 * errs[0], errs
    assert divergence_norm(ah, meta, U) < 0.6  # weakly controlled


def test_stokes_pressure_error_checked():
    """Linear exact pressure recovered (zero-mean) — the symmetric
    rank-1 mean regularization replaces the round-1 row pinning."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import agglomerate_by_partition
    from polydeal_tpu.models.stokes import (pressure_errors,
                                            solve_stokes_dense,
                                            velocity_errors)

    m = pd.hyper_cube(2, 8)
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors, 8)
    ah = pd.AgglomerationHandler(m, c2p, degree=2)
    # u = (y, x) divergence-free harmonic; p = x (f = grad p)
    u_ex = lambda x: jnp.stack([x[..., 1], x[..., 0]], axis=-1)
    p_ex = lambda x: x[..., 0]
    f = lambda x: jnp.stack([jnp.ones(x.shape[:-1]),
                             jnp.zeros(x.shape[:-1])], axis=-1)
    U, Pr, meta = solve_stokes_dense(ah, f, u_ex, degree_u=2)
    assert velocity_errors(ah, meta, U, u_ex) < 1e-9
    assert pressure_errors(ah, meta, Pr, p_ex) < 1e-8
