"""Application-level tests (reference examples as integration tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from polydeal_tpu.config import MonodomainConfig, to_text, from_text
from polydeal_tpu.models.diffusion_reaction import (
    solve_diffusion_reaction,
    convergence_study,
)
from polydeal_tpu.models.monodomain import (
    MonodomainSolver,
    ionic_rates,
    ionic_current,
)
from polydeal_tpu.models.poisson import solve_poisson


def test_poisson_model_mg():
    out = solve_poisson(dim=2, n=16, degree=1, strategy="rtree",
                        solver="mg", verbose=False)
    assert out["iterations"] <= 16
    assert out["l2"] < 0.06


def test_poisson_model_metis():
    out = solve_poisson(dim=2, n=8, degree=2, strategy="metis",
                        solver="cg", verbose=False)
    assert out["l2"] < 0.02


def test_diffusion_reaction_convergence():
    errs, rates = convergence_study(dim=2, degree=1, sizes=(8, 16),
                                    verbose=False)
    assert rates[0] > 1.3  # pre-asymptotic but clearly converging
    assert errs[1] < errs[0]


def test_diffusion_reaction_reaction_term_matters():
    a = solve_diffusion_reaction(dim=2, n=8, reaction=0.0, verbose=False)
    b = solve_diffusion_reaction(dim=2, n=8, reaction=100.0, verbose=False)
    assert a["l2"] < 0.2 and b["l2"] < 0.2


# ---------------------------------------------------------------- ionic


def test_ionic_resting_state():
    """At u=0, w=(1,1,0): the reference formulation gives
    I_so = (u - Vo)/tauop = -1 exactly (it reuses Vo as both the theta_o
    threshold and the resting offset, monodomain_DG3D.cc:1264-1268), and
    the v/w gates are stationary; s relaxes toward its small sigmoid value."""
    from polydeal_tpu.config import BuenoOrovioParams

    p = BuenoOrovioParams()
    u = jnp.zeros(4)
    w = jnp.stack([jnp.ones(4), jnp.ones(4), jnp.zeros(4)], axis=-1)
    i = ionic_current(u, w, p)
    assert np.allclose(np.asarray(i), -p.Vo / p.tauop, atol=1e-12)
    a, b, winf = ionic_rates(u, p)
    dw = (b - a) * w + a * winf
    assert np.allclose(np.asarray(dw[..., :2]), 0.0, atol=1e-10)
    # s gate: relaxes to winf[2] = smooth-heaviside(0; V3, k3), small
    assert float(winf[0, 2]) < 0.05


def test_ionic_upstroke_sign():
    """Above threshold the fast inward current is depolarizing (negative
    I_ion drives u up)."""
    from polydeal_tpu.config import BuenoOrovioParams

    p = BuenoOrovioParams()
    i = ionic_current(jnp.asarray(0.5), jnp.asarray([1.0, 1.0, 0.0]), p)
    assert float(i) < 0.0


@pytest.mark.parametrize("scheme", ["BDF1", "BDF2"])
def test_monodomain_short_run(scheme):
    """A few steps: stimulated region depolarizes, solution stays bounded
    (reference monodomain time loop behavior)."""
    cfg = MonodomainConfig(
        dim=2, n_refinements=4, degree=1, time_stepping_scheme=scheme,
        dt=5e-5, final_time=5e-4, end_time_current=5e-4,
        applied_current=300.0, stimulus_radius=0.3, output_frequency=100,
    )
    cfg.solver.rtol = 1e-8
    solver = MonodomainSolver.build(cfg)
    u, w, iters = solver.run()
    uq = np.asarray(solver.u_at_quad(u))
    assert np.isfinite(uq).all()
    assert uq.max() > 0.01  # stimulus depolarized the tissue
    assert uq.max() < 2.0  # bounded by the model ceiling
    assert max(iters) < 60


def test_monodomain_relabel_invariance():
    """The band-minimizing relabel only renumbers polytopes: the scanned
    BDF2 trajectory must produce the same physical field (compared via
    ordering-invariant integrals ∫u and ∫u²) while collapsing the SFC
    ordering's band offsets to 2*dim+1."""
    import jax

    cfg = MonodomainConfig(
        dim=2, n_refinements=3, degree=1, time_stepping_scheme="BDF2",
        dt=5e-5, final_time=3e-4, end_time_current=3e-4,
        applied_current=300.0, stimulus_radius=0.3,
    )
    cfg.solver.rtol = 1e-10
    # jacobi: the relabeled-MG machinery is covered by test_multigrid's
    # relabel tests; this test targets the model wiring + physics
    cfg.multigrid.preconditioner = "jacobi"

    def run_case(relabel):
        solver = MonodomainSolver.build(cfg, relabel=relabel)
        u, w = solver.initial_state()
        u1, w1, _ = jax.jit(
            lambda a, b, c: solver.step(a, b, c, 0.0, True))(u, u, w)
        uf, _, _, _ = solver.steps_scan(u1, u, w1, cfg.dt, 5)
        uq = solver.u_at_quad(uf)
        n_off = solver.A.offsets.shape[0]
        return (float(jnp.sum(solver.w_t * uq)),
                float(jnp.sum(solver.w_t * uq**2)), n_off)

    m0, m2_0, off_sfc = run_case(None)
    m1, m2_1, off_lex = run_case("lex")
    assert off_lex == 2 * 2 + 1, (off_sfc, off_lex)
    assert abs(m1 - m0) < 1e-8 * max(1.0, abs(m0))
    assert abs(m2_1 - m2_0) < 1e-8 * max(1.0, abs(m2_0))


def test_config_roundtrip():
    cfg = MonodomainConfig(dim=3, dt=2e-4)
    cfg.ionic.sigma = 5e-4
    cfg.multigrid.preconditioner = "jacobi"
    text = to_text(cfg)
    cfg2 = from_text(text)
    assert cfg2.dim == 3 and cfg2.dt == 2e-4
    assert cfg2.ionic.sigma == 5e-4
    assert cfg2.multigrid.preconditioner == "jacobi"
