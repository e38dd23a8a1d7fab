"""Cardiac monodomain with the Bueno-Orovio minimal ventricular model.

Rebuild of reference examples/monodomain_DG2D.cc / monodomain_DG3D.cc:
chi C_m du/dt = div(sigma grad u) - chi I_ion(u, w) + I_app, with three
gating variables w integrated pointwise (explicitly) and the diffusion
implicit — BDF1/BDF2 IMEX (monodomain_DG3D.cc:1240-1330, 2206-2330).

TPU-native state layout: the gating variables live at *quadrature points*
[n_cells, q, 3] and the reaction term is integrated by quadrature, instead
of the reference's at-DoF nodal trick (update_w_and_ion) — exact for the
modal basis and fully vmapped.  One time step = one jitted program:
gating update + reaction integral + MG-preconditioned CG solve.

Ionic model functions alpha/beta/w_inf/Iion mirror the reference
(monodomain_DG3D.cc:842-892,1258-1278) with the same constants
(config.BuenoOrovioParams).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

import numpy as np

from polydeal_tpu.config import MonodomainConfig, BuenoOrovioParams

__all__ = ["MonodomainSolver", "run_monodomain"]


def _hs(u, theta):
    """Sharp Heaviside H(u - theta)."""
    import jax.numpy as jnp

    return jnp.where(u > theta, 1.0, 0.0)


def _h(u, theta, k):
    """Smooth Heaviside 0.5 (1 + tanh(k (u - theta)))."""
    import jax.numpy as jnp

    return 0.5 * (1.0 + jnp.tanh(k * (u - theta)))


def ionic_rates(u, p: BuenoOrovioParams):
    """(alpha[3], beta[3], w_inf[3]) at u — vectorized over any shape."""
    import jax.numpy as jnp

    a0 = (1.0 - _hs(u, p.V1)) / (
        _hs(u, p.V1m) * (p.tau1pp - p.tau1p) + p.tau1p)
    a1 = (1.0 - _hs(u, p.V2)) / (
        _h(u, p.V2m, p.k2) * (p.tau2pp - p.tau2p) + p.tau2p)
    a2 = 1.0 / (_hs(u, p.V2) * (p.tau3pp - p.tau3p) + p.tau3p)
    b0 = -_hs(u, p.V1) / p.tau1plus
    b1 = -_hs(u, p.V2) / p.tau2plus
    b2 = jnp.zeros_like(u)
    wi0 = 1.0 - _hs(u, p.V1m)
    wi1 = _hs(u, p.Vo) * (p.w_star_inf - 1.0 + u / p.tau2inf) + 1.0 - u / p.tau2inf
    wi2 = _h(u, p.V3, p.k3)
    alpha = jnp.stack([a0, a1, a2], axis=-1)
    beta = jnp.stack([b0, b1, b2], axis=-1)
    winf = jnp.stack([wi0, wi1, wi2], axis=-1)
    return alpha, beta, winf


def ionic_current_parts(u, w0, w1, w2, p: BuenoOrovioParams):
    """I_ion from separate gating components (layout-agnostic)."""
    i_fi = (-_hs(u, p.V1) * (u - p.V1) * (p.Vhat - u) * w0) / p.taufi
    i_so = ((1.0 - _hs(u, p.V2)) * (u - p.Vo)) / (
        _hs(u, p.Vo) * (p.tauopp - p.tauop) + p.tauop
    ) + _hs(u, p.V2) / (_h(u, p.Vso, p.kso) * (p.tausopp - p.tausop) + p.tausop)
    i_si = -(_hs(u, p.V2) * w1 * w2) / p.tausi
    return i_fi + i_so + i_si


def ionic_current(u, w, p: BuenoOrovioParams):
    """I_ion(u, w) (reference Iion, monodomain_DG3D.cc:1258-1278)."""
    return ionic_current_parts(u, w[..., 0], w[..., 1], w[..., 2], p)


@dataclass
class MonodomainSolver:
    """Holds the discrete operators and the jitted IMEX step.

    All quadrature-state arrays are LANE-ALIGNED (entity last): the
    basis table is [C, q, nb, P], the gating state [3, C, q, P] — the
    COO/[n_c, q, nb] layouts tile-pad their tiny minor axes 32x on TPU
    and dominated the step cost.  Level matrices are assembled directly
    in the banded layout (sigma*K + c*M in the diagonal band row), so
    the solver scales to 10^7-DoF hierarchies like the Poisson bench.
    """

    cfg: MonodomainConfig
    handler: object
    mg: object
    B_t: object  # [C, q, nb, P] basis values at quadrature (lane-major)
    w_t: object  # [C, q, P] quadrature weights (JxW)
    stim_t: object  # [C, q, P] stimulus mask
    A: object = None  # finest-level matrix (Jacobi fallback path)

    @classmethod
    def build(cls, cfg: MonodomainConfig, dtype=None, mesh=None,
              pack=None, relabel=None):
        import jax
        import jax.numpy as jnp
        import polydeal_tpu as pd
        from polydeal_tpu.agglomeration import RTreeAgglomerator
        from polydeal_tpu.assembly.sipg import (
            assemble_mass_banded_direct,
            assemble_sipg_banded_direct,
            build_banded_groups,
        )
        from polydeal_tpu.solvers import build_rtree_hierarchy
        from polydeal_tpu.solvers.multigrid import (
            Multigrid,
            Transfer,
            build_embedding,
            maybe_pack_level,
        )

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        p = cfg.ionic
        if mesh is None:
            mesh = pd.hyper_cube(cfg.dim, 2**cfg.n_refinements)
        agg = RTreeAgglomerator.build(mesh.cell_centers())
        levels = list(range(cfg.multigrid.starting_level, agg.n_levels - 1)) or [1]
        # relabel='lex' applies the band-minimizing per-level relabeling
        # (see solvers.relabel_band_minimizing): the SFC rank ordering's
        # ~6*dim band offsets collapse to 2*dim+1, so every per-step SpMV
        # in the scanned time loop streams ~5x less band data
        handlers, parents = build_rtree_hierarchy(mesh, agg, levels,
                                                  degree=cfg.degree,
                                                  relabel=relabel)
        ah = handlers[-1]
        from polydeal_tpu.solvers import detect_grid_shapes

        grid_shapes = (detect_grid_shapes(handlers, parents)
                       if relabel else None)

        bdf = 1.0 if cfg.time_stepping_scheme == "BDF1" else 1.5
        mass_coeff = bdf * p.chi * p.Cm / cfg.dt

        transfers = [
            Transfer(E=build_embedding(handlers[l], handlers[l + 1],
                                       parents[l], dtype=dtype),
                     parent=parents[l], n_coarse=handlers[l].n_poly,
                     grid_shape=(None if grid_shapes is None
                                 else grid_shapes[l]))
            for l in range(len(handlers) - 1)
        ]

        # per-level banded assembly: sigma*K + mass_coeff*M with the mass
        # added into the diagonal band row (reference operator
        # utils.h:1128-1137), memory-lean at 10^7+ DoF
        matrices = []
        fine_groups = None
        for li, h in enumerate(handlers):
            ft = h.faces
            interior = ~ft.is_boundary
            import numpy as _np

            diffs = (ft.poly_out - ft.poly_in)[interior].astype(_np.int64)
            offs = _np.unique(_np.concatenate(
                [diffs, -diffs, _np.zeros(1, dtype=_np.int64)]))
            groups = build_banded_groups(h, offs, dtype)

            @jax.jit
            def _asm(t, h=h, offs=offs):
                K = assemble_sipg_banded_direct(h, t, offsets=offs)
                Md = assemble_mass_banded_direct(h, t)
                K = BlockBandedScale(K, p.sigma)
                return K.add_to_diagonal_band(mass_coeff * Md)

            from polydeal_tpu.sparse import BlockBanded

            def BlockBandedScale(K, a):
                return BlockBanded(K.data * a, K.offsets, K.n_block_cols)

            A_l = _asm(groups)
            if li == len(handlers) - 1:
                fine_groups = groups
                A_fine_band = A_l
            if li > 0:
                A_l = maybe_pack_level(h, A_l, pack)
            matrices.append(A_l)

        if cfg.multigrid.preconditioner == "agglomg" and len(matrices) > 1:
            mg = Multigrid.setup(
                matrices, transfers,
                chebyshev_degree=cfg.multigrid.chebyshev_degree,
                n_smooth=cfg.multigrid.n_smoothing_steps,
                smoothing_range=cfg.multigrid.smoothing_range,
            )
        else:
            mg = None

        # lane-aligned quadrature tables straight from the slot-padded
        # volume group (cells ordered by polytope lane)
        vol = fine_groups["vol"]
        B_t = ah.basis.eval_t(vol["pts"]).astype(dtype)  # [C, q, nb, P]
        ext_t, lo_t = fine_groups["ext_t"], fine_groups["lo_t"]
        real = lo_t[None, None] + vol["pts"] * ext_t[None, None]
        # [C, q, dim, P] -> distance from the origin corner
        dist = jnp.sqrt(jnp.sum(real**2, axis=2))  # [C, q, P]
        stim_t = (dist < cfg.stimulus_radius).astype(dtype)
        return cls(cfg=cfg, handler=ah, mg=mg, B_t=B_t, w_t=vol["w"],
                   stim_t=stim_t, A=A_fine_band)

    # ------------------------------------------------------------------
    def initial_state(self):
        import jax.numpy as jnp

        ah = self.handler
        u = jnp.zeros(ah.n_dofs, dtype=self.B_t.dtype)
        # w = (1, 1, 0) resting state, lane-aligned [3, C, q, P]
        w = jnp.stack([
            jnp.ones_like(self.w_t), jnp.ones_like(self.w_t),
            jnp.zeros_like(self.w_t)
        ], axis=0)
        return u, w

    def u_at_quad(self, u):
        """[C, q, P] potential at quadrature points."""
        import jax.numpy as jnp

        ah = self.handler
        ut = u.reshape(ah.n_poly, ah.n_basis).T  # [nb, P]
        return jnp.einsum("cqip,ip->cqp", self.B_t, ut)

    def step(self, u_n, u_nm1, w, t, first_step: bool):
        """One IMEX BDF step; returns (u_np1, w_np1, iterations)."""
        import jax
        import jax.numpy as jnp
        from polydeal_tpu.solvers import cg_solve, block_jacobi_preconditioner

        cfg, p = self.cfg, self.cfg.ionic
        dt = cfg.dt
        ah = self.handler
        bdf2 = cfg.time_stepping_scheme == "BDF2" and not first_step

        uq_n = self.u_at_quad(u_n)
        uq_nm1 = self.u_at_quad(u_nm1) if bdf2 else None
        u_star = 2.0 * uq_n - uq_nm1 if bdf2 else uq_n  # BDF2 extrapolation

        # gating update (pointwise at quadrature points,
        # reference update_w_and_ion), state [3, C, q, P]
        a, b, winf = ionic_rates_t(u_star, p)
        w_np1 = w + dt * ((b - a) * w + a * winf)

        i_ion = ionic_current_t(u_star, w_np1, p)

        stim = jnp.where(jnp.asarray(t) < cfg.end_time_current,
                         cfg.applied_current, 0.0)
        i_app = stim * self.stim_t

        u_hist = (2.0 * uq_n - 0.5 * uq_nm1) if bdf2 else uq_n
        integrand = (p.chi * p.Cm / dt) * u_hist - p.chi * i_ion + i_app
        # rhs directly in the transposed layout: no scatters, no gathers
        r_t = jnp.einsum("cqip,cqp,cqp->ip", self.B_t, self.w_t, integrand)
        rhs = r_t.T.reshape(-1)

        if self.mg is not None:
            res = self.mg.solve_cg(rhs, rtol=cfg.solver.rtol,
                                   maxiter=cfg.solver.max_iterations)
        else:
            A = self.A
            res = cg_solve(A.matvec, rhs,
                           M=block_jacobi_preconditioner(A.diag_blocks()),
                           rtol=cfg.solver.rtol,
                           maxiter=cfg.solver.max_iterations)
        return res.x, w_np1, res.iterations

    def steps_scan(self, u, u_prev, w, t0, n_steps: int):
        """n_steps IMEX steps as ONE lax.scan program (the throughput
        path: no host round trips inside the loop — the reference's time
        loop pays per-step MPI + output instead,
        monodomain_DG3D.cc:2206-2330).  Returns (u, u_prev, w, iters)."""
        import jax
        import jax.numpy as jnp

        dt = self.cfg.dt

        def body(carry, k):
            u, u_prev, w = carry
            t = t0 + k * dt
            u_new, w_new, it = self.step(u, u_prev, w, t, False)
            return (u_new, u, w_new), it

        (u, u_prev, w), iters = jax.lax.scan(
            body, (u, u_prev, w), jnp.arange(n_steps))
        return u, u_prev, w, iters

    def run(self, n_steps=None, callback=None, checkpoint_dir=None,
            checkpoint_every=0, resume=False):
        """Time loop with optional orbax checkpoint/resume — the restart
        capability the reference's monodomain lacks (SURVEY §5)."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        if n_steps is None:
            n_steps = int(round(cfg.final_time / cfg.dt))
        u, w = self.initial_state()
        u_prev = u
        start = 0
        if resume and checkpoint_dir is not None:
            from polydeal_tpu.checkpoint import restore_checkpoint, latest_step

            if latest_step(checkpoint_dir) is not None:
                start, state = restore_checkpoint(checkpoint_dir)
                u = jnp.asarray(state["u"])
                u_prev = jnp.asarray(state["u_prev"])
                w = jnp.asarray(state["w"])
        step1 = jax.jit(lambda un, um, w, t: self.step(un, um, w, t, True))
        step2 = jax.jit(lambda un, um, w, t: self.step(un, um, w, t, False))
        iters = []
        for k in range(start, n_steps):
            t = k * cfg.dt
            stepper = step1 if k == 0 else step2
            u_new, w, it = stepper(u, u_prev, w, t)
            u_prev, u = u, u_new
            iters.append(int(it))
            if callback is not None and (k + 1) % cfg.output_frequency == 0:
                callback(k + 1, t + cfg.dt, u, w)
            if (checkpoint_dir is not None and checkpoint_every > 0
                    and (k + 1) % checkpoint_every == 0):
                from polydeal_tpu.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_dir, k + 1, dict(
                    u=np.asarray(u), u_prev=np.asarray(u_prev),
                    w=np.asarray(w)))
        return u, w, iters


def ionic_rates_t(u, p: BuenoOrovioParams):
    """ionic_rates with the gating axis FIRST ([3, ...] — lane-aligned
    when u is [..., P]; no transposed intermediates)."""
    import jax.numpy as jnp

    a0 = (1.0 - _hs(u, p.V1)) / (
        _hs(u, p.V1m) * (p.tau1pp - p.tau1p) + p.tau1p)
    a1 = (1.0 - _hs(u, p.V2)) / (
        _h(u, p.V2m, p.k2) * (p.tau2pp - p.tau2p) + p.tau2p)
    a2 = 1.0 / (_hs(u, p.V2) * (p.tau3pp - p.tau3p) + p.tau3p)
    b0 = -_hs(u, p.V1) / p.tau1plus
    b1 = -_hs(u, p.V2) / p.tau2plus
    b2 = jnp.zeros_like(u)
    wi0 = 1.0 - _hs(u, p.V1m)
    wi1 = _hs(u, p.Vo) * (p.w_star_inf - 1.0 + u / p.tau2inf) + 1.0 - u / p.tau2inf
    wi2 = _h(u, p.V3, p.k3)
    return (jnp.stack([a0, a1, a2], axis=0), jnp.stack([b0, b1, b2], axis=0),
            jnp.stack([wi0, wi1, wi2], axis=0))


def ionic_current_t(u, w_first, p: BuenoOrovioParams):
    """ionic_current with gating state [3, ...] (axis first)."""
    return ionic_current_parts(u, w_first[0], w_first[1], w_first[2], p)


def run_monodomain(cfg: MonodomainConfig | None = None, verbose=True, **kw):
    cfg = cfg or MonodomainConfig(**kw)
    solver = MonodomainSolver.build(cfg)
    import jax.numpy as jnp

    def cb(step, t, u, w):
        if verbose:
            uq = solver.u_at_quad(u)
            print(f"step {step:5d} t={t:.5f}  max u = {float(uq.max()):.4f}")

    u, w, iters = solver.run(callback=cb)
    return solver, u, w, iters


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--refinements", type=int, default=5)
    ap.add_argument("--degree", type=int, default=1)
    ap.add_argument("--scheme", default="BDF2", choices=("BDF1", "BDF2"))
    ap.add_argument("--dt", type=float, default=1e-4)
    ap.add_argument("--final-time", type=float, default=2e-3)
    ap.add_argument("--preconditioner", default="agglomg",
                    choices=("agglomg", "jacobi"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prm", type=str, default=None,
                    help="config file in 'a.b = v' format")
    args = ap.parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if args.prm:
        from polydeal_tpu.config import from_text

        cfg = from_text(open(args.prm).read())
    else:
        cfg = MonodomainConfig(
            dim=args.dim, n_refinements=args.refinements, degree=args.degree,
            time_stepping_scheme=args.scheme, dt=args.dt,
            final_time=args.final_time,
        )
        cfg.multigrid.preconditioner = args.preconditioner
    run_monodomain(cfg)


if __name__ == "__main__":
    main()
