"""TPU benchmark: 3D SIPG Poisson (R-tree flagship + structured) and the
monodomain time loop — one JSON line.

Primary metric (BASELINE.md north star): DoF/s for 3D SIPG Poisson on an
agglomerated hex grid, assembled and solved to 1e-8 with
R3MG-preconditioned CG, on the GENERAL R-TREE hierarchy — the
reference's flagship configuration (R3MG, examples/agglo_amg.cc).  The
structured (lexicographic) geometric-MG variant and the monodomain
DoF*steps/s throughput are recorded alongside in ``detail`` every run.

vs_baseline is measured against the performance gate of 10x single-node
deal.II throughput: deal.II matrix-based 3D SIPG assembly + AMG-CG runs
at ~2e5 DoF/s per node, so the gate is 2e6 DoF/s and
vs_baseline = dof_per_s / 2e6.

Timing methodology: one fused jitted program per case (assembly + solve,
or N scanned time steps); per-call host read of the result (the tunneled
remote execution can outlive block_until_ready); best of 3 with unique
inputs so no layer can dedupe executions.
"""

import gc
import json
import os
import sys
import time


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _read(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench_poisson(hierarchy: str, n: int, degree: int, rtol: float,
                  cheb_deg: int, n_smooth: int, precond: str,
                  vector: str = "none"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import polydeal_tpu as pd
    from polydeal_tpu.assembly.sipg import (
        assemble_rhs_direct,
        assemble_sipg_banded_direct,
        build_banded_groups,
    )
    from polydeal_tpu.solvers import (
        build_multigrid,
        build_structured_hierarchy,
    )

    t_setup0 = time.perf_counter()
    dtype = jnp.float32
    mesh = pd.hyper_cube(3, n)
    # level trimming: keep only the last BENCH_TRIM extraction levels
    # below the fine DG level (0 = full hierarchy).  The dropped tiny
    # levels cost more in sequential small-op latency than their
    # smoothing helps; the bigger coarsest level is solved directly via
    # the explicit-inverse matmul (BENCH_COARSE_SOLVER=inv) which is
    # MXU-bound instead of the TRSM latency-bound lu_solve.
    # Swept round 5 at 1M DoF: trim=3 (coarsest 512) 11.1-11.5M DoF/s @
    # 20 iters; trim=4 (coarsest 4096) 10.59M @ 23; trim=2 (coarsest
    # 16384) infeasible — XLA's LuDecompositionBlock overflows its
    # scoped VMEM there (the same bound bench_scale works around).
    trim = int(os.environ.get("BENCH_TRIM", "3"))
    coarse_solver = os.environ.get("BENCH_COARSE_SOLVER", "inv")
    relabel = os.environ.get("BENCH_RELABEL", "lex")
    relabel = None if relabel in ("", "none") else relabel
    if hierarchy == "rtree":
        # the general R3MG path: STR R-tree hierarchy.  With the default
        # band-minimizing relabel (BENCH_RELABEL=lex) every level is
        # renumbered in sliced-lexicographic centroid order, collapsing
        # the SFC rank ordering's 37 band offsets to 7 — the banded
        # i-major kernel then matches the structured path.  With
        # BENCH_RELABEL=none the SFC ordering is kept and the wide-offset
        # PACKED format (K = 7 slots) serves the SpMV.
        from polydeal_tpu.agglomeration import RTreeAgglomerator
        from polydeal_tpu.solvers import build_rtree_hierarchy

        agg = RTreeAgglomerator.build(mesh.cell_centers())
        lv0 = 1 if trim <= 0 else max(1, agg.n_levels - 1 - trim)
        handlers, parents = build_rtree_hierarchy(
            mesh, agg, list(range(lv0, agg.n_levels - 1)), degree=degree,
            relabel=relabel)
        # structural detection: on quasi-uniform meshes the relabeled
        # parent maps equal the 2x grid-coarsening pattern, so the
        # reshape-sum transfer replaces the (slow) lane-gather path
        from polydeal_tpu.solvers import detect_grid_shapes

        grid_shapes = (detect_grid_shapes(handlers, parents)
                       if relabel else None)
    else:
        # structured fast path: lexicographic levels -> 7 banded offsets
        # + reshape transfers
        cside = 2 if trim <= 0 else max(2, n >> trim)
        handlers, parents, grid_shapes = build_structured_hierarchy(
            mesh, n, degree=degree, coarsest_side=cside)
    ah = handlers[-1]
    t_hier = time.perf_counter() - t_setup0

    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: 3 * jnp.pi**2 * u_ex(x)

    # setup: fine matrix assembled DIRECTLY in banded layout (the COO
    # path's [f, nb, nb] intermediates tile-pad 32x and OOM at 10^7 DoF)
    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    band_offsets = np.unique(np.concatenate(
        [diffs, -diffs, np.zeros(1, dtype=np.int64)]))
    t_g0 = time.perf_counter()
    groups = build_banded_groups(ah, band_offsets, dtype)
    t_groups = time.perf_counter() - t_g0
    # format choice: the packed format pays off only when the offset set
    # is much wider than the per-lane degree (SFC ordering); with the
    # band-minimizing relabel the offset set is ~2*dim+1 and the banded
    # i-major kernel (identical to the structured path) is tighter
    packed = hierarchy == "rtree" and band_offsets.shape[0] > 2 * 3 + 3
    plan = oid_dev = None
    if packed:
        from polydeal_tpu.ops.packed import build_pack_plan

        plan, oid, _, _ = build_pack_plan(
            ft.poly_in[interior], ft.poly_out[interior],
            ah.n_poly, ah.n_basis, offsets=band_offsets, near_limit=-1)
        oid_dev = jax.numpy.asarray(oid)
    # the fine matrix is assembled DIRECTLY in its solver layout: packed
    # for the wide-offset rtree path (the dense 37-row band would be
    # ~5 GB at 8.4M DoF and is never needed), banded otherwise
    t_a0 = time.perf_counter()
    A0 = jax.jit(lambda t: assemble_sipg_banded_direct(
        ah, t, offsets=band_offsets, pack_plan=plan,
        pack_oid=oid_dev))(groups)
    jax.block_until_ready(jax.tree.leaves(A0)[0])
    t_asm0 = time.perf_counter() - t_a0
    pdt = None if precond in ("", "none") else getattr(jnp, precond)
    # vector_dtype stays None by default: bf16 smoothing VECTORS were
    # measured to cost 2-3x the CG iterations (55-96 vs 20-24) for an
    # x-side-only traffic saving — a net 1.6-2.5x slowdown.  bf16 is
    # applied to the matrix band copies (precond_dtype) instead.
    vdt = None if vector in ("", "none") else getattr(jnp, vector)

    def _sched(v):
        # "5" = every level; "5,2" = finest level 5, coarser levels 2
        # (coarse levels are latency-bound — cheaper smoothing there
        # shortens the V-cycle's sequential small-op chain)
        if "," not in str(v):
            return int(v)
        fine, coarse = (int(x) for x in str(v).split(","))
        return tuple([coarse] * (len(handlers) - 1) + [fine])

    t_m0 = time.perf_counter()
    mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                         grid_shapes=grid_shapes,
                         chebyshev_degree=_sched(cheb_deg),
                         n_smooth=_sched(n_smooth),
                         precond_dtype=pdt, vector_dtype=vdt,
                         level_assembly="banded",
                         coarse_solver=coarse_solver,
                         smoothing_range=float(os.environ.get(
                             "BENCH_SMOOTH_RANGE", "20")),
                         fused_smoother=(
                             None if os.environ.get("BENCH_FUSED", "1")
                             == "1" else False))
    t_mg = time.perf_counter() - t_m0

    # the setup-time fine matrix is dead once the MG levels are built
    # (the fused program re-assembles it) — free it before the solve
    del A0
    gc.collect()

    if packed:
        from polydeal_tpu.sparse import BlockPacked

        assert isinstance(mg.ells[-1], BlockPacked), "packed path engaged"
    elif hierarchy == "rtree":
        assert band_offsets.shape[0] <= 2 * 3 + 3, (
            "relabel should have produced a narrow band")

    # ONE jitted program: assembly (directly in the banded layout, then
    # packed for the wide-offset case) + MG-CG solve.  mg and the tables
    # enter as pytree ARGUMENTS (closure capture would inline them as
    # constants and overflow the remote compiler).
    # the setup-time fine-level copies are dead in the fused program —
    # strip them to zero-length views so they don't occupy HBM as inputs
    from polydeal_tpu.sparse import BlockBanded as _BB
    from polydeal_tpu.sparse import BlockPacked as _BP

    def _strip(e):
        if isinstance(e, _BP):
            return _BP(e.data_i[:, :0], e.oid, e.plan, e.far_data,
                       e.far_rows, e.far_cols)
        if isinstance(e, _BB):
            return _BB(e.data[:, :, :, :0], e.offsets, e.n_block_cols)
        return e

    mg.ells[-1] = _strip(mg.ells[-1])
    # matrices[-1] aliases the same fine-level object — strip it too or
    # the dead full pack rides along as a program argument (~1 GB at
    # 8.4M DoF)
    mg.matrices[-1] = mg.ells[-1]
    if mg.lo_ells is not None:
        # the lo fine-level copy is refreshed inside the fused program —
        # strip the setup-time one too (it would otherwise ride in as a
        # traced argument, a duplicate fine band in HBM)
        mg.lo_ells[-1] = _strip(mg.lo_ells[-1])

    fmg = os.environ.get("BENCH_FMG", "1") == "1"
    # host setup phase (mesh + hierarchy + tables + pack plan + MG setup
    # incl. its compiles) — the reference times its construction phase
    # explicitly (examples/benchmarks_3D.cc:139-176, poisson.cc:1099-1106)
    setup_s = time.perf_counter() - t_setup0

    @jax.jit
    def assemble_and_solve(tabs, m, scale):
        # `scale` keeps every timed call's inputs unique so no layer can
        # dedupe identical (executable, inputs) executions; it multiplies
        # the rhs, leaving iteration counts untouched
        b = assemble_rhs_direct(ah, tabs, f, u_ex) * scale
        if packed:
            # assemble DIRECTLY into the packed layout: the dense band
            # (n_off rows, ~5 GB at 8.4M DoF) is never materialized and
            # the separate to_packed pass disappears
            m.ells[-1] = assemble_sipg_banded_direct(
                ah, tabs, offsets=band_offsets, pack_plan=plan,
                pack_oid=oid_dev)
            if m.lo_ells is not None:
                # packed levels reuse the full-precision object: the
                # packed kernel is VPU-bound on window construction, so
                # halving its band bytes buys nothing (measured bf16 =
                # f32 time) and a bf16 copy would duplicate the band
                m.lo_ells[-1] = m.ells[-1]
        else:
            A_band = assemble_sipg_banded_direct(
                ah, tabs, offsets=band_offsets)
            m.ells[-1] = A_band.with_imajor(drop_omajor=True)
            if m.lo_ells is not None:
                m.lo_ells[-1] = (
                    A_band if pdt is None else _BB(
                        A_band.data.astype(pdt), A_band.offsets,
                        A_band.n_block_cols)).with_imajor(drop_omajor=True)
        return m.solve_cg(b, rtol=rtol, maxiter=100, fmg=fmg)

    _log(f"bench[{hierarchy}]: setup built, compiling fused program...")
    t_c0 = time.perf_counter()
    res = assemble_and_solve(groups, mg, jnp.float32(1.0))
    _read(res.x)  # host read: guarantees remote completion
    compile_s = time.perf_counter() - t_c0
    _log(f"bench[{hierarchy}]: warm, timing...")
    times = []
    for k in range(3):
        t0 = time.perf_counter()
        res = assemble_and_solve(groups, mg,
                                 jnp.float32(1.0 + 1e-6 * (k + 1)))
        _read(res.x)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    out = dict(
        dof_per_s=round(ah.n_dofs / elapsed, 1),
        n_dofs=ah.n_dofs,
        band_offsets=int(band_offsets.shape[0]),
        iterations=int(res.iterations),
        residual=float(res.residual),
        elapsed_s=round(elapsed, 4),
        level_sizes=[int(h.n_poly) for h in handlers],
        coarse_solver=coarse_solver,
        fmg=fmg,
        format="packed" if packed else "banded",
        relabel=relabel if hierarchy == "rtree" else None,
        setup_s=round(setup_s, 2),
        compile_s=round(compile_s, 2),
        setup_phases_s=dict(
            hierarchy=round(t_hier, 2), groups=round(t_groups, 2),
            assemble0=round(t_asm0, 2), mg_setup=round(t_mg, 2)),
    )
    del mg, groups, res
    gc.collect()
    return out


def bench_sharded(n: int, degree: int, rtol: float):
    """ShardedBandedSystem (shard_map SPMD solver) vs the unsharded solve
    on ONE real device — the round-2 gate "within ~10% of unsharded at
    n_dev=1" (collectives are identity; any gap is shard_map program
    overhead).  The analogue of the reference's MPI solve timing
    (examples/agglo_amg.cc:1408-1420)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import polydeal_tpu as pd
    from polydeal_tpu.assembly.sipg import (
        assemble_rhs_direct,
        assemble_sipg_banded_direct,
        build_banded_groups,
    )
    from polydeal_tpu.parallel.banded import ShardedBandedSystem
    from polydeal_tpu.solvers import (
        build_multigrid,
        build_structured_hierarchy,
    )

    dtype = jnp.float32
    mesh = pd.hyper_cube(3, n)
    handlers, parents, grid_shapes = build_structured_hierarchy(
        mesh, n, degree=degree, coarsest_side=8)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: 3 * jnp.pi**2 * u_ex(x)
    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([diffs, -diffs,
                                     np.zeros(1, np.int64)]))
    groups = build_banded_groups(ah, offs, dtype)
    A0 = jax.jit(lambda t: assemble_sipg_banded_direct(
        ah, t, offsets=offs))(groups)
    mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                         grid_shapes=grid_shapes, chebyshev_degree=5,
                         n_smooth=1, precond_dtype=jnp.bfloat16,
                         level_assembly="banded", coarse_solver="inv")
    b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)

    def timeit(fn, *args, reps=3):
        r = fn(*args)
        _read(jax.tree.leaves(r)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*args)
            _read(jax.tree.leaves(r)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=rtol, maxiter=100))
    r = sol(b)
    t_host = timeit(sol, b)
    dmesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
    ss = ShardedBandedSystem.from_multigrid(mg, dmesh)
    xs, ks, _ = ss.solve_cg(b, rtol=rtol, maxiter=100)
    # time the DEVICE-result entry point: solve_cg's int(k)/float(res)
    # host reads cost a tunnel round trip each — more than a V-cycle —
    # and the host arm above never pays them
    t_sh = timeit(
        lambda bb: ss.solve_cg_async(bb, rtol=rtol, maxiter=100)[0], b)
    err = float(jnp.max(jnp.abs(xs - r.x)))
    out = dict(
        n_dofs=ah.n_dofs,
        unsharded_ms=round(t_host * 1e3, 2),
        sharded_1dev_ms=round(t_sh * 1e3, 2),
        ratio=round(t_sh / t_host, 3),
        sharded_dof_per_s=round(ah.n_dofs / t_sh, 1),
        iterations=(int(ks), int(r.iterations)),
        max_abs_diff=err,
    )
    del mg, groups, ss, A0
    gc.collect()
    return out


def bench_monodomain(n_ref: int, degree: int, n_steps: int, dt: float):
    """DoF*steps/s of the scanned IMEX monodomain loop at ~1M DoF 3D
    (reference flagship app, monodomain_DG3D.cc:2206-2330)."""
    import jax
    import jax.numpy as jnp

    from polydeal_tpu.config import MonodomainConfig
    from polydeal_tpu.models.monodomain import MonodomainSolver

    cfg = MonodomainConfig(
        dim=3, n_refinements=n_ref, degree=degree,
        time_stepping_scheme="BDF2", dt=dt,
        final_time=n_steps * dt, end_time_current=2 * dt,
        applied_current=300.0, stimulus_radius=0.2)
    cfg.solver.rtol = 1e-8
    relabel = os.environ.get("BENCH_MONO_RELABEL", "lex")
    relabel = None if relabel in ("", "none") else relabel
    solver = MonodomainSolver.build(cfg, relabel=relabel)
    u, w = solver.initial_state()
    step1 = jax.jit(lambda a, b, c: solver.step(a, b, c, 0.0, True))
    u1, w1, _ = step1(u, u, w)
    scan = jax.jit(
        lambda u_, up_, w_, t0: solver.steps_scan(u_, up_, w_, t0, n_steps))
    uf, up, wf, iters = scan(u1, u, w1, dt)
    _read(uf)
    times = []
    for k in range(3):
        t0w = time.perf_counter()
        uf, up, wf, iters = scan(u1, u, w1, dt * (1.0 + 1e-9 * k))
        _read(uf)
        times.append(time.perf_counter() - t0w)
    elapsed = min(times)
    n_dofs = solver.handler.n_dofs
    import numpy as np

    out = dict(
        dof_steps_per_s=round(n_dofs * n_steps / elapsed, 1),
        steps_per_s=round(n_steps / elapsed, 2),
        n_dofs=n_dofs,
        n_steps=n_steps,
        cg_iters_per_step=float(np.asarray(iters).mean()),
        elapsed_s=round(elapsed, 4),
        hierarchy="rtree",
        relabel=relabel,
    )
    del solver, u, w, uf, up, wf
    gc.collect()
    return out


def main():
    # persistent XLA compilation cache (TPU backend only — the XLA:CPU
    # loader crash that forced the round-3 revert is CPU-specific):
    # build_multigrid's fresh closure-jits defeat the in-memory cache, so
    # every arm re-compiles programs an earlier arm already built;
    # measured on v5e: mg_setup 164.3s -> 67.1s across processes.
    # Opt out with POLYDEAL_JAX_CACHE=0.
    from polydeal_tpu.utils.timer import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("BENCH_N", "64"))  # fine cells per direction
    degree = int(os.environ.get("BENCH_DEGREE", "1"))
    rtol = float(os.environ.get("BENCH_RTOL", "1e-8"))
    cheb_deg = os.environ.get("BENCH_CHEB_DEG", "5")  # "5" or "fine,coarse"
    n_smooth = os.environ.get("BENCH_NSMOOTH", "1")
    precond = os.environ.get("BENCH_PRECOND_DTYPE", "bfloat16")
    vector = os.environ.get("BENCH_VECTOR_DTYPE", "none")

    import jax

    detail = {
        "n_cells": n**3,
        "degree": degree,
        "rtol": rtol,
        "device": str(jax.devices()[0]),
    }
    _log("bench: rtree poisson...")
    rtree = bench_poisson("rtree", n, degree, rtol, cheb_deg, n_smooth,
                          precond, vector)
    _log(f"bench: rtree done {rtree}")
    detail["rtree"] = rtree
    if os.environ.get("BENCH_SKIP_STRUCTURED", "") != "1":
        _log("bench: structured poisson...")
        detail["structured"] = bench_poisson(
            "structured", n, degree, rtol, cheb_deg, n_smooth, precond,
            vector)
        _log(f"bench: structured done {detail['structured']}")
    if os.environ.get("BENCH_SKIP_SHARDED", "") != "1":
        _log("bench: sharded (n_dev=1 real chip)...")
        detail["sharded"] = bench_sharded(n, degree, rtol)
        _log(f"bench: sharded done {detail['sharded']}")
    if os.environ.get("BENCH_SCALE", "") == "1":
        # 8.4M-DoF (n=128) single-chip scale point — opt-in: it runs at
        # the v5e's HBM capacity edge and takes several minutes of host
        # setup (reference times its construction phase the same way,
        # examples/benchmarks_3D.cc:139-176)
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_scale import run_scale

        _log("bench: 8.4M-DoF scale point...")
        detail["scale"] = run_scale()
        _log(f"bench: scale done {detail['scale']}")
    if os.environ.get("BENCH_SKIP_MONODOMAIN", "") != "1":
        import math

        n_ref = int(math.log2(n))
        _log("bench: monodomain...")
        detail["monodomain"] = bench_monodomain(
            n_ref=n_ref, degree=degree, n_steps=20, dt=5e-5)
        _log(f"bench: monodomain done {detail['monodomain']}")

    out = {
        "metric": "sipg3d_rtree_assemble_solve_dof_per_s",
        "value": rtree["dof_per_s"],
        "unit": "DoF/s",
        "vs_baseline": round(rtree["dof_per_s"] / 2e6, 3),
        "detail": detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
