"""8.4M-DoF (n=128, p=1) single-chip scale point on the R-tree path.

The bench's ONE-program form (assembly + solve fused) exceeds the v5e's
15.75 GB at this size — XLA's compile-time accounting charges the live
quadrature tables (~7 GB) PLUS the assembly temps simultaneously.  Split
into two sequential jitted programs (assemble, then MG-CG solve), each
fits; the reported time is the SUM of both, with per-call host reads,
best of 3 — the same honesty standard as bench.py.

With the band-minimizing relabel (SCALE_RELABEL=lex, default) the fine
level has 7 band offsets and the banded i-major kernel serves the SpMV
(no packed format needed — the 7-row band is ~1.8 GB); with
SCALE_RELABEL=none the SFC ordering's 37 offsets route through the
packed format as before.
"""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_scale():
    import gc
    from polydeal_tpu.utils.timer import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.assembly.sipg import (
        assemble_rhs_direct,
        assemble_sipg_banded_direct,
        build_banded_groups,
    )
    from polydeal_tpu.solvers import (
        build_multigrid,
        build_rtree_hierarchy,
        detect_grid_shapes,
    )

    n = int(os.environ.get("SCALE_N", "128"))
    relabel = os.environ.get("SCALE_RELABEL", "lex")
    relabel = None if relabel in ("", "none") else relabel
    rtol = 1e-8
    dtype = jnp.float32
    mesh = pd.hyper_cube(3, n)
    agg = RTreeAgglomerator.build(mesh.cell_centers())
    # one more level than the bench's trim=3: at n=128 the trim-3
    # coarsest is 16384 DoF, where XLA's LuDecomposition block overflows
    # its scoped VMEM (16.07M > 16M); trim=4 keeps the direct solve at
    # 2048 DoF
    lv0 = max(1, agg.n_levels - 1 - 4)
    handlers, parents = build_rtree_hierarchy(
        mesh, agg, list(range(lv0, agg.n_levels - 1)), degree=1,
        relabel=relabel)
    grid_shapes = detect_grid_shapes(handlers, parents) if relabel else None
    ah = handlers[-1]
    log(f"setup: {ah.n_poly} polytopes, {ah.n_dofs} DoF, relabel={relabel}")
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: 3 * jnp.pi**2 * u_ex(x)
    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([diffs, -diffs,
                                     np.zeros(1, dtype=np.int64)]))
    packed = offs.shape[0] > 2 * 3 + 3
    groups = build_banded_groups(ah, offs, dtype)
    plan = oid_dev = None
    if packed:
        from polydeal_tpu.ops.packed import build_pack_plan

        plan, oid, _, _ = build_pack_plan(
            ft.poly_in[interior], ft.poly_out[interior], ah.n_poly,
            ah.n_basis, offsets=offs, near_limit=-1)
        oid_dev = jnp.asarray(oid)
    # setup fine matrix directly in its solver layout (packed: no 5 GB
    # dense band ever exists; banded: the 7-row band is ~1.8 GB)
    A0 = jax.jit(lambda t: assemble_sipg_banded_direct(
        ah, t, offsets=offs, pack_plan=plan, pack_oid=oid_dev))(groups)
    mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                         grid_shapes=grid_shapes,
                         chebyshev_degree=5, n_smooth=1,
                         precond_dtype=jnp.bfloat16,
                         level_assembly="banded", coarse_solver="inv")
    del A0
    gc.collect()
    from polydeal_tpu.sparse import BlockBanded as _BB
    from polydeal_tpu.sparse import BlockPacked as _BP

    fine = mg.ells[-1]
    if packed:
        assert isinstance(fine, _BP)

    def _strip(e):
        if isinstance(e, _BP):
            return _BP(e.data_i[:, :0], e.oid, e.plan, e.far_data,
                       e.far_rows, e.far_cols)
        if isinstance(e, _BB):
            return _BB(e.data[:, :, :, :0], e.offsets, e.n_block_cols)
        return e

    # program 1: assemble (directly in the solver layout) + rhs
    @jax.jit
    def assemble(tabs, scale):
        A = assemble_sipg_banded_direct(ah, tabs, offsets=offs,
                                        pack_plan=plan, pack_oid=oid_dev)
        if not packed:
            A = A.with_imajor(drop_omajor=True)
        b = assemble_rhs_direct(ah, tabs, f, u_ex) * scale
        return A, b

    # program 2: MG-CG solve with the fine level injected
    mg.ells[-1] = _strip(fine)
    mg.matrices[-1] = mg.ells[-1]
    if mg.lo_ells is not None:
        mg.lo_ells[-1] = _strip(mg.lo_ells[-1])
    del fine
    gc.collect()

    @jax.jit
    def solve(A, b, m):
        m.ells[-1] = A
        if m.lo_ells is not None:
            # banded: bf16 i-major copy halves the smoother's band
            # traffic; packed reuses the f32 object (VPU-bound kernel)
            m.lo_ells[-1] = A if packed else _BB(
                A.data, A.offsets, A.n_block_cols,
                data_i=A.data_i.astype(jnp.bfloat16))
        return m.solve_cg(b, rtol=rtol, maxiter=100, fmg=True)

    log("compiling assemble...")
    A, b = assemble(groups, jnp.float32(1.0))
    float(jnp.sum(b))
    log("compiling solve...")
    res = solve(A, b, mg)
    float(jnp.sum(res.x))
    log(f"warm: iters={int(res.iterations)} residual={float(res.residual)}")
    times = []
    for k in range(3):
        # at the capacity edge the PREVIOUS iteration's matrix must be
        # freed before re-assembling (two copies + assembly temps OOM)
        del A, b, res
        gc.collect()
        t0 = time.perf_counter()
        A, b = assemble(groups, jnp.float32(1.0 + 1e-6 * (k + 1)))
        res = solve(A, b, mg)
        float(jnp.sum(res.x))
        times.append(time.perf_counter() - t0)
    el = min(times)
    out = dict(n_dofs=ah.n_dofs, dof_per_s=round(ah.n_dofs / el, 1),
               iterations=int(res.iterations),
               residual=float(res.residual), elapsed_s=round(el, 4),
               level_sizes=[int(h.n_poly) for h in handlers],
               format="packed" if packed else "banded", relabel=relabel)
    log(f"scale point: {out}")
    return out


def main():
    print(run_scale())


if __name__ == "__main__":
    main()
