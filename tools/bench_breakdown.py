"""Breakdown of the rtree bench: assembly vs SpMV vs V-cycle vs CG.

Run from the repo root on the TPU: python tools/bench_breakdown.py
(sys.path fix below allows running from anywhere)."""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
import polydeal_tpu as pd
from polydeal_tpu.assembly.sipg import (assemble_rhs_direct,
    assemble_sipg_banded_direct, build_banded_groups)
from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy
from polydeal_tpu.agglomeration import RTreeAgglomerator

n = 64; degree = 1
dtype = jnp.float32
mesh = pd.hyper_cube(3, n)
agg = RTreeAgglomerator.build(mesh.cell_centers())
handlers, parents = build_rtree_hierarchy(
    mesh, agg, list(range(1, agg.n_levels - 1)), degree=degree)
ah = handlers[-1]
u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
f = lambda x: 3 * jnp.pi**2 * u_ex(x)
ft = ah.faces
interior = ~ft.is_boundary
diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
offs = np.unique(np.concatenate([diffs, -diffs, np.zeros(1, np.int64)]))
groups = build_banded_groups(ah, offs, dtype)
A0 = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs))(groups)
mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                     chebyshev_degree=5, n_smooth=1,
                     precond_dtype=jnp.bfloat16, level_assembly="banded")
from polydeal_tpu.ops.packed import build_pack_plan
from polydeal_tpu.sparse import BlockPacked
plan, oid, _, _ = build_pack_plan(ft.poly_in[interior], ft.poly_out[interior],
    ah.n_poly, ah.n_basis, offsets=offs, near_limit=-1)
oid_dev = jnp.asarray(oid)

def timeit(fn, *args, reps=5):
    r = fn(*args); jax.block_until_ready(r); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

# 1. assembly only
asm = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs).to_packed(plan, oid_dev).data_i)
print("assembly+pack:", timeit(asm, groups), file=sys.stderr)

# rhs
rhsf = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))
print("rhs:", timeit(rhsf, groups), file=sys.stderr)

b = rhsf(groups)
Ap = mg.ells[-1]
xt = jnp.asarray(np.random.default_rng(0).normal(size=(ah.n_basis, ah.n_poly)), dtype)
mv = jax.jit(lambda x: Ap.matvec_t(x))
print("fine packed SpMV:", timeit(mv, xt), file=sys.stderr)

vc = jax.jit(lambda r: mg.v_cycle(r))
print("v_cycle:", timeit(vc, b), file=sys.stderr)

sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=1e-8, maxiter=100))
r = sol(b)
print("iterations:", int(r.iterations), file=sys.stderr)
print("solve:", timeit(sol, b), file=sys.stderr)
