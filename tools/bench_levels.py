"""Level-trimming experiment: V-cycle cost vs iteration count.

Usage: python tools/bench_levels.py <variant>
variant in {full, last4, last3, last2}: how many R-tree extraction
levels to keep below the fine DG level (full = all).
"""
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


def log(m):
    print(m, file=sys.stderr, flush=True)


n = 64; degree = 1
dtype = jnp.float32
mesh = pd.hyper_cube(3, n)
agg = RTreeAgglomerator.build(mesh.cell_centers())
log(f"n_levels: {agg.n_levels}")

name = sys.argv[1] if len(sys.argv) > 1 else "full"
cs = sys.argv[2] if len(sys.argv) > 2 else "lu"
keep = {"full": agg.n_levels - 2,
        "last4": 4, "last3": 3, "last2": 2}[name]
lv = list(range(max(1, agg.n_levels - 1 - keep), agg.n_levels - 1))


def timeit(fn, *args, reps=3):
    r = fn(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
f = lambda x: 3 * jnp.pi**2 * u_ex(x)

t0 = time.perf_counter()
handlers, parents = build_rtree_hierarchy(mesh, agg, lv, degree=degree)
log(f"{name}: levels={lv} sizes={[h.n_poly for h in handlers]} "
    f"hier={time.perf_counter()-t0:.1f}s")
ah = handlers[-1]
ft = ah.faces
interior = ~ft.is_boundary
diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
offs = np.unique(np.concatenate([diffs, -diffs, np.zeros(1, np.int64)]))
t0 = time.perf_counter()
groups = build_banded_groups(ah, offs, dtype)
A0 = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs))(groups)
log(f"{name}: assembled {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                     chebyshev_degree=5, n_smooth=1,
                     precond_dtype=jnp.bfloat16, level_assembly="banded",
                     coarse_solver=cs)
log(f"{name}: mg built {time.perf_counter()-t0:.1f}s")
b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)
sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=1e-8, maxiter=100))
t0 = time.perf_counter()
r = sol(b); float(jnp.sum(r.x))
log(f"{name}: solve compiled+run {time.perf_counter()-t0:.1f}s")
ts = timeit(sol, b)
log(f"RESULT {name}/{cs}: sizes={[h.n_poly for h in handlers]} "
    f"iters={int(r.iterations)} res={float(r.residual):.2e} "
    f"solve={ts*1000:.1f}ms dof/s={ah.n_dofs/ts/1e6:.2f}M")
