"""Level-trimming experiment: V-cycle cost vs iteration count."""
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
print("n_levels:", agg.n_levels, file=sys.stderr)

def timeit(fn, *args, reps=5):
    r = fn(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def chain(fn, k):
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None, length=k)
        return out
    return jax.jit(run)

u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
f = lambda x: 3 * jnp.pi**2 * u_ex(x)

variants = {
    "full": list(range(1, agg.n_levels - 1)),
    "last3": list(range(max(1, agg.n_levels - 4), agg.n_levels - 1)),
    "last2": list(range(max(1, agg.n_levels - 3), agg.n_levels - 1)),
}
for name, lv in variants.items():
    handlers, parents = build_rtree_hierarchy(mesh, agg, lv, degree=degree)
    ah = handlers[-1]
    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([diffs, -diffs, np.zeros(1, np.int64)]))
    groups = build_banded_groups(ah, offs, dtype)
    A0 = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs))(groups)
    mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                         chebyshev_degree=5, n_smooth=1,
                         precond_dtype=jnp.bfloat16, level_assembly="banded")
    b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)
    t1 = timeit(chain(lambda v: mg.v_cycle(v), 1), b)
    t5 = timeit(chain(lambda v: mg.v_cycle(v), 5), b)
    sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=1e-8, maxiter=100))
    r = sol(b)
    ts = timeit(sol, b)
    sizes = [h.n_poly for h in handlers]
    print(f"{name}: sizes={sizes} vcycle={(t5-t1)/4*1000:.2f}ms "
          f"iters={int(r.iterations)} solve={ts*1000:.1f}ms", file=sys.stderr)
    del mg, groups, A0, handlers
