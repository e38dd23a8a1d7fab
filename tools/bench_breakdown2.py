"""Tunnel-overhead-corrected breakdown: chain N ops in one call."""
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
b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)
Ap = mg.ells[-1]
xt = jnp.asarray(np.random.default_rng(0).normal(size=(ah.n_basis, ah.n_poly)), dtype)

def timeit(fn, *args, reps=5):
    r = fn(*args); jax.block_until_ready(r); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

tiny = jnp.ones((8, 128), dtype)
rtt = timeit(jax.jit(lambda z: z + 1.0), tiny)
print("rtt (trivial call):", rtt, file=sys.stderr)

def chain(fn, k):
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=k)
        return out
    return jax.jit(run)

for k in (1, 9):
    t = timeit(chain(lambda v: Ap.matvec_t(v), k), xt)
    print(f"spmv chain x{k}:", t, file=sys.stderr)
for k in (1, 5):
    t = timeit(chain(lambda v: mg.v_cycle(v), k), b)
    print(f"vcycle chain x{k}:", t, file=sys.stderr)
