"""Real-chip 1-device ShardedBandedSystem vs unsharded solve.

The VERDICT round-2 gate: the sharded solver consuming the fast
banded/packed setup should be within ~10% of the unsharded solve on one
device (collectives are identity at n_dev=1; any gap is overhead of the
shard_map program structure).
"""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
from polydeal_tpu.utils.timer import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import Mesh
import polydeal_tpu as pd
from polydeal_tpu.assembly.sipg import (assemble_rhs_direct,
    assemble_sipg_banded_direct, build_banded_groups)
from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy
from polydeal_tpu.parallel.banded import ShardedBandedSystem


def log(m):
    print(m, file=sys.stderr, flush=True)


n = 64; degree = 1
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
offs = np.unique(np.concatenate([diffs, -diffs, np.zeros(1, np.int64)]))
groups = build_banded_groups(ah, offs, dtype)
A0 = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs))(groups)
mg = build_multigrid(handlers, parents, A0, dtype=dtype,
                     grid_shapes=grid_shapes,
                     chebyshev_degree=5, n_smooth=1,
                     precond_dtype=jnp.bfloat16, level_assembly="banded",
                     coarse_solver="inv")
b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)
log("setup done")


def timeit(fn, *args, reps=3):
    r = fn(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=1e-8, maxiter=100))
r = sol(b); float(jnp.sum(r.x))
t_host = timeit(sol, b)
log(f"unsharded: iters={int(r.iterations)} solve={t_host*1e3:.1f}ms "
    f"dof/s={ah.n_dofs/t_host/1e6:.2f}M")

dmesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
ss = ShardedBandedSystem.from_multigrid(mg, dmesh)
xs, ks, ress = ss.solve_cg(b, rtol=1e-8, maxiter=100)
# device-result entry point: solve_cg's scalar host reads are tunnel
# round trips the unsharded arm never pays
t_sh = timeit(lambda bb: ss.solve_cg_async(bb, rtol=1e-8, maxiter=100)[0], b)
log(f"sharded(1dev): iters={ks} solve={t_sh*1e3:.1f}ms "
    f"dof/s={ah.n_dofs/t_sh/1e6:.2f}M ratio={t_sh/t_host:.3f}")
assert ks == int(r.iterations), (ks, int(r.iterations))
err = float(jnp.max(jnp.abs(xs - r.x)))
log(f"max|x_sharded - x_host| = {err:.2e}")
