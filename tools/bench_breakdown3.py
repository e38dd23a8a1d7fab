"""Chained-scan breakdown of the trimmed rtree bench config (trim=3, inv).

Per-component costs with the 35ms tunnel RTT cancelled:
cost = (t(chain k2) - t(chain k1)) / (k2 - k1).
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
lv = list(range(max(1, agg.n_levels - 4), agg.n_levels - 1))  # trim=3
handlers, parents = build_rtree_hierarchy(mesh, agg, lv, degree=degree)
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
                     precond_dtype=jnp.bfloat16, level_assembly="banded",
                     coarse_solver="inv")
# pack the fine level like the bench does
from polydeal_tpu.ops.packed import build_pack_plan
from polydeal_tpu.sparse import BlockPacked
plan, oid, _, _ = build_pack_plan(
    ft.poly_in[interior], ft.poly_out[interior],
    ah.n_poly, ah.n_basis, offsets=offs, near_limit=-1)
oid_dev = jnp.asarray(oid)
mg.ells[-1] = A0.to_packed(plan, oid_dev)
if mg.lo_ells is not None:
    mg.lo_ells[-1] = mg.ells[-1].astype(jnp.bfloat16)
b = jax.jit(lambda t: assemble_rhs_direct(ah, t, f, u_ex))(groups)


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


def rate(fn, x, k1=1, k2=9):
    fn_c = lambda v: fn(v).astype(v.dtype)
    t1 = timeit(chain(fn_c, k1), x)
    t2 = timeit(chain(fn_c, k2), x)
    return (t2 - t1) / (k2 - k1)


tiny = jnp.ones((8, 128), dtype)
log(f"rtt: {timeit(jax.jit(lambda z: z + 1.0), tiny)*1e3:.1f}ms")

xt = jnp.asarray(np.random.default_rng(0).normal(
    size=(ah.n_basis, ah.n_poly)), dtype)
log(f"fine packed SpMV f32: {rate(lambda v: mg.ells[-1].matvec_t(v), xt)*1e3:.3f}ms")
lo = mg.lo_ells[-1]
xt16 = xt.astype(jnp.bfloat16)
log(f"fine packed SpMV bf16: {rate(lambda v: lo.matvec_t(v), xt16, k2=33)*1e3:.3f}ms")

# per-level smoothing cost: one Chebyshev application (deg 5) per level
from polydeal_tpu.solvers.multigrid import ChebyshevSmoother
for li in range(1, mg.n_levels):
    A = (mg.lo_ells or mg.ells)[li]
    dinv = (mg.lo_dinvs or mg.dinvs_t)[li]
    dv = dinv if dinv.ndim == 2 else dinv.reshape(-1, mg._nb(li)).T
    sm = ChebyshevSmoother(A=A.matvec_t, Minv=lambda r: dv * r,
                           lo=mg.los[li], hi=mg.his[li], degree=5)
    nb = mg._nb(li)
    P = mg.matrices[li].n_block_rows if hasattr(mg.matrices[li], "n_block_rows") else A.data.shape[-1]
    z = jnp.asarray(np.random.default_rng(1).normal(size=(nb, P)),
                    dv.dtype)
    log(f"level {li} (P={P}) cheb5 smooth: {rate(lambda v: sm(z, v), z, k2=17)*1e3:.3f}ms")

# coarse inverse matmul
binv = mg.coarse_lu[0]
z0 = jnp.asarray(np.random.default_rng(2).normal(size=binv.shape[0]),
                 binv.dtype)
log(f"coarse inv matmul ({binv.shape[0]}): {rate(lambda v: binv @ v, z0, k2=33)*1e3:.3f}ms")

log(f"full V-cycle: {rate(lambda v: mg.v_cycle(v), b, k1=1, k2=5)*1e3:.3f}ms")

# assembly: tables as ARGUMENTS (closure constants overflow the remote
# compiler), per-step carry dependency so scan can't CSE it
def asm_chain(k):
    @jax.jit
    def run(c, tabs):
        def body(cc, _):
            t2 = jax.tree.map(
                lambda a: a * (1.0 + 0.0 * cc[0, 0]).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tabs)
            A = assemble_sipg_banded_direct(ah, t2, offsets=offs)
            return cc + jnp.sum(A.data[:, :, :, :1]).astype(cc.dtype), None
        out, _ = jax.lax.scan(body, c, None, length=k)
        return out
    return run

t1 = timeit(asm_chain(1), tiny, groups)
t2 = timeit(asm_chain(4), tiny, groups)
log(f"assembly (banded direct): {(t2-t1)/3*1e3:.3f}ms")

sol = jax.jit(lambda bb: mg.solve_cg(bb, rtol=1e-8, maxiter=100))
r = sol(b); float(jnp.sum(r.x))
ts = timeit(sol, b)
log(f"solve_cg: {ts*1e3:.1f}ms iters={int(r.iterations)}")
