"""Packed SpMV: pre-rolled far copies (near_limit=-1) vs block-COO far
tail (near_limit=default tile) at the 1M-DoF R-tree leaf level."""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
import polydeal_tpu as pd
from polydeal_tpu.agglomeration import RTreeAgglomerator
from polydeal_tpu.assembly.sipg import (assemble_sipg_banded_direct,
                                        build_banded_groups)
from polydeal_tpu.ops.packed import build_pack_plan, choose_near_limit


def log(m):
    print(m, file=sys.stderr, flush=True)


n = 64
mesh = pd.hyper_cube(3, n)
agg = RTreeAgglomerator.build(mesh.cell_centers())
c2p = agg.extract_agglomerates(agg.n_levels - 1)
ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
ft = ah.faces
interior = ~ft.is_boundary
diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
offs = np.unique(np.concatenate([diffs, -diffs, np.zeros(1, np.int64)]))
groups = build_banded_groups(ah, offs, jnp.float32)
A = jax.jit(lambda t: assemble_sipg_banded_direct(ah, t, offsets=offs))(groups)
jax.block_until_ready(A.data)
log(f"assembled; n_off={len(offs)} near_limit_default="
    f"{choose_near_limit(ah.n_poly, ah.n_basis)}")

rng = np.random.default_rng(0)
xt32 = jnp.asarray(rng.standard_normal((ah.n_basis, ah.n_poly)),
                   dtype=jnp.float32)


def timeit(fn, *args, reps=5):
    r = fn(*args); float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chain_rate(m, x, k1=1, k2=17):
    def mk(k):
        @jax.jit
        def run(v, mm):
            out, _ = jax.lax.scan(
                lambda c, _: (mm.matvec_t(c).astype(c.dtype), None),
                v, None, length=k)
            return out
        return run
    t1 = timeit(mk(k1), x, m)
    t2 = timeit(mk(k2), x, m)
    return (t2 - t1) / (k2 - k1)


results = {}
for label, nl in (("rolled(-1)", -1), ("blockCOO(default)", None)):
    plan, oid, frows, fcols = build_pack_plan(
        ft.poly_in[interior], ft.poly_out[interior],
        ah.n_poly, ah.n_basis, offsets=offs, near_limit=nl)
    n_far = 0 if frows is None else int(np.asarray(frows).size)
    pk = jax.jit(lambda a, o: a.to_packed(plan, o, frows, fcols))(
        A, jnp.asarray(oid))
    jax.block_until_ready(pk.data_i)
    for dt in (jnp.float32, jnp.bfloat16):
        m = pk if dt == jnp.float32 else pk.astype(dt)
        x = xt32.astype(dt)
        t = chain_rate(m, x)
        key = f"{label} {dt.__name__}"
        results[key] = t
        log(f"{key}: K={plan.K} n_far={n_far} spmv={t*1e3:.3f}ms")
for k, v in results.items():
    log(f"SUMMARY {k}: {v*1e3:.3f}ms")
