"""Component-level comparison: ShardedBandedSystem (1 device) vs the
unsharded solver, chained-cost methodology (dispatch latency cancels).

The chains run INSIDE one shard_map program (the flat->transposed layout
conversion happens once, exactly like solve_cg), so the numbers isolate
the per-application cost of the sharded matvec / V-cycle themselves.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from jax.sharding import Mesh, PartitionSpec as Ps
import polydeal_tpu as pd
from polydeal_tpu.assembly.sipg import (assemble_rhs_direct,
    assemble_sipg_banded_direct, build_banded_groups)
from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy
from polydeal_tpu.parallel.banded import ShardedBandedSystem
from polydeal_tpu.utils.timer import chained_cost


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

dmesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
ss = ShardedBandedSystem.from_multigrid(mg, dmesh)
nb = mg.ells[-1].n_basis
P = mg.ells[-1].n_block_rows
xt = jnp.asarray(np.random.default_rng(0).normal(size=(nb, P)), dtype)
xf = xt.T.reshape(-1)
fine = ss.levels[-1]
log(f"fine level: kind={fine.kind} T={fine.T} use_kernel={fine.use_kernel} "
    f"per={fine.per} nb={fine.nb}")


def sharded_chain_cost(step_loc, n_small=4, n_large=36, reps=3):
    """step_loc: [nb, per] -> [nb, per], run inside shard_map on chains."""
    def chain(k):
        @partial(jax.shard_map, mesh=dmesh,
                 in_specs=(Ps("shard"), ss._specs(),
                           jax.tree.map(lambda _: Ps(), ss.rep_mg)),
                 out_specs=Ps("shard"), check_vma=False)
        def run(b_flat, lv, rep):
            v = b_flat.reshape(-1, nb).T
            v = jax.lax.scan(lambda c, _: (step_loc(c, lv, rep), None),
                             v, None, length=k)[0]
            return v.T.reshape(-1)
        g = jax.jit(run)
        r = g(xf, ss.params, ss.rep_mg); float(jnp.sum(r))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = g(xf, ss.params, ss.rep_mg); float(jnp.sum(r))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (chain(n_large) - chain(n_small)) / (n_large - n_small)


# --- fine matvec: host vs sharded (fair: chain inside shard_map) ---
log(f"host fine matvec f32:    {chained_cost(lambda v: mg.ells[-1].matvec_t(v), xt)*1e3:.3f} ms")
c = sharded_chain_cost(lambda v, lv, rep: ss._matvec(fine, lv[-1], v))
log(f"sharded fine matvec f32: {c*1e3:.3f} ms")

if mg.lo_ells is not None:
    log(f"host lo matvec (bf16 band, f32 x):    {chained_cost(lambda v: mg.lo_ells[-1].matvec_t(v), xt)*1e3:.3f} ms")
    c = sharded_chain_cost(
        lambda v, lv, rep: ss._matvec(fine, lv[-1], v, lo=True).astype(v.dtype))
    log(f"sharded lo matvec (bf16 band, f32 x): {c*1e3:.3f} ms")

# --- one fine-level smooth (cheb deg 5) ---
c = sharded_chain_cost(
    lambda v, lv, rep: ss._smooth(fine, lv[-1], v, jnp.zeros_like(v)),
    n_small=2, n_large=10)
log(f"sharded fine smooth (cheb5): {c*1e3:.3f} ms")

# --- full V-cycle ---
log(f"host v_cycle:    {chained_cost(lambda v: mg.v_cycle(v), b, n_small=2, n_large=10)*1e3:.3f} ms")
c = sharded_chain_cost(
    lambda v, lv, rep: ss._cycle(lv, rep, len(ss.levels) - 1, v).astype(v.dtype),
    n_small=2, n_large=10)
log(f"sharded v_cycle: {c*1e3:.3f} ms")
