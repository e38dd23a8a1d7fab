"""Fused Chebyshev-step kernel vs composed SpMV+updates, on-chip rates.

Measures, at the 1M-DoF leaf level (both the packed/rtree and the
banded/structured fine formats, f32 and the bf16 smoother copy):
  - bare matvec_t rate
  - fused cheb_step_t rate
  - composed cheb5 smooth vs fused cheb5 smooth
Chained-scan slope methodology (utils.timer.chained_cost); operators are
passed as scan OPERANDS, not closures — closure capture would inline the
134 MB band as MLIR constants and crash the remote compiler.
"""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import numpy as np
import jax, jax.numpy as jnp
import polydeal_tpu as pd
from polydeal_tpu.assembly.sipg import (assemble_sipg_banded_direct,
                                        build_banded_groups)
from polydeal_tpu.agglomeration import RTreeAgglomerator
from polydeal_tpu.solvers import build_structured_hierarchy
from polydeal_tpu.solvers.chebyshev import ChebyshevSmoother
from polydeal_tpu.utils.timer import chained_cost


def log(m):
    print(m, file=sys.stderr, flush=True)


n = 64
mesh = pd.hyper_cube(3, n)


def build_band(hierarchy):
    if hierarchy == "rtree":
        agg = RTreeAgglomerator.build(mesh.cell_centers())
        c2p = agg.extract_agglomerates(agg.n_levels - 1)
        ah = pd.AgglomerationHandler(mesh, c2p, degree=1)
    else:
        handlers, _, _ = build_structured_hierarchy(mesh, n, degree=1,
                                                    coarsest_side=n)
        ah = handlers[-1]
    ft = ah.faces
    interior = ~ft.is_boundary
    d = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([d, -d, [0]]))
    groups = build_banded_groups(ah, offs, jnp.float32)
    A = jax.jit(lambda t: assemble_sipg_banded_direct(
        ah, t, offsets=offs))(groups)
    return ah, A, offs


def rate_mv(mm, x):
    return chained_cost(
        lambda c, m: m.matvec_t(c).astype(c.dtype), x, mm)


def rate_step(mm, dinv, b, x):
    def body(c, m, dv, bb):
        xx, dd = c
        return m.cheb_step_t(xx, dd, bb, dv, 0.9, 0.1)

    return chained_cost(body, (x, jnp.zeros_like(x)), mm, dinv, b)


def rate_smooth(mm, dinv, b, x, fused: bool):
    interp = jax.default_backend() != "tpu"

    def body(xx, m, dv, bb):
        step = (lambda x2, d2, c1, c2: m.cheb_step_t(
            x2, d2, bb, dv, c1, c2, interpret=interp)) if fused else None
        sm = ChebyshevSmoother(A=m.matvec_t, Minv=lambda r: dv * r,
                               lo=0.06, hi=1.2, degree=5, step_fn=step)
        return sm(bb, xx)

    return chained_cost(body, x, mm, dinv, b, n_large=24)


for hier in ("rtree", "structured"):
    ah, A, offs = build_band(hier)
    ft = ah.faces
    interior = ~ft.is_boundary
    if hier == "rtree":
        from polydeal_tpu.ops.packed import build_pack_plan
        plan, oid, _, _ = build_pack_plan(
            ft.poly_in[interior], ft.poly_out[interior],
            ah.n_poly, ah.n_basis, offsets=offs, near_limit=-1)
        m = jax.jit(lambda a, o: a.to_packed(plan, o))(A, jnp.asarray(oid))
        variants = {"f32": m}
    else:
        m = jax.jit(lambda a: a.with_imajor(drop_omajor=True))(A)
        m16 = jax.jit(lambda a: type(a)(
            a.data.astype(jnp.bfloat16), a.offsets,
            a.n_block_cols).with_imajor(drop_omajor=True))(A)
        variants = {"f32": m, "bf16": m16}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ah.n_basis, ah.n_poly)),
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((ah.n_basis, ah.n_poly)),
                    jnp.float32)
    dinv = 1.0 / variants["f32"].diagonal_t()
    for name, mm in variants.items():
        t_mv = rate_mv(mm, x)
        t_st = rate_step(mm, dinv, b, x)
        t_sc = rate_smooth(mm, dinv, b, x, fused=False)
        t_sf = rate_smooth(mm, dinv, b, x, fused=True)
        log(f"{hier}/{name}: matvec {t_mv*1e3:.3f}ms  fused_step "
            f"{t_st*1e3:.3f}ms  cheb5 composed {t_sc*1e3:.3f}ms  "
            f"fused {t_sf*1e3:.3f}ms")
