"""Multigrid tests (reference tier 6: coarse_operator_from_matrix_free,
distributed_injection_01, and the agglo_amg flagship behavior)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import RTreeAgglomerator
from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
from polydeal_tpu.postprocess import compute_global_error
from polydeal_tpu.solvers import (
    build_embedding,
    build_multigrid,
    build_rtree_hierarchy,
    cg_solve,
    galerkin_coarsen,
    block_jacobi_preconditioner,
)


def make_hierarchy(n=16, degree=1, dim=2, start=1, distort=0.0):
    m0 = pd.hyper_cube(dim, n)
    m = pd.distort_random(m0, distort, seed=2) if distort else m0
    agg = RTreeAgglomerator.build(m0.cell_centers())
    levels = list(range(start, agg.n_levels - 1))
    return build_rtree_hierarchy(m, agg, levels, degree=degree)


def test_embedding_exact_on_polynomials():
    """Prolongation reproduces coarse polynomials exactly — the invariant
    behind reference fill_injection_matrix (utils.h:190-239)."""
    handlers, parents = make_hierarchy(n=8, degree=2)
    hc, hf = handlers[0], handlers[1]
    E = build_embedding(hc, hf, parents[0])
    from polydeal_tpu.assembly import project
    from polydeal_tpu.solvers.multigrid import Transfer

    t = Transfer(E=E, parent=parents[0], n_coarse=hc.n_poly)
    fn = lambda x: 1.0 + 2 * x[..., 0] - x[..., 1] + 0.5 * x[..., 0] * x[..., 1]
    u_c = project(hc, fn)
    u_f = t.prolong(u_c)
    l2, _ = compute_global_error(hf, u_f, fn)
    assert float(l2) < 1e-13


def test_restriction_is_transpose():
    handlers, parents = make_hierarchy(n=8, degree=1)
    hc, hf = handlers[0], handlers[1]
    E = build_embedding(hc, hf, parents[0])
    from polydeal_tpu.solvers.multigrid import Transfer

    t = Transfer(E=E, parent=parents[0], n_coarse=hc.n_poly)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=hc.n_dofs))
    v = jnp.asarray(rng.normal(size=hf.n_dofs))
    assert abs(float(v @ t.prolong(u)) - float(t.restrict(v) @ u)) < 1e-12


def test_galerkin_equals_triple_product():
    """A_c == Pᵀ A_f P checked densely (reference AmgProjector semantics,
    multigrid_amg.h:274-305)."""
    handlers, parents = make_hierarchy(n=8, degree=1)
    hc, hf = handlers[0], handlers[1]
    A_f = assemble_sipg_matrix(hf)
    E = build_embedding(hc, hf, parents[0])
    A_c = galerkin_coarsen(A_f, E, parents[0], hc.n_poly)
    # dense P
    nb = hf.n_basis
    P = np.zeros((hf.n_dofs, hc.n_dofs))
    for c in range(hf.n_poly):
        p = parents[0][c]
        P[c * nb : (c + 1) * nb, p * nb : (p + 1) * nb] = np.asarray(E[c])
    dense = P.T @ np.asarray(A_f.to_dense()) @ P
    assert np.allclose(np.asarray(A_c.to_dense()), dense, atol=1e-11)


@pytest.mark.parametrize("dim,n,start", [(2, 16, 1), (3, 8, 1)])
def test_mg_preconditioned_cg_fast(dim, n, start):
    """CG + polytopal-MG converges in O(10) iterations, far fewer than
    Jacobi-CG — the R3MG headline behavior (agglo_amg.cc:1408-1420)."""
    handlers, parents = make_hierarchy(n=n, degree=1, dim=dim, start=start)
    hf = handlers[-1]
    A = assemble_sipg_matrix(hf)
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: dim * jnp.pi**2 * u_ex(x)
    b = assemble_rhs(hf, f, u_ex)
    mg = build_multigrid(handlers, parents, A)
    res = mg.solve_cg(b, rtol=1e-9)
    assert float(res.residual) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
    assert int(res.iterations) <= 16, int(res.iterations)
    # compare: block-jacobi CG needs far more iterations
    res_j = cg_solve(A.matvec, b, M=block_jacobi_preconditioner(A.diag_blocks()),
                     rtol=1e-9, maxiter=2000)
    assert int(res_j.iterations) > 2 * int(res.iterations)


def test_mg_iterations_mesh_independent():
    """Iteration counts stay ~flat under refinement (the multigrid
    property the R3MG paper demonstrates)."""
    iters = []
    for n in (8, 16, 32):
        handlers, parents = make_hierarchy(n=n, degree=1)
        hf = handlers[-1]
        A = assemble_sipg_matrix(hf)
        b = assemble_rhs(hf, lambda x: jnp.ones_like(x[..., 0]), None)
        mg = build_multigrid(handlers, parents, A)
        res = mg.solve_cg(b, rtol=1e-9)
        iters.append(int(res.iterations))
    assert iters[2] <= iters[0] + 8, iters


def test_mg_galerkin_mode():
    """Inherited (Galerkin) coarsening — reference AmgProjector parity —
    still converges, just with more iterations than direct mode."""
    handlers, parents = make_hierarchy(n=16, degree=1)
    hf = handlers[-1]
    A = assemble_sipg_matrix(hf)
    b = assemble_rhs(hf, lambda x: jnp.ones_like(x[..., 0]), None)
    mg = build_multigrid(handlers, parents, A, mode="galerkin")
    res = mg.solve_cg(b, rtol=1e-9)
    assert float(res.residual) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
    assert int(res.iterations) <= 25


def test_mg_distorted_grid():
    handlers, parents = make_hierarchy(n=16, degree=1, distort=0.15)
    hf = handlers[-1]
    A = assemble_sipg_matrix(hf)
    u_ex = lambda x: x[..., 0] + x[..., 1]
    b = assemble_rhs(hf, lambda x: jnp.zeros_like(x[..., 0]), u_ex)
    mg = build_multigrid(handlers, parents, A)
    res = mg.solve_cg(b, rtol=1e-11)
    l2, _ = compute_global_error(hf, res.x, u_ex)
    assert float(l2) < 1e-10


def test_structured_hierarchy_matches_rtree():
    """Structured (lexicographic + reshape transfers) MG solves the same
    system to the same solution as the generic path, with 2*dim+1 banded
    offsets at every level."""
    from polydeal_tpu.solvers import build_structured_hierarchy

    m = pd.hyper_cube(2, 16)
    handlers, parents, gss = build_structured_hierarchy(m, 16, degree=1)
    hf = handlers[-1]
    A = assemble_sipg_matrix(hf)
    assert A.banded_offsets().shape[0] == 5  # 2*dim + 1
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    b = assemble_rhs(hf, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg = build_multigrid(handlers, parents, A, grid_shapes=gss)
    res = mg.solve_cg(b, rtol=1e-10)
    assert int(res.iterations) <= 16
    # adjointness of the structured transfers
    t = mg.transfers[-1]
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=handlers[-2].n_dofs))
    v = jnp.asarray(rng.normal(size=handlers[-1].n_dofs))
    assert abs(float(v @ t.prolong(u)) - float(t.restrict(v) @ u)) < 1e-11
    # same L2 error as the generic hierarchy solve
    from polydeal_tpu.postprocess import compute_global_error

    l2, _ = compute_global_error(hf, res.x, u_ex)
    assert abs(float(l2) - 0.056) < 0.002


def test_banded_level_assembly_matches():
    """level_assembly='banded' (memory-lean setup for 10^7+ DoF) gives
    the same MG as the table-based per-level assembly."""
    from polydeal_tpu.solvers import build_structured_hierarchy

    mesh = pd.hyper_cube(2, 16)
    handlers, parents, gs = build_structured_hierarchy(mesh, 16, degree=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg_a = build_multigrid(handlers, parents, A, grid_shapes=gs)
    mg_b = build_multigrid(handlers, parents, A, grid_shapes=gs,
                           level_assembly="banded")
    ra = mg_a.solve_cg(b, rtol=1e-9)
    rb = mg_b.solve_cg(b, rtol=1e-9)
    assert abs(int(ra.iterations) - int(rb.iterations)) <= 1
    assert np.allclose(np.asarray(ra.x), np.asarray(rb.x), atol=1e-7)


def test_packed_level_mg_matches():
    """pack=True (the wide-offset R-tree fast path: conflict-colored
    per-lane slots + the resident-x Pallas kernel, interpret mode on
    CPU) must reproduce the banded MG solve."""
    from polydeal_tpu.sparse import BlockPacked
    from polydeal_tpu.assembly.sipg import (
        assemble_sipg_banded_direct, build_banded_groups)

    handlers, parents = make_hierarchy(n=16, degree=1, dim=2, start=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([diffs, -diffs,
                                     np.zeros(1, dtype=np.int64)]))
    groups = build_banded_groups(ah, offs, jnp.float64)
    A = assemble_sipg_banded_direct(ah, groups, offsets=offs,
                                    use_pallas=False)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg_a = build_multigrid(handlers, parents, A, level_assembly="banded",
                           pack=False)
    mg_b = build_multigrid(handlers, parents, A, level_assembly="banded",
                           pack=True)
    assert isinstance(mg_b.ells[-1], BlockPacked)
    ra = mg_a.solve_cg(b, rtol=1e-9)
    rb = mg_b.solve_cg(b, rtol=1e-9)
    assert abs(int(ra.iterations) - int(rb.iterations)) <= 1
    assert np.allclose(np.asarray(ra.x), np.asarray(rb.x), atol=1e-7)


def test_coarse_solver_inv_matches_lu():
    """The explicit-inverse coarse solve (one MXU matmul instead of the
    TPU-latency-bound triangular solves; Utils::MGCoarseDirect analogue,
    reference utils.h:286-350) must reproduce the LU path: same CG
    iteration count, same solution."""
    handlers, parents = make_hierarchy(n=16, degree=1, dim=2, start=2)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg_lu = build_multigrid(handlers, parents, A, coarse_solver="lu")
    mg_inv = build_multigrid(handlers, parents, A, coarse_solver="inv")
    assert len(mg_lu.coarse_lu) == 2 and len(mg_inv.coarse_lu) == 1
    ra = mg_lu.solve_cg(b, rtol=1e-10)
    rb = mg_inv.solve_cg(b, rtol=1e-10)
    assert int(ra.iterations) == int(rb.iterations)
    assert np.allclose(np.asarray(ra.x), np.asarray(rb.x), atol=1e-9)


def test_precond_dtype_low_precision_converges():
    """precond_dtype (the bench runs bf16 on TPU): low-precision V-cycle
    vectors + smoother copies, full-precision CG operator.  The CG
    solve must still reach the tight tolerance — the preconditioner may
    be inexact, CG stays full-precision.  Covers both the banded and
    the packed fine level.

    CPU CI exercises the machinery with precond_dtype=float32 against
    the f64 operator (a genuinely inexact preconditioner): XLA:CPU's
    bf16 EMULATION makes bf16-heavy bodies pathologically slow to
    compile (>30 min observed for one V-cycle), so bf16 numerics proper
    are certified on real TPU hardware by bench.py (which solves to
    1e-8 with precond_dtype=bfloat16 every round).  The bf16 wiring
    (copies, dtypes, packed-level object reuse) is asserted here
    without executing bf16 code."""
    import jax.numpy as jnp

    handlers, parents = make_hierarchy(n=16, degree=1, dim=2, start=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    ref = build_multigrid(handlers, parents, A,
                          level_assembly="banded").solve_cg(b, rtol=1e-9)
    # packing engages on a BlockBanded fine level (maybe_pack_level)
    from polydeal_tpu.sparse import BlockPacked
    from polydeal_tpu.assembly.sipg import (
        assemble_sipg_banded_direct, build_banded_groups)

    ft = ah.faces
    interior = ~ft.is_boundary
    diffs = (ft.poly_out - ft.poly_in)[interior].astype(np.int64)
    offs = np.unique(np.concatenate([diffs, -diffs,
                                     np.zeros(1, dtype=np.int64)]))
    A_band = assemble_sipg_banded_direct(
        ah, build_banded_groups(ah, offs, jnp.float64), offsets=offs,
        use_pallas=False)
    for pack in (False, True):
        # bf16 wiring (no execution — see docstring).  precond_dtype
        # alone lowers only the MATRIX copies; vectors stay at the
        # operator dtype (bf16 vectors measured 2-3x the iterations)
        mg16 = build_multigrid(handlers, parents, A_band if pack else A,
                               level_assembly="banded",
                               pack=pack, precond_dtype=jnp.bfloat16)
        assert mg16.lo_ells is not None
        assert mg16.lo_dinvs[-1].dtype == mg16.dinvs_t[-1].dtype
        if pack:
            # packed levels must REUSE the full-precision operator object
            # (bf16 packed kernel measured slower on v5e; no dup band)
            assert isinstance(mg16.ells[-1], BlockPacked)
            assert mg16.lo_ells[-1] is mg16.ells[-1]
        else:
            assert mg16.lo_ells[-1].data.dtype == jnp.bfloat16
        del mg16
        # vector_dtype additionally lowers the smoothing vectors
        mg16v = build_multigrid(handlers, parents, A_band if pack else A,
                                level_assembly="banded",
                                pack=pack, precond_dtype=jnp.bfloat16,
                                vector_dtype=jnp.bfloat16)
        assert mg16v.lo_dinvs[-1].dtype == jnp.bfloat16
        del mg16v
        # f32-precond solve: the same lo-policy code paths, executable
        # on CPU at normal compile cost (vectors AND matrix copies f32
        # against the f64 operator — a genuinely inexact preconditioner)
        mg = build_multigrid(handlers, parents, A_band if pack else A,
                             level_assembly="banded",
                             pack=pack, precond_dtype=jnp.float32,
                             vector_dtype=jnp.float32)
        res = mg.solve_cg(b, rtol=1e-9)
        assert float(res.residual) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
        # an inexact (f32) preconditioner may cost a few extra CG
        # iterations, never multiples
        assert int(res.iterations) <= int(ref.iterations) + 4
        assert np.allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-7)


def test_fmg_initial_guess():
    """solve_cg(fmg=True) — FMG restrict/solve/prolong-correct initial
    guess — must reach the same tight tolerance and solution with FEWER
    CG iterations than the zero start, on both the rtree (packed/banded)
    and structured layouts."""
    from polydeal_tpu.solvers import build_structured_hierarchy

    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)

    def run(handlers, parents, gs):
        ah = handlers[-1]
        A = assemble_sipg_matrix(ah)
        b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
        mg = build_multigrid(handlers, parents, A, grid_shapes=gs,
                             level_assembly="banded")
        r0 = mg.solve_cg(b, rtol=1e-9)
        r1 = mg.solve_cg(b, rtol=1e-9, fmg=True)
        nb = float(jnp.linalg.norm(b))
        assert float(r1.residual) <= 1e-9 * nb * 1.01
        assert int(r1.iterations) < int(r0.iterations)
        assert np.allclose(np.asarray(r1.x), np.asarray(r0.x), atol=1e-7)

    handlers, parents = make_hierarchy(n=16, degree=1, dim=2, start=1)
    run(handlers, parents, None)
    mesh2 = pd.hyper_cube(2, 16)
    handlers, parents, gs = build_structured_hierarchy(mesh2, 16, degree=1)
    run(handlers, parents, gs)


def test_per_level_smoother_schedule():
    """chebyshev_degree / n_smooth accept per-level tuples (coarsest
    first).  A schedule that keeps the fine level's smoothing but relaxes
    the latency-bound coarse levels must still converge to the same
    solution in a comparable iteration count."""
    handlers, parents = make_hierarchy(n=16, degree=1, dim=2, start=1)
    ah = handlers[-1]
    A = assemble_sipg_matrix(ah)
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    n_lv = len(handlers)
    ref = build_multigrid(handlers, parents, A, chebyshev_degree=5,
                          n_smooth=1).solve_cg(b, rtol=1e-9)
    sched = tuple([2] * (n_lv - 1) + [5])
    mg = build_multigrid(handlers, parents, A, chebyshev_degree=sched,
                         n_smooth=tuple([1] * n_lv))
    res = mg.solve_cg(b, rtol=1e-9)
    assert float(res.residual) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
    assert int(res.iterations) <= int(ref.iterations) + 4
    assert np.allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-7)
    with pytest.raises(ValueError):
        build_multigrid(handlers, parents, A, chebyshev_degree=(5, 2))


def test_band_minimizing_relabel():
    """The sliced-lexicographic relabel (relabel='lex') collapses the SFC
    ordering's band offsets to 2*dim+1 per level on a uniform mesh, the
    grid detector recognizes every transfer as a reshape pattern, and the
    solve is identical (same agglomerates, same iterations, same L2) on
    both the lane-gather and grid-reshape transfer paths."""
    from polydeal_tpu.solvers import detect_grid_shapes

    m = pd.hyper_cube(2, 16)
    agg = RTreeAgglomerator.build(m.cell_centers())
    levels = list(range(1, agg.n_levels - 1))
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    f = lambda x: 2 * jnp.pi**2 * u_ex(x)
    got = {}
    for rl in (None, "lex"):
        handlers, parents = build_rtree_hierarchy(
            m, agg, levels, degree=1, relabel=rl)
        hf = handlers[-1]
        n_off = assemble_sipg_matrix(hf).banded_offsets().shape[0]
        gs = detect_grid_shapes(handlers, parents) if rl else None
        A = assemble_sipg_matrix(hf)
        b = assemble_rhs(hf, f, u_ex)
        mg = build_multigrid(handlers, parents, A, grid_shapes=gs)
        res = mg.solve_cg(b, rtol=1e-10)
        l2, _ = compute_global_error(hf, res.x, u_ex)
        got[rl] = (n_off, int(res.iterations), float(l2))
        if rl == "lex":
            assert n_off == 5  # 2*dim + 1, matching the structured path
            assert gs is not None and gs[-1] == (16, 16)
            # transfers stay adjoint on the gather path too
            mg2 = build_multigrid(handlers, parents, A)  # no grid_shapes
            t = mg2.transfers[-1]
            assert t._gather_t and t.t_fast
            rng = np.random.default_rng(0)
            u = jnp.asarray(rng.normal(size=handlers[-2].n_dofs))
            v = jnp.asarray(rng.normal(size=handlers[-1].n_dofs))
            assert abs(float(v @ t.prolong(u))
                       - float(t.restrict(v) @ u)) < 1e-11
            nb = t.E.shape[-1]
            ut, vt = u.reshape(-1, nb).T, v.reshape(-1, nb).T
            assert abs(float(jnp.vdot(vt, t.prolong_t(ut)))
                       - float(jnp.vdot(t.restrict_t(vt), ut))) < 1e-11
            # gather vs grid transfers differ only in FP summation order;
            # CG may stop one iteration apart at the tolerance boundary
            r2 = mg2.solve_cg(b, rtol=1e-10)
            assert abs(int(r2.iterations) - int(res.iterations)) <= 1
            l2b, _ = compute_global_error(hf, r2.x, u_ex)
            assert abs(float(l2b) - float(l2)) < 1e-12
    # same MG method, ids moved only: FP summation order may shift CG's
    # stopping point by one iteration at the tolerance boundary
    assert abs(got[None][1] - got["lex"][1]) <= 1
    assert abs(got[None][2] - got["lex"][2]) < 1e-12
    assert got["lex"][0] < got[None][0]


def test_relabel_distorted_mesh_gather_path():
    """On a distorted mesh the relabel still solves to discretization
    accuracy with identical iterations to the SFC ordering (the gather
    transfer path when grid detection fails is exercised via
    grid_shapes=None)."""
    m = pd.distort_random(pd.hyper_cube(2, 16), 0.15, seed=4)
    agg = RTreeAgglomerator.build(m.cell_centers())
    levels = list(range(2, agg.n_levels - 1))
    u_ex = lambda x: x[..., 0] + x[..., 1]
    got = []
    for rl in (None, "lex"):
        handlers, parents = build_rtree_hierarchy(
            m, agg, levels, degree=1, relabel=rl)
        hf = handlers[-1]
        A = assemble_sipg_matrix(hf)
        b = assemble_rhs(hf, lambda x: jnp.zeros_like(x[..., 0]), u_ex)
        mg = build_multigrid(handlers, parents, A)
        res = mg.solve_cg(b, rtol=1e-11)
        l2, _ = compute_global_error(hf, res.x, u_ex)
        assert float(l2) < 1e-10
        got.append(int(res.iterations))
    assert got[0] == got[1]
