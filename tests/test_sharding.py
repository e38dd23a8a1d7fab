"""Multi-device SPMD tests on the 8-device virtual CPU mesh — the
analogue of the reference's mpirun=2/3 ctest tier (SURVEY §4 tiers 3-5).
Key invariant: results are independent of device count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.agglomeration import RTreeAgglomerator
from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
from polydeal_tpu.parallel import make_mesh, ShardedSystem, shard_block_matrix
from polydeal_tpu.postprocess import compute_global_error
from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy


def setup_problem(n=16, degree=1, **mg_kw):
    m0 = pd.hyper_cube(2, n)
    agg = RTreeAgglomerator.build(m0.cell_centers())
    handlers, parents = build_rtree_hierarchy(
        m0, agg, list(range(1, agg.n_levels - 1)), degree=degree
    )
    hf = handlers[-1]
    A = assemble_sipg_matrix(hf)
    u_ex = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    b = assemble_rhs(hf, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg = build_multigrid(handlers, parents, A, **mg_kw)
    return hf, A, b, mg, u_ex


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_matvec_matches(n_dev):
    hf, A, b, mg, _ = setup_problem(n=8)
    mesh = make_mesh(n_dev)
    ss = ShardedSystem.from_multigrid(mg, mesh)
    # unpreconditioned CG through the sharded path vs host CG
    x_s, k_s, res_s = ss.solve_cg(b, rtol=1e-10, maxiter=3000,
                                  precondition=False)
    from polydeal_tpu.solvers import cg_solve

    res_h = cg_solve(A.matvec, b, rtol=1e-10, maxiter=3000)
    assert np.allclose(np.asarray(x_s), np.asarray(res_h.x), atol=1e-8)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_mg_cg_device_count_invariant(n_dev):
    """MG-CG over the mesh: same iterations and same solution as 1 device
    (the reference's 'identical errors regardless of rank count')."""
    hf, A, b, mg, u_ex = setup_problem(n=16)
    x1, k1, _ = ShardedSystem.from_multigrid(mg, make_mesh(1)).solve_cg(b)
    xn, kn, _ = ShardedSystem.from_multigrid(mg, make_mesh(n_dev)).solve_cg(b)
    assert k1 == kn
    assert np.allclose(np.asarray(x1), np.asarray(xn), atol=1e-9)
    l2, _ = compute_global_error(hf, jnp.asarray(xn), u_ex)
    assert float(l2) < 0.06


def test_sharded_mg_matches_host_mg():
    # non-default chebyshev_degree guards from_multigrid forwarding it
    hf, A, b, mg, _ = setup_problem(n=16, chebyshev_degree=5, n_smooth=2)
    res_host = mg.solve_cg(b, rtol=1e-9)
    x_s, k_s, _ = ShardedSystem.from_multigrid(mg, make_mesh(8)).solve_cg(
        b, rtol=1e-9
    )
    assert abs(int(res_host.iterations) - k_s) <= 1
    assert np.allclose(np.asarray(res_host.x), np.asarray(x_s), atol=1e-8)


def test_shard_block_matrix_padding():
    hf, A, b, mg, _ = setup_problem(n=8)
    SA = shard_block_matrix(A, 8)
    assert SA.n_rows_pad % 8 == 0
    # reconstruct dense from shards and compare
    nb = A.data.shape[-1]
    dense = np.zeros((SA.n_rows_pad * nb, SA.n_rows_pad * nb))
    per = SA.rows_per_shard
    data = np.asarray(SA.data).reshape(8, -1, nb, nb)
    lrows = np.asarray(SA.lrows).reshape(8, -1)
    cols = np.asarray(SA.cols).reshape(8, -1)
    for d in range(8):
        for k in range(data.shape[1]):
            r = d * per + lrows[d, k]
            c = cols[d, k]
            dense[r * nb : (r + 1) * nb, c * nb : (c + 1) * nb] += data[d, k]
    ref = np.asarray(A.to_dense())
    assert np.allclose(dense[: ref.shape[0], : ref.shape[1]], ref, atol=1e-13)


def test_halo_comm_volume():
    """Comm volume per SpMV is proportional to the halo, not n_global
    (replaces the round-1 all_gather of the entire dof vector; the
    reference ships ghost data the same way — only interface rows,
    agglomeration_handler.cc:1026-1091)."""
    hf, A, b, mg, _ = setup_problem(n=16)
    ss = ShardedSystem.from_multigrid(mg, make_mesh(8))
    fine = ss.levels[-1]
    halo = sum(fine.n_sends)
    assert halo > 0  # there IS inter-shard coupling
    # ... but the per-SpMV traffic is far below the previous
    # all_gather of the full vector (n_rows_pad rows)
    assert halo < fine.n_rows_pad // 3
    # nested contiguous hierarchy -> transfers are communication-free
    assert fine.nested_transfer


def test_halo_matvec_matches_dense():
    """Sharded halo SpMV equals the host matvec exactly."""
    hf, A, b, mg, _ = setup_problem(n=16)
    ss = ShardedSystem.from_multigrid(mg, make_mesh(8))
    x_s, k_s, res_s = ss.solve_cg(b, rtol=1e-10, maxiter=3000,
                                  precondition=False)
    from polydeal_tpu.solvers import cg_solve

    res_h = cg_solve(A.matvec, b, rtol=1e-10, maxiter=3000)
    assert np.allclose(np.asarray(x_s), np.asarray(res_h.x), atol=1e-8)


def test_sharded_banded_structured_matches_host():
    """ShardedBandedSystem (lane-slab sharding + ring-halo windows) must
    reproduce the host banded MG-CG solve: same iterations, same
    solution — over the full 8-device virtual mesh."""
    import jax
    import jax.numpy as jnp
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
    from polydeal_tpu.parallel import make_mesh
    from polydeal_tpu.parallel.banded import ShardedBandedSystem
    from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy

    mesh2 = pd.hyper_cube(2, 16)
    handlers, parents, gs = build_structured_hierarchy(mesh2, 16, degree=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    # per-level smoother schedule (fine 5 / coarse 2): the sharded cycle
    # must apply the SAME schedule as the host cycle for exact parity
    sched = tuple([2] * (len(handlers) - 1) + [5])
    mg = build_multigrid(handlers, parents, A, grid_shapes=gs,
                         level_assembly="banded", chebyshev_degree=sched)
    r_host = mg.solve_cg(b, rtol=1e-9)
    ss = ShardedBandedSystem.from_multigrid(mg, make_mesh(8))
    x, iters, res = ss.solve_cg(b, rtol=1e-9)
    assert iters == int(r_host.iterations)
    assert np.allclose(np.asarray(x), np.asarray(r_host.x), atol=1e-9)


def test_sharded_banded_packed_rtree_matches_host():
    """Packed (R-tree SFC) fine level sharded: near window + far COO halo
    exchange must match the host solve across 8 devices."""
    import jax
    import jax.numpy as jnp
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.assembly import assemble_rhs
    from polydeal_tpu.assembly.sipg import (
        assemble_sipg_banded_direct, build_banded_groups)
    from polydeal_tpu.parallel import make_mesh
    from polydeal_tpu.parallel.banded import ShardedBandedSystem
    from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy

    mesh2 = pd.hyper_cube(2, 16)
    agg = RTreeAgglomerator.build(mesh2.cell_centers())
    handlers, parents = build_rtree_hierarchy(
        mesh2, agg, list(range(1, agg.n_levels - 1)), degree=1)
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
    # near_limit 16 < per=32 so the sharded halo constraint holds AND the
    # far COO path is exercised across shards
    mg = build_multigrid(handlers, parents, A, level_assembly="banded",
                         pack=True, pack_near_limit=16)
    from polydeal_tpu.sparse import BlockPacked

    assert isinstance(mg.ells[-1], BlockPacked)
    assert mg.ells[-1].far_rows is not None and mg.ells[-1].far_rows.size
    r_host = mg.solve_cg(b, rtol=1e-9)
    ss = ShardedBandedSystem.from_multigrid(mg, make_mesh(8))
    assert ss.levels[-1].has_far
    x, iters, res = ss.solve_cg(b, rtol=1e-9)
    assert iters == int(r_host.iterations)
    assert np.allclose(np.asarray(x), np.asarray(r_host.x), atol=1e-9)


def test_sharded_repacks_full_coloring_plan():
    """A full-coloring pack (far offsets in slots, single-chip mode) must
    be repacked with an explicit near/far split when sharded — and still
    match the host solve."""
    import jax.numpy as jnp
    from polydeal_tpu.agglomeration import RTreeAgglomerator
    from polydeal_tpu.assembly import assemble_rhs
    from polydeal_tpu.assembly.sipg import (
        assemble_sipg_banded_direct, build_banded_groups)
    from polydeal_tpu.parallel import make_mesh
    from polydeal_tpu.parallel.banded import ShardedBandedSystem
    from polydeal_tpu.solvers import build_multigrid, build_rtree_hierarchy
    from polydeal_tpu.sparse import BlockPacked

    mesh2 = pd.hyper_cube(2, 16)
    agg = RTreeAgglomerator.build(mesh2.cell_centers())
    handlers, parents = build_rtree_hierarchy(
        mesh2, agg, list(range(1, agg.n_levels - 1)), degree=1)
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
    mg = build_multigrid(handlers, parents, A, level_assembly="banded",
                         pack=True)  # default: FULL coloring
    fine = mg.ells[-1]
    assert isinstance(fine, BlockPacked) and fine.far_data is None
    per = ah.n_poly // 8
    assert max(abs(o) for o in fine.plan.offsets) > per  # repack required
    r_host = mg.solve_cg(b, rtol=1e-9)
    ss = ShardedBandedSystem.from_multigrid(mg, make_mesh(8))
    assert ss.levels[-1].has_far  # the split actually happened
    x, iters, res = ss.solve_cg(b, rtol=1e-9)
    assert iters == int(r_host.iterations)
    assert np.allclose(np.asarray(x), np.asarray(r_host.x), atol=1e-9)


def test_sharded_lo_precond_matches_host():
    """The sharded solve with low-precision smoothing vectors (lo_vec —
    the bench's production configuration runs bf16 on TPU) must
    converge identically to the host lo-precond solve: same iteration
    count, same solution.  CPU CI runs the policy at float32 (XLA:CPU's
    bf16 emulation makes bf16 while-loop bodies pathologically slow to
    COMPILE, >30 min observed; bf16 numerics proper are certified on
    TPU by bench.py); the bf16 lo_vec WIRING is asserted without
    executing bf16 code."""
    import jax.numpy as jnp
    from polydeal_tpu.assembly import assemble_sipg_matrix, assemble_rhs
    from polydeal_tpu.parallel import make_mesh
    from polydeal_tpu.parallel.banded import ShardedBandedSystem
    from polydeal_tpu.solvers import build_multigrid, build_structured_hierarchy

    mesh2 = pd.hyper_cube(2, 16)
    handlers, parents, gs = build_structured_hierarchy(mesh2, 16, degree=1)
    ah = handlers[-1]
    u_ex = lambda x: jnp.prod(jnp.sin(jnp.pi * x), axis=-1)
    A = assemble_sipg_matrix(ah)
    b = assemble_rhs(ah, lambda x: 2 * jnp.pi**2 * u_ex(x), u_ex)
    mg16 = build_multigrid(handlers, parents, A, grid_shapes=gs,
                           level_assembly="banded",
                           precond_dtype=jnp.bfloat16,
                           vector_dtype=jnp.bfloat16)
    ss16 = ShardedBandedSystem.from_multigrid(mg16, make_mesh(8))
    assert ss16.lo_vec == jnp.bfloat16
    assert any(lv.has_lo for lv in ss16.levels)
    del mg16, ss16
    # matrix copies low, vectors kept at the operator dtype (the
    # production default: bf16 vectors cost 2-3x the iterations)
    mg16m = build_multigrid(handlers, parents, A, grid_shapes=gs,
                            level_assembly="banded",
                            precond_dtype=jnp.bfloat16)
    ss16m = ShardedBandedSystem.from_multigrid(mg16m, make_mesh(8))
    assert ss16m.lo_vec == A.data.dtype  # vectors stay full precision
    assert any(lv.has_lo for lv in ss16m.levels)
    del mg16m, ss16m
    mg = build_multigrid(handlers, parents, A, grid_shapes=gs,
                         level_assembly="banded",
                         precond_dtype=jnp.float32,
                         vector_dtype=jnp.float32)
    r_host = mg.solve_cg(b, rtol=1e-9)
    assert float(r_host.residual) <= 1e-9 * float(jnp.linalg.norm(b)) * 1.01
    ss = ShardedBandedSystem.from_multigrid(mg, make_mesh(8))
    assert ss.lo_vec == jnp.float32
    x, iters, res = ss.solve_cg(b, rtol=1e-9)
    assert iters == int(r_host.iterations)
    assert np.allclose(np.asarray(x), np.asarray(r_host.x), atol=1e-9)
