"""Accessor API parity + checkpoint/resume tests."""

import numpy as np
import pytest

import polydeal_tpu as pd
from polydeal_tpu.accessor import Polytope, polytope_iterators


def quad_handler(n=4):
    m = pd.hyper_cube(2, n)
    centers = m.cell_centers()
    c2p = (centers[:, 0] > 0.5).astype(np.int32) + 2 * (centers[:, 1] > 0.5)
    return pd.AgglomerationHandler(m, c2p, degree=1)


def test_polytope_iterator_protocol():
    """Mirror of reference polytope_iterator.cc / agglomerated_neighbors."""
    ah = quad_handler()
    polys = list(polytope_iterators(ah))
    assert len(polys) == 4
    p0 = polys[0]
    assert p0.id() == 0
    assert p0.n_faces() == 3
    assert p0.at_boundary()
    # neighbor symmetry through the accessor
    for p in polys:
        for f in range(p.n_faces()):
            q = p.neighbor(f)
            if q is not None:
                nofn = p.neighbor_of_agglomerated_neighbor(f)
                assert q.neighbor(nofn).id() == p.id()
    assert p0.diameter() == pytest.approx(np.sqrt(0.5))
    assert p0.volume() == pytest.approx(0.25)
    assert p0.measure() == pytest.approx(0.25)
    assert p0.n_background_cells() == 4
    assert np.array_equal(p0.get_dof_indices(), np.arange(3))
    lo, hi = p0.get_bounding_box()
    assert np.allclose(hi - lo, 0.5)


def test_polytope_children():
    from polydeal_tpu.agglomeration import RTreeAgglomerator

    m = pd.hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(m.cell_centers())
    ah_c = pd.AgglomerationHandler(m, agg.extract_agglomerates(1), degree=1)
    parent = agg.hierarchy(1, 2)
    p = Polytope(ah_c, 0)
    ch = p.children(parent)
    assert ch.shape[0] == 4
    assert (parent[ch] == 0).all()


def test_checkpoint_roundtrip(tmp_path):
    from polydeal_tpu.checkpoint import (
        save_checkpoint,
        restore_checkpoint,
        latest_step,
    )

    state = dict(u=np.arange(5.0), w=np.ones((2, 3)))
    save_checkpoint(str(tmp_path), 3, state)
    save_checkpoint(str(tmp_path), 7, {**state, "u": 2 * state["u"]})
    assert latest_step(str(tmp_path)) == 7
    step, restored = restore_checkpoint(str(tmp_path))
    assert step == 7
    assert np.allclose(restored["u"], 2 * state["u"])
    step3, restored3 = restore_checkpoint(str(tmp_path), 3)
    assert np.allclose(restored3["u"], state["u"])


def test_monodomain_checkpoint_resume(tmp_path):
    """Run 6 BDF2 steps with checkpointing, resume from step 4, match the
    uninterrupted run BITWISE: the checkpoint carries the full BDF2
    history (u, u_prev, w), so the resumed trajectory replays the exact
    same jitted step program on the exact same inputs — any
    representation loss in save/restore or a dropped history term would
    break exact equality (restart capability the reference's monodomain
    lacks, SURVEY §5)."""
    from polydeal_tpu.config import MonodomainConfig
    from polydeal_tpu.models.monodomain import MonodomainSolver

    cfg = MonodomainConfig(dim=2, n_refinements=3, degree=1, dt=5e-5,
                           final_time=3e-4, stimulus_radius=0.4,
                           time_stepping_scheme="BDF2")
    cfg.multigrid.preconditioner = "jacobi"
    solver = MonodomainSolver.build(cfg)
    u_full, w_full, _ = solver.run(n_steps=6)

    ckdir = str(tmp_path / "ck")
    solver2 = MonodomainSolver.build(cfg)
    solver2.run(n_steps=4, checkpoint_dir=ckdir, checkpoint_every=2)
    u_res, w_res, _ = solver2.run(n_steps=6, checkpoint_dir=ckdir,
                                  resume=True)
    assert np.array_equal(np.asarray(u_full), np.asarray(u_res))
    assert np.array_equal(np.asarray(w_full), np.asarray(w_res))
