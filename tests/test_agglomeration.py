"""Agglomeration strategy tests (reference tier-1: rtree_mesh, 3DRtree,
extract_last_level, repairing)."""

import numpy as np
import pytest

from polydeal_tpu.mesh.fine_mesh import hyper_cube
from polydeal_tpu.agglomeration.rtree import RTreeAgglomerator, str_tile
from polydeal_tpu.agglomeration.partition import (
    partition_cells,
    agglomerate_by_partition,
)
from polydeal_tpu.agglomeration.graph import (
    connected_components,
    split_disconnected,
)


def test_str_tile_balance():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(100, 2))
    labels = str_tile(pts, 7)
    counts = np.bincount(labels, minlength=7)
    assert counts.sum() == 100
    assert counts.max() - counts.min() <= 2


def test_rtree_2d_levels():
    """16x16 grid, fanout 4: levels have 1, 4, 16, 64, 256 nodes."""
    m = hyper_cube(2, 16)
    agg = RTreeAgglomerator.build(m.cell_centers())
    assert agg.n_nodes(0) == 1
    assert agg.n_nodes(1) == 4
    assert agg.n_nodes(2) == 16
    assert agg.n_nodes(3) == 64
    assert agg.n_nodes(agg.n_levels - 1) == 256  # leaves


def test_rtree_3d_levels():
    m = hyper_cube(3, 4)  # 64 cells, fanout 8
    agg = RTreeAgglomerator.build(m.cell_centers())
    assert agg.n_nodes(0) == 1
    assert agg.n_nodes(1) == 8
    assert agg.n_nodes(2) == 64


def test_rtree_agglomerates_connected():
    m = hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(m.cell_centers())
    c2p = agg.extract_agglomerates(2)  # 16 polytopes of 4 cells
    assert c2p.max() + 1 == 16
    for p in range(16):
        cells = np.where(c2p == p)[0]
        comps = connected_components(cells, m.neighbors)
        assert len(comps) == 1


def test_rtree_hierarchy_consistent():
    m = hyper_cube(2, 8)
    agg = RTreeAgglomerator.build(m.cell_centers())
    parent = agg.hierarchy(1, 2)
    fine = agg.extract_agglomerates(2)
    coarse = agg.extract_agglomerates(1)
    assert np.array_equal(parent[fine], coarse)


def test_rtree_depth_fallback():
    """Requesting a level past the leaves returns one cell per agglomerate
    (reference agglomerator.h:407-413)."""
    m = hyper_cube(2, 4)
    agg = RTreeAgglomerator.build(m.cell_centers())
    c2p = agg.extract_agglomerates(99)
    assert c2p.max() + 1 == m.n_cells


@pytest.mark.parametrize("strategy", ["rcb", "greedy"])
def test_partition_balanced(strategy):
    m = hyper_cube(2, 8)
    labels = partition_cells(m.cell_centers(), m.neighbors, 4, strategy)
    counts = np.bincount(labels, minlength=4)
    assert counts.sum() == 64
    assert counts.min() >= 8


def test_agglomerate_by_partition_connected():
    m = hyper_cube(2, 10)
    c2p = agglomerate_by_partition(m.cell_centers(), m.neighbors, 7)
    for p in range(c2p.max() + 1):
        cells = np.where(c2p == p)[0]
        assert len(connected_components(cells, m.neighbors)) == 1


def test_split_disconnected_repairs():
    """Two opposite corners labeled together get split (reference
    examples/repairing.cc:161-165 behavior)."""
    m = hyper_cube(2, 4)
    c2p = np.ones(16, dtype=np.int32)
    c2p[0] = 0  # corner (0,0)
    c2p[15] = 0  # corner (3,3) — disconnected from cell 0
    fixed = split_disconnected(c2p, m.neighbors)
    assert fixed[0] != fixed[15]
    assert fixed.max() + 1 == 3


def test_multilevel_partition_quality():
    """Multilevel (METIS-family) partitioner: balanced parts with an
    edge cut no worse than plain BFS growth (the reference uses METIS
    k-way for this job, poly_utils.h:553-704)."""
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration.partition import partition_cells

    mesh = pd.distort_random(pd.hyper_cube(2, 16), 0.2, seed=1)
    nb = mesh.neighbors
    n_parts = 8

    def edge_cut(labels):
        l = labels[np.maximum(nb, 0)]
        return int(((nb >= 0) & (l != labels[:, None])).sum()) // 2

    ml = partition_cells(mesh.cell_centers(), nb, n_parts, "multilevel")
    gr = partition_cells(mesh.cell_centers(), nb, n_parts, "greedy")
    assert ml.max() + 1 == n_parts
    counts = np.bincount(ml)
    assert counts.min() >= 0.5 * counts.max()  # balanced
    assert edge_cut(ml) <= edge_cut(gr) * 1.1  # competitive cut
