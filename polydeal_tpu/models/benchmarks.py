"""Agglomeration-construction benchmarks — reference examples/benchmarks_3D.cc.

Times METIS-style partitioning vs R-tree agglomeration on a 3D grid and
the full handler (connectivity + quadrature) build, like the reference's
``benchmarks_3D`` timing printouts (benchmarks_3D.cc:139-176).

    python -m polydeal_tpu.models.benchmarks --n 32
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(n: int = 32, dim: int = 3, degree: int = 1, verbose: bool = True):
    import polydeal_tpu as pd
    from polydeal_tpu.agglomeration import (
        RTreeAgglomerator,
        agglomerate_by_partition,
    )
    from polydeal_tpu.utils.timer import Timer

    t = Timer()
    with t.scope("mesh build"):
        mesh = pd.hyper_cube(dim, n)
    with t.scope("connectivity"):
        mesh.neighbors

    with t.scope("rtree build"):
        agg = RTreeAgglomerator.build(mesh.cell_centers())
    with t.scope("rtree extract"):
        c2p_rtree = agg.extract_agglomerates(agg.n_levels - 2)

    n_agg = int(c2p_rtree.max()) + 1
    with t.scope("partition rcb"):
        c2p_rcb = agglomerate_by_partition(
            mesh.cell_centers(), mesh.neighbors, n_agg, strategy="rcb")
    with t.scope("partition greedy"):
        c2p_greedy = agglomerate_by_partition(
            mesh.cell_centers(), mesh.neighbors, n_agg, strategy="greedy")

    with t.scope("handler (rtree)"):
        ah = pd.AgglomerationHandler(mesh, c2p_rtree, degree=degree)

    if verbose:
        print(f"cells: {mesh.n_cells}  agglomerates: {n_agg} "
              f"(rcb {c2p_rcb.max()+1}, greedy {c2p_greedy.max()+1})")
        print(f"polytopal faces (fine-face rows): {ah.faces.n_faces}")
        print(t.summary())
    return t


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--degree", type=int, default=1)
    args = ap.parse_args()
    run(n=args.n, dim=args.dim, degree=args.degree)


if __name__ == "__main__":
    main()
