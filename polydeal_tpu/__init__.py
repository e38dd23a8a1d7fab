"""polydeal_tpu — a TPU-native polytopal Discontinuous Galerkin framework.

A from-scratch rebuild (JAX / XLA / Pallas / jax.sharding) of the
capabilities of the polyDEAL reference library (fdrmrc/Polydeal): polytopal
DG (SIPG) methods in 2D/3D on agglomerated meshes, with R-tree and
METIS-style agglomeration strategies, composite quadrature on bounding
boxes, matrix-based and matrix-free operators, and polytopal (R3MG)
multigrid — re-designed array-first for TPU hardware instead of the
reference's pointer/iterator MPI C++ design.

Core data model (replaces the reference's AgglomerationHandler iterators,
cf. reference include/agglomeration_handler.h):
  * fine mesh               -> vertex/cell/neighbor arrays  (mesh/)
  * agglomerates            -> ``cell2poly`` int array + padded gather maps
  * MappingBox              -> two vectorized affine ops on [n_poly, 2, dim]
  * composite quadrature    -> materialized [n_poly, Q] point/weight arrays
  * PolytopeCache.interface -> a flat fine-face table (handler.FaceTable)
  * MPI ghost exchange      -> sharded gathers + psum over a jax Mesh
"""

__version__ = "0.1.0"

from polydeal_tpu.fem.quadrature import gauss_legendre_1d, tensor_gauss
from polydeal_tpu.fem.basis import LegendreDGP, TensorDGQ, make_basis
from polydeal_tpu.mesh.fine_mesh import FineMesh, hyper_cube, distort_random
from polydeal_tpu.handler import AgglomerationHandler

__all__ = [
    "gauss_legendre_1d",
    "tensor_gauss",
    "LegendreDGP",
    "TensorDGQ",
    "make_basis",
    "FineMesh",
    "hyper_cube",
    "distort_random",
    "AgglomerationHandler",
]
