from polydeal_tpu.mesh.fine_mesh import (
    FineMesh,
    hyper_cube,
    hyper_rectangle,
    distort_random,
)
from polydeal_tpu.mesh.simplex import SimplexMesh, triangulated_hyper_cube
from polydeal_tpu.mesh.gmsh_io import read_msh

__all__ = [
    "FineMesh",
    "hyper_cube",
    "hyper_rectangle",
    "distort_random",
    "SimplexMesh",
    "triangulated_hyper_cube",
    "read_msh",
]
