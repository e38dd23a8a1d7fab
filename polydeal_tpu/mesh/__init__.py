from polydeal_tpu.mesh.fine_mesh import (
    FineMesh,
    hyper_cube,
    hyper_rectangle,
    distort_random,
)

__all__ = ["FineMesh", "hyper_cube", "hyper_rectangle", "distort_random"]
