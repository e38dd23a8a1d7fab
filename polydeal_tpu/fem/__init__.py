from polydeal_tpu.fem.quadrature import gauss_legendre_1d, tensor_gauss, face_quadrature
from polydeal_tpu.fem.basis import LegendreDGP, TensorDGQ, make_basis

__all__ = [
    "gauss_legendre_1d",
    "tensor_gauss",
    "face_quadrature",
    "LegendreDGP",
    "TensorDGQ",
    "make_basis",
]
