"""Pallas TPU kernels for the framework's hot operations."""

from polydeal_tpu.ops.banded import (
    banded_matvec_t_imajor,
    banded_matvec_t_pallas,
    pallas_supported,
    pick_tile,
)

__all__ = ["banded_matvec_t_imajor", "banded_matvec_t_pallas",
           "pallas_supported", "pick_tile"]
