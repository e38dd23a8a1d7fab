from polydeal_tpu.assembly.sipg import (
    default_penalty_constant,
    assemble_sipg_matrix,
    assemble_sipg_banded,
    assemble_sipg_banded_t,
    transpose_tables,
    assemble_rhs,
    mass_matrix,
    project,
    build_volume_tables,
    build_face_tables,
    VolumeTables,
    FaceTables,
)

__all__ = [
    "default_penalty_constant",
    "assemble_sipg_matrix",
    "assemble_sipg_banded",
    "assemble_sipg_banded_t",
    "transpose_tables",
    "assemble_rhs",
    "mass_matrix",
    "project",
    "build_volume_tables",
    "build_face_tables",
    "VolumeTables",
    "FaceTables",
]
