"""Multi-field DG systems on (sub)domains of a polytopal mesh.

TPU-native replacement for the reference's hp FESystem/FE_Nothing
machinery (reference examples/darcy_stokes.cc:600-608, oseen.cc:475-478;
source/agglomeration_handler.cc:106-168,381-474): instead of assigning
every polytope an hp ``active_fe_index`` into an FECollection whose
inactive components are FE_Nothing, each *field* (velocity, a pressure,
…) carries

  * a scalar basis (shared by its ``n_components`` vector components),
  * the sorted subset of polytopes where it is active (its domain), and
  * a contiguous slab of global dofs: polytope-major, then component,
    then basis function.

A field that is inactive on a polytope simply has no dofs there — the
exact effect of FE_Nothing, with zero bookkeeping inside the compute
path.  Assembly restricted to a field's domain is a numpy index
selection at setup; runtime kernels never see masks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from polydeal_tpu.fem.basis import Basis

__all__ = ["Field", "SystemSpace"]


@dataclass(frozen=True)
class Field:
    """One unknown field of a coupled system.

    ``polys`` is the sorted array of global polytope ids where the field
    is active (its subdomain).  The field's dofs are laid out
    polytope-major: local polytope k owns the block
    [offset + k*block, offset + (k+1)*block) with block =
    n_components * basis.n_basis, components major over basis functions.
    """

    name: str
    basis: Basis
    n_components: int
    polys: np.ndarray

    def __post_init__(self):
        p = np.asarray(self.polys, dtype=np.int64)
        assert (np.diff(p) > 0).all(), "field polys must be sorted unique"
        object.__setattr__(self, "polys", p)

    @property
    def block(self) -> int:
        return self.n_components * self.basis.n_basis

    @property
    def n_polys(self) -> int:
        return self.polys.shape[0]

    @property
    def n_dofs(self) -> int:
        return self.n_polys * self.block


class SystemSpace:
    """Dof layout of a list of fields over one polytopal mesh.

    Mirrors what ``distribute_agglomerated_dofs(fe_collection)`` produces
    in the reference (one global enumeration covering all hp spaces),
    with field-contiguous numbering: global dof vector =
    concat(field_0 dofs, field_1 dofs, ...).
    """

    def __init__(self, ah, fields: list[Field]):
        self.ah = ah
        self.fields = {f.name: f for f in fields}
        self._order = [f.name for f in fields]
        self._offsets = {}
        off = 0
        for f in fields:
            self._offsets[f.name] = off
            off += f.n_dofs
        self.n_dofs = off
        # global polytope id -> field-local polytope index (or -1)
        self._local = {}
        for f in fields:
            loc = np.full(ah.n_poly, -1, dtype=np.int64)
            loc[f.polys] = np.arange(f.n_polys)
            self._local[f.name] = loc

    def offset(self, name: str) -> int:
        return self._offsets[name]

    def dof_slice(self, name: str) -> slice:
        o = self._offsets[name]
        return slice(o, o + self.fields[name].n_dofs)

    def local_poly(self, name: str) -> np.ndarray:
        """[n_poly_global] -> field-local polytope index (-1 = inactive)."""
        return self._local[name]

    def unpack(self, x, name: str):
        """Slice a global vector to [n_polys, n_components, n_basis]."""
        f = self.fields[name]
        return x[self.dof_slice(name)].reshape(
            f.n_polys, f.n_components, f.basis.n_basis)

    def pack(self, parts: dict):
        """Concatenate per-field arrays (any shape, flattened) into a
        global vector, in field order."""
        import jax.numpy as jnp

        return jnp.concatenate(
            [jnp.reshape(parts[name], (-1,)) for name in self._order])
