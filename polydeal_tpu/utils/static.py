"""Hashable wrappers for static index arrays stored in pytree aux data.

jit caches compare pytree aux metadata by equality/hash; bare numpy arrays
raise ("truth value of an array...") or are unhashable.  Static gather/
scatter index arrays (sparsity patterns, parent maps, cell2poly) therefore
travel through tree_flatten wrapped in :class:`StaticArray`, which hashes
by content once and compares cheaply.
"""

from __future__ import annotations

import numpy as np

__all__ = ["StaticArray", "wrap_static", "unwrap_static"]


class StaticArray:
    __slots__ = ("arr", "_hash")

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self._hash = None

    def __hash__(self):
        if self._hash is None:
            self._hash = hash(
                (self.arr.shape, self.arr.dtype.str, self.arr.tobytes())
            )
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, StaticArray)
            and self.arr.shape == other.arr.shape
            and self.arr.dtype == other.arr.dtype
            and np.array_equal(self.arr, other.arr)
        )

    def __repr__(self):
        return f"StaticArray{self.arr.shape}"


def wrap_static(x):
    return StaticArray(x) if isinstance(x, np.ndarray) else x


def unwrap_static(x):
    return x.arr if isinstance(x, StaticArray) else x
