from polydeal_tpu.agglomeration.graph import (
    connected_components,
    split_disconnected,
)
from polydeal_tpu.agglomeration.rtree import RTreeAgglomerator
from polydeal_tpu.agglomeration.partition import (
    partition_cells,
    agglomerate_by_partition,
)

__all__ = [
    "connected_components",
    "split_disconnected",
    "RTreeAgglomerator",
    "partition_cells",
    "agglomerate_by_partition",
]
