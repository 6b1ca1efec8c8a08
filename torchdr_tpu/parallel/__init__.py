"""SPMD multi-chip scaling over jax.sharding meshes.

Replaces the reference's torchrun/NCCL distributed runtime (SURVEY.md
§2.2-2.3) with GSPMD placement + explicit shard_map kernels.
"""

from .knn import knn_graph_ring, knn_graph_sharded, knn_graph_sharded_queries
from .sparse import distributed_symmetrize_sparse
from .mesh import (
    MeshConfig,
    chunk_bounds,
    make_mesh,
    pad_to_multiple,
    rank_of_rows,
    replicate,
    replicated,
    row_sharding,
    shard_rows,
)

__all__ = [
    "MeshConfig", "make_mesh", "shard_rows", "replicate", "replicated",
    "row_sharding", "chunk_bounds", "rank_of_rows", "pad_to_multiple",
    "knn_graph_ring", "knn_graph_sharded", "knn_graph_sharded_queries",
    "distributed_symmetrize_sparse",
]
