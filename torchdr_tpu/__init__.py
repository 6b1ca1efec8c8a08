"""torchdr_tpu — a TPU-native dimensionality-reduction framework.

From-scratch JAX/XLA/Pallas re-design with the capabilities of TorchDR
(reference layer map in SURVEY.md §1): neighbor-embedding estimators
(UMAP, TSNE, SNE, LargeVis, InfoTSNE, TSNEkhorn, PACMAP, COSNE), spectral
estimators (PCA, IncrementalPCA, KernelPCA, PHATE), an affinity subsystem,
a from-scratch kNN-graph builder, blockwise streaming reductions, and
SPMD multi-chip scaling via jax.sharding.
"""

__version__ = "0.1.0"

from .affinity import (
    Affinity,
    EntropicAffinity,
    LogAffinity,
    NormalizedGaussianAffinity,
    NormalizedStudentAffinity,
    SinkhornAffinity,
    SparseAffinity,
    SparseLogAffinity,
    SymmetricEntropicAffinity,
    MAGICAffinity,
    PACMAPAffinity,
    PHATEAffinity,
    SelfTuningAffinity,
    UMAPAffinity,
    DoublyStochasticQuadraticAffinity,
)
from .affinity_matcher import AffinityMatcher
from .base import DRModule
from .eval import (
    adjusted_rand_index,
    kmeans_ari,
    knn_label_accuracy,
    knn_recall,
    neighborhood_preservation,
    neighborhood_preservation_sampled,
    silhouette_samples,
    silhouette_score,
)
from .models import (
    NegativeSamplingNeighborEmbedding,
    NeighborEmbedding,
    ExactIncrementalPCA,
    IncrementalPCA,
    COSNE,
    PACMAP,
    PCA,
    PHATE,
    SNE,
    TSNE,
    InfoTSNE,
    KernelPCA,
    LargeVis,
    TSNEkhorn,
    UMAP,
)
from .ops import (
    BatchSource,
    binary_search,
    false_position,
    EXACT,
    FAST,
    IVF,
    get_loader_metadata,
    ivf_build,
    ivf_build_from_batches,
    ivf_knn,
    ivf_knn_queries,
    kmeans_fit,
    KnnConfig,
    knn_graph,
    knn_graph_from_batches,
    knn_graph_streaming,
    pairwise_distances,
    pairwise_distances_indexed,
    pq_encode,
    pq_knn,
    pq_search,
    pq_train,
    validate_deterministic_loader,
)
from .ops.distance import knn_graph_host_chunked

__all__ = [
    "Affinity", "LogAffinity", "SparseAffinity", "SparseLogAffinity",
    "EntropicAffinity", "NormalizedGaussianAffinity", "NormalizedStudentAffinity",
    "SinkhornAffinity", "SymmetricEntropicAffinity",
    "AffinityMatcher", "DRModule", "NeighborEmbedding", "NegativeSamplingNeighborEmbedding",
    "binary_search", "false_position",
    "silhouette_samples", "silhouette_score", "knn_label_accuracy",
    "knn_recall", "neighborhood_preservation", "neighborhood_preservation_sampled",
    "kmeans_ari", "adjusted_rand_index",
    "PCA", "SNE", "TSNE", "UMAP", "LargeVis", "InfoTSNE", "TSNEkhorn", "PACMAP", "COSNE", "KernelPCA", "PHATE", "IncrementalPCA", "ExactIncrementalPCA",
    "DoublyStochasticQuadraticAffinity",
    "MAGICAffinity", "PACMAPAffinity", "PHATEAffinity", "SelfTuningAffinity", "UMAPAffinity",
    "knn_graph", "knn_graph_host_chunked", "pairwise_distances",
    "pairwise_distances_indexed",
    "KnnConfig", "EXACT", "FAST", "IVF", "ivf_build", "ivf_build_from_batches",
    "ivf_knn", "ivf_knn_queries",
    "kmeans_fit", "knn_graph_from_batches", "knn_graph_streaming",
    "BatchSource", "get_loader_metadata", "validate_deterministic_loader",
    "pq_train", "pq_encode", "pq_search", "pq_knn",
]
