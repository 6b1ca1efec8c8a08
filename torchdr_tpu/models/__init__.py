"""Estimators: neighbor-embedding and spectral families."""

from .neighbor.base import NegativeSamplingNeighborEmbedding, NeighborEmbedding
from .neighbor.cosne import COSNE
from .neighbor.largevis import InfoTSNE, LargeVis
from .neighbor.pacmap import PACMAP
from .neighbor.tsne import SNE, TSNE
from .neighbor.tsnekhorn import TSNEkhorn
from .neighbor.umap import UMAP
from .spectral.incremental_pca import ExactIncrementalPCA, IncrementalPCA
from .spectral.kernel_pca import KernelPCA
from .spectral.pca import PCA
from .spectral.phate import PHATE

__all__ = [
    "NeighborEmbedding", "NegativeSamplingNeighborEmbedding",
    "TSNE", "SNE", "UMAP", "LargeVis", "InfoTSNE", "TSNEkhorn", "PACMAP", "COSNE",
    "PCA", "KernelPCA", "PHATE", "IncrementalPCA", "ExactIncrementalPCA",
]
