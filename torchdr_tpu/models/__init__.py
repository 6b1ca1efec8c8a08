"""Estimators: neighbor-embedding and spectral families."""

from .neighbor.base import NegativeSamplingNeighborEmbedding, NeighborEmbedding
from .neighbor.largevis import InfoTSNE, LargeVis
from .neighbor.tsne import SNE, TSNE
from .neighbor.umap import UMAP
from .spectral.pca import PCA

__all__ = ["NeighborEmbedding", "NegativeSamplingNeighborEmbedding", "TSNE", "SNE", "UMAP", "LargeVis", "InfoTSNE", "PCA"]
