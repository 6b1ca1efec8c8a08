"""Estimators: neighbor-embedding and spectral families."""

from .neighbor.base import NegativeSamplingNeighborEmbedding, NeighborEmbedding
from .neighbor.tsne import SNE, TSNE
from .spectral.pca import PCA

__all__ = ["NeighborEmbedding", "NegativeSamplingNeighborEmbedding", "TSNE", "SNE", "PCA"]
