from .base import NegativeSamplingNeighborEmbedding, NeighborEmbedding
from .tsne import SNE, TSNE
