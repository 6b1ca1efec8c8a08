from .base import NegativeSamplingNeighborEmbedding, NeighborEmbedding
from .largevis import InfoTSNE, LargeVis
from .tsne import SNE, TSNE
from .umap import UMAP
