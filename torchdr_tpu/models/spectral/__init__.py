from .pca import PCA
