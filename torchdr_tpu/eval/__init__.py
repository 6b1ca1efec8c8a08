"""Evaluation metrics."""

from .silhouette import silhouette_samples, silhouette_score
