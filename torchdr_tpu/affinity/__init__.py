"""Affinity subsystem."""

from .base import Affinity, LogAffinity, SparseAffinity, SparseLogAffinity
from .knn_normalized import (
    MAGICAffinity,
    PACMAPAffinity,
    PHATEAffinity,
    SelfTuningAffinity,
    UMAPAffinity,
)
from .quadratic import DoublyStochasticQuadraticAffinity
from .entropic import (
    EntropicAffinity,
    NormalizedGaussianAffinity,
    NormalizedStudentAffinity,
    SinkhornAffinity,
    SymmetricEntropicAffinity,
)

__all__ = [
    "Affinity", "LogAffinity", "SparseAffinity", "SparseLogAffinity",
    "EntropicAffinity", "NormalizedGaussianAffinity", "NormalizedStudentAffinity",
    "SinkhornAffinity", "SymmetricEntropicAffinity",
    "MAGICAffinity", "PACMAPAffinity", "PHATEAffinity", "SelfTuningAffinity", "UMAPAffinity", "DoublyStochasticQuadraticAffinity",
]
