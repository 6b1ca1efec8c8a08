"""Affinity subsystem."""

from .base import Affinity, LogAffinity, SparseAffinity, SparseLogAffinity
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
]
