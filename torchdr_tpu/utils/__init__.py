"""Numeric and framework utilities."""

from .logger import get_logger, log_phase
from .optim import make_optimizer, normalize_optimizer_kwargs
from .schedulers import make_scheduler
from .validation import (
    check_entropy,
    check_marginal,
    check_NaNs,
    check_neighbor_param,
    check_nonnegativity,
    check_shape,
    check_similarity_dense_sparse,
    check_symmetry,
    check_type,
)
from .wrappers import deduplicate, restore_format, to_jax, validate_2d
