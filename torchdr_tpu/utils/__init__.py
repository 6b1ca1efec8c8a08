"""Numeric and framework utilities."""

from .compile_cache import compile_cache_dir, enable_compile_cache
from .logger import get_logger, log_phase
from .optim import lbfgs_minimize, make_optimizer, normalize_optimizer_kwargs
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

from .checkpoint import load_estimator, save_estimator
from .encoders import MLP, make_mlp_encoder
from .manifold import (
    mobius_add,
    poincare_expmap,
    poincare_expmap0,
    poincare_inner,
    poincare_logmap,
    poincare_logmap0,
    poincare_project,
    poincare_ptransp,
    poincare_sqdist,
)
from .native_loader import NpyBatchLoader, native_available
from .profiling import PhaseTimer, device_trace
from .visu import plot_poincare_disk
