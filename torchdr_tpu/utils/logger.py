"""Per-class logging utilities.

Mirrors the reference's ``[TorchDR] <Class>:`` prefixed stdlib logger
(reference: torchdr/utils/utils.py:20-48) with a TPU-flavoured prefix and
adds what the reference lacks (SURVEY.md §5): lightweight per-phase
wall-clock timing hooks that show up in the verbose log.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time

_PREFIX = "[TorchDR-TPU]"


def get_logger(name: str, verbose: bool = False) -> logging.Logger:
    """Return a logger named after the owning class.

    INFO level iff ``verbose``, WARNING otherwise.
    """
    logger = logging.getLogger(f"torchdr_tpu.{name}")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(f"{_PREFIX} {name}: %(message)s"))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(logging.INFO if verbose else logging.WARNING)
    return logger


@contextlib.contextmanager
def log_phase(logger: logging.Logger, phase: str):
    """Context manager logging the wall-clock duration of a fit phase.

    The reference has no in-library profiling; this is the per-phase
    (kNN / affinity / optimize) timer recommended by SURVEY.md §5.
    """
    t0 = time.perf_counter()
    logger.info(f"----- {phase} -----")
    try:
        yield
    finally:
        logger.info(f"{phase} took {time.perf_counter() - t0:.3f}s")
