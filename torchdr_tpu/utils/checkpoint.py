"""Estimator checkpointing.

The reference has **no** save/load or mid-fit resume (SURVEY.md §5 —
fitted state lives in non-persistent buffers and is deleted by
``clear_memory``). Here fitted estimators can be saved and restored:
fitted array attributes go into an ``.npz``, constructor params into a
JSON sidecar, and flax encoder variables through ``flax.serialization``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_SKIP_TYPES = (str, bool)


def _arrayable(v):
    return hasattr(v, "shape") or isinstance(v, (int, float, np.number))


def save_estimator(model, path: str) -> None:
    """Save a fitted estimator to ``<path>.npz`` (+ ``<path>.json``)."""
    path = Path(path)
    arrays = {}
    for name, value in vars(model).items():
        if not name.endswith("_") or name.startswith("_"):
            continue
        if name == "encoder_variables_":
            continue
        if _arrayable(value) and not isinstance(value, _SKIP_TYPES):
            arrays[name] = np.asarray(value)
    np.savez(str(path.with_suffix(".npz")), **arrays)

    meta = {
        "class": type(model).__name__,
        "module": type(model).__module__,
        "params": {},
    }
    for key, value in model.get_params().items():
        try:
            json.dumps(value)
            meta["params"][key] = value
        except TypeError:
            meta["params"][key] = None  # non-serializable (affinity objects...)
    path.with_suffix(".json").write_text(json.dumps(meta, indent=2))

    if getattr(model, "encoder", None) is not None and hasattr(
        model, "encoder_variables_"
    ):
        from flax import serialization

        path.with_suffix(".flax").write_bytes(
            serialization.to_bytes(model.encoder_variables_)
        )


def load_estimator(model, path: str):
    """Restore fitted state into an estimator instance of the same class.

    ``model`` must be constructed with the same hyperparameters (and the
    same encoder module in parametric mode); only the fitted arrays are
    loaded.
    """
    path = Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    if meta["class"] != type(model).__name__:
        raise ValueError(
            f"[TorchDR-TPU] checkpoint is for {meta['class']}, got {type(model).__name__}."
        )
    data = np.load(str(path.with_suffix(".npz")), allow_pickle=False)
    for name in data.files:
        arr = data[name]
        setattr(model, name, arr if arr.ndim else arr.item())
    flax_path = path.with_suffix(".flax")
    if flax_path.exists() and getattr(model, "encoder", None) is not None:
        import jax.numpy as jnp
        from flax import serialization

        # re-init to get the pytree structure, then overwrite
        template = model.encoder.init(
            __import__("jax").random.PRNGKey(0),
            jnp.zeros((1, int(data["n_features_in_"]))),
        )
        model.encoder_variables_ = serialization.from_bytes(
            template, flax_path.read_bytes()
        )
    model.is_fitted_ = True
    if not hasattr(model, "_input_format_"):
        model._input_format_ = "numpy"
    return model
