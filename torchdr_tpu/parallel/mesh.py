"""Device mesh configuration and sharding helpers.

TPU-native replacement for the reference's distributed runtime
(reference: torchdr/distributed/__init__.py:25-322). There is no process
group, rendezvous, or launcher: JAX is single-program SPMD. A
:class:`MeshConfig` names the data axis; arrays are placed with
``NamedSharding`` and XLA inserts the collectives (psum ↔ all_reduce,
all_to_all, all_gather) that the reference issues manually through NCCL
(SURVEY.md §2.3).

The reference's ``DistributedContext`` row-chunk arithmetic
(compute_chunk_bounds / get_rank_for_indices, distributed/__init__.py:
183-267) survives here only as the tiny helpers used by explicit
``shard_map`` kernels; GSPMD paths don't need it at all.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class MeshConfig:
    """Configuration of the data-parallel device mesh.

    Parameters
    ----------
    n_devices : int, optional
        Number of devices; default all local devices.
    axis : str, default "data"
        Mesh axis name for row sharding.
    devices : sequence of jax.Device, optional
        Explicit device list.
    """

    n_devices: Optional[int] = None
    axis: str = "data"
    devices: Optional[Sequence] = None

    def build(self) -> Mesh:
        devs = list(self.devices) if self.devices is not None else jax.devices()
        if self.n_devices is not None:
            devs = devs[: self.n_devices]
        return Mesh(np.array(devs), (self.axis,))


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    return MeshConfig(n_devices=n_devices, axis=axis).build()


def row_sharding(mesh: Mesh, ndim: int = 2, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (row) dimension over the mesh axis."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x, mesh: Mesh):
    """Place an array row-sharded on the mesh (pads are caller's concern:
    the row count should divide the mesh size for even shards)."""
    return jax.device_put(x, row_sharding(mesh, np.ndim(x)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, replicated(mesh))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


# --- chunk arithmetic for explicit shard_map kernels (reference:
# torchdr/distributed/__init__.py:183-267) ---


def chunk_bounds(n: int, world: int, rank: int):
    """(start, size) of rank's row chunk; first ``n % world`` ranks get one
    extra row — same convention as the reference."""
    base, rem = divmod(n, world)
    size = base + (1 if rank < rem else 0)
    start = rank * base + min(rank, rem)
    return start, size


def rank_of_rows(indices, n: int, world: int):
    """Inverse map row index → owning rank (vectorized, numpy/jnp)."""
    base, rem = divmod(n, world)
    cutoff = rem * (base + 1)
    import jax.numpy as jnp

    idx = jnp.asarray(indices)
    return jnp.where(
        idx < cutoff,
        idx // (base + 1),
        rem + (idx - cutoff) // jnp.maximum(base, 1),
    )
