"""Device mesh + sharding rules.

Replaces the reference's horovod/NCCL data parallelism
(utils/distributed.py; dataset sharded per rank, flat-buffer grad
*sum* allreduce) with a ``jax.sharding.Mesh`` and sharding-annotated
``jit``: the batch is sharded over the ``data`` axis, params are replicated
(or FSDP-sharded over ``data`` for uniter-large), and XLA inserts the ICI
collectives. There is no explicit broadcast/allreduce code — the sharding
specs are the whole story (SURVEY.md §2c/§5 distributed bullet).

Axes:
  data  — data parallelism (the reference's only strategy)
  model — tensor parallelism for large configs (reference: absent; the mesh
          abstraction is built so TP specs can be added without touching the
          training loop)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all devices
    model: int = 1
    # Shard params over the data axis (ZeRO-3 style) instead of replicating.
    fsdp: bool = False
    # Minimum parameter size (elements) to FSDP-shard; small params stay
    # replicated (sharding tiny LN vectors costs more than it saves).
    fsdp_min_size: int = 2**16


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = config.data if config.data > 0 else n // config.model
    assert data * config.model == n, (
        f"mesh {data}x{config.model} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, config.model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over data."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(path_leaf_shape, mesh: Mesh, min_size: int) -> P:
    shape = path_leaf_shape
    if int(np.prod(shape)) < min_size:
        return P()
    # Shard the largest axis divisible by the data-axis size.
    n = mesh.shape["data"]
    axes = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in axes:
        if shape[ax] % n == 0:
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def param_sharding(params: Any, mesh: Mesh,
                   config: MeshConfig = MeshConfig()):
    """Sharding pytree for params: replicated, or FSDP over data."""
    if not config.fsdp:
        rep = replicate(mesh)
        return jax.tree.map(lambda _: rep, params)
    return jax.tree.map(
        lambda p: NamedSharding(
            mesh, _fsdp_spec(p.shape, mesh, config.fsdp_min_size)
        ),
        params,
    )
