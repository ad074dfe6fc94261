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
from typing import Any

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
    """FSDP spec for a single leaf: the largest axis divisible by the
    data-axis size is sharded (small params stay replicated). Thin wrapper
    over _compose_fsdp so there is exactly one implementation of the rule."""
    return _compose_fsdp(P(), path_leaf_shape, mesh, min_size)


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


# Tensor-parallel rules for the encoder (Megatron-style): QKV and FFN-in
# kernels column-sharded over 'model' (heads / intermediate split), output
# projections row-sharded; XLA inserts the psum on the row-sharded matmuls.
# The reference has no TP (SURVEY §2c — model <= 330M params); this enables
# the mesh's 'model' axis for uniter-large and beyond.
_TP_COL = ("attention/query/kernel", "attention/key/kernel",
           "attention/value/kernel", "intermediate_dense/kernel")
_TP_ROW = ("attention/output_dense/kernel", "output_dense/kernel")
_TP_COL_BIAS = ("attention/query/bias", "attention/key/bias",
                "attention/value/bias", "intermediate_dense/bias")


def _tp_spec(path: str, shape, mesh: Mesh) -> P:
    n = mesh.shape["model"]
    ndim = len(shape)
    for pat in _TP_COL:
        if path.endswith(pat) and shape[-1] % n == 0:
            return P(*([None] * (ndim - 1) + ["model"]))
    for pat in _TP_ROW:
        # row-sharded: the contract dim (axis -2 of the kernel) is split;
        # covers both the attention output proj [H, H] and FFN out [4H, H]
        if path.endswith(pat) and ndim >= 2 and shape[-2] % n == 0:
            return P(*([None] * (ndim - 2) + ["model", None]))
    for pat in _TP_COL_BIAS:
        if path.endswith(pat) and shape[-1] % n == 0:
            return P(*([None] * (ndim - 1) + ["model"]))
    return P()


def _compose_fsdp(spec: P, shape, mesh: Mesh, min_size: int) -> P:
    """Add a 'data'-axis shard (ZeRO-3) to a spec on its largest free axis."""
    if int(np.prod(shape)) < min_size:
        return spec
    n = mesh.shape["data"]
    parts = list(spec) + [None] * (len(shape) - len(spec))
    for ax in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if parts[ax] is None and shape[ax] % n == 0:
            parts[ax] = "data"
            return P(*parts)
    return spec


def param_sharding_full(params: Any, mesh: Mesh,
                        config: MeshConfig = MeshConfig()):
    """Megatron TP over 'model' (when the mesh has one) composed with FSDP
    over 'data' — the full-parallelism spec for uniter-large and beyond.
    The reference has neither (SURVEY §2c: DP-only, <=330M params)."""
    from uniter_tpu.models.checkpoint import flatten

    tp = mesh.shape.get("model", 1) > 1
    flat = flatten(params)
    specs = {}
    for path, leaf in flat.items():
        spec = _tp_spec(path, leaf.shape, mesh) if tp else P()
        if config.fsdp:
            spec = _compose_fsdp(spec, leaf.shape, mesh, config.fsdp_min_size)
        specs[path] = NamedSharding(mesh, spec)
    out: dict = {}
    for path, s in specs.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = s
    return out


def opt_state_sharding(opt_state: Any, tx, param_shardings: Any, mesh: Mesh):
    """Shard optimizer moments exactly like their parameters (ZeRO-3: the
    Adam moments are 2x the param memory — replicating them while sharding
    params would defeat FSDP). Non-param leaves (step counts) replicate."""
    import optax

    rep = replicate(mesh)
    return optax.tree_map_params(
        tx, lambda _leaf, s: s, opt_state, param_shardings,
        transform_non_params=lambda _: rep)


def param_sharding_tp(params: Any, mesh: Mesh):
    """Megatron-style TP specs over the 'model' axis (replicated elsewhere,
    no FSDP composition) — param_sharding_full with fsdp off."""
    return param_sharding_full(params, mesh, MeshConfig(fsdp=False))
