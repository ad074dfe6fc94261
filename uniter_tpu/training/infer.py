"""Shared inference plumbing (reference inf_*.py pattern: reload
hps.json/model.json from the train dir, load a weights snapshot, run the
jitted predict over bucketed eval batches)."""

from __future__ import annotations

import json
import os
from types import SimpleNamespace
from typing import Optional

from uniter_tpu.config import UniterConfig
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.save import load_params_msgpack


def load_train_meta(train_dir: str):
    """(hps Namespace, model-config dict) from a training output dir
    (reference inf_nlvr2.py:28,63-71)."""
    with open(os.path.join(train_dir, "log", "hps.json")) as f:
        hps = SimpleNamespace(**json.load(f))
    with open(os.path.join(train_dir, "log", "model.json")) as f:
        model_json = json.load(f)
    return hps, model_json


def model_config_from_meta(model_json: dict, **overrides) -> UniterConfig:
    # training metadata stores RESOLVED policies (e.g. block_fusion
    # "pallas" from a TPU run) — re-resolve so CPU inference of a
    # TPU-trained run downgrades to the XLA reference paths
    from uniter_tpu.config import resolve_kernel_policies

    return resolve_kernel_policies(
        UniterConfig.from_dict(model_json, **overrides))


def resolve_ckpt(train_dir: str, ckpt: Optional[str] = None) -> str:
    """Pick an explicit snapshot file, or the latest model_step_N.msgpack.

    An explicitly requested path that does not exist is an ERROR — silently
    falling back to the latest snapshot would report results for the wrong
    checkpoint."""
    if ckpt:
        if not os.path.exists(ckpt):
            raise FileNotFoundError(f"--ckpt {ckpt} does not exist")
        return ckpt
    import re

    d = os.path.join(train_dir, "ckpt")
    cands = []
    for f in os.listdir(d):
        m = re.match(r"model_step_(\d+)\.msgpack", f)
        if m:
            cands.append((int(m.group(1)), f))
    if not cands:
        raise FileNotFoundError(f"no weight snapshot under {d}")
    path = os.path.join(d, max(cands)[1])
    LOGGER.info("using checkpoint %s", path)
    return path


def local_eval_mesh():
    """Mesh over THIS process's devices for eval/inference compute.

    Eval work is sharded by *process* (each host scores its own rows and
    results are all-gathered — reference utils/itm_eval.py:99-110 and every
    inf_*.py run all ranks), so within a process the batch must spread over
    the local chips only; a global mesh would demand lockstep batches
    across hosts, which the per-host eval loops don't produce."""
    import jax

    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh

    return make_mesh(MeshConfig(data=-1), devices=jax.local_devices())


def eval_put(batch: dict, mesh, strict: bool = False) -> dict:
    """device_put a host eval batch with the leading (batch) axis sharded
    over the mesh's data axis so every local chip computes a slice
    (reference: all inference runs multi-GPU; the rebuild previously
    computed eval on one chip per process).

    Rows are zero-padded up to a data-axis multiple. Padding rows are
    all-zero, so callers must either trim outputs to their real row count
    (the inf_* loops index by qids/ex_weight) or pass ``strict=True`` to
    assert divisibility instead — required when the caller reduces with
    in-batch masks like ``tgt != -1`` that would mis-count zero rows.
    Non-array values (qids and other host metadata) pass through."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]
    sh = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        pad = (-v.shape[0]) % n
        if pad:
            assert not strict, (
                f"eval batch axis {v.shape[0]} ({k}) not divisible by the "
                f"{n}-device data axis — this caller relies on in-batch "
                "masks and cannot tolerate zero padding rows")
            v = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
        out[k] = jax.device_put(v, sh)
    return out


def load_params(path: str, template_params):
    if path.endswith(".msgpack"):
        return load_params_msgpack(path, template_params)
    if path.endswith(".pt"):
        raise ValueError(
            "torch checkpoints load through the task driver's "
            "load_trunk_checkpoint path, not here")
    raise ValueError(f"unknown checkpoint format: {path}")
