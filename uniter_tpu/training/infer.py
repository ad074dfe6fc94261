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


def load_params(path: str, template_params):
    if path.endswith(".msgpack"):
        return load_params_msgpack(path, template_params)
    if path.endswith(".pt"):
        raise ValueError(
            "torch checkpoints load through the task driver's "
            "load_trunk_checkpoint path, not here")
    raise ValueError(f"unknown checkpoint format: {path}")
