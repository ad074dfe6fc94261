"""Shared inference plumbing (reference inf_*.py pattern: reload
hps.json/model.json from the train dir, load a weights snapshot, run the
jitted predict over bucketed eval batches)."""

from __future__ import annotations

import json
import os
import weakref
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
    """Pick an explicit snapshot file, ``best``/``<step>`` by name under
    train_dir/ckpt (the reference's ``--checkpoint best`` convention,
    inf_re.py:53-56), or the latest model_step_N.msgpack.

    An explicitly requested checkpoint that does not exist is an ERROR —
    silently falling back to the latest snapshot would report results for
    the wrong checkpoint."""
    if ckpt:
        if not os.path.exists(ckpt) and (ckpt == "best" or ckpt.isdigit()):
            if not train_dir:
                raise FileNotFoundError(
                    f"--ckpt {ckpt} needs --train_dir to resolve")
            ckpt = os.path.join(train_dir, "ckpt",
                                f"model_step_{ckpt}.msgpack")
        if not os.path.exists(ckpt):
            raise FileNotFoundError(f"--ckpt {ckpt} does not exist")
        return ckpt
    if not train_dir:
        raise FileNotFoundError("no --train_dir and no --ckpt given")
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


def eval_put(batch: dict, mesh, group: int = 1) -> dict:
    """device_put a host eval batch with the leading (batch) axis sharded
    over the mesh's data axis so every local chip computes a slice
    (reference: all inference runs multi-GPU; the rebuild previously
    computed eval on one chip per process).

    Rows are ZERO-padded up to a multiple of lcm(data_axis, ``group``)
    (any local device count works, including ones that don't divide the
    bucket batch size; ``group`` > 1 preserves row grouping for models
    that reshape rows into fixed-size sets, e.g. the NLVR2 paired model's
    2 rows/example) — callers must trim device outputs to their real row
    count before reducing (the contract every caller here follows: qids /
    targets length / host-row count). Non-array values (qids and other
    host metadata) pass through."""
    import math

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = math.lcm(mesh.shape["data"], max(int(group), 1))
    sh = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v
            continue
        pad = (-v.shape[0]) % n
        if pad:
            v = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
        out[k] = jax.device_put(v, sh)
    return out


def local_eval_params(params, mesh=None):
    """Process-locally-addressable params for process-sharded eval.

    In-training validation feeds ``state.params`` — committed to the
    GLOBAL training mesh by place_state — into eval jits whose batches
    eval_put commits to the process-LOCAL mesh; on a multi-process run
    that mixes device sets inside one jit and raises. This gathers the
    FULL parameter values and (with ``mesh``) commits them ONCE to the
    local mesh replicated, so the per-batch eval jits neither re-upload
    the tree per call nor see mixed device sets.

    Single-process: returns params unchanged (the local mesh equals the
    training mesh). Multi-process: FSDP-sharded leaves are first
    replicated over the global mesh — a COLLECTIVE, so every process
    must call this together (in-training validation is lockstep; the
    reference's every-rank validation has the same property,
    pretrain.py:390-544)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() > 1:
        leaves = [x for x in jax.tree.leaves(params)
                  if isinstance(x, jax.Array)
                  and not x.is_fully_addressable]
        if leaves:
            if any(not x.sharding.is_fully_replicated for x in leaves):
                gmesh = leaves[0].sharding.mesh
                rep = NamedSharding(gmesh, P())
                params = jax.jit(
                    lambda p: p,
                    out_shardings=jax.tree.map(
                        lambda _: rep, params))(params)

            def to_host(x):
                if (isinstance(x, jax.Array)
                        and not x.is_fully_addressable):
                    return np.asarray(x.addressable_data(0))
                return x

            params = jax.tree.map(to_host, params)
    if mesh is not None:
        # commit host leaves (gathered above, or checkpoint-loaded numpy)
        # to the local mesh ONCE so the per-batch jits don't re-place them
        # (applies single-process too)
        lrep = NamedSharding(mesh, P())
        params = jax.tree.map(
            lambda x: (jax.device_put(x, lrep)
                       if isinstance(x, np.ndarray) else x), params)
    return params


_PREDICT_CACHE = weakref.WeakKeyDictionary()


def cached_predict(model):
    """Per-model jitted forward ``(params, batch) -> outputs``. Validation
    helpers call this instead of building a fresh ``jax.jit(lambda ...)``
    per validation round — a new callable would re-trace (and re-look-up
    compilation) every round."""
    import jax

    try:
        fn = _PREDICT_CACHE.get(model)
    except TypeError:  # unhashable model: fall back to uncached
        fn = None
    if fn is None:
        def fn(p, b, _m=model):
            return _m.apply({"params": p}, b, False)

        fn = jax.jit(fn)
        try:
            _PREDICT_CACHE[model] = fn
        except TypeError:
            pass
    return fn


def eval_batches(predict_fn, params, loader, prefetch: int = 2, mesh=None,
                 group: int = 1):
    """Drive a jitted predict over an eval loader with the standard
    two-level sharding: params made process-local once (local_eval_params
    on the local mesh), each batch's rows spread over the local chips
    (eval_put), and the NEXT batch's host fetch + transfer overlapped
    with the current predict (DevicePrefetcher — eval batches come from
    per-batch host collates, which would otherwise serialize with the
    device). Yields ``(host_batch, device_outputs)`` — callers trim
    outputs to their real row count (targets/qids length) before
    reducing, since eval_put may append zero rows for divisibility.

    Pass ``mesh`` when the caller ALREADY localized params with
    local_eval_params(params, mesh) (e.g. once for several loaders) —
    localization is then skipped here instead of relying on idempotence."""
    import numpy as np

    from uniter_tpu.data.loader import DevicePrefetcher

    if mesh is None:
        mesh = local_eval_mesh()
        params = local_eval_params(params, mesh)

    def put(batch):
        return batch, eval_put({k: v for k, v in batch.items()
                                if isinstance(v, np.ndarray)}, mesh,
                               group=group)

    it = DevicePrefetcher(iter(loader), put, depth=prefetch)
    try:
        for batch, jb in it:
            yield batch, predict_fn(params, jb)
    finally:
        it.close()


def load_params(path: str, template_params):
    if path.endswith(".msgpack"):
        return load_params_msgpack(path, template_params)
    if path.endswith(".pt"):
        raise ValueError(
            "torch checkpoints load through the task driver's "
            "load_trunk_checkpoint path, not here")
    raise ValueError(f"unknown checkpoint format: {path}")
