"""Checkpointing + run provenance (reference utils/save.py).

``save_training_meta`` writes hps.json / model.json / git info
(reference :17-54). ``TrainStateSaver`` goes beyond the reference's
weights-only ``ModelSaver`` (:57-73, whose optimizer-state save was an
unfinished TODO): full train-state checkpointing via Orbax with real resume,
plus a weights-only export for inference.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Any, Optional

from uniter_tpu.utils.logger import LOGGER


def save_training_meta(output_dir: str, args: Any, model_config: dict):
    os.makedirs(os.path.join(output_dir, "log"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "ckpt"), exist_ok=True)

    hps = {k: v for k, v in sorted(vars(args).items())
           if not k.startswith("_")}
    with open(os.path.join(output_dir, "log", "hps.json"), "w") as f:
        json.dump(hps, f, indent=4, default=str)
    with open(os.path.join(output_dir, "log", "model.json"), "w") as f:
        json.dump(model_config, f, indent=4)
    try:
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], text=True,
            stderr=subprocess.DEVNULL).strip()
        branch = subprocess.check_output(
            ["git", "rev-parse", "--abbrev-ref", "HEAD"], text=True,
            stderr=subprocess.DEVNULL).strip()
        with open(os.path.join(output_dir, "log", "git_info.json"), "w") as f:
            json.dump({"branch": branch, "commit": sha}, f, indent=4)
    except Exception:
        LOGGER.info("git info not available")


class TrainStateSaver:
    """Orbax-backed train-state checkpoints: ckpt/step_{N} holds params +
    opt state + step; restore() resumes exactly."""

    def __init__(self, output_dir: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(os.path.join(output_dir, "ckpt"))
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, block: bool = True,
             best_value: Optional[float] = None):
        """Checkpoint the full train state + a weights-only export.

        ``block=False`` overlaps the disk write/finalize with training:
        Orbax's async save copies device buffers to host before returning
        (so later donation of the state by the next step is safe) and
        writes in the background; the msgpack export similarly snapshots
        to host here and writes from a thread. Readers (``restore``,
        ``latest_*``) and the next ``save`` wait for the pending save.

        ``best_value``: also write ``model_step_best.msgpack`` (+ sidecar
        json) from the SAME host snapshot — the reference's
        ``model_saver.save(model, 'best')`` (train_re.py:259-263) without
        a second device->host gather.
        """
        import threading

        import jax
        import orbax.checkpoint as ocp

        self.wait()
        self.mngr.save(
            step,
            args=ocp.args.StandardSave({"params": state.params,
                                        "opt_state": state.opt_state,
                                        "step": state.step}),
        )
        # weights-only export for inference (the reference's
        # model_step_{N}.pt analog, utils/save.py:57-69); host snapshot
        # taken NOW (donation safety), disk write deferred when async
        host_params = self._host_params(state)
        path = os.path.join(self.dir, f"model_step_{step}.msgpack")
        if jax.process_index() != 0:
            # every host joined the gather above (collective); only one
            # writes — concurrent writers to the shared dir would race
            if block:
                self.mngr.wait_until_finished()
            return
        if block:
            self.mngr.wait_until_finished()
            self._write_exports(path, host_params, step, best_value)
        else:
            t = threading.Thread(
                target=self._export,
                args=(path, host_params, step, best_value), daemon=False)
            t.start()
            self._export_thread = t

    def _host_params(self, state):
        """Weights as host numpy arrays (collective across hosts).

        --param_dtype bfloat16 stores params bf16 with fp32 masters in
        the optimizer state; exports ship the masters (full precision —
        the inference surface expects fp32 weights)."""
        import jax
        import numpy as np

        def to_host(x):
            # FSDP/multi-host shards are not fully addressable here;
            # reassemble the global array before serializing
            if getattr(x, "is_fully_addressable", True):
                return np.asarray(x)
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))

        export_params = state.params
        master = getattr(state.opt_state, "master", None)
        if master is not None:
            export_params = master
        return jax.tree.map(to_host, export_params)

    def best_info(self) -> Optional[dict]:
        path = os.path.join(self.dir, "model_step_best.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def clear_best(self):
        """Remove a previous run's best-checkpoint export.

        A FRESH run in a reused output_dir starts its own maximum from
        scratch; until it first improves, a stale ``model_step_best.*``
        from an earlier run would silently resolve ``--ckpt best`` to the
        wrong weights. Process 0 only (it owns the export files)."""
        import jax

        if jax.process_index() != 0:
            return
        for name in ("model_step_best.msgpack", "model_step_best.json"):
            path = os.path.join(self.dir, name)
            if os.path.exists(path):
                os.remove(path)
                LOGGER.info("cleared stale best export %s", path)

    def _write_exports(self, path, host_params, step, best_value):
        save_params_msgpack(path, host_params)
        if best_value is not None:
            save_params_msgpack(
                os.path.join(self.dir, "model_step_best.msgpack"),
                host_params)
            with open(os.path.join(self.dir, "model_step_best.json"),
                      "w") as f:
                json.dump({"step": int(step), "value": float(best_value)},
                          f)
            LOGGER.info("new best checkpoint at step %d (%.4f)",
                        step, best_value)

    def _export(self, path, host_params, step=None, best_value=None):
        try:
            self._write_exports(path, host_params, step, best_value)
        except BaseException as e:  # re-raised by wait()
            self._export_error = e

    def wait(self):
        """Block until any pending async save is durable; surface any
        export-thread failure (a swallowed ENOSPC would otherwise look like
        a successful checkpoint)."""
        self.mngr.wait_until_finished()
        t = getattr(self, "_export_thread", None)
        if t is not None:
            t.join()
            self._export_thread = None
        err = getattr(self, "_export_error", None)
        if err is not None:
            self._export_error = None
            raise err

    def latest_params_file(self) -> Optional[str]:
        import re

        self.wait()
        cands = []
        for f in os.listdir(self.dir):
            m = re.match(r"model_step_(\d+)\.msgpack", f)
            if m:
                cands.append((int(m.group(1)), f))
        if not cands:
            return None
        return os.path.join(self.dir, max(cands)[1])

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self.mngr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.wait()
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        restored = self.mngr.restore(
            step,
            args=ocp.args.StandardRestore({"params": state.params,
                                           "opt_state": state.opt_state,
                                           "step": state.step}),
        )
        return state.replace(**restored)


def save_params_msgpack(path: str, params):
    """Weights-only export (flax serialization) — the analog of the
    reference's ``model_step_{N}.pt``."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params_msgpack(path: str, template):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
