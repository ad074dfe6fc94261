"""Logging + metrics (reference utils/logger.py).

Keeps the reference's observable surface: a module-level ``LOGGER``, a
``TB_LOGGER`` singleton with an internal global_step and the same scalar
names (``loss``, ``lr``, ``grad_norm``, ``perf/*``), and ``RunningMeter``
EMA(0.99) loss meters. Scalars go to TensorBoard event files via tf.summary
when tensorflow is importable, and always to a ``scalars.jsonl`` sidecar
(greppable, no TB needed).
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Dict, Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"
logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("__main__")


def add_log_to_file(log_path: str):
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, datefmt=_DATE_FMT))
    logging.getLogger().addHandler(fh)


class TensorboardLogger:
    def __init__(self):
        self._global_step = 0
        self._writer = None
        self._jsonl = None

    def create(self, path: str):
        os.makedirs(path, exist_ok=True)
        self._jsonl = open(os.path.join(path, "scalars.jsonl"), "a")
        try:
            import tensorflow as tf  # noqa

            self._writer = tf.summary.create_file_writer(path)
        except Exception:
            self._writer = None

    def noop(self, *a, **kw):
        return

    def step(self):
        self._global_step += 1

    @property
    def global_step(self):
        return self._global_step

    def add_scalar(self, name: str, value, step: Optional[int] = None):
        if self._jsonl is None:
            return
        step = self._global_step if step is None else step
        v = float(value)
        self._jsonl.write(json.dumps({"step": step, name: v}) + "\n")
        self._jsonl.flush()
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                tf.summary.scalar(name, v, step=step)

    def log_scalar_dict(self, log: Dict[str, float], prefix: str = "",
                        step: Optional[int] = None):
        if prefix:
            prefix = f"{prefix}_"
        for name, value in log.items():
            if isinstance(value, dict):
                self.log_scalar_dict(value, f"{prefix}{name}", step)
            else:
                self.add_scalar(f"{prefix}{name}", value, step)


TB_LOGGER = TensorboardLogger()


class RunningMeter:
    """Exponential-moving-average loss meter (reference utils/logger.py:68-94)."""

    def __init__(self, name: str, val: Optional[float] = None,
                 smooth: float = 0.99):
        self._name = name
        self._sm = smooth
        self._val = val

    def __call__(self, value: float):
        value = float(value)
        if math.isnan(value) or math.isinf(value):
            return
        self._val = (value if self._val is None
                     else value * (1 - self._sm) + self._val * self._sm)

    def __str__(self):
        return f"{self._name}: {self._val:.4f}"

    @property
    def val(self):
        return self._val

    @property
    def name(self):
        return self._name
