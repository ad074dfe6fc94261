"""Config/flag system + misc helpers (reference utils/misc.py).

``parse_with_config``: precedence CLI > --config JSON > argparse default
(reference utils/misc.py:26-36). ``NoOp`` silences rank>0 loggers.
"""

from __future__ import annotations

import argparse
import json
import random
import sys

import numpy as np


class NoOp:
    """Useful for distributed training no-op on non-zero processes
    (reference utils/misc.py:17-23)."""

    def __getattr__(self, name):
        def noop(*args, **kwargs):
            return

        return noop


def parse_with_config(parser: argparse.ArgumentParser,
                      argv=None) -> argparse.Namespace:
    args = parser.parse_args(argv)
    if getattr(args, "config", None):
        with open(args.config) as f:
            config_args = json.load(f)
        cli = sys.argv[1:] if argv is None else argv
        override_keys = {
            arg[2:].split("=")[0] for arg in cli if arg.startswith("--")
        }
        for k, v in config_args.items():
            if k not in override_keys:
                setattr(args, k, v)
    del args.config
    return args


VE_ENT2IDX = {"contradiction": 0, "entailment": 1, "neutral": 2}
VE_IDX2ENT = {v: k for k, v in VE_ENT2IDX.items()}


class Struct:
    def __init__(self, dict_):
        self.__dict__.update(dict_)


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
