"""BERT .pt checkpoint -> UNITER-init checkpoint
(reference scripts/convert_ckpt.py: renames ``bert.`` keys to ``uniter.``).
"""

from __future__ import annotations

import sys

import torch


def main(src: str, dst: str):
    checkpoint = torch.load(src, map_location="cpu", weights_only=True)
    state = {k.replace("bert", "uniter"): v for k, v in checkpoint.items()}
    torch.save(state, dst)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
