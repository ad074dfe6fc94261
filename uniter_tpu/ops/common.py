"""Shared Pallas-kernel plumbing for the ops modules.

One definition of the interpret-mode switch (CPU test coverage of TPU
kernels) and the row-block picker used by the row-parallel kernels
(LayerNorm, fused dropout+residual+LN tails, FFN).
"""

from __future__ import annotations

import os


def interpret_mode() -> bool:
    """True when kernels should run under the Pallas interpreter — the CPU
    test suite sets UNITER_PALLAS_INTERPRET=1 to cover the kernel bodies
    without TPU hardware."""
    return os.environ.get("UNITER_PALLAS_INTERPRET") == "1"


def pick_row_block(n_rows: int, max_block: int = 256) -> int:
    """Largest power-of-two row-block (<= max_block) dividing n_rows;
    falls back to the full row count for awkward sizes (tiny test
    shapes)."""
    cand = max_block
    while cand >= 8:
        if n_rows % cand == 0:
            return cand
        cand //= 2
    return n_rows
