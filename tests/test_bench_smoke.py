"""bench.py artifact-pipeline smoke test (CPU, tiny shapes).

The driver runs ``python bench.py`` on real TPU at the end of every round
and records its JSON lines; a host-logic bug there (e.g. mis-unpacking a
result tuple) silently drops a metric from the round artifact. This test
drives the full 4-line pipeline under UNITER_BENCH_SMOKE=1 so that logic
is exercised every round on CPU.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED = [
    "itm_retrieval_scoring_throughput",
    "pretrain_mix_train_throughput",
    "uniter_large_finetune_train_throughput",
    "nlvr2_class_finetune_train_throughput",
]


@pytest.mark.e2e
def test_bench_smoke_emits_all_lines():
    env = dict(os.environ)
    env.update(
        UNITER_BENCH_SMOKE="1",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
    )
    env.pop("XLA_FLAGS", None)  # no virtual mesh needed; single CPU device
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # every stdout line must be valid JSON (the driver parses the tail);
    # warnings/errors go to stderr
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    recs = [json.loads(l) for l in lines]
    assert [r["metric"] for r in recs] == EXPECTED, proc.stderr[-2000:]
    for r in recs:
        assert r["value"] > 0 and r["vs_baseline"] > 0
        assert r["unit"].endswith("/chip")
    # flagship line LAST (single-line consumers read the tail)
    assert recs[-1]["metric"] == "nlvr2_class_finetune_train_throughput"
