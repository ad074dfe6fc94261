"""Pretrain-mix knob sweep on the real TPU (r5): the mixed-task line
became a guarded bench metric in r5 (bench.py bench_pretrain_mix) but its
knobs were inherited from the fine-tune flagship, not measured at the
pretrain shape (B=48, T=160, R=64 -> S=224, reference in-domain recipe
config/pretrain-indomain-base-8gpu.json). Sweeps steps_per_call k and the
attention batch block at that shape.

Flagship priors being tested: k=64 won at B=96 S=104 (r3b, +0.4% over 32;
128 collapsed) and bb=2 won under the 6MB VMEM budget — at S=224 the
attention working set per batch element is ~4x larger, so the bb=2
admission may silently degrade and the best k may differ.

Usage: python scripts/sweep_pretrain_mix.py   (real TPU, no env overrides)
Appends JSON lines to /tmp/sweep_pretrain_mix.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

OUT = "/tmp/sweep_pretrain_mix.jsonl"

# (k, bb) combos: control first (the current bench default), then k sweep
# at bb=2, then bb=1 at the control k to isolate the attention grid knob.
COMBOS = [
    (8, 2),    # control — bench.py default (r5 BENCH line 780 ex/s)
    (16, 2),
    (32, 2),
    (8, 1),
    (32, 1),
]


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    results = []
    for k, bb in COMBOS:
        os.environ["UNITER_BENCH_ATTN_BB"] = str(bb)
        # re-import per combo so the env knob is re-read by the config
        for mod in [m for m in list(sys.modules) if m == "bench_pretrain_tpu"]:
            del sys.modules[mod]
        from bench_pretrain_tpu import run_mix

        t0 = time.time()
        ex_s = run_mix(k=k, n_cycles=3)
        rec = dict(k=k, attn_bb=bb, ex_per_s=round(ex_s, 1),
                   wall_s=round(time.time() - t0, 1))
        results.append(rec)
        line = json.dumps(rec)
        print(line, flush=True)
        with open(OUT, "a") as f:
            f.write(line + "\n")
    best = max(results, key=lambda r: r["ex_per_s"])
    print(json.dumps(dict(best=best)), flush=True)


if __name__ == "__main__":
    main()
