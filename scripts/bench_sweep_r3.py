"""r3 TPU perf sweep (VERDICT r2 #7): B-resweep at native S=128 buckets
post-block-fusion, big-batch retest, residual-dropout ceiling, higher
steps_per_call. One process, sequential configs, persistent compile cache.

Usage (real TPU, no env overrides):  python scripts/bench_sweep_r3.py
Appends one JSON line per config to stdout and /tmp/bench_sweep_r3.jsonl.
tok_per_s = ex_per_s * (T + R) is the cross-shape comparable number.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CONFIGS_R1 = [
    dict(name="base_B96_S104", B=96, T=64, R=40),
    dict(name="S128_B96", B=96, T=64, R=64),
    dict(name="S128_B128", B=128, T=64, R=64),
    dict(name="B112_S104", B=112, T=64, R=40),
    dict(name="B192_S104", B=192, T=64, R=40),
    dict(name="dropout0_B96_S104", B=96, T=64, R=40, dropout=0.0),
    dict(name="k32_B96_S104", B=96, T=64, R=40, k=32),
]
CONFIGS_R2 = [
    dict(name="dropout0_B96_S104", B=96, T=64, R=40, dropout=0.0),
    dict(name="B128_S104", B=128, T=64, R=40),
    dict(name="B160_S104", B=160, T=64, R=40),
    dict(name="base_B96_S104_rep", B=96, T=64, R=40),
    dict(name="k32_B96_S104_rep", B=96, T=64, R=40, k=32),
]
CONFIGS_R3 = [
    # composition untested in r2: XLA fused attention + Pallas block tails
    dict(name="xla_attn_blockfused", B=96, T=64, R=40,
         attention_impl="xla"),
]
CONFIGS_R4 = [
    # uniter-large: r2 optimum was B=96 k=8 (585 ex/s; k=16 neutral 586)
    dict(name="large_B96_k8", B=96, T=64, R=40, k=8, large=True),
    dict(name="large_B96_k32", B=96, T=64, R=40, k=32, large=True),
]
CONFIGS_R5 = [
    # bf16 param storage + fp32 master (--param_dtype bfloat16)
    dict(name="parambf16_B96_k32", B=96, T=64, R=40, k=32, param_bf16=True),
    dict(name="fp32param_B96_k32_rep", B=96, T=64, R=40, k=32),
]
CONFIGS_R6 = [
    # untried corners after the k=32 fold-in: deeper step chaining,
    # the S=112 half-step bucket, and the B=104 row-count neighbor
    dict(name="k32_B96_S104_ctl", B=96, T=64, R=40, k=32),
    dict(name="k64_B96_S104", B=96, T=64, R=40, k=64),
    dict(name="S112_B96", B=96, T=64, R=48, k=32),
    dict(name="B104_S104", B=104, T=64, R=40, k=32),
]
CONFIGS_R7 = [
    # pre-block-fusion negatives re-measured post-fusion (the fusion
    # changed the balance: XLA attn's relative cost grew, so these may
    # have flipped): Pallas fused FFN (was 1554 vs 1608) and fused QKV
    # (was 1549 vs 1604)
    dict(name="ctl_B96_k32", B=96, T=64, R=40, k=32),
    dict(name="ffn_pallas", B=96, T=64, R=40, k=32, ffn_impl="pallas"),
    dict(name="fused_qkv", B=96, T=64, R=40, k=32, fused_qkv=True),
    dict(name="ffn_pallas_fused_qkv", B=96, T=64, R=40, k=32,
         ffn_impl="pallas", fused_qkv=True),
]
CONFIGS_R8 = [
    # batch-blocked attention grid: bc batch elements per kernel step
    # (amortizes grid overhead, enlarges MXU batched GEMMs)
    dict(name="attn_bb2", B=96, T=64, R=40, k=32, attn_bb=2),
    dict(name="attn_bb4", B=96, T=64, R=40, k=32, attn_bb=4),
    dict(name="attn_bb8", B=96, T=64, R=40, k=32, attn_bb=8),
    # does the k=64 relay-dispatch win carry to uniter-large?
    dict(name="large_B96_k64", B=96, T=64, R=40, k=64, large=True),
]
CONFIGS_R9 = [
    # guard: uniter-large under the production attn_batch_block=2 default
    # (R8 measured large only at bb=1; the VMEM clamp sizes off head_dim
    # so large's 16 heads x 64 head_dim may clamp differently)
    dict(name="large_k32_bb1_ctl", B=96, T=64, R=40, k=32, large=True),
    dict(name="large_k32_bb2", B=96, T=64, R=40, k=32, large=True,
         attn_bb=2),
]
CONFIGS_R10 = [
    # r4: head-chunked attention grid for uniter-large (VERDICT r3 #3).
    # _grid_blocks now admits bc=2 by chunking heads (hc=8, 2.9MB) under
    # the default 5MB clamp; the 6MB probe admits the full-head bb=2
    # working set (hc=16, 5.75MB — between the proven-good 4.3MB and the
    # Mosaic-crash 8.6MB points).
    dict(name="large_k32_bb1_ctl", B=96, T=64, R=40, k=32, large=True),
    dict(name="large_k32_bb2_hc8", B=96, T=64, R=40, k=32, large=True,
         attn_bb=2),
    dict(name="large_k32_bb2_hc16_6MB", B=96, T=64, R=40, k=32, large=True,
         attn_bb=2, vmem_budget=6 * 1024 * 1024),
    # flagship guard: base shapes must be unchanged by the joint selector
    dict(name="base_k64_bb2_ctl", B=96, T=64, R=40, k=64, attn_bb=2),
]
import os as _os
CONFIGS = {"2": CONFIGS_R2, "3": CONFIGS_R3, "4": CONFIGS_R4,
           "5": CONFIGS_R5, "6": CONFIGS_R6, "7": CONFIGS_R7,
           "8": CONFIGS_R8, "9": CONFIGS_R9,
           "10": CONFIGS_R10}.get(
               _os.environ.get("SWEEP_ROUND", "1"), CONFIGS_R1)


def run_one(B, T, R, k=16, dropout=None, attention_impl="pallas",
            large=False, param_bf16=False, ffn_impl="xla",
            fused_qkv=False, attn_bb=1, vmem_budget=None):
    if vmem_budget is not None:
        # read at pallas_call construction (trace time) by _bc_budget
        os.environ["UNITER_ATTN_VMEM_BUDGET"] = str(vmem_budget)
    else:
        os.environ.pop("UNITER_ATTN_VMEM_BUDGET", None)
    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import base_config, large_config, tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule
    from uniter_tpu.training.step import TrainState, make_train_step

    # UNITER_BENCH_SMOKE=1: tiny config + XLA paths so bench.py's CPU smoke
    # test (tests/test_bench_smoke.py) can drive this host logic end to end.
    smoke = os.environ.get("UNITER_BENCH_SMOKE") == "1"
    kw = dict(dtype="bfloat16", attention_impl=attention_impl,
              scan_unroll=24 if large else 12, block_fusion="pallas",
              ffn_impl=ffn_impl, fused_qkv=fused_qkv,
              attn_batch_block=attn_bb)
    if dropout is not None:
        kw.update(hidden_dropout_prob=dropout,
                  attention_probs_dropout_prob=dropout)
    if smoke:
        kw.update(attention_impl="xla", scan_unroll=2, block_fusion="none",
                  attn_batch_block=1)
    img_dim = 32 if smoke else 2048
    vocab = 500 if smoke else 28000
    cfg = (tiny_config if smoke
           else (large_config if large else base_config))(**kw)
    model = UniterForVisualQuestionAnswering(cfg, img_dim=img_dim)
    rng_np = np.random.RandomState(0)
    batch = dict(
        input_ids=jnp.asarray(rng_np.randint(1, vocab, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(rng_np.randn(B, R, img_dim).astype(np.float32)),
        img_pos_feat=jnp.asarray(rng_np.rand(B, R, 7).astype(np.float32)),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
        targets=jnp.asarray((rng_np.rand(B, 3129) < 0.003).astype(np.float32)),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    tx = build_optimizer(params, get_lr_schedule(8e-5, 600, 6000),
                         grad_norm=2.0, weight_decay=0.01, fused=True,
                         mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
                         master=param_bf16)
    from types import SimpleNamespace

    from uniter_tpu.training.driver import make_train_state

    # the driver's create-then-cast sequence (masters stay exact fp32)
    state = make_train_state(params, tx, SimpleNamespace(
        param_dtype="bfloat16" if param_bf16 else "float32"))

    def loss_fn(p, b, r):
        per_elem = model.apply({"params": p}, b, True, deterministic=False,
                               rngs={"dropout": r})
        return jnp.mean(per_elem) * 3129, {}

    step = make_train_step(loss_fn, loss_scale="mean", steps_per_call=k)
    if k > 1:
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (k,) + x.shape),
                             batch)
    rng = jax.random.key(1, impl="rbg")
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    assert np.isfinite(float(np.asarray(metrics["loss"]).reshape(-1)[-1]))
    n_iters = max(32 // k, 3)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, batch, rng)
    _ = float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # relay fence
    dt = time.perf_counter() - t0
    return n_iters * k * B / dt


def main():
    out_path = "/tmp/bench_sweep_r3.jsonl"
    for c in CONFIGS:
        c = dict(c)
        name = c.pop("name")
        t0 = time.time()
        try:
            ex_s = run_one(**c)
            rec = dict(name=name, **c, ex_per_s=round(ex_s, 1),
                       tok_per_s=round(ex_s * (c["T"] + c["R"])),
                       wall_s=round(time.time() - t0, 1))
        except Exception as e:  # keep sweeping
            rec = dict(name=name, **c, error=repr(e)[:300],
                       wall_s=round(time.time() - t0, 1))
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
