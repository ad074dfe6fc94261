"""Measured op-level cost breakdown of the uniter-base train step (real TPU).

The relay backend exposes no device op profiles (docs/PERF.md), so the
"where do the other ~48% of MXU cycles go" question is answered here by
construction: each hot component is timed in isolation at the production
shapes (B=96, S=104, H=768, 12 layers), chained through a lax.scan so one
jit call amortizes relay dispatch, fenced by a host readback. The sum of
parts vs the measured full step bounds what scheduling/fusion overhead
remains.

Components (per optimizer step = fwd + bwd + update):
  attn      fused Pallas attention fwd+bwd x12 layers
  proj      q/k/v/output projections (4x [768,768] GEMMs) fwd+bwd x12
  ffn       [768,3072] GEMM + gelu + [3072,768] GEMM fwd+bwd x12
  tails     fused drop+res+LN block tails fwd+bwd x24 (2 per layer)
  adamw     fused AdamW update on a ~107M-param tree (bandwidth-bound)
  step      the actual full train step (bench.py workload) for comparison
(embeddings and the VQA head are O(B) or lookup-bound — they land in the
residual together with scheduling gaps)

Usage: python scripts/op_cost_breakdown.py   (real TPU, ~10 min cold cache)
Appends JSON lines to /tmp/op_cost_breakdown.jsonl.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

B, T, R, H, L, NH, D = 96, 64, 40, 768, 12, 12, 64
S = T + R
TOK = B * S
PEAK_TFLOPS = 197.0  # v5e bf16


N_CHAIN = int(os.environ.get("OPCOST_N_CHAIN", "32"))
N_CALLS = int(os.environ.get("OPCOST_N_CALLS", "4"))
ONLY = os.environ.get("OPCOST_ONLY", "")  # comma-set: attn,proj,ffn,...


def timed(fn, args, n_chain=None, n_calls=None):
    """fn: (carry, *args) -> carry. Chains n_chain applications in one jit
    call via lax.scan; returns seconds per single application."""
    n_chain = n_chain or N_CHAIN
    n_calls = n_calls or N_CALLS

    @jax.jit
    def run(carry, *a):
        def body(c, _):
            return fn(c, *a), ()

        out, _ = jax.lax.scan(body, carry, None, length=n_chain)
        return out

    carry0 = args[0]
    rest = args[1:]
    out = run(carry0, *rest)  # compile + warm
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])  # fence
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = run(carry0, *rest)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    dt = time.perf_counter() - t0
    return dt / (n_calls * n_chain)


def chain(x, g, eps=1e-30):
    # data-dependence between scan iterations without changing magnitude
    # (eps product is not constant-foldable; keeps the op off the DCE floor)
    return x + eps * g


def rec(name, sec, per_step_mult, flops_per_apply=None):
    ms = sec * 1e3 * per_step_mult
    row = dict(name=name, ms_per_step=round(ms, 3))
    if flops_per_apply:
        tf = flops_per_apply / sec / 1e12
        row["tflops"] = round(tf, 1)
        row["mxu_frac"] = round(tf / PEAK_TFLOPS, 3)
    print(json.dumps(row), flush=True)
    with open("/tmp/op_cost_breakdown.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    return ms


def want(name):
    return (not ONLY) or name in ONLY.split(",")


def main():
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16
    results = {}

    # --- attention fwd+bwd (per layer) ---
    from uniter_tpu.ops.attention import multi_head_attention

    q = jnp.asarray(rng.randn(B, S, NH, D), bf)
    k = jnp.asarray(rng.randn(B, S, NH, D), bf)
    v = jnp.asarray(rng.randn(B, S, NH, D), bf)
    bias = jnp.zeros((B, S), jnp.float32)
    key = jax.random.key(0, impl="rbg")

    def attn_loss(q, k, v):
        o = multi_head_attention(q, k, v, bias, dropout_rate=0.1,
                                 dropout_rng=key, impl="pallas")
        return jnp.sum(o.astype(jnp.float32) ** 2)

    attn_vg = jax.value_and_grad(attn_loss, argnums=(0, 1, 2))

    def attn_step(q, k, v):
        _, (gq, _, _) = attn_vg(q, k, v)
        return chain(q, gq)

    if want("attn"):
        sec = timed(lambda c, k_, v_: attn_step(c, k_, v_), (q, k, v))
        # fwd 2 matmuls + bwd 5 matmuls, each 2*B*NH*S*S*D FLOPs
        fl = 7 * 2 * B * NH * S * S * D
        results["attn"] = rec("attn_x12", sec, 12, fl)

    # --- projections: 4x [H,H] GEMMs over TOK rows, fwd+bwd ---
    x = jnp.asarray(rng.randn(TOK, H), bf)
    w4 = [jnp.asarray(rng.randn(H, H) * 0.02, bf) for _ in range(4)]

    def proj_loss(x, ws):
        y = x
        for w in ws:
            y = y @ w
        return jnp.sum(y.astype(jnp.float32) ** 2)

    proj_vg = jax.value_and_grad(proj_loss)

    def proj_step(x, ws):
        _, g = proj_vg(x, ws)
        return chain(x, g)

    if want("proj"):
        sec = timed(proj_step, (x, w4))
        fl = 4 * 3 * 2 * TOK * H * H  # 4 GEMMs x (fwd + 2 bwd)
        results["proj"] = rec("proj_x12", sec, 12, fl)

    # --- FFN: [H,4H] gelu [4H,H], fwd+bwd ---
    w1 = jnp.asarray(rng.randn(H, 4 * H) * 0.02, bf)
    w2 = jnp.asarray(rng.randn(4 * H, H) * 0.02, bf)

    def ffn_loss(x, w1, w2):
        h = jax.nn.gelu(x @ w1, approximate=False)
        return jnp.sum((h @ w2).astype(jnp.float32) ** 2)

    ffn_vg = jax.value_and_grad(ffn_loss)

    def ffn_step(x, w1, w2):
        _, g = ffn_vg(x, w1, w2)
        return chain(x, g)

    if want("ffn"):
        sec = timed(ffn_step, (x, w1, w2))
        fl = 2 * 3 * 2 * TOK * H * 4 * H
        results["ffn"] = rec("ffn_x12", sec, 12, fl)

    # --- fused block tails (drop+res+LN) fwd+bwd, 2 per layer ---
    from uniter_tpu.ops.fused_block import drop_res_ln

    res = jnp.asarray(rng.randn(TOK, H), bf)
    w = jnp.ones((H,), jnp.float32)
    b = jnp.zeros((H,), jnp.float32)

    def tail_loss(x):
        y = drop_res_ln(x, res, w, b, rate=0.1, rng=key, impl="pallas")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    tail_vg = jax.value_and_grad(tail_loss)

    def tail_step(x):
        _, g = tail_vg(x)
        return chain(x, g)

    if want("tails"):
        sec = timed(tail_step, (x,))
        results["tails"] = rec("tails_x24", sec, 24)

    # --- fused AdamW on a uniter-base-sized param tree ---
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule

    params = {"emb": jnp.asarray(rng.randn(28996, H) * 0.02, jnp.float32)}
    for i in range(L):
        params[f"l{i}"] = {
            "qkv_o": jnp.asarray(rng.randn(4, H, H) * 0.02, jnp.float32),
            "ffn1": jnp.asarray(rng.randn(H, 4 * H) * 0.02, jnp.float32),
            "ffn2": jnp.asarray(rng.randn(4 * H, H) * 0.02, jnp.float32),
        }
    n_par = sum(x.size for x in jax.tree.leaves(params))
    tx = build_optimizer(params, get_lr_schedule(8e-5, 600, 6000),
                         grad_norm=2.0, weight_decay=0.01, fused=True,
                         mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
    opt0 = tx.init(params)
    import optax

    def adamw_step(carry, grads):
        p, o = carry
        upd, o2 = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o2)

    grads = jax.tree.map(lambda x: x * 1e-3, params)
    if want("adamw"):
        sec = timed(adamw_step, ((params, opt0), grads))
        results["adamw"] = rec(f"adamw_{n_par/1e6:.0f}M", sec, 1)

    if ONLY:
        return
    # --- full train step (bench workload) for the denominator ---
    from scripts.bench_sweep_r3 import run_one

    ex_s = run_one(B=B, T=T, R=R, k=32)
    step_ms = B / ex_s * 1e3
    print(json.dumps(dict(name="full_step", ms_per_step=round(step_ms, 2),
                          ex_per_s=round(ex_s, 1))), flush=True)

    known = sum(results.values())
    print(json.dumps(dict(name="sum_of_parts", ms_per_step=round(known, 2),
                          residual_ms=round(step_ms - known, 2),
                          residual_frac=round(1 - known / step_ms, 3))),
          flush=True)


if __name__ == "__main__":
    main()
