"""Benchmark: uniter-base fine-tune train-step throughput on one TPU chip.

Prints up to FOUR JSON lines (VERDICT r3 #5 / r4 #3 — machine-record the
non-flagship paths so regressions show in artifact diffs, not prose):
  {"metric": "itm_retrieval_scoring_throughput", ...}     (extra)
  {"metric": "pretrain_mix_train_throughput", ...}        (extra)
  {"metric": "uniter_large_finetune_train_throughput", ...} (extra)
  {"metric": "nlvr2_class_finetune_train_throughput", ...}  (flagship, LAST)
The flagship line prints last so single-line consumers reading the tail
keep getting it; UNITER_BENCH_EXTRA=0 suppresses the extra lines.

Baseline: the reference publishes no throughput numbers (README.md:1-275;
see BASELINE.md). The comparison point is the reference's own recipe
hardware — fp16 apex-O2 fine-tuning on V100 (README.md:30-31). We use an
estimated 170 examples/sec/V100 for the NLVR2-class workload (~53 GFLOP/ex
at seq~104; 8% MFU of 112 fp16 TFLOPS — typical for apex BERT-base short-seq
fine-tune). vs_baseline = measured_ex_per_sec_per_chip / 170. The extra
rows use the same estimate scaled by workload: uniter-large ~3.1x the
FLOPs (55 ex/s/V100); retrieval scoring is forward-only (~3x the train
rate at the same shapes: 510 pairs/s/V100).
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compile cache: pallas+PRNG kernels take minutes to compile
# through the remote-compile tunnel the first time; cached afterwards.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

V100_BASELINE_EX_PER_SEC = 170.0

# UNITER_BENCH_SMOKE=1: tiny shapes + tiny config + XLA paths so the full
# 3-line artifact pipeline runs on CPU in seconds (tests/test_bench_smoke.py
# guards the host logic — e.g. result unpacking — every round).
SMOKE = os.environ.get("UNITER_BENCH_SMOKE") == "1"

# Workload: NLVR2-class fine-tune shapes — ~10k tokens per batch
# (config/train-nlvr2-base-1gpu.json: 10240-token batches).
B, T, R = (8, 16, 8) if SMOKE else (96, 64, 40)


def bench_retrieval():
    """Retrieval fast-path pairs/s at the r3 production tile (32 texts x
    128 images per device batch — docs/PERF.md r3; utils/itm_fast.py)."""
    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from uniter_tpu.config import base_config, tiny_config
    from uniter_tpu.models.itm import UniterForImageTextRetrieval
    from uniter_tpu.utils.itm_fast import fast_score_matrix

    n_txt, n_img, t, r, d = (
        (16, 16, 16, 8, 32) if SMOKE else (512, 512, 64, 40, 2048))
    rng = np.random.RandomState(0)
    toks = [rng.randint(5, 500 if SMOKE else 28000, rng.randint(8, t - 2))
            for _ in range(n_txt)]
    feats = {f"i{j}": (rng.randn(r, d).astype(np.float32),
                       rng.rand(r, 7).astype(np.float32), r)
             for j in range(n_img)}
    ds = SimpleNamespace(
        ids=[f"t{i}" for i in range(n_txt)],
        all_img_ids=list(feats),
        txt_db=SimpleNamespace(combine_inputs=lambda ids: np.concatenate(
            [[101], np.asarray(ids, np.int32), [102]])),
        img_db=SimpleNamespace(get_img_feat=lambda name: feats[name]),
        example=lambda i: {"input_ids": toks[i]},
    )
    if SMOKE:
        cfg = tiny_config(dtype="bfloat16", attention_impl="xla",
                          scan_unroll=2, block_fusion="none")
    else:
        cfg = base_config(dtype="bfloat16", attention_impl="pallas",
                          scan_unroll=12, block_fusion="pallas",
                          attn_batch_block=2)
    model = UniterForImageTextRetrieval(cfg, img_dim=d)
    init_batch = dict(
        input_ids=jnp.zeros((8, t), jnp.int32),
        position_ids=jnp.zeros((8, t), jnp.int32),
        img_feat=jnp.zeros((8, r, d), jnp.float32),
        img_pos_feat=jnp.zeros((8, r, 7), jnp.float32),
        attn_mask=jnp.ones((8, t + r), jnp.int32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                        False)["params"]
    kw = (dict(txt_tile=4, img_tile=8, dtype="bfloat16") if SMOKE
          else dict(txt_tile=32, img_tile=128, dtype="bfloat16"))
    fast_score_matrix(model, params, ds, t, r, **kw)  # compile warm-up
    t0 = time.perf_counter()
    scores, _ids = fast_score_matrix(model, params, ds, t, r, **kw)
    _ = float(np.asarray(scores).reshape(-1)[-1])  # relay fence
    return n_txt * n_img / (time.perf_counter() - t0)


def bench_pretrain_mix():
    """Mixed-task pretrain stream (MLM:ITM:MRFR:MRC = 2:2:1:1, the
    reference's in-domain ratio — config/pretrain-indomain-base-8gpu.json)
    at the pretrain flagship shape B=48 S=224 (VERDICT r4 #3: guard the
    headline pretraining workload, not just fine-tune + retrieval)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    try:
        from bench_pretrain_tpu import run_mix
    finally:
        sys.path.pop(0)
    if SMOKE:
        return run_mix(b=4, t=16, r=8, k=2, tiny=True, n_cycles=1)
    return run_mix(b=48, t=160, r=64, k=8)


def bench_large():
    """uniter-large (24L/1024H/16 heads) fine-tune-class train step at the
    r3 optimum (B=96 S=104 k=32; docs/PERF.md)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    try:
        from bench_sweep_r3 import run_one
    finally:
        sys.path.pop(0)
    if SMOKE:
        return run_one(B=8, T=16, R=8, k=2, large=True)
    return run_one(B=96, T=64, R=40, k=32, large=True, attn_bb=2)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from uniter_tpu.config import base_config, tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule
    from uniter_tpu.training.step import TrainState, make_train_step

    # Measured on v5e: the head-batched Pallas kernel (ops/attention.py)
    # edges out XLA's fused attention (1630 vs 1613 ex/s at these shapes).
    attention_impl = os.environ.get(
        "UNITER_BENCH_IMPL", "xla" if SMOKE else "pallas")

    def build(impl):
        # measured fastest on v5e (docs/PERF.md r2): fully-unrolled encoder,
        # fused Pallas attention, fused dropout+residual+LN block tails,
        # hardware RNG, fused AdamW with bf16 moments, 16 steps per call
        # attn_batch_block=2: two batch elements per attention grid step
        # (r3 sweep: 1927.6 vs 1915.5 ex/s; >=4 overflows VMEM)
        mk_cfg = tiny_config if SMOKE else base_config
        cfg = mk_cfg(dtype="bfloat16", attention_impl=impl,
                     scan_unroll=2 if SMOKE else 12,
                     block_fusion="none" if impl == "xla" else "pallas",
                     attn_batch_block=int(os.environ.get(
                         "UNITER_BENCH_ATTN_BB", "1" if SMOKE else "2")))
        img_dim = 32 if SMOKE else 2048
        model = UniterForVisualQuestionAnswering(cfg, img_dim=img_dim)
        rng = np.random.RandomState(0)
        batch = dict(
            input_ids=jnp.asarray(
                rng.randint(1, 500 if SMOKE else 28000, (B, T)), jnp.int32),
            position_ids=jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32), (B, T)),
            img_feat=jnp.asarray(rng.randn(B, R, img_dim).astype(np.float32)),
            img_pos_feat=jnp.asarray(rng.rand(B, R, 7).astype(np.float32)),
            attn_mask=jnp.ones((B, T + R), jnp.int32),
            targets=jnp.asarray(
                (rng.rand(B, 3129) < 0.003).astype(np.float32)),
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, False)["params"]
        tx = build_optimizer(
            params, get_lr_schedule(8e-5, 600, 6000), grad_norm=2.0,
            weight_decay=0.01, fused=True, mu_dtype=jnp.bfloat16,
            nu_dtype=jnp.bfloat16)
        state = TrainState.create(params, tx)

        def loss_fn(p, b, r):
            per_elem = model.apply(
                {"params": p}, b, True, deterministic=False,
                rngs={"dropout": r})
            return jnp.mean(per_elem) * 3129, {}

        # measure the recommended throughput configuration: 64 optimizer
        # steps per jit call (--steps_per_call 64; amortizes per-step
        # dispatch via the remote relay — r3 sweep: k=32 +0.5% over k=16
        # (1912-1916 vs 1905-1907), k=64 +0.4% more (1923.1/1923.8 twice
        # confirmed), k=128 collapses (1706 — k-stacked batch broadcast
        # blows past what fits close to the cores)
        k = int(os.environ.get("UNITER_BENCH_STEPS_PER_CALL",
                               "2" if SMOKE else "64"))
        step = make_train_step(loss_fn, loss_scale="mean",
                               steps_per_call=k)
        if k > 1:
            batch = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (k,) + x.shape), batch)
        return state, batch, step, k

    def run(impl):
        state, batch, step, k = build(impl)
        # rbg (hardware RNG) base key: the step folds in state.step itself
        # (threefry mask generation costs ~18ms/step; host-side per-step
        # split costs another ~2-4ms of dispatch)
        rng = jax.random.key(1, impl="rbg")
        # warmup/compile. NOTE: block_until_ready does not synchronize on the
        # remote-relay TPU backend — force a host readback to fence timing.
        for _ in range(3):
            state, metrics = step(state, batch, rng)
        assert np.isfinite(float(np.asarray(metrics["loss"]).reshape(-1)[-1]))
        n_iters = max(20 // k, 3)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, batch, rng)
        _ = float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # fence
        dt = time.perf_counter() - t0
        return n_iters * k * B / dt

    if os.environ.get("UNITER_BENCH_EXTRA", "1") != "0":
        # pretrain baseline: same estimation method as the flagship
        # (docstring above) scaled by per-example FLOPs — S=224 vs S=104
        # puts the pretrain example at ~2.15x the NLVR2-class example
        # (the masked heads add <2% on top of the trunk), so
        # 170 / 2.15 ~= 79 ex/s/V100.
        for name, fn, unit, baseline in (
                ("itm_retrieval_scoring_throughput", bench_retrieval,
                 "pairs/sec/chip", 510.0),
                ("pretrain_mix_train_throughput", bench_pretrain_mix,
                 "examples/sec/chip", 79.0),
                ("uniter_large_finetune_train_throughput", bench_large,
                 "examples/sec/chip", 55.0)):
            try:
                v = fn()
                print(json.dumps({
                    "metric": name, "value": round(v, 2), "unit": unit,
                    "vs_baseline": round(v / baseline, 3)}), flush=True)
            except Exception as e:
                print(f"[bench] extra {name} failed ({e!r})",
                      file=sys.stderr)

    try:
        ex_per_sec = run(attention_impl)
    except Exception as e:  # pallas path unavailable -> XLA fallback
        print(f"[bench] {attention_impl} failed ({e!r}); retrying xla",
              file=sys.stderr)
        attention_impl = "xla"
        ex_per_sec = run("xla")

    # flagship line LAST (single-line consumers parse the tail)
    print(json.dumps({
        "metric": "nlvr2_class_finetune_train_throughput",
        "value": round(ex_per_sec, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(ex_per_sec / V100_BASELINE_EX_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
