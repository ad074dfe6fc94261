#!/usr/bin/env python
"""Lock the released UNITER checkpoints' logits into a golden file.

The released weights (scripts/download_pretrained.sh; reference
README.md:34-35) cannot be fetched in every environment, so the parity
proof is split: this script — run once on a machine WITH the weights —
pushes uniter-base.pt / uniter-large.pt through the full import path
(models/checkpoint.py + driver.load_trunk_checkpoint + seed_rank_head,
the same code inf_itm's zero-shot path uses) on a FIXED canned batch and
records the zero-shot ITM-rank logits (+ file hash, load accounting) to
``tests/golden_released.json``. ``tests/test_released_checkpoints.py``
then replays the canned batch and compares whenever the weights are
present, so any converter regression (key mapping, transposes, fp16
handling) breaks a test instead of an accuracy run.

Usage:
  python scripts/make_released_golden.py --pretrain_dir /pretrain \
      [--output tests/golden_released.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = {
    "uniter-base": dict(json_file="configs/uniter-base.json"),
    "uniter-large": dict(json_file="configs/uniter-large.json"),
}
# canned batch: fixed seed, fixed shapes — identical in the test replay
CANNED_SEED, B, T, R = 1234, 4, 16, 8


def canned_batch(vocab_size: int = 28996):
    # ids drawn in [1000, 20000): the modulo is a NO-OP for the real
    # released vocab (28996) and keeps the offline tiny-config self-test
    # (tests/test_released_checkpoints.py) in range
    import jax.numpy as jnp

    rng = np.random.RandomState(CANNED_SEED)
    return dict(
        input_ids=jnp.asarray(
            rng.randint(1000, 20000, (B, T)) % vocab_size, jnp.int32),
        position_ids=jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(
            (rng.randn(B, R, 2048) * 0.5).astype(np.float32)),
        img_pos_feat=jnp.asarray(rng.rand(B, R, 7).astype(np.float32)),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
    )


def zero_shot_logits(ckpt_path: str, json_file: str) -> dict:
    """Zero-shot ITM-rank logits via the exact inf_itm load path."""
    from types import SimpleNamespace

    import jax

    from uniter_tpu.config import UniterConfig, resolve_kernel_policies
    from uniter_tpu.models.itm import (UniterForImageTextRetrieval,
                                       seed_rank_head)
    from uniter_tpu.training import driver

    cfg = resolve_kernel_policies(
        UniterConfig.from_json_file(json_file, dtype="float32",
                                    attention_impl="xla"))
    model = UniterForImageTextRetrieval(cfg, img_dim=2048)
    batch = canned_batch(cfg.vocab_size)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    params = driver.load_trunk_checkpoint(
        params, SimpleNamespace(checkpoint=ckpt_path), cfg,
        extra_map=seed_rank_head)
    logits = np.asarray(
        model.apply({"params": params}, batch, False), np.float64)
    return dict(
        logits=[round(float(v), 6) for v in logits.reshape(-1)],
        logits_mean=round(float(logits.mean()), 6),
        logits_std=round(float(logits.std()), 6),
    )


def nlvr2_logits(ckpt_path: str, json_file: str) -> dict:
    """Trunk-loaded NLVR2-paired logits (head is fresh-init from the fixed
    PRNGKey(0), so values are deterministic given the trunk weights —
    reference train_nlvr2.py:127-135 loads the trunk the same way)."""
    from types import SimpleNamespace

    import jax

    from uniter_tpu.config import UniterConfig, resolve_kernel_policies
    from uniter_tpu.models.nlvr2 import UniterForNlvr2Paired
    from uniter_tpu.training import driver

    cfg = resolve_kernel_policies(
        UniterConfig.from_json_file(json_file, dtype="float32",
                                    attention_impl="xla",
                                    type_vocab_size=3))
    model = UniterForNlvr2Paired(cfg, img_dim=2048)
    batch = canned_batch(cfg.vocab_size)
    batch["img_type_ids"] = (np.ones((B, R), np.int32)
                             * (np.arange(B)[:, None] % 2 + 1)).astype(
                                 np.int32)
    import jax.numpy as jnp
    batch["img_type_ids"] = jnp.asarray(batch["img_type_ids"])
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    params = driver.load_trunk_checkpoint(
        params, SimpleNamespace(checkpoint=ckpt_path), cfg,
        n_type_rows=3, type_copy_row=1)
    logits = np.asarray(
        model.apply({"params": params}, batch, False), np.float64)
    return dict(
        nlvr2_logits=[round(float(v), 6) for v in logits.reshape(-1)],
        nlvr2_logits_mean=round(float(logits.mean()), 6),
    )


def vqa_logits(ckpt_path: str, json_file: str, num_answer: int = 8) -> dict:
    """Trunk-loaded VQA logits (train_vqa.py's exact load: plain trunk
    merge, head fresh-init from PRNGKey(0) — reference
    model/vqa.py from_pretrained + train_vqa.py:210)."""
    from types import SimpleNamespace

    import jax

    from uniter_tpu.config import UniterConfig, resolve_kernel_policies
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training import driver

    cfg = resolve_kernel_policies(
        UniterConfig.from_json_file(json_file, dtype="float32",
                                    attention_impl="xla"))
    model = UniterForVisualQuestionAnswering(cfg, img_dim=2048,
                                             num_answer=num_answer)
    batch = canned_batch(cfg.vocab_size)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    params = driver.load_trunk_checkpoint(
        params, SimpleNamespace(checkpoint=ckpt_path), cfg)
    logits = np.asarray(
        model.apply({"params": params}, batch, False), np.float64)
    return dict(
        vqa_logits=[round(float(v), 6) for v in logits.reshape(-1)],
        vqa_logits_mean=round(float(logits.mean()), 6),
    )


def vcr_logits(ckpt_path: str, json_file: str) -> dict:
    """VCR surgeries locked: 4 token-type rows (rows 2,3 <- row 0) and
    +81 special word rows (train_vcr.py build_model_and_params;
    reference train_vcr.py:37, model/vcr.py:32-41)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import UniterConfig, resolve_kernel_policies
    from uniter_tpu.models.vcr import (NUM_SPECIAL_TOKENS,
                                       UniterForVisualCommonsenseReasoning)
    from uniter_tpu.training import driver

    cfg = resolve_kernel_policies(
        UniterConfig.from_json_file(json_file, dtype="float32",
                                    attention_impl="xla",
                                    type_vocab_size=4))
    cfg = cfg.replace(vocab_size=cfg.vocab_size + NUM_SPECIAL_TOKENS)
    model = UniterForVisualCommonsenseReasoning(cfg, img_dim=2048)
    batch = canned_batch(cfg.vocab_size)
    rng = np.random.RandomState(CANNED_SEED + 1)
    batch["txt_type_ids"] = jnp.asarray(
        rng.randint(0, 4, (B, T)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    params = driver.load_trunk_checkpoint(
        params, SimpleNamespace(checkpoint=ckpt_path), cfg,
        n_type_rows=4, type_copy_row=0,
        n_special_words=NUM_SPECIAL_TOKENS)
    logits = np.asarray(
        model.apply({"params": params}, batch, False), np.float64)
    return dict(
        vcr_logits=[round(float(v), 6) for v in logits.reshape(-1)],
        vcr_logits_mean=round(float(logits.mean()), 6),
    )


def re_logits(ckpt_path: str, json_file: str) -> dict:
    """Trunk-loaded RE region scores (train_re.py's load path; region mask
    from the canned attn_mask — reference model/re.py:68)."""
    from types import SimpleNamespace

    import jax

    from uniter_tpu.config import UniterConfig, resolve_kernel_policies
    from uniter_tpu.models.re import UniterForReferringExpressionComprehension
    from uniter_tpu.training import driver

    cfg = resolve_kernel_policies(
        UniterConfig.from_json_file(json_file, dtype="float32",
                                    attention_impl="xla"))
    model = UniterForReferringExpressionComprehension(cfg, img_dim=2048)
    batch = canned_batch(cfg.vocab_size)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    params = driver.load_trunk_checkpoint(
        params, SimpleNamespace(checkpoint=ckpt_path), cfg)
    scores = np.asarray(
        model.apply({"params": params}, batch, False), np.float64)
    return dict(
        re_scores=[round(float(v), 6) for v in scores.reshape(-1)],
        re_scores_mean=round(float(scores.mean()), 6),
    )


# the per-task golden surface: every fine-tune head surgery the drivers
# perform (VERDICT r4 #5) — each function runs the EXACT driver load path
TASK_GOLDEN_FNS = dict(
    itm_zero_shot=zero_shot_logits,
    nlvr2=nlvr2_logits,
    vqa=vqa_logits,
    vcr=vcr_logits,
    re=re_logits,
)


def load_accounting(ckpt_path: str, num_layers: int) -> dict:
    from uniter_tpu.models import checkpoint as ckpt_lib

    sd = ckpt_lib.load_torch_checkpoint(ckpt_path)
    flat, missing, consumed = ckpt_lib.uniter_params_from_state_dict(
        sd, num_layers)
    return dict(
        n_trunk_tensors=len(flat),
        missing_trunk=sorted(missing),
        n_consumed=len(consumed),
        unconsumed=sorted(set(sd) - set(consumed)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain_dir", default="/pretrain")
    ap.add_argument("--output", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden_released.json"))
    opts = ap.parse_args()

    golden = {"canned_seed": CANNED_SEED, "shapes": [B, T, R]}
    for name, spec in MODELS.items():
        path = os.path.join(opts.pretrain_dir, f"{name}.pt")
        if not os.path.exists(path):
            print(f"[skip] {path} not found")
            continue
        with open(path, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        layers = 24 if "large" in name else 12
        golden[name] = dict(sha256=sha, **load_accounting(path, layers))
        for fn in TASK_GOLDEN_FNS.values():
            golden[name].update(fn(path, spec["json_file"]))
        print(f"[ok] {name}: {golden[name]['n_trunk_tensors']} trunk "
              f"tensors, logits mean {golden[name]['logits_mean']}")
    with open(opts.output, "w") as f:
        json.dump(golden, f, indent=2)
    print(f"wrote {opts.output}")


if __name__ == "__main__":
    main()
