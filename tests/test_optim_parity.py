"""Optimizer parity: our optax AdamW chain vs the reference's torch AdamW
(decoupled decay, bias correction, eps 1e-6) on identical params/grads,
including the head-lr-multiplier equivalence.

Note on decay ordering: the reference applies decay *after* the Adam update
on the already-updated param (optim/adamw.py:100-101); optax/torch decay the
pre-update param. The difference is O(lr^2 * wd) per step — below fp32
noise at published hyperparameters.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.step import TrainState


def test_adamw_matches_reference_update():
    rng = np.random.RandomState(0)
    params = {
        "kernel": rng.randn(4, 3).astype(np.float32),
        "bias": rng.randn(3).astype(np.float32),
        "vqa_out": {"kernel": rng.randn(3, 2).astype(np.float32)},
    }
    grads = jax.tree.map(lambda p: rng.randn(*p.shape).astype(np.float32),
                         params)
    lr, betas, eps, wd = 1e-3, (0.9, 0.98), 1e-6, 0.01

    jp = jax.tree.map(jnp.asarray, params)
    tx = build_optimizer(jp, lr, betas=betas, eps=eps, weight_decay=wd,
                         grad_norm=-1, lr_mul=10.0, lr_mul_paths=("vqa_",))
    state = TrainState.create(jp, tx)
    for _ in range(3):
        state = state.apply_gradients(jax.tree.map(jnp.asarray, grads))
    got = jax.tree.map(np.asarray, state.params)

    # torch oracle: 3 steps of torch.optim-style AdamW with per-group lr
    tp = {k: torch.tensor(v, requires_grad=True)
          for k, v in {"kernel": params["kernel"], "bias": params["bias"],
                       "vqa_out.kernel": params["vqa_out"]["kernel"]}.items()}
    tg = {"kernel": grads["kernel"], "bias": grads["bias"],
          "vqa_out.kernel": grads["vqa_out"]["kernel"]}
    groups = [
        {"params": [tp["kernel"]], "lr": lr, "weight_decay": wd},
        {"params": [tp["bias"]], "lr": lr, "weight_decay": 0.0},
        {"params": [tp["vqa_out.kernel"]], "lr": lr * 10,
         "weight_decay": wd},
    ]
    opt = torch.optim.AdamW(groups, betas=betas, eps=eps)
    for _ in range(3):
        for k, p in tp.items():
            p.grad = torch.tensor(tg[k])
        opt.step()

    np.testing.assert_allclose(
        got["kernel"], tp["kernel"].detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["bias"], tp["bias"].detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["vqa_out"]["kernel"], tp["vqa_out.kernel"].detach().numpy(),
        rtol=1e-5, atol=1e-6)
