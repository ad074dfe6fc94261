"""Optimizer construction (reference /root/reference/optim/adamw.py,
optim/misc.py, + the 10x head-lr groups of train_vqa.py:51-86 etc.).

AdamW with decoupled weight decay and bias correction (the reference's
defaults: eps 1e-6, correct_bias=True, decay applied as
``p -= lr * wd * p``) — optax.adamw implements the identical update. The
no-decay group covers biases and LayerNorm params (optim/misc.py:12-22).
Head-lr multipliers are applied as a post-scale on the head params' updates,
which is mathematically identical to a separate param group with
``lr * lr_mul`` (both the Adam term and the decay term scale by lr).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def decay_mask(params):
    """True where weight decay applies: everything except biases and
    LayerNorm weights/biases (reference optim/misc.py:14)."""

    def f(path, _):
        p = _path_str(path)
        # reference matches by substring: any param whose name contains
        # 'bias' (incl. in_proj_bias), plus LayerNorm weight/bias
        if "bias" in p.rsplit("/", 1)[-1]:
            return False
        if "LayerNorm" in p or "layer_norm" in p or "_ln" in p:
            return False
        if p.endswith("/weight"):  # only LN params are named 'weight'
            return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


def head_mask(params, head_paths: Sequence[str]):
    """True for params whose path contains any of head_paths (the task-head
    groups that get lr_mul, e.g. train_vqa.py:208-214)."""

    def f(path, _):
        p = _path_str(path)
        return any(h in p for h in head_paths)

    return jax.tree_util.tree_map_with_path(f, params)


def build_optimizer(
    params,
    learning_rate: Callable | float,
    *,
    betas=(0.9, 0.98),
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    grad_norm: float = 2.0,
    lr_mul: float = 1.0,
    lr_mul_paths: Sequence[str] = (),
    optim: str = "adamw",
    mu_dtype=None,
) -> optax.GradientTransformation:
    """Mirror of reference build_optimizer + driver-side clip/lr logic.

    ``mu_dtype``: storage dtype for the first moment (e.g. "bfloat16" to
    halve its HBM traffic; the optimizer step is HBM-bound on TPU). Second
    moments stay fp32 (they hold squared grads; bf16's 8 mantissa bits are
    not enough there).
    """
    if optim == "adamw":
        core = optax.adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay, mask=decay_mask(params),
            mu_dtype=mu_dtype,
        )
    elif optim == "adam":
        core = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    elif optim == "adamax":
        core = optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
    else:
        raise ValueError(f"invalid optimizer {optim}")

    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(core)
    if lr_mul != 1.0 and lr_mul_paths:
        hmask = head_mask(params, lr_mul_paths)
        chain.append(
            optax.masked(optax.scale(lr_mul), hmask)
        )
    return optax.chain(*chain)
