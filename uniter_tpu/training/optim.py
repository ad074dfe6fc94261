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

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
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


class FusedAdamWState(NamedTuple):
    """State of :func:`fused_adamw`.

    ``gnorm`` is the pre-clip global gradient norm of the *last* update —
    drivers log it without a second full pass over the gradients.
    ``master`` holds fp32 master weights for params stored in a lower
    dtype (``master=True`` mode — bf16 param storage); ``None`` leaves for
    params that are already fp32.
    """

    count: jax.Array
    mu: Any
    nu: Any
    gnorm: jax.Array
    master: Any = None


def fused_adamw(
    learning_rate: Callable | float,
    *,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    decay_mask_tree=None,
    grad_norm: float = 0.0,
    lr_mul: float = 1.0,
    lr_mul_tree=None,
    mu_dtype=None,
    nu_dtype=None,
    master: bool = False,
) -> optax.GradientTransformation:
    """One-pass AdamW: clip + moments + bias correction + decoupled decay +
    schedule + head-lr multipliers computed in a single per-leaf kernel.

    Mathematically identical to the optax chain built by
    :func:`build_optimizer` (unit-tested leaf-exact); the fusion matters on
    TPU because the optimizer step is HBM-bound — every extra elementwise
    pass over 110M params re-reads/rewrites ~440MB. This formulation reads
    (g, mu, nu, p) once and writes (mu, nu, update) once, and optionally
    stores the moments in bfloat16 (`mu_dtype`/`nu_dtype`) to cut the traffic
    further; moment *arithmetic* is always fp32 (the EMA update is computed
    in fp32 and rounded once on store).

    ``master=True`` enables low-precision param storage: the optimizer
    keeps an fp32 master copy of every param in its state, updates the
    master in fp32, and ``TrainState.apply_gradients`` re-casts the master
    into each param's storage dtype after every step (the apex-O2 /
    DeepSpeed bf16 scheme — params may live in bf16 without the update
    math losing precision; grads arrive in the param dtype, halving the
    optimizer's gradient reads)."""
    lr_fn = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        def zeros_like(dt):
            return lambda p: jnp.zeros(p.shape, dtype=dt or p.dtype)

        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros_like(mu_dtype), params),
            nu=jax.tree.map(zeros_like(nu_dtype), params),
            gnorm=jnp.zeros((), jnp.float32),
            # copy=True: fp32 leaves must NOT alias their master (the jit
            # train step donates the whole state; an aliased buffer would
            # be donated twice)
            master=(jax.tree.map(
                lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
                params) if master else None),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params")
        # fp32 accumulation regardless of grad dtype (bf16 grads in master
        # mode: squaring/summing in bf16 would make the clip norm noisy)
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree.leaves(grads)))
        if grad_norm and grad_norm > 0:
            # optax.clip_by_global_norm: g * clip / max(norm, clip)
            clip = jnp.minimum(
                1.0, grad_norm / jnp.maximum(gnorm, grad_norm))
        else:
            clip = jnp.ones((), jnp.float32)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf
        # optax.scale_by_learning_rate steps its own counter starting at 0
        lr = jnp.asarray(lr_fn(state.count), jnp.float32)

        def leaf(g, mu, nu, p, decay, mul):
            g = g.astype(jnp.float32) * clip
            mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
            nu32 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
            u = (mu32 / bc1) / (jnp.sqrt(nu32 / bc2) + eps)
            if decay:
                u = u + weight_decay * p.astype(jnp.float32)
            step = (-lr * mul) * u
            if master:
                # p IS the fp32 master here; the caller recasts to the
                # storage dtype (TrainState.apply_gradients)
                return p + step, mu32.astype(mu.dtype), nu32.astype(nu.dtype)
            return (step.astype(p.dtype), mu32.astype(mu.dtype),
                    nu32.astype(nu.dtype))

        decay_leaves = (decay_mask_tree if decay_mask_tree is not None
                        else jax.tree.map(lambda _: True, grads))
        mul_leaves = jax.tree.map(
            lambda m: lr_mul if m else 1.0,
            lr_mul_tree if lr_mul_tree is not None
            else jax.tree.map(lambda _: False, grads))
        p_in = state.master if master else params
        out = jax.tree.map(leaf, grads, state.mu, state.nu, p_in,
                           decay_leaves, mul_leaves)
        treedef = jax.tree.structure(grads)
        flat = jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))
        first = jax.tree.unflatten(treedef, [t[0] for t in flat])
        mu = jax.tree.unflatten(treedef, [t[1] for t in flat])
        nu = jax.tree.unflatten(treedef, [t[2] for t in flat])
        if master:
            # updates carry the TRUE delta (new_master cast to storage
            # dtype, minus p) so the standard optax contract
            # (optax.apply_updates) still trains; the master-aware caller
            # (TrainState.apply_gradients) takes opt_state.master directly
            # — exact, no double-rounding — and XLA DCEs this delta there.
            updates = jax.tree.map(
                lambda m, p: m.astype(p.dtype) - p, first, params)
            return updates, FusedAdamWState(count=count, mu=mu, nu=nu,
                                            gnorm=gnorm, master=first)
        return first, FusedAdamWState(count=count, mu=mu, nu=nu,
                                      gnorm=gnorm, master=None)

    return optax.GradientTransformation(init, update)


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
    nu_dtype=None,
    fused: bool = False,
    master: bool = False,
) -> optax.GradientTransformation:
    """Mirror of reference build_optimizer + driver-side clip/lr logic.

    ``mu_dtype``/``nu_dtype``: storage dtype for the moments (e.g.
    "bfloat16" to halve their HBM traffic; the optimizer step is HBM-bound
    on TPU). ``fused=True`` uses :func:`fused_adamw` — one fused per-leaf
    kernel, leaf-exact vs the optax chain at fp32 moments.
    """
    if master and not (fused and optim == "adamw"):
        raise ValueError("master-weight mode (--param_dtype bfloat16) "
                         "requires the fused adamw optimizer")
    if fused and optim == "adamw":
        return fused_adamw(
            learning_rate, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay, decay_mask_tree=decay_mask(params),
            grad_norm=grad_norm or 0.0, lr_mul=lr_mul,
            lr_mul_tree=(head_mask(params, lr_mul_paths)
                         if lr_mul != 1.0 and lr_mul_paths else None),
            mu_dtype=mu_dtype, nu_dtype=nu_dtype, master=master,
        )
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
