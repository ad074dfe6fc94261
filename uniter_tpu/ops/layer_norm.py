"""LayerNorm with XLA and fused-Pallas implementations.

Replaces apex ``FusedLayerNorm(eps=1e-12)`` (reference model/model.py:229,
model/layer.py:25). Statistics are always computed in fp32 regardless of the
compute dtype, matching apex's fused kernel behavior under O2 mixed precision.

The Pallas kernel fuses mean/var/normalize/affine over rows, tiled so the
feature axis stays in VMEM lanes; backward is a custom VJP that recomputes
statistics (cheap) instead of saving them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from uniter_tpu.ops.common import interpret_mode, pick_row_block
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable in some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None




def _layer_norm_xla(x, weight, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)




@functools.partial(jax.jit, static_argnames=("eps",))
def _layer_norm_pallas(x, weight, bias, eps):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    rows = x2.shape[0]
    blk = pick_row_block(rows)
    grid = (rows // blk,)
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2, weight, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_pallas_vjp(x, weight, bias, eps):
    return _layer_norm_pallas(x, weight, bias, eps)


def _ln_fwd(x, weight, bias, eps):
    return _layer_norm_pallas(x, weight, bias, eps), (x, weight)


def _ln_bwd(eps, res, g):
    # Recompute statistics; grads in fp32 (standard LN backward).
    x, weight = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    w32 = weight.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    d = x.shape[-1]
    gw = g32 * w32
    dx = inv * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - xhat * jnp.mean(gw * xhat, axis=-1, keepdims=True)
    )
    reduce_axes = tuple(range(x.ndim - 1))
    dweight = jnp.sum(g32 * xhat, axis=reduce_axes).astype(weight.dtype)
    dbias = jnp.sum(g32, axis=reduce_axes).astype(weight.dtype)
    return dx.astype(x.dtype), dweight, dbias


_layer_norm_pallas_vjp.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, weight, bias, *, eps: float = 1e-12, impl: str = "xla"):
    """LayerNorm over the last axis. impl in {"xla", "pallas"}."""
    if impl == "pallas" and pltpu is not None:
        return _layer_norm_pallas_vjp(x, weight, bias, eps)
    return _layer_norm_xla(x, weight, bias, eps)
