"""Fused dropout + residual-add + LayerNorm (the post-GEMM tail of every
BERT sub-block, reference model/layer.py:104-127,158-170:
``LayerNorm(dropout(dense_out) + residual)``).

Why a kernel: on TPU this tail is pure HBM traffic. Run separately, the
dropout mask bits, the dropped activations, and the LN input each make an
HBM round trip per site (2 sites x num_layers, fwd and bwd). Fused, the
forward reads (x, residual) and writes y — nothing else touches HBM: the
keep-mask is generated from the on-core PRNG inside the kernel, and the
backward *replays* the same seed and recomputes the LN statistics, so the
custom VJP saves only the original inputs (no mask, no intermediate, no
stats).

Dropout semantics: keep iff uniform_u32 >= rate * 2^32 (exact to 2^-32 —
no rate quantization), rescale by 1/(1-rate). Same scheme as the fused
attention kernel (ops/attention.py), distinct stream per row-block.

Statistics are fp32 (apex FusedLayerNorm parity, eps 1e-12).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from uniter_tpu.ops.common import interpret_mode, pick_row_block
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None




def _keep_mask(seed_ref, rate, shape):
    # distinct stream per grid row-block; identical fwd/bwd (replay)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * (2**32)))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _t_block(x_ref, res_ref, seed_ref, rate):
    """drop(x) + res in fp32 for one [blk, D] block."""
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, rate, x.shape)
        x = jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0)
    else:
        keep = None
    return x + res_ref[...].astype(jnp.float32), keep


def _ln_stats(t, eps):
    mean = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(t - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (t - mean) * inv, inv


def _fwd_kernel(seed_ref, x_ref, res_ref, w_ref, b_ref, o_ref, *, rate, eps):
    t, _ = _t_block(x_ref, res_ref, seed_ref, rate)
    that, _ = _ln_stats(t, eps)
    y = that * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, res_ref, w_ref, g_ref,
                dx_ref, dres_ref, dw_ref, db_ref, *, rate, eps):
    t, keep = _t_block(x_ref, res_ref, seed_ref, rate)
    that, inv = _ln_stats(t, eps)
    g = g_ref[...].astype(jnp.float32)
    gw = g * w_ref[...].astype(jnp.float32)
    dt = inv * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - that * jnp.mean(gw * that, axis=-1, keepdims=True)
    )
    dres_ref[...] = dt.astype(dres_ref.dtype)
    if keep is not None:
        dx = jnp.where(keep, dt * (1.0 / (1.0 - rate)), 0.0)
    else:
        dx = dt
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # weight/bias grads: reduce each [blk, D] block to an [8, D] partial
    # (TPU tiling needs >=8 sublanes) and accumulate across the sequential
    # grid into a single VMEM-resident accumulator; the caller sums the 8
    # rows.
    blk, d = g.shape
    pw = jnp.sum((g * that).reshape(blk // 8, 8, d), axis=0)
    pb = jnp.sum(g.reshape(blk // 8, 8, d), axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = pw
        db_ref[...] = pb

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        dw_ref[...] += pw
        db_ref[...] += pb




def _row_specs(blk, d):
    return pl.BlockSpec((blk, d), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(d):
    return pl.BlockSpec((d,), lambda i, *_: (0,), memory_space=pltpu.VMEM)


def _drop_res_ln_fwd_raw(x, res, weight, bias, seed, rate, eps):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    res2 = res.reshape(-1, d)
    rows = x2.shape[0]
    blk = pick_row_block(rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // blk,),
        in_specs=[_row_specs(blk, d)] * 2 + [_vec_spec(d)] * 2,
        out_specs=_row_specs(blk, d),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=grid_spec,
    )(seed, x2, res2, weight, bias)
    return out.reshape(shape)


def _drop_res_ln_bwd_raw(x, res, weight, seed, rate, eps, g):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    res2 = res.reshape(-1, d)
    g2 = g.reshape(-1, d)
    rows = x2.shape[0]
    blk = pick_row_block(rows)
    n_blk = rows // blk
    acc_spec = pl.BlockSpec((8, d), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blk,),
        in_specs=[_row_specs(blk, d)] * 2 + [_vec_spec(d),
                                             _row_specs(blk, d)],
        out_specs=[_row_specs(blk, d), _row_specs(blk, d),
                   acc_spec, acc_spec],
    )
    dx, dres, dw_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=eps),
        interpret=interpret_mode(),
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(seed, x2, res2, weight, g2)
    return (dx.reshape(shape), dres.reshape(shape),
            jnp.sum(dw_p, axis=0), jnp.sum(db_p, axis=0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _drop_res_ln(x, res, weight, bias, seed, rate, eps):
    return _drop_res_ln_fwd_raw(x, res, weight, bias, seed, rate, eps)


def _drop_res_ln_fwd(x, res, weight, bias, seed, rate, eps):
    y = _drop_res_ln_fwd_raw(x, res, weight, bias, seed, rate, eps)
    return y, (x, res, weight, seed)


def _drop_res_ln_bwd(rate, eps, saved, g):
    x, res, weight, seed = saved
    dx, dres, dw, db = _drop_res_ln_bwd_raw(x, res, weight, seed, rate, eps, g)
    return dx, dres, dw.astype(weight.dtype), db.astype(weight.dtype), None


_drop_res_ln.defvjp(_drop_res_ln_fwd, _drop_res_ln_bwd)


# ---------------------------------------------------------------------------
# ln_drop: dropout(LayerNorm(x)) — the embedding tails (text and image
# embeddings run LN *then* dropout, reference model/model.py:241-244,269-271;
# the sub-block tails above run dropout *then* LN+residual).
# ---------------------------------------------------------------------------


def _ln_drop_fwd_kernel(seed_ref, x_ref, w_ref, b_ref, o_ref, *, rate, eps):
    x = x_ref[...].astype(jnp.float32)
    that, _ = _ln_stats(x, eps)
    y = that * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, rate, y.shape)
        y = jnp.where(keep, y * (1.0 / (1.0 - rate)), 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_drop_bwd_kernel(seed_ref, x_ref, w_ref, g_ref,
                        dx_ref, dw_ref, db_ref, *, rate, eps):
    x = x_ref[...].astype(jnp.float32)
    that, inv = _ln_stats(x, eps)
    g = g_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref, rate, g.shape)
        g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
    gw = g * w_ref[...].astype(jnp.float32)
    dx = inv * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - that * jnp.mean(gw * that, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    blk, d = g.shape
    pw = jnp.sum((g * that).reshape(blk // 8, 8, d), axis=0)
    pb = jnp.sum(g.reshape(blk // 8, 8, d), axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = pw
        db_ref[...] = pb

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        dw_ref[...] += pw
        db_ref[...] += pb


def _ln_drop_fwd_raw(x, weight, bias, seed, rate, eps):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    rows = x2.shape[0]
    blk = pick_row_block(rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // blk,),
        in_specs=[_row_specs(blk, d)] + [_vec_spec(d)] * 2,
        out_specs=_row_specs(blk, d),
    )
    out = pl.pallas_call(
        functools.partial(_ln_drop_fwd_kernel, rate=rate, eps=eps),
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid_spec=grid_spec,
    )(seed, x2, weight, bias)
    return out.reshape(shape)


def _ln_drop_bwd_raw(x, weight, seed, rate, eps, g):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    g2 = g.reshape(-1, d)
    rows = x2.shape[0]
    blk = pick_row_block(rows)
    acc_spec = pl.BlockSpec((8, d), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // blk,),
        in_specs=[_row_specs(blk, d), _vec_spec(d), _row_specs(blk, d)],
        out_specs=[_row_specs(blk, d), acc_spec, acc_spec],
    )
    dx, dw_p, db_p = pl.pallas_call(
        functools.partial(_ln_drop_bwd_kernel, rate=rate, eps=eps),
        interpret=interpret_mode(),
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(seed, x2, weight, g2)
    return dx.reshape(shape), jnp.sum(dw_p, axis=0), jnp.sum(db_p, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ln_drop(x, weight, bias, seed, rate, eps):
    return _ln_drop_fwd_raw(x, weight, bias, seed, rate, eps)


def _ln_drop_vjp_fwd(x, weight, bias, seed, rate, eps):
    return _ln_drop_fwd_raw(x, weight, bias, seed, rate, eps), (x, weight, seed)


def _ln_drop_vjp_bwd(rate, eps, saved, g):
    x, weight, seed = saved
    dx, dw, db = _ln_drop_bwd_raw(x, weight, seed, rate, eps, g)
    return dx, dw.astype(weight.dtype), db.astype(weight.dtype), None


_ln_drop.defvjp(_ln_drop_vjp_fwd, _ln_drop_vjp_bwd)


def ln_drop(x, weight, bias, *, rate: float = 0.0, rng=None,
            eps: float = 1e-12, impl: str = "xla"):
    """``dropout(LayerNorm(x))`` over the last axis (embedding tails)."""
    rows = x.size // x.shape[-1]
    if impl == "pallas" and pltpu is not None and rows % 8 == 0:
        r = float(rate) if rng is not None else 0.0
        if r > 0.0:
            seed = jax.random.randint(
                rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        return _ln_drop(x, weight, bias, seed, r, eps)
    from uniter_tpu.ops.layer_norm import layer_norm

    y = layer_norm(x, weight, bias, eps=eps, impl="xla")
    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, y.shape)
        y = jnp.where(keep, y / (1.0 - rate), jnp.zeros((), y.dtype))
    return y


def _xla_reference(x, res, weight, bias, rate, rng, eps):
    """Unfused composition (CPU / parity path): flax-compatible dropout."""
    from uniter_tpu.ops.layer_norm import layer_norm

    if rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        x = jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))
    return layer_norm(x + res, weight, bias, eps=eps, impl="xla")


def drop_res_ln(x, res, weight, bias, *, rate: float = 0.0, rng=None,
                eps: float = 1e-12, impl: str = "xla"):
    """``LayerNorm(dropout(x) + res)`` over the last axis.

    rate is applied only when ``rng`` is not None (training). impl
    "pallas" fuses the whole tail into one kernel with in-kernel PRNG;
    "xla" is the unfused reference composition.
    """
    rows = x.size // x.shape[-1]
    if impl == "pallas" and pltpu is not None and rows % 8 == 0:
        r = float(rate) if rng is not None else 0.0
        if r > 0.0:
            seed = jax.random.randint(
                rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
        return _drop_res_ln(x, res, weight, bias, seed, r, eps)
    return _xla_reference(x, res, weight, bias,
                          rate if rng is not None else 0.0, rng, eps)
