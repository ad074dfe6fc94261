"""Fused FFN Pallas kernel: x @ W1 + b1 -> erf-gelu -> @ W2 + b2.

The reference's FFN is two cuBLAS GEMMs with an eager gelu between
(model/layer.py:130-156). This kernel keeps the [rows, 4H] intermediate in
VMEM (never materialized in HBM), tiling rows over the grid with both weight
matrices resident. Backward recomputes the intermediate (gelu is cheap)
via a custom VJP.

Weights are taken in bf16 for MXU; accumulation fp32.
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




from uniter_tpu.ops.activations import gelu


def _erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7 — far below bf16
    resolution); Pallas TPU has no erf lowering."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(x):
    return x * 0.5 * (1.0 + _erf_poly(x * 0.7071067811865476))


def _ffn_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _gelu_kernel(h).astype(x.dtype)
    o = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)




def _ffn_pallas_raw(x2, w1, b1, w2, b2):
    rows, d_in = x2.shape
    d_mid = w1.shape[1]
    d_out = w2.shape[1]
    blk = pick_row_block(rows, max_block=512)
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ffn_fwd_kernel,
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((rows, d_out), x2.dtype),
        grid=(rows // blk,),
        in_specs=[
            pl.BlockSpec((blk, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(d_in, d_mid),
            full(d_mid),
            full(d_mid, d_out),
            full(d_out),
        ],
        out_specs=pl.BlockSpec((blk, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2, w1, b1, w2, b2)


@jax.custom_vjp
def _ffn_pallas(x2, w1, b1, w2, b2):
    return _ffn_pallas_raw(x2, w1, b1, w2, b2)


def _ffn_fwd(x2, w1, b1, w2, b2):
    return _ffn_pallas_raw(x2, w1, b1, w2, b2), (x2, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    # Recompute the intermediate; backward in plain XLA (fused well there).
    # The recompute uses the SAME polynomial erf as the forward kernel so
    # h and the gelu cdf are the derivative of the actual primal (mixing
    # jax.lax.erf here would fail strict fp32 fwd/bwd-consistency checks).
    x2, w1, b1, w2, b2 = res
    x32 = x2.astype(jnp.float32)
    pre = x32 @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    h = _gelu_kernel(pre)
    g32 = g.astype(jnp.float32)
    dh = g32 @ w2.astype(jnp.float32).T
    # erf-gelu derivative
    inv_sqrt2 = 0.7071067811865476
    cdf = 0.5 * (1.0 + _erf_poly(pre * inv_sqrt2))
    pdf = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
    dpre = dh * (cdf + pre * pdf)
    dx = (dpre @ w1.astype(jnp.float32).T).astype(x2.dtype)
    dw1 = (x32.T @ dpre).astype(w1.dtype)
    db1 = jnp.sum(dpre, axis=0).astype(b1.dtype)
    dw2 = (h.T @ g32).astype(w2.dtype)
    db2 = jnp.sum(g32, axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


_ffn_pallas.defvjp(_ffn_fwd, _ffn_bwd)


def ffn(x, w1, b1, w2, b2, *, impl: str = "xla"):
    """[..., D] -> [..., D_out] fused feed-forward. impl in {xla, pallas}."""
    if impl == "pallas" and pltpu is not None:
        shape = x.shape
        out = _ffn_pallas(
            x.reshape(-1, shape[-1]),
            w1.astype(x.dtype), b1, w2.astype(x.dtype), b2)
        return out.reshape(*shape[:-1], w2.shape[1])
    h = gelu(jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype))
    return jnp.dot(h, w2.astype(x.dtype)) + b2.astype(x.dtype)
