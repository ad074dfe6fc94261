"""Dropout with a reduced-traffic TPU mask path.

``impl="xla"`` is `jax.random.bernoulli` + select — the standard path, and
bit-compatible with flax ``nn.Dropout``.

``impl="u16"`` draws 16-bit thresholds instead of 32-bit uniforms: the
random-bit tensor is half the bytes, and dropout-mask generation is pure
HBM traffic on TPU (the hidden-state masks are [B, S, 768/3072] per layer;
the VPU compare/select fuses into the consumer either way). The keep
probability is quantized to 1/65536 steps — for rate=0.1 the effective rate
is 0.100006... — and the kept values are rescaled by the *quantized* rate so
E[dropout(x)] == x exactly. 16 bits of threshold resolution matches the
mask-quality of standard fp32 dropout (which also compares ~24 significant
bits of a u32-derived uniform; mask statistics are tested in
tests/test_encoder.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dropout(x, rate: float, rng, *, impl: str = "xla", deterministic: bool = False):
    """Inverted dropout. Returns x unchanged when deterministic or rate==0."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    if impl == "u8":
        # 8-bit thresholds: quarter the random-bit traffic of u32. The keep
        # rate quantizes to 1/256 steps (0.1 -> 26/256 = 0.1016); the
        # rescale uses the quantized rate so E[dropout(x)] == x stays exact.
        thr = int(round(rate * 256))
        if 0 < thr < 256:
            keep_q = 1.0 - thr / 256.0
            bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
            keep = bits >= jnp.uint8(thr)
            scale = jnp.asarray(1.0 / keep_q, x.dtype)
            return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
    if impl in ("u16", "u16pack"):
        thr = int(round(rate * 65536))
        if 0 < thr < 65536:
            keep_q = 1.0 - thr / 65536.0
            shape = x.shape
            if impl == "u16pack" and shape and shape[-1] % 2 == 0:
                # draw u32 for half the elements and view as u16 pairs.
                # (Measured SLOWER than the whole thing is worth on v5e —
                # the bitcast+reshape relayout costs more than the halved
                # bit traffic saves; kept for experiments.)
                half = shape[:-1] + (shape[-1] // 2,)
                bits32 = jax.random.bits(rng, half, dtype=jnp.uint32)
                bits = lax.bitcast_convert_type(bits32, jnp.uint16).reshape(shape)
            else:
                bits = jax.random.bits(rng, shape, dtype=jnp.uint16)
            keep = bits >= jnp.uint16(thr)
            scale = jnp.asarray(1.0 / keep_q, x.dtype)
            return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))
