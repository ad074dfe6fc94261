"""Activation functions.

The reference pins the *erf* form of GELU (model/layer.py:31-37) — not the
tanh approximation — which matters for logit parity with released
checkpoints. ``jax.nn.gelu(approximate=False)`` is the same function; we
spell it out explicitly so the parity contract is visible.
"""

import jax
import jax.numpy as jnp


def gelu(x):
    """erf-form GELU: x * 0.5 * (1 + erf(x / sqrt(2)))."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def swish(x):
    return x * jax.nn.sigmoid(x)


ACT2FN = {"gelu": gelu, "relu": jax.nn.relu, "swish": swish}
