"""Optimal transport (IPOT) for the Word-Region-Alignment pretraining loss.

Reference: /root/reference/model/ot.py. The reference runs 50 proximal-point
iterations (k=1 inner Sinkhorn steps) under torch.no_grad on a detached cost
matrix, then takes distance = trace(C @ T) with T detached — gradients flow
only through the cosine cost matrix. We reproduce that exactly: the
iteration is a fixed-length ``lax.scan`` (trivially jittable), wrapped in
``stop_gradient``, and everything runs fp32 for stability
(model/pretrain.py:186-188).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_matrix_cosine(x, y, eps: float = 1e-5):
    """Batched pairwise cosine distance [B,M,D],[B,N,D] -> [B,M,N]
    (reference ot.py:11-21; F.normalize clamps the norm at eps)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.einsum("bmd,bnd->bmn", xn, yn)


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad, beta, iteration, k):
    """Inexact proximal point OT (reference ot.py:35-66).

    C: [B, M, N] cost; x_pad/y_pad True at padding; x_len/y_len valid counts.
    Returns the transport plan T [B, N, M] (note the reference's transposed
    layout).
    """
    b, m, n = C.shape
    # Guard against fully-padded rows (batch-padding examples): lengths
    # clamped to 1 so no inf/nan can leak through masked positions.
    x_len = jnp.maximum(x_len, 1.0)
    y_len = jnp.maximum(y_len, 1.0)
    sigma = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None])  # [B, M]
    T0 = jnp.where(jnp.swapaxes(joint_pad, 1, 2), 0.0, 1.0)  # [B, N, M]
    A = jnp.where(
        jnp.swapaxes(joint_pad, 1, 2), 0.0,
        jnp.exp(-jnp.swapaxes(C, 1, 2) / beta),
    )  # [B, N, M]
    x_mask = (x_pad.astype(C.dtype) * 1e4)[:, None, :]  # [B, 1, M]
    y_mask = (y_pad.astype(C.dtype) * 1e4)[:, None, :]  # [B, 1, N]
    xl = x_len[:, None, None]
    yl = y_len[:, None, None]

    def outer(carry, _):
        T, sigma = carry
        Q = A * T  # [B, N, M]

        def inner(sigma, _):
            # delta: [B, 1, N]; sigma: [B, 1, M]
            delta = 1.0 / (
                yl * jnp.einsum("bnm,bm->bn", Q, sigma)[:, None, :] + y_mask
            )
            sigma_new = 1.0 / (xl * jnp.einsum("bn,bnm->bm", delta[:, 0], Q)[:, None, :] + x_mask)
            return sigma_new[:, 0], delta

        sigma, deltas = jax.lax.scan(inner, sigma, None, length=k)
        delta = deltas[-1]  # [B, 1, N]
        T = delta[:, 0, :, None] * Q * sigma[:, None, :]
        return (T, sigma), None

    (T, _), _ = jax.lax.scan(outer, (T0, sigma), None, length=iteration)
    return jnp.where(jnp.swapaxes(joint_pad, 1, 2), 0.0, T)


def optimal_transport_dist(
    txt_emb, img_emb, txt_pad, img_pad, beta=0.5, iteration=50, k=1
):
    """Per-example OT distance [B] (reference ot.py:69-85)."""
    txt_emb = txt_emb.astype(jnp.float32)
    img_emb = img_emb.astype(jnp.float32)
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = jnp.sum(~txt_pad, axis=1).astype(cost.dtype)
    img_len = jnp.sum(~img_pad, axis=1).astype(cost.dtype)
    T = jax.lax.stop_gradient(
        ipot(
            jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
            joint_pad, beta, iteration, k,
        )
    )
    # trace(C @ T) per batch element = sum_mn C[m,n] * T[n,m]
    return jnp.einsum("bmn,bnm->b", cost, T)
