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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from uniter_tpu.ops.common import interpret_mode


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


# ---------------------------------------------------------------------------
# Pallas TPU kernel: the full proximal-point loop in VMEM
# ---------------------------------------------------------------------------
#
# Under XLA the scan materializes Q, T, sigma to HBM every one of the 50
# iterations (~4 passes over a [B,N,M] fp32 buffer per iteration — pure
# HBM-bandwidth cost; the matvec FLOPs are negligible). The per-example
# working set (A, T, Q at typical pretrain shapes 64x160 fp32 = ~120KB)
# fits VMEM with room to batch several examples per grid step, so one
# kernel runs the entire loop with a single HBM read of A and a single
# write of T. Forward-only by design — the reference computes T under
# torch.no_grad (ot.py:53; gradients flow only through the cost matrix).


def _ipot_batch_block(b, n, m, budget=4 * 1024 * 1024):
    per = 3 * n * m * 4 + 8 * (n + m) * 4
    bc = max(1, min(b, budget // max(per, 1)))
    while b % bc:
        bc -= 1
    return bc


def _ipot_kernel(a_ref, sigma0_ref, xmask_ref, ymask_ref, xl_ref, yl_ref,
                 t_ref, *, iteration, k):
    A = a_ref[...]  # [bc, N, M]
    sigma = sigma0_ref[...]  # [bc, M]
    xm = xmask_ref[...]  # [bc, M]
    ym = ymask_ref[...]  # [bc, N]
    xl = xl_ref[...]  # [bc, 1]
    yl = yl_ref[...]  # [bc, 1]
    T0 = (A > 0.0).astype(jnp.float32)  # joint-pad zeros (exp(finite) > 0)

    def outer(_, carry):
        T, sigma = carry
        Q = A * T

        def inner(_, st):
            sigma, _ = st
            delta = 1.0 / (yl * jnp.sum(Q * sigma[:, None, :], axis=2) + ym)
            sigma = 1.0 / (xl * jnp.sum(Q * delta[:, :, None], axis=1) + xm)
            return sigma, delta

        sigma, delta = jax.lax.fori_loop(
            0, k, inner, (sigma, jnp.zeros(ym.shape, jnp.float32)))
        T = delta[:, :, None] * Q * sigma[:, None, :]
        return T, sigma

    T, _ = jax.lax.fori_loop(0, iteration, outer, (T0, sigma))
    t_ref[...] = T


def ipot_pallas(C, x_len, x_pad, y_len, y_pad, joint_pad, beta, iteration,
                k):
    """Drop-in for :func:`ipot` on TPU: same inputs, same [B, N, M]
    transport plan, the whole loop fused into one VMEM-resident kernel."""
    b, m, n = C.shape
    x_len = jnp.maximum(x_len, 1.0)
    y_len = jnp.maximum(y_len, 1.0)
    jp_t = jnp.swapaxes(joint_pad, 1, 2)  # [B, N, M]
    A = jnp.where(jp_t, 0.0, jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))
    sigma0 = jnp.where(x_pad, 0.0, 1.0 / x_len[:, None]).astype(jnp.float32)
    x_mask = x_pad.astype(jnp.float32) * 1e4  # [B, M]
    y_mask = y_pad.astype(jnp.float32) * 1e4  # [B, N]
    bc = _ipot_batch_block(b, n, m)
    kernel = functools.partial(_ipot_kernel, iteration=iteration, k=k)

    def spec(*shape):
        return pl.BlockSpec((bc,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    T = pl.pallas_call(
        kernel,
        interpret=interpret_mode(),
        grid=(b // bc,),
        in_specs=[spec(n, m), spec(m), spec(m), spec(n), spec(1), spec(1)],
        out_specs=spec(n, m),
        out_shape=jax.ShapeDtypeStruct((b, n, m), jnp.float32),
    )(A.astype(jnp.float32), sigma0, x_mask, y_mask,
      x_len[:, None].astype(jnp.float32), y_len[:, None].astype(jnp.float32))
    return jnp.where(jp_t, 0.0, T)


def optimal_transport_dist(
    txt_emb, img_emb, txt_pad, img_pad, beta=0.5, iteration=50, k=1,
    impl: str = "auto",
):
    """Per-example OT distance [B] (reference ot.py:69-85).

    ``impl``: "xla" (the lax.scan reference), "pallas" (single fused
    kernel), or "auto" (pallas on accelerators)."""
    if impl == "auto":
        import os

        impl = os.environ.get("UNITER_OT_IMPL") or (
            "pallas" if jax.default_backend() != "cpu"
            and pltpu is not None else "xla")
    txt_emb = txt_emb.astype(jnp.float32)
    img_emb = img_emb.astype(jnp.float32)
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = jnp.sum(~txt_pad, axis=1).astype(cost.dtype)
    img_len = jnp.sum(~img_pad, axis=1).astype(cost.dtype)
    ipot_fn = ipot_pallas if impl == "pallas" else ipot
    T = jax.lax.stop_gradient(
        ipot_fn(
            jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
            joint_pad, beta, iteration, k,
        )
    )
    # trace(C @ T) per batch element = sum_mn C[m,n] * T[n,m]
    return jnp.einsum("bmn,bnm->b", cost, T)
