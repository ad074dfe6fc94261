"""Pallas kernels under interpret mode (CPU CI coverage for the TPU
kernels: attention, FFN, LayerNorm). Dropout paths need the on-core PRNG
and are validated on hardware (docs/PERF.md), not here."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("UNITER_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("impl,B,bb", [("pallas", 2, 1), ("pallas", 2, 2),
                                       ("pallas", 4, 3), ("pallas_nt", 2, 1),
                                       ("pallas_nt", 2, 2)])
def test_attention_kernel_interpret(impl, B, bb):
    # B=4/bb=3 exercises _batch_block's non-divisor decrement (3 does not
    # divide 4 -> clamps to bc=2)
    from uniter_tpu.ops.attention import multi_head_attention

    S, H, D = 16, 4, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32).at[:, 12:].set(-10000.0)
    out_p = np.asarray(multi_head_attention(q, k, v, bias, impl=impl,
                                            batch_block=bb))
    out_x = np.asarray(multi_head_attention(q, k, v, bias, impl="xla"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    gp = jax.grad(lambda q, k, v: jnp.sum(
        multi_head_attention(q, k, v, bias, impl=impl, batch_block=bb) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(
        multi_head_attention(q, k, v, bias, impl="xla") ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ffn_kernel_interpret():
    from uniter_tpu.ops.ffn import ffn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 24), jnp.float32)
    w1 = jnp.asarray(rng.randn(24, 48) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(48) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(48, 24) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(24) * 0.1, jnp.float32)
    out_p = np.asarray(ffn(x, w1, b1, w2, b2, impl="pallas"))
    out_x = np.asarray(ffn(x, w1, b1, w2, b2, impl="xla"))
    # erf polynomial vs exact erf: 1.5e-7 abs, fp32-visible but tiny
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)

    g = jax.grad(lambda *a: jnp.sum(ffn(*a, impl="pallas") ** 2),
                 argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(lambda *a: jnp.sum(ffn(*a, impl="xla") ** 2),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_layer_norm_kernel_interpret():
    from uniter_tpu.ops.layer_norm import layer_norm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32), jnp.float32)
    b = jnp.asarray(rng.randn(32), jnp.float32)
    out_p = np.asarray(layer_norm(x, w, b, impl="pallas"))
    out_x = np.asarray(layer_norm(x, w, b, impl="xla"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    gp = jax.grad(lambda x, w, b: jnp.sum(
        layer_norm(x, w, b, impl="pallas") ** 2), argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lambda x, w, b: jnp.sum(
        layer_norm(x, w, b, impl="xla") ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_drop_res_ln_kernel_interpret():
    """Fused dropout+residual+LN tail (rate=0 path: exact parity with the
    unfused composition, incl. weight/bias grads; the PRNG path needs the
    on-core generator and is validated on hardware)."""
    from uniter_tpu.ops.fused_block import drop_res_ln

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 24), jnp.float32)
    res = jnp.asarray(rng.randn(32, 24), jnp.float32)
    w = jnp.asarray(1.0 + 0.1 * rng.randn(24), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(24), jnp.float32)

    out_p = np.asarray(drop_res_ln(x, res, w, b, impl="pallas"))
    out_x = np.asarray(drop_res_ln(x, res, w, b, impl="xla"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    gp = jax.grad(lambda *a: jnp.sum(
        drop_res_ln(*a, impl="pallas") ** 2), argnums=(0, 1, 2, 3))(
        x, res, w, b)
    gx = jax.grad(lambda *a: jnp.sum(
        drop_res_ln(*a, impl="xla") ** 2), argnums=(0, 1, 2, 3))(
        x, res, w, b)
    for a, e in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_ln_drop_kernel_interpret():
    """Fused LN+dropout embedding tail (rate=0 path: exact parity with the
    unfused composition, incl. weight/bias grads)."""
    from uniter_tpu.ops.fused_block import ln_drop

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 24), jnp.float32)
    w = jnp.asarray(1.0 + 0.1 * rng.randn(24), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(24), jnp.float32)

    out_p = np.asarray(ln_drop(x, w, b, impl="pallas"))
    out_x = np.asarray(ln_drop(x, w, b, impl="xla"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)

    gp = jax.grad(lambda *a: jnp.sum(
        ln_drop(*a, impl="pallas") ** 2), argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lambda *a: jnp.sum(
        ln_drop(*a, impl="xla") ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_ipot_kernel_interpret():
    """Fused IPOT loop kernel == the lax.scan reference (ops/ot.py ipot),
    including padded rows/cols and the trace-distance consumer."""
    from uniter_tpu.ops.ot import optimal_transport_dist

    rng = np.random.RandomState(3)
    B, M, N, D = 4, 12, 8, 16
    txt = jnp.asarray(rng.randn(B, M, D), jnp.float32)
    img = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    txt_lens = np.array([12, 7, 3, 12])
    img_lens = np.array([8, 8, 2, 5])
    txt_pad = jnp.asarray(np.arange(M)[None] >= txt_lens[:, None])
    img_pad = jnp.asarray(np.arange(N)[None] >= img_lens[:, None])

    d_x = np.asarray(optimal_transport_dist(
        txt, img, txt_pad, img_pad, impl="xla"))
    d_p = np.asarray(optimal_transport_dist(
        txt, img, txt_pad, img_pad, impl="pallas"))
    np.testing.assert_allclose(d_p, d_x, rtol=1e-5, atol=1e-6)
    assert np.isfinite(d_p).all()

    # gradients flow only through the cost matrix (T under stop_gradient):
    # both impls must produce identical embedding grads
    g_x = jax.grad(lambda a, b: jnp.sum(optimal_transport_dist(
        a, b, txt_pad, img_pad, impl="xla")), argnums=(0, 1))(txt, img)
    g_p = jax.grad(lambda a, b: jnp.sum(optimal_transport_dist(
        a, b, txt_pad, img_pad, impl="pallas")), argnums=(0, 1))(txt, img)
    for a, e in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)


def test_attention_fwd_only_budget_divergent_grids(monkeypatch):
    """rate=0: the forward budgets 4 buffers and may pick a LARGER batch
    block than the 7-buffer backward — legal without dropout replay; both
    must still match the XLA reference (this budget admits fwd (2,4) vs
    bwd (2,2) at these shapes)."""
    from uniter_tpu.ops.attention import _grid_blocks, multi_head_attention

    monkeypatch.setenv("UNITER_ATTN_VMEM_BUDGET", "26000")
    B, S, H, D = 2, 16, 4, 8
    assert _grid_blocks(B, H, S, D, n_bufs=4, requested=2) == (2, 4)
    assert _grid_blocks(B, H, S, D, n_bufs=7, requested=2) == (2, 2)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32).at[:, 12:].set(-10000.0)
    out_p = np.asarray(multi_head_attention(q, k, v, bias, impl="pallas",
                                            batch_block=2))
    out_x = np.asarray(multi_head_attention(q, k, v, bias, impl="xla"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)
    gp = jax.grad(lambda q, k, v: jnp.sum(multi_head_attention(
        q, k, v, bias, impl="pallas", batch_block=2) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(multi_head_attention(
        q, k, v, bias, impl="xla") ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_vmem_budget_by_device_kind(monkeypatch):
    """The bc>1 admission budget derives from the device generation's VMEM
    (VERDICT r4 #7): 16MB-class parts (v2-v5, incl. the measured v5e) keep
    the probe-calibrated 6MB; Trillium's doubled VMEM doubles it; unknown
    kinds (incl. CPU) stay conservative; the env override always wins."""
    from uniter_tpu.ops.attention import _bc_budget

    monkeypatch.delenv("UNITER_ATTN_VMEM_BUDGET", raising=False)
    six_mb = 6 * 1024 * 1024
    for kind in ("TPU v2", "TPU v3", "TPU v4", "TPU v5 lite", "TPU v5p",
                 "TPU v5", "cpu", "unknown"):
        assert _bc_budget(kind) == six_mb, kind
    for kind in ("TPU v6 lite", "TPU v6e", "TPU7x"):
        assert _bc_budget(kind) == 2 * six_mb, kind
    monkeypatch.setenv("UNITER_ATTN_VMEM_BUDGET", "12345")
    assert _bc_budget("TPU v6 lite") == 12345
