"""Multi-head self-attention: XLA reference path + fused Pallas TPU kernel.

Semantics follow the reference's BertSelfAttention (model/layer.py:75-101):
scores = QK^T / sqrt(head_dim) + additive_bias; probs = softmax(scores);
probs = dropout(probs); out = probs @ V. The additive bias is the
``(1-mask) * -10000`` padding bias precomputed once per batch
(model/model.py:342-345).

TPU-first design notes:
  * Sequences are short (<=512) and statically bucketed, so one (batch, head)
    grid step holds the full S x S score matrix in VMEM — no flash-style
    streaming needed; the win is fusing QK^T + bias + softmax + dropout + PV
    into one kernel (one HBM round-trip for Q/K/V instead of four).
  * Scores and softmax are computed in fp32 on the MXU
    (preferred_element_type), inputs may be bf16.
  * Dropout uses the on-core PRNG; the backward kernel replays the same seed
    so the keep-mask never touches HBM.
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





# ---------------------------------------------------------------------------
# XLA path (used on CPU and as autodiff reference)
# ---------------------------------------------------------------------------


def _mha_xla(q, k, v, bias, dropout_rate=0.0, dropout_rng=None):
    """q, k, v: [B, S, H, D]; bias: [B, S_k] additive fp32."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale + bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _attn_probs(q_ref, k_ref, bias_ref, *, sm_scale, native=False):
    """Batch/head-blocked scores: one MXU batched-matmul per grid step
    (grid is (B/bc, H/hc); heads AND a bc-chunk of batch elements are
    merged into the single dot_general batch dim Mosaic supports —
    tpu.matmul allows at most one — so Mosaic pipelines them instead of
    paying per-(b,h) grid overhead). Returns merged [bc*hc, S, S]."""
    q = _ld(q_ref, native)  # [bc*hc, S, D]
    k = _ld(k_ref, native)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bc*hc, Sq, Sk]
    bias = bias_ref[...].astype(jnp.float32)  # [bc, 1, Sk]
    bc = bias.shape[0]
    n, sq, sk = s.shape
    # bias is per batch element: add in a (bc, hc, Sq, Sk) view (leading-dim
    # reshapes are layout-free; tiling lives in the last two dims)
    s = s.reshape(bc, n // bc, sq, sk) * sm_scale + bias[:, :, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    return p.reshape(n, sq, sk)


def _dropout_bits(seed_ref, rate, shape):
    # distinct stream per (batch, head-chunk) grid step; identical between
    # fwd and bwd so the keep-mask replays exactly
    pltpu.prng_seed(
        seed_ref[0] + pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    )
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * (2**32)))
    return pltpu.bitcast(bits, jnp.uint32) >= threshold  # keep-mask


def _ld(ref, native):
    """Load a block as merged [bc*hc, S, D]. In native layout the HBM
    array is [B, S, H, D] (the projections' own layout — no HBM transpose
    kernels around the pallas call) and the block arrives [bc, S, hc, D];
    the swap to head-major happens here, in VMEM."""
    x = ref[...]
    if native:
        x = jnp.swapaxes(x, 1, 2)
    bc, hc, s, d = x.shape
    return x.reshape(bc * hc, s, d)


def _st(ref, x, native):
    """Store a merged [bc*hc, S, D] result back through the block's
    layout."""
    bc = ref.shape[0]
    hc = ref.shape[2] if native else ref.shape[1]
    x = x.reshape(bc, hc, *x.shape[1:])
    ref[...] = jnp.swapaxes(x, 1, 2) if native else x


def _mha_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                    sm_scale, rate, native=False):
    p = _attn_probs(q_ref, k_ref, bias_ref, sm_scale=sm_scale, native=native)
    if rate > 0.0:
        keep = _dropout_bits(seed_ref, rate, p.shape)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    out = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        _ld(v_ref, native),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)
    _st(o_ref, out, native)


def _mha_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
    sm_scale, rate, native=False
):
    p = _attn_probs(q_ref, k_ref, bias_ref, sm_scale=sm_scale, native=native)
    g = _ld(g_ref, native).astype(jnp.float32)  # [bc*hc, S, D]
    v = _ld(v_ref, native).astype(jnp.float32)
    if rate > 0.0:
        keep = _dropout_bits(seed_ref, rate, p.shape)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
    else:
        keep = None
        pd = p
    dv = jax.lax.dot_general(
        pd, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    _st(dv_ref, dv, native)
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bc*hc, S, S]
    if keep is not None:
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax bwd
    ds = ds * sm_scale
    dq = jax.lax.dot_general(
        ds, _ld(k_ref, native).astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    _st(dq_ref, dq, native)
    dk = jax.lax.dot_general(
        ds, _ld(q_ref, native).astype(jnp.float32),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    _st(dk_ref, dk, native)


def _head_chunk(h, s, d, n_bufs, bc=1):
    """Heads per grid step, fitting scores+blocks in a VMEM budget. At short
    S all heads batch into one step; at S=512 the [H,S,S] fp32 scores alone
    would blow the ~16MB VMEM, so heads are chunked. bc batch elements per
    step multiply the whole budget."""
    budget = 10 * 1024 * 1024
    per_head = bc * (s * s * 4 * 2 + n_bufs * s * d * 2)
    hc = max(1, min(h, budget // max(per_head, 1)))
    while h % hc:
        hc -= 1
    return hc


def _device_vmem_bytes(kind: str) -> int:
    """Per-core VMEM by device generation. v2-v5 report ~16MB/core (the
    pallas guide's figure; v5e measured here); Trillium (v6 lite) doubled
    the on-chip vector memory. Unknown kinds (incl. CPU interpret runs)
    fall back to the conservative 16MB class."""
    k = kind.lower()
    if "v6" in k or "v7" in k or "tpu7" in k:
        return 32 * 1024 * 1024
    return 16 * 1024 * 1024


def _bc_budget(device_kind: str | None = None) -> int:
    """VMEM working-set bound for bc>1 grid steps. On v5e (16MB VMEM):
    Mosaic compile-crashes at 8.6MB (bb=4 at base shapes, docs/PERF.md r3
    part 2); 4.3MB (base bb=2) and 5.75MB (uniter-large full-head bb=2, r4
    sweep — compiles, replays, and is the fastest large config at 590.4 vs
    587.9 ex/s) are measured good, so bc>1 is admitted up to 6MB — between
    the measured good and bad points (37.5% of VMEM: the block buffers are
    double-buffered by the pipeline, so ~2x the working set must fit).
    Other generations scale by their VMEM size (VERDICT r4 #7); the env
    override (UNITER_ATTN_VMEM_BUDGET, bytes) wins for hardware probes."""
    import os

    env = os.environ.get("UNITER_ATTN_VMEM_BUDGET")
    if env is not None:
        return int(env)
    if device_kind is None:
        try:
            device_kind = jax.devices()[0].device_kind
        except Exception:  # backend not initializable -> conservative class
            device_kind = "unknown"
    # measured v5e point: 6MB of 16MB; keep the same fraction elsewhere
    return (_device_vmem_bytes(device_kind) * 6) // 16


def _grid_blocks(b, h, s, d, n_bufs, requested):
    """Joint (bc, hc) selection: batch elements and heads per grid step.

    Maximizes the per-step MXU batch (bc*hc — what amortizes grid overhead
    and feeds the systolic array), tie-breaking toward larger bc (fewer
    grid steps). bc=1 may use the looser 10MB bound (proven by the r1-r3
    single-element kernels); bc>1 is capped by _bc_budget(). A requested
    bb whose all-heads working set overflows is satisfied by chunking
    heads (hc < H) rather than degrading to bc=1 (VERDICT r3 #3). r4
    hardware sweep at uniter-large S=104: hc<H cancels the batch-block
    gain (hc=8/bb=2 587.5 vs ctl 587.9 — double the grid steps), while
    full-head bb=2 under the raised 6MB budget wins (590.4); head
    chunking remains the only admission path at S>=128 large shapes."""
    per_head = s * s * 4 * 2 + n_bufs * s * d * 2
    best = (1, _head_chunk(h, s, d, n_bufs, bc=1))
    if requested <= 1:
        return best
    budget = _bc_budget()
    for bc in range(min(b, requested), 1, -1):
        if b % bc:
            continue
        hc = max(1, min(h, budget // max(bc * per_head, 1)))
        while h % hc:
            hc -= 1
        if bc * hc * per_head > budget:
            continue
        if (bc * hc, bc) > (best[0] * best[1], best[0]):
            best = (bc, hc)
    return best


def _bhsd_spec(bc, hc, s, d):
    # index_map receives (*grid_ids, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — swallow the scalar ref.
    return pl.BlockSpec(
        (bc, hc, s, d), lambda b, j, *_: (b, j, 0, 0), memory_space=pltpu.VMEM
    )


def _bshd_spec(bc, hc, s, d):
    # native layout: the HBM array keeps the projections' [B, S, H, D]
    # shape; the head axis is still the grid's chunk axis.
    return pl.BlockSpec(
        (bc, s, hc, d), lambda b, j, *_: (b, 0, j, 0), memory_space=pltpu.VMEM
    )


def _bias_spec(bc, s):
    # bias arrives as [B, 1, S]; a (bc, 1, S) block satisfies the TPU tiling
    # rule (trailing block dims equal to the array dims).
    return pl.BlockSpec(
        (bc, 1, s), lambda b, j, *_: (b, 0, 0), memory_space=pltpu.VMEM
    )


def _mha_pallas_raw(q, k, v, bias, seed, rate, native=False, bb=1):
    """q,k,v: [B, H, S, D] (or [B, S, H, D] when native); bias: [B, S]."""
    if native:
        b, s, h, d = q.shape
        spec = _bshd_spec
    else:
        b, h, s, d = q.shape
        spec = _bhsd_spec
    bias = bias.reshape(b, 1, s)
    # at rate>0 chunk sizes must MATCH the backward pass so dropout
    # streams replay (budget for the bwd's 7 buffers); at rate==0 there is
    # no replay constraint and the forward holds only q/k/v/o — the
    # smaller working set admits bigger batch blocks (retrieval scoring)
    n_bufs = 7 if rate > 0.0 else 4
    bc, hc = _grid_blocks(b, h, s, d, n_bufs=n_bufs, requested=bb)
    kernel = functools.partial(
        _mha_fwd_kernel, sm_scale=1.0 / (d**0.5), rate=rate, native=native
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bc, h // hc),
        in_specs=[spec(bc, hc, s, d)] * 3 + [_bias_spec(bc, s)],
        out_specs=spec(bc, hc, s, d),
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
    )(seed, q, k, v, bias)


def _mha_pallas_bwd_raw(q, k, v, bias, seed, rate, g, native=False, bb=1):
    if native:
        b, s, h, d = q.shape
        spec = _bshd_spec
    else:
        b, h, s, d = q.shape
        spec = _bhsd_spec
    bias = bias.reshape(b, 1, s)
    bc, hc = _grid_blocks(b, h, s, d, n_bufs=7, requested=bb)
    kernel = functools.partial(
        _mha_bwd_kernel, sm_scale=1.0 / (d**0.5), rate=rate, native=native
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bc, h // hc),
        in_specs=[spec(bc, hc, s, d)] * 3 + [_bias_spec(bc, s),
                                             spec(bc, hc, s, d)],
        out_specs=[spec(bc, hc, s, d)] * 3,
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret_mode(),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        grid_spec=grid_spec,
    )(seed, q, k, v, bias, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _mha_pallas(q, k, v, bias, seed, rate, native=False, bb=1):
    return _mha_pallas_raw(q, k, v, bias, seed, rate, native, bb)


def _mha_pallas_fwd(q, k, v, bias, seed, rate, native=False, bb=1):
    return (_mha_pallas_raw(q, k, v, bias, seed, rate, native, bb),
            (q, k, v, bias, seed))


def _mha_pallas_bwd(rate, native, bb, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _mha_pallas_bwd_raw(q, k, v, bias, seed, rate, g, native, bb)
    return dq, dk, dv, None, None


_mha_pallas.defvjp(_mha_pallas_fwd, _mha_pallas_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def multi_head_attention(
    q,
    k,
    v,
    bias,
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    impl: str = "xla",
    batch_block: int = 1,
):
    """Fused MHA. q, k, v: [B, S, H, D]; bias: [B, S] additive (0 / -10000).

    Returns [B, S, H, D].
    """
    if impl in ("pallas", "pallas_nt") and pltpu is not None:
        rate = float(dropout_rate) if dropout_rng is not None else 0.0
        if rate > 0.0:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        else:
            seed = jnp.zeros((1,), jnp.int32)
        if impl == "pallas_nt":
            # experimental native layout: q/k/v stay [B, S, H, D] and the
            # head-major swap happens in VMEM inside the kernel. MEASURED
            # MUCH SLOWER on v5e (1180 vs 1638 ex/s full-step): Mosaic's
            # sublane swap of [S, hc, D] blocks costs far more than the HBM
            # transpose kernels it replaces (which XLA largely fuses).
            # Kept as a documented negative result; do not default.
            return _mha_pallas(q, k, v, bias.astype(jnp.float32), seed, rate,
                               True, int(batch_block))
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        out = _mha_pallas(qt, kt, vt, bias.astype(jnp.float32), seed, rate,
                          False, int(batch_block))
        return jnp.transpose(out, (0, 2, 1, 3))
    return _mha_xla(q, k, v, bias, dropout_rate, dropout_rng)
