"""Hardware (TPU) validation of the fused drop+res+LN kernel PRNG path.
 1. keep-rate ~ 1-rate (binomial tolerance)
 2. replay: fwd twice -> identical
 3. bwd mask consistency: dx == 0 exactly where the fwd dropped x,
    and dx == dres/(1-rate) (through LN chain) at kept positions
 4. grads match the XLA composition when the XLA path is given the
    kernel's own keep-mask (extracted via linearity probes)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
from uniter_tpu.ops.fused_block import drop_res_ln
from uniter_tpu.ops.layer_norm import layer_norm

rng = np.random.RandomState(0)
N, D = 512, 768
x = jnp.asarray(rng.randn(N, D), jnp.float32)
res = jnp.asarray(rng.randn(N, D), jnp.float32)
w = jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32)
b = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
key = jax.random.PRNGKey(5)
rate = 0.1

f = jax.jit(lambda x, res, w, b: drop_res_ln(
    x, res, w, b, rate=rate, rng=key, impl="pallas"))
y1 = np.asarray(f(x, res, w, b))
y2 = np.asarray(f(x, res, w, b))
assert np.array_equal(y1, y2), "replay mismatch"
print("replay ok")

# extract the keep mask: t = drop(x)+res ; with res=0, w=1, b=0 the LN is
# monotone per-row but mixing -- instead probe via derivative: dy/dx[i,j]=0
# iff dropped. Use jvp with one-hot-free trick: grad of sum(y) wrt x has
# exact zeros at dropped positions.
g = jax.jit(jax.grad(lambda x: jnp.sum(drop_res_ln(
    x, res, w, b, rate=rate, rng=key, impl="pallas"))))(x)
g = np.asarray(g)
dropped = g == 0.0
drop_frac = dropped.mean()
print("drop fraction:", drop_frac)
assert abs(drop_frac - rate) < 0.005, drop_frac

# grads parity vs XLA composition with the SAME mask
keep = jnp.asarray(~dropped)
def xla_comp(x, res, w, b):
    xx = jnp.where(keep, x / (1 - rate), 0.0)
    return layer_norm(xx + res, w, b, impl="xla")
for i, (gp, gx) in enumerate(zip(
        jax.jit(jax.grad(lambda *a: jnp.sum(drop_res_ln(
            *a, rate=rate, rng=key, impl="pallas") ** 2), argnums=(0,1,2,3)))(x, res, w, b),
        jax.jit(jax.grad(lambda *a: jnp.sum(xla_comp(*a) ** 2),
                         argnums=(0,1,2,3)))(x, res, w, b))):
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=2e-4, atol=2e-4, err_msg=f"arg {i}")
print("grad parity vs same-mask XLA composition ok")
# fwd parity too
yx = np.asarray(jax.jit(xla_comp)(x, res, w, b))
np.testing.assert_allclose(y1, yx, rtol=2e-5, atol=2e-5)
print("fwd parity ok")
print("ALL OK")

# ---- ln_drop (embedding tail) PRNG path ----
from uniter_tpu.ops.fused_block import ln_drop

f2 = jax.jit(lambda x, w, b: ln_drop(x, w, b, rate=rate, rng=key, impl="pallas"))
z1 = np.asarray(f2(x, w, b))
z2 = np.asarray(f2(x, w, b))
assert np.array_equal(z1, z2), "ln_drop replay mismatch"
dropped2 = z1 == 0.0
frac2 = dropped2.mean()
assert abs(frac2 - rate) < 0.005, frac2
keep2 = jnp.asarray(~dropped2)
def xla_comp2(x, w, b):
    y = layer_norm(x, w, b, impl="xla")
    return jnp.where(keep2, y / (1 - rate), 0.0)
z_x = np.asarray(jax.jit(xla_comp2)(x, w, b))
np.testing.assert_allclose(z1, z_x, rtol=2e-5, atol=2e-5)
for i, (gp, gx) in enumerate(zip(
        jax.jit(jax.grad(lambda *a: jnp.sum(ln_drop(
            *a, rate=rate, rng=key, impl="pallas") ** 2), argnums=(0, 1, 2)))(x, w, b),
        jax.jit(jax.grad(lambda *a: jnp.sum(xla_comp2(*a) ** 2),
                         argnums=(0, 1, 2)))(x, w, b))):
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=2e-4, atol=2e-4, err_msg=f"ln_drop arg {i}")
print("ln_drop: replay, rate, fwd+grad parity OK")

# ---- attention dropout replay at batch_block=2 (the accel default) ----
# fwd determinism, keep-rate, and bwd seed-replay consistency: grads of
# the bb=2 kernel must match the bb=2 XLA composition given the kernel's
# own keep-mask (extracted via the zero pattern of d(out)/d(v) columns is
# not separable here, so use fwd-vs-masked-fwd agreement + grad replay).
from uniter_tpu.ops.attention import multi_head_attention

Ba, S, Hh, Dd = 8, 32, 4, 16
qa = jnp.asarray(rng.randn(Ba, S, Hh, Dd), jnp.float32)
ka = jnp.asarray(rng.randn(Ba, S, Hh, Dd), jnp.float32)
va = jnp.asarray(rng.randn(Ba, S, Hh, Dd), jnp.float32)
bias_a = jnp.zeros((Ba, S), jnp.float32).at[:, 28:].set(-10000.0)

def attn_bb(q, k, v, bb):
    return multi_head_attention(q, k, v, bias_a, dropout_rate=rate,
                                dropout_rng=key, impl="pallas",
                                batch_block=bb)

fa = jax.jit(lambda q, k, v: attn_bb(q, k, v, 2))
o1 = np.asarray(fa(qa, ka, va))
o2 = np.asarray(fa(qa, ka, va))
assert np.array_equal(o1, o2), "attn bb=2 fwd replay mismatch"

# grad replay: two evaluations of the same grad must be bit-identical
ga = jax.jit(jax.grad(lambda q, k, v: jnp.sum(attn_bb(q, k, v, 2) ** 2),
                      argnums=(0, 1, 2)))
g1 = ga(qa, ka, va)
g2 = ga(qa, ka, va)
for a_, b_ in zip(g1, g2):
    assert np.array_equal(np.asarray(a_), np.asarray(b_)), \
        "attn bb=2 grad replay mismatch"

# deterministic (rate-0) path: bb=2 must equal bb=1 exactly (same math,
# different grid blocking)
f0_1 = jax.jit(lambda q, k, v: multi_head_attention(
    q, k, v, bias_a, impl="pallas", batch_block=1))
f0_2 = jax.jit(lambda q, k, v: multi_head_attention(
    q, k, v, bias_a, impl="pallas", batch_block=2))
np.testing.assert_allclose(np.asarray(f0_1(qa, ka, va)),
                           np.asarray(f0_2(qa, ka, va)),
                           rtol=1e-6, atol=1e-6)
print("attention bb=2: fwd/grad replay + bb1==bb2 (rate 0) OK")

# ---- head-chunked grid (r4): bc=2 with hc < H must equal bc=1 ----
# force the selector into head-chunking by shrinking the bc>1 budget so
# the all-heads working set overflows (the uniter-large case at real
# shapes, reproduced at check scale)
import os as _os

_os.environ["UNITER_ATTN_VMEM_BUDGET"] = "70000"  # admits (bc=2, hc=2), not (2, 4)
f0_hc = jax.jit(lambda q, k, v: multi_head_attention(
    q, k, v, bias_a, impl="pallas", batch_block=2))
out_hc = np.asarray(f0_hc(qa, ka, va))
_os.environ.pop("UNITER_ATTN_VMEM_BUDGET")
np.testing.assert_allclose(out_hc, np.asarray(f0_1(qa, ka, va)),
                           rtol=1e-6, atol=1e-6)
# dropout replay under the head-chunked grid
_os.environ["UNITER_ATTN_VMEM_BUDGET"] = "70000"
fhc = jax.jit(lambda q, k, v: attn_bb(q, k, v, 2))
h1 = np.asarray(fhc(qa, ka, va))
h2 = np.asarray(fhc(qa, ka, va))
assert np.array_equal(h1, h2), "head-chunked fwd replay mismatch"
ghc = jax.jit(jax.grad(lambda q, k, v: jnp.sum(attn_bb(q, k, v, 2) ** 2),
                       argnums=(0, 1, 2)))
hg1 = ghc(qa, ka, va)
hg2 = ghc(qa, ka, va)
for a_, b_ in zip(hg1, hg2):
    assert np.array_equal(np.asarray(a_), np.asarray(b_)), \
        "head-chunked grad replay mismatch"
_os.environ.pop("UNITER_ATTN_VMEM_BUDGET")
print("attention head-chunked grid (bc=2, hc<H): parity + replay OK")

# ---- fused IPOT kernel vs the lax.scan reference (r4) ----
from uniter_tpu.ops.ot import optimal_transport_dist

Bo, Mo, No, Do = 8, 40, 24, 64
txt_o = jnp.asarray(rng.randn(Bo, Mo, Do), jnp.float32)
img_o = jnp.asarray(rng.randn(Bo, No, Do), jnp.float32)
tl = rng.randint(3, Mo + 1, Bo)
il = rng.randint(2, No + 1, Bo)
tp = jnp.asarray(np.arange(Mo)[None] >= tl[:, None])
ip = jnp.asarray(np.arange(No)[None] >= il[:, None])
d_p = np.asarray(jax.jit(lambda a, b: optimal_transport_dist(
    a, b, tp, ip, impl="pallas"))(txt_o, img_o))
d_x = np.asarray(jax.jit(lambda a, b: optimal_transport_dist(
    a, b, tp, ip, impl="xla"))(txt_o, img_o))
np.testing.assert_allclose(d_p, d_x, rtol=1e-5, atol=1e-6)
print("fused IPOT kernel == lax.scan reference on hardware OK")
print("R4 KERNEL CHECKS ALL OK")
