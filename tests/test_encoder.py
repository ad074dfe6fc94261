"""Core encoder tests: shapes, input modes, dropout determinism, mask
invariance (padding must not change valid-position outputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniter_tpu.config import tiny_config
from uniter_tpu.models.encoder import UniterModel


IMG_DIM = 32


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = UniterModel(cfg, img_dim=IMG_DIM)
    rng = jax.random.PRNGKey(0)
    B, T, R = 2, 8, 4
    batch = make_batch(B, T, R)
    params = model.init(rng, **batch)["params"]
    return model, params, cfg


def make_batch(B, T, R, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(rng.randn(B, R, IMG_DIM), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
    )


def test_joint_forward_shape(model_and_params):
    model, params, cfg = model_and_params
    batch = make_batch(2, 8, 4)
    out = model.apply({"params": params}, **batch)
    assert out.shape == (2, 12, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_txt_only_and_img_only(model_and_params):
    model, params, cfg = model_and_params
    batch = make_batch(2, 8, 4)
    txt = model.apply(
        {"params": params},
        input_ids=batch["input_ids"],
        position_ids=batch["position_ids"],
        attn_mask=jnp.ones((2, 8), jnp.int32),
    )
    assert txt.shape == (2, 8, cfg.hidden_size)
    img = model.apply(
        {"params": params},
        img_feat=batch["img_feat"],
        img_pos_feat=batch["img_pos_feat"],
        attn_mask=jnp.ones((2, 4), jnp.int32),
    )
    assert img.shape == (2, 4, cfg.hidden_size)


def test_padding_invariance(model_and_params):
    """Padding positions must not affect valid-position outputs: the static
    bucket layout relies on this (replaces the reference's gather_index
    compaction, model/model.py:321-334)."""
    model, params, _ = model_and_params
    B, T, R = 2, 8, 4
    batch = make_batch(B, T, R)
    out_full = model.apply({"params": params}, **batch)

    # Pad txt by 3 junk tokens and img by 2 junk regions, mask them out.
    rng = np.random.RandomState(99)
    input_ids = jnp.concatenate(
        [batch["input_ids"],
         jnp.asarray(rng.randint(1, 500, (B, 3)), jnp.int32)], axis=1)
    position_ids = jnp.broadcast_to(jnp.arange(T + 3, dtype=jnp.int32), (B, T + 3))
    img_feat = jnp.concatenate(
        [batch["img_feat"], jnp.asarray(rng.randn(B, 2, IMG_DIM), jnp.float32)],
        axis=1)
    img_pos_feat = jnp.concatenate(
        [batch["img_pos_feat"], jnp.asarray(rng.rand(B, 2, 7), jnp.float32)],
        axis=1)
    attn_mask = jnp.concatenate(
        [jnp.ones((B, T)), jnp.zeros((B, 3)), jnp.ones((B, R)),
         jnp.zeros((B, 2))], axis=1).astype(jnp.int32)
    out_pad = model.apply(
        {"params": params}, input_ids=input_ids, position_ids=position_ids,
        img_feat=img_feat, img_pos_feat=img_pos_feat, attn_mask=attn_mask)

    np.testing.assert_allclose(
        np.asarray(out_pad[:, :T]), np.asarray(out_full[:, :T]),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_pad[:, T + 3:T + 3 + R]), np.asarray(out_full[:, T:]),
        rtol=2e-5, atol=2e-5)


def test_dropout_train_vs_eval(model_and_params):
    model, params, _ = model_and_params
    batch = make_batch(2, 8, 4)
    out1 = model.apply({"params": params}, **batch, deterministic=True)
    out2 = model.apply(
        {"params": params}, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    out3 = model.apply(
        {"params": params}, **batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out3))


def test_mrm_mask_embedding(model_and_params):
    """img_masks adds mask_embedding row 1 at masked region positions
    (reference model/model.py:261-265)."""
    model, params, _ = model_and_params
    batch = make_batch(2, 8, 4)
    masks = jnp.zeros((2, 4), bool).at[0, 1].set(True)
    out_masked = model.apply({"params": params}, **batch, img_masks=masks)
    out_plain = model.apply({"params": params}, **batch)
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_plain))
    zero_masks = jnp.zeros((2, 4), bool)
    out_zero = model.apply({"params": params}, **batch, img_masks=zero_masks)
    np.testing.assert_allclose(
        np.asarray(out_zero), np.asarray(out_plain), rtol=1e-6, atol=1e-6)


def test_fused_qkv_bit_exact_and_checkpoint_compatible():
    """fused_qkv=True (one [H,3H] QKV GEMM) is a pure compute-layout change:
    identical param tree and bit-identical outputs vs the unfused path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering

    rng = np.random.RandomState(0)
    B, T, R, IMG = 4, 8, 6, 32
    batch = dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(rng.randn(B, R, IMG), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
    )
    m1 = UniterForVisualQuestionAnswering(tiny_config(), img_dim=IMG,
                                          num_answer=5)
    params = m1.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    m2 = UniterForVisualQuestionAnswering(tiny_config(fused_qkv=True),
                                          img_dim=IMG, num_answer=5)
    p2 = m2.init({"params": jax.random.PRNGKey(0)}, batch, False)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    o1 = np.asarray(m1.apply({"params": params}, batch, False))
    o2 = np.asarray(m2.apply({"params": params}, batch, False))
    np.testing.assert_array_equal(o1, o2)


def test_u16_dropout_statistics_and_determinism():
    """ops/dropout.py u16 path: correct keep rate, exact mean preservation
    scaling, replayable under the same key, and traffic-shape sanity."""
    import jax
    import jax.numpy as jnp
    from uniter_tpu.ops.dropout import dropout

    rng = jax.random.PRNGKey(7)
    x = jnp.ones((512, 768), jnp.float32)
    y = dropout(x, 0.1, rng, impl="u16")
    y2 = dropout(x, 0.1, rng, impl="u16")
    assert np.array_equal(np.asarray(y), np.asarray(y2))
    kept = float(np.mean(np.asarray(y) > 0))
    thr = round(0.1 * 65536)
    keep_q = 1 - thr / 65536
    assert abs(kept - keep_q) < 5e-3, kept
    # kept values are scaled by exactly 1/keep_q
    vals = np.asarray(y)[np.asarray(y) > 0]
    np.testing.assert_allclose(vals, 1.0 / keep_q, rtol=1e-6)
    # deterministic path is the identity
    assert dropout(x, 0.1, None, impl="u16", deterministic=True) is x


def test_dropout_impl_u16_trains(tiny_model_batch=None):
    """Encoder forward with dropout_impl=u16 runs and differs from the
    deterministic forward (masks actually applied)."""
    import jax
    import jax.numpy as jnp
    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.encoder import UniterModel

    cfg = tiny_config(dropout_impl="u16")
    model = UniterModel(cfg, img_dim=16)
    B, T, R = 4, 8, 4
    r = np.random.RandomState(0)
    batch = dict(
        input_ids=jnp.asarray(r.randint(1, 500, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(r.randn(B, R, 16), jnp.float32),
        img_pos_feat=jnp.asarray(r.rand(B, R, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["input_ids"], batch["position_ids"],
                        batch["img_feat"], batch["img_pos_feat"],
                        batch["attn_mask"])["params"]
    det = model.apply({"params": params}, batch["input_ids"],
                      batch["position_ids"], batch["img_feat"],
                      batch["img_pos_feat"], batch["attn_mask"],
                      deterministic=True)
    stoch = model.apply({"params": params}, batch["input_ids"],
                        batch["position_ids"], batch["img_feat"],
                        batch["img_pos_feat"], batch["attn_mask"],
                        deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(stoch)).all()
    assert not np.allclose(np.asarray(det), np.asarray(stoch))


def test_remat_grads_match():
    """--remat (nn.remat around the scanned layer) must not change grads."""
    import jax
    import jax.numpy as jnp
    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.encoder import UniterModel

    B, T, R = 4, 8, 4
    r = np.random.RandomState(0)
    batch = (
        jnp.asarray(r.randint(1, 500, (B, T)), jnp.int32),
        jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        jnp.asarray(r.randn(B, R, 16), jnp.float32),
        jnp.asarray(r.rand(B, R, 7), jnp.float32),
        jnp.ones((B, T + R), jnp.int32),
    )

    def grads(remat):
        cfg = tiny_config(remat=remat)
        model = UniterModel(cfg, img_dim=16)
        params = model.init({"params": jax.random.PRNGKey(0)}, *batch)[
            "params"]

        def loss(p):
            return jnp.sum(model.apply({"params": p}, *batch) ** 2)

        return params, jax.grad(loss)(params)

    p0, g0 = grads(False)
    p1, g1 = grads(True)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # the recompute reorders fp32 reductions, so near-cancelled grads (the
    # embedding tables see ~1e-5 grads through two LayerNorms at this loss
    # scale) shift by roundoff; bound the diff against the overall grad
    # scale rather than per-element
    scale = float(np.sqrt(sum(
        float(np.sum(np.square(np.asarray(x)))) for x in jax.tree.leaves(g0))))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        assert d <= 1e-5 * max(scale, 1.0), (d, scale)
