"""Smoke + behavior tests for every task model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uniter_tpu.config import tiny_config
from uniter_tpu.models.itm import (
    UniterForImageTextRetrieval,
    UniterForImageTextRetrievalHardNeg,
    init_rank_output_from_itm,
)
from uniter_tpu.models.nlvr2 import MODEL_REGISTRY as NLVR2_MODELS
from uniter_tpu.models.pretrain import UniterForPretraining
from uniter_tpu.models.re import UniterForReferringExpressionComprehension
from uniter_tpu.models.vcr import UniterForVisualCommonsenseReasoning
from uniter_tpu.models.vqa import (
    UniterForVisualEntailment,
    UniterForVisualQuestionAnswering,
)

IMG_DIM = 32
B, T, R = 4, 8, 6


def make_batch(b=B, t=T, r=R, seed=0, n_types=2):
    rng = np.random.RandomState(seed)
    attn = np.ones((b, t + r), np.int32)
    attn[0, t - 2:t] = 0
    attn[1, t + r - 2:] = 0
    return dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (b, t)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t)),
        img_feat=jnp.asarray(rng.randn(b, r, IMG_DIM), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(b, r, 7), jnp.float32),
        attn_mask=jnp.asarray(attn),
    )


def init_and_loss(model, batch, extra_rngs=()):
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, batch, False)
    apply_rngs = {"dropout": jax.random.PRNGKey(1)}
    for name in extra_rngs:
        apply_rngs[name] = jax.random.PRNGKey(2)
    loss = model.apply(variables, batch, True, deterministic=False,
                       rngs=apply_rngs)
    logits = model.apply(variables, batch, False)
    return loss, logits


@pytest.mark.parametrize("kind", ["paired", "triplet", "paired-attn"])
def test_nlvr2(kind):
    cfg = tiny_config(type_vocab_size=3)
    model = NLVR2_MODELS[kind](cfg, img_dim=IMG_DIM)
    batch = make_batch()
    batch["img_type_ids"] = jnp.asarray(
        np.tile([[1], [2]], (B // 2, R)), jnp.int32)
    n_out = B if kind == "triplet" else B // 2
    batch["targets"] = jnp.asarray([0, 1] * (n_out // 2), jnp.int32)
    loss, logits = init_and_loss(model, batch)
    assert loss.shape == (n_out,)
    assert logits.shape == (n_out, 2)
    assert np.isfinite(np.asarray(loss)).all()


def test_vqa_and_ve():
    cfg = tiny_config()
    batch = make_batch()
    for cls, n_ans in ((UniterForVisualQuestionAnswering, 11),
                       (UniterForVisualEntailment, 3)):
        kw = {"num_answer": n_ans} if cls is UniterForVisualQuestionAnswering else {}
        model = cls(cfg, img_dim=IMG_DIM, **kw)
        batch["targets"] = jnp.asarray(
            np.random.RandomState(0).rand(B, n_ans), jnp.float32)
        loss, logits = init_and_loss(model, batch)
        assert loss.shape == (B, n_ans)
        assert logits.shape == (B, n_ans)


def test_vcr():
    cfg = tiny_config(type_vocab_size=4)
    model = UniterForVisualCommonsenseReasoning(cfg, img_dim=IMG_DIM)
    batch = make_batch()
    batch["txt_type_ids"] = jnp.zeros((B, T), jnp.int32)
    batch["targets"] = jnp.asarray([0, 1, 0, 1], jnp.int32)
    loss, logits = init_and_loss(model, batch)
    assert loss.shape == (B,)
    assert logits.shape == (B, 1)  # positive column only


def test_itm_rank_and_hardneg():
    cfg = tiny_config()
    batch = make_batch()
    model = UniterForImageTextRetrieval(cfg, img_dim=IMG_DIM)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    loss = model.apply(variables, batch, True, sample_size=2,
                       deterministic=True)
    assert loss.shape == (B // 2, 1)

    params = init_rank_output_from_itm(dict(variables["params"]))
    np.testing.assert_array_equal(
        np.asarray(params["rank_output"]["bias"]),
        np.asarray(variables["params"]["itm_output"]["bias"])[1:],
    )

    hn = UniterForImageTextRetrievalHardNeg(cfg, img_dim=IMG_DIM, hard_size=2)
    vhn = hn.init({"params": jax.random.PRNGKey(0)}, batch, False)
    loss = hn.apply(vhn, batch, True, deterministic=True)
    assert loss.shape == (1, 2)  # 1 group of (1 pos + hard_size), negs only
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize("loss_type", ["cls", "rank"])
def test_re(loss_type):
    cfg = tiny_config()
    model = UniterForReferringExpressionComprehension(
        cfg, img_dim=IMG_DIM, loss_type=loss_type)
    batch = make_batch()
    batch["obj_masks"] = jnp.asarray(
        ~np.asarray(batch["attn_mask"][:, T:], bool))
    batch["targets"] = jnp.asarray([0, 1, 2, 3], jnp.int32)
    loss, logits = init_and_loss(model, batch, extra_rngs=("sampling",))
    assert loss.shape == (B,)
    assert logits.shape == (B, R)
    # non-object scores are filled at -1e4
    masked = np.asarray(logits)[np.asarray(batch["obj_masks"])]
    assert (masked == -1e4).all()


def test_pretrain_tasks():
    cfg = tiny_config()
    model = UniterForPretraining(cfg, img_dim=IMG_DIM, img_label_dim=17)
    rng = np.random.RandomState(0)
    M, Mr = 3, 2
    batch = make_batch()
    batch.update(
        mlm_pos=jnp.asarray(rng.randint(0, T, (B, M)), jnp.int32),
        mlm_tgt=jnp.asarray(
            np.where(rng.rand(B, M) < 0.7, rng.randint(0, 500, (B, M)), -1),
            jnp.int32),
        mrm_pos=jnp.asarray(rng.randint(0, R, (B, Mr)), jnp.int32),
        mrm_valid=jnp.asarray(rng.rand(B, Mr) < 0.8, jnp.float32),
        feat_targets=jnp.asarray(rng.randn(B, Mr, IMG_DIM), jnp.float32),
        label_targets=jnp.asarray(
            np.abs(rng.rand(B, Mr, 17)) / rng.rand(B, Mr, 17).sum(-1, keepdims=True),
            jnp.float32),
        targets=jnp.asarray(rng.randint(0, 2, (B,)), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch,
        method=UniterForPretraining.init_all)
    for task in ["mlm", "mrfr", "itm", "mrc", "mrc-kl"]:
        scalar, metrics = model.apply(
            variables, batch, task, ot_lambda=0.1 if task == "itm" else 0.0,
            deterministic=True, method=UniterForPretraining.scalar_loss)
        assert np.isfinite(float(scalar)), task

    # MLM head ties the decoder to the word embedding table
    flat = variables["params"]
    assert "embedding" not in flat.get("cls", {}), "decoder must be tied"
