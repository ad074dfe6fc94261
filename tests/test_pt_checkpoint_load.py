"""End-to-end .pt checkpoint loading: a torch state dict in the released
checkpoints' naming (uniter.* trunk + pretrain heads, gamma/beta variants)
flows through load_trunk_checkpoint incl. widening surgeries."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def make_reference_state_dict(vocab=512, h=64, layers=2, heads=4, ff=128,
                              img_dim=2048, seed=0):
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "uniter.embeddings.word_embeddings.weight": t(vocab, h),
        "uniter.embeddings.position_embeddings.weight": t(64, h),
        "uniter.embeddings.token_type_embeddings.weight": t(2, h),
        # gamma/beta naming exercises the rename path (model.py:166-176)
        "uniter.embeddings.LayerNorm.gamma": torch.ones(h),
        "uniter.embeddings.LayerNorm.beta": torch.zeros(h),
        "uniter.img_embeddings.img_linear.weight": t(h, img_dim),
        "uniter.img_embeddings.img_linear.bias": t(h),
        "uniter.img_embeddings.img_layer_norm.weight": torch.ones(h),
        "uniter.img_embeddings.img_layer_norm.bias": torch.zeros(h),
        "uniter.img_embeddings.pos_linear.weight": t(h, 7),
        "uniter.img_embeddings.pos_linear.bias": t(h),
        "uniter.img_embeddings.pos_layer_norm.weight": torch.ones(h),
        "uniter.img_embeddings.pos_layer_norm.bias": torch.zeros(h),
        "uniter.img_embeddings.mask_embedding.weight": t(2, img_dim),
        "uniter.img_embeddings.LayerNorm.weight": torch.ones(h),
        "uniter.img_embeddings.LayerNorm.bias": torch.zeros(h),
        "uniter.pooler.dense.weight": t(h, h),
        "uniter.pooler.dense.bias": t(h),
        "itm_output.weight": t(2, h),
        "itm_output.bias": t(2),
        "cls.predictions.transform.dense.weight": t(h, h),
        "cls.predictions.transform.dense.bias": t(h),
        "cls.predictions.transform.LayerNorm.weight": torch.ones(h),
        "cls.predictions.transform.LayerNorm.bias": torch.zeros(h),
        "cls.predictions.bias": torch.zeros(vocab),
    }
    for i in range(layers):
        p = f"uniter.encoder.layer.{i}."
        sd[p + "attention.self.query.weight"] = t(h, h)
        sd[p + "attention.self.query.bias"] = t(h)
        sd[p + "attention.self.key.weight"] = t(h, h)
        sd[p + "attention.self.key.bias"] = t(h)
        sd[p + "attention.self.value.weight"] = t(h, h)
        sd[p + "attention.self.value.bias"] = t(h)
        sd[p + "attention.output.dense.weight"] = t(h, h)
        sd[p + "attention.output.dense.bias"] = t(h)
        sd[p + "attention.output.LayerNorm.weight"] = torch.ones(h)
        sd[p + "attention.output.LayerNorm.bias"] = torch.zeros(h)
        sd[p + "intermediate.dense.weight"] = t(ff, h)
        sd[p + "intermediate.dense.bias"] = t(ff)
        sd[p + "output.dense.weight"] = t(h, ff)
        sd[p + "output.dense.bias"] = t(h)
        sd[p + "output.LayerNorm.weight"] = torch.ones(h)
        sd[p + "output.LayerNorm.bias"] = torch.zeros(h)
    return sd


def test_pt_load_with_type_widening(tmp_path):
    from types import SimpleNamespace

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.nlvr2 import UniterForNlvr2Paired
    from uniter_tpu.training import driver

    ckpt = str(tmp_path / "uniter-tiny.pt")
    sd = make_reference_state_dict()
    torch.save(sd, ckpt)

    cfg = tiny_config(type_vocab_size=3)
    model = UniterForNlvr2Paired(cfg, img_dim=2048)
    b, t, r = 4, 8, 4
    batch = dict(
        input_ids=jnp.zeros((b, t), jnp.int32),
        position_ids=jnp.zeros((b, t), jnp.int32),
        img_feat=jnp.zeros((b, r, 2048), jnp.float32),
        img_pos_feat=jnp.zeros((b, r, 7), jnp.float32),
        attn_mask=jnp.ones((b, t + r), jnp.int32),
        targets=jnp.zeros((b // 2,), jnp.int32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    opts = SimpleNamespace(checkpoint=ckpt)
    params = driver.load_trunk_checkpoint(
        params, opts, cfg, n_type_rows=3, type_copy_row=1)

    # trunk tensors transposed correctly
    got = np.asarray(params["uniter"]["img_embeddings"]["img_linear"]
                     ["kernel"])
    want = sd["uniter.img_embeddings.img_linear.weight"].numpy().T
    np.testing.assert_array_equal(got, want)
    # gamma/beta renamed LN loaded
    np.testing.assert_array_equal(
        np.asarray(params["uniter"]["embeddings"]["LayerNorm"]["weight"]),
        np.ones(64, np.float32))
    # widened type table: rows 0/1 from ckpt, row 2 == row 1
    tt = np.asarray(params["uniter"]["embeddings"]["token_type_embeddings"]
                    ["embedding"])
    ref_tt = sd["uniter.embeddings.token_type_embeddings.weight"].numpy()
    np.testing.assert_array_equal(tt[:2], ref_tt)
    np.testing.assert_array_equal(tt[2], ref_tt[1])
    # stacked per-layer weights
    q = np.asarray(params["uniter"]["encoder"]["layer"]["bert_layer"]
                   ["attention"]["query"]["kernel"])
    assert q.shape == (2, 64, 64)
    np.testing.assert_array_equal(
        q[1], sd["uniter.encoder.layer.1.attention.self.query.weight"
                 ].numpy().T)
