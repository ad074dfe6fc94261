"""Logit-parity gate for the encoder + checkpoint converter.

The reference's text path is exactly HuggingFace-lineage post-LN BERT
(reference model/layer.py:1-186, model/model.py:217-245), so
``transformers.BertModel`` with erf-gelu and eps=1e-12 is a bit-faithful
oracle: we transplant its torch state dict through our converter and demand
matching hidden states + pooled output in fp32 text-only mode.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.encoder import UniterModel
from uniter_tpu.models import checkpoint as ckpt

pytestmark = pytest.mark.e2e  # torch-reference parity harness (slow import/build)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def bert_and_uniter():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=333,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        hidden_act="gelu",
        max_position_embeddings=64,
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    bert = BertModel(hf_cfg).eval()

    cfg = UniterConfig(
        vocab_size=333,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
        dtype="float32",
    )
    model = UniterModel(cfg, img_dim=16)
    B, T = 3, 10
    init_batch = dict(
        input_ids=jnp.zeros((B, T), jnp.int32),
        position_ids=jnp.zeros((B, T), jnp.int32),
        img_feat=jnp.zeros((B, 4, 16), jnp.float32),
        img_pos_feat=jnp.zeros((B, 4, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + 4), jnp.int32),
    )
    init_params = model.init(jax.random.PRNGKey(0), **init_batch,
                             method=UniterModel.init_all)["params"]

    sd = ckpt.normalize_state_dict(bert.state_dict())
    flat, missing, consumed = ckpt.uniter_params_from_state_dict(
        sd, num_layers=3
    )
    # All text-path params must be found; only img_embeddings may be missing.
    assert all(m.startswith("img_embeddings") for m in missing), missing
    params, filled = ckpt.merge_into_params(dict(init_params), flat)
    assert len(filled) == len(flat)
    return bert, model, params


def test_text_hidden_state_parity(bert_and_uniter):
    bert, model, params = bert_and_uniter
    rng = np.random.RandomState(7)
    B, T = 3, 10
    ids = rng.randint(1, 333, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 7:] = 0
    mask[2, 5:] = 0

    with torch.no_grad():
        ref = bert(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        )
    out = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids, jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        attn_mask=jnp.asarray(mask, jnp.int32),
    )
    got = np.asarray(out)
    want = ref.last_hidden_state.numpy()
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-5)


def test_pooler_parity(bert_and_uniter):
    bert, model, params = bert_and_uniter
    rng = np.random.RandomState(11)
    B, T = 2, 8
    ids = rng.randint(1, 333, (B, T))
    with torch.no_grad():
        ref = bert(input_ids=torch.tensor(ids))
    seq = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids, jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        attn_mask=jnp.ones((B, T), jnp.int32),
    )
    pooled = model.apply({"params": params}, seq, method=lambda m, x: m.pooler(x))
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), rtol=1e-4, atol=1e-5
    )
