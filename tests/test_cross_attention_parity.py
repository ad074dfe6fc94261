"""CrossAttention parity vs torch.nn.MultiheadAttention (the reference's
standalone MHA, model/attention.py:268-402, used by NLVR2 paired-attn)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from uniter_tpu.config import tiny_config
from uniter_tpu.models.heads import CrossAttention


def test_cross_attention_matches_torch_mha():
    cfg = tiny_config(attention_probs_dropout_prob=0.0,
                      hidden_dropout_prob=0.0)
    h = cfg.hidden_size
    mod = CrossAttention(cfg)
    rng = np.random.RandomState(0)
    B, Tq, Tk = 3, 5, 7
    q = rng.randn(B, Tq, h).astype(np.float32)
    k = rng.randn(B, Tk, h).astype(np.float32)
    pad = np.zeros((B, Tk), bool)
    pad[1, 5:] = True

    variables = mod.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
        key_padding_mask=jnp.asarray(pad))
    p = variables["params"]

    t_mha = torch.nn.MultiheadAttention(h, cfg.num_attention_heads,
                                        dropout=0.0)
    with torch.no_grad():
        t_mha.in_proj_weight.copy_(torch.tensor(np.asarray(
            p["in_proj_weight"])))
        t_mha.in_proj_bias.copy_(torch.tensor(np.asarray(p["in_proj_bias"])))
        t_mha.out_proj.weight.copy_(torch.tensor(np.asarray(
            p["out_proj"]["kernel"]).T))
        t_mha.out_proj.bias.copy_(torch.tensor(np.asarray(
            p["out_proj"]["bias"])))
        # torch MHA is seq-first (the reference transposes around it,
        # model/nlvr2.py:182-189)
        want, _ = t_mha(
            torch.tensor(q).transpose(0, 1),
            torch.tensor(k).transpose(0, 1),
            torch.tensor(k).transpose(0, 1),
            key_padding_mask=torch.tensor(pad))
        want = want.transpose(0, 1).numpy()

    got = np.asarray(mod.apply(
        variables, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
        key_padding_mask=jnp.asarray(pad)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
