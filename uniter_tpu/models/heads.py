"""Task heads and auxiliary attention blocks.

Covers the reference's head zoo: BertPredictionHeadTransform / MLM head
(model/layer.py:188-233), RegionFeatureRegression / RegionClassification
(model/pretrain.py:19-47), AttentionPool (model/nlvr2.py:110-125), and the
standalone cross-attention MultiheadAttention used by the NLVR2 paired-attn
model (model/attention.py:13-267).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.encoder import Dense, LayerNorm, _dense_init
from uniter_tpu.ops.activations import ACT2FN, gelu
from uniter_tpu.ops.attention import multi_head_attention


class BertPredictionHeadTransform(nn.Module):
    """Dense -> act -> LN (reference model/layer.py:188-202)."""

    config: UniterConfig

    def setup(self):
        cfg = self.config
        self.dense = Dense(cfg, cfg.hidden_size, name="dense")
        self.LayerNorm = LayerNorm(cfg, name="LayerNorm")

    def __call__(self, x):
        return self.LayerNorm(ACT2FN[self.config.hidden_act](self.dense(x)))


class MLMHead(nn.Module):
    """Vocab logits with decoder weight tied to the word-embedding table.

    The tied table is supplied by the caller via ``attend_fn`` (the
    ``Embed.attend`` bound method of uniter.embeddings.word_embeddings);
    reference model/layer.py:205-233.
    """

    config: UniterConfig
    vocab_size: Optional[int] = None

    def setup(self):
        self.transform = BertPredictionHeadTransform(self.config, name="transform")
        self.bias = self.param(
            "bias", nn.initializers.zeros,
            (self.vocab_size or self.config.vocab_size,), jnp.float32,
        )

    def __call__(self, x, attend_fn):
        h = self.transform(x)
        return attend_fn(h) + self.bias.astype(h.dtype)


class RegionFeatureRegression(nn.Module):
    """MRFR head: Dense+GELU+LN then projection back to feature space using
    the transposed img_linear weight (reference model/pretrain.py:19-33)."""

    config: UniterConfig
    feat_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.net_dense = Dense(cfg, cfg.hidden_size, name="net_dense")
        self.net_ln = LayerNorm(cfg, name="net_ln")
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.feat_dim,), jnp.float32
        )

    def __call__(self, x, img_linear_attend_fn):
        h = self.net_ln(gelu(self.net_dense(x)))
        return img_linear_attend_fn(h) + self.bias.astype(h.dtype)


class RegionClassification(nn.Module):
    """MRC head: Dense+GELU+LN+Dense(label_dim) (model/pretrain.py:36-47)."""

    config: UniterConfig
    label_dim: int = 1601

    def setup(self):
        cfg = self.config
        self.net_dense = Dense(cfg, cfg.hidden_size, name="net_dense")
        self.net_ln = LayerNorm(cfg, name="net_ln")
        self.net_out = Dense(cfg, self.label_dim, name="net_out")

    def __call__(self, x):
        return self.net_out(self.net_ln(gelu(self.net_dense(x))))


class AttentionPool(nn.Module):
    """Learned scalar-score softmax pooling (model/nlvr2.py:110-125)."""

    config: UniterConfig
    drop: float = 0.0

    def setup(self):
        self.fc = Dense(self.config, 1, name="fc")
        self.dropout = nn.Dropout(self.drop)

    def __call__(self, x, pad_mask=None, *, deterministic: bool = True):
        """x: [B, T, D]; pad_mask: [B, T] True at PAD positions."""
        score = nn.relu(self.fc(x).squeeze(-1)).astype(jnp.float32)
        if pad_mask is not None:
            score = score + pad_mask.astype(jnp.float32) * -1e4
        w = nn.softmax(score, axis=1)
        w = self.dropout(w, deterministic=deterministic).astype(x.dtype)
        return jnp.einsum("bt,btd->bd", w, x)


class CrossAttention(nn.Module):
    """Torch-style MultiheadAttention used for cross-stream attention in
    NLVR2 paired-attn (reference model/attention.py:268-402; invoked
    bidirectionally at model/nlvr2.py:184-191).

    Single in-proj for Q/K/V (as torch's in_proj_weight) + out_proj.
    key_padding_mask True positions are excluded (-inf fill equivalent via
    additive -1e4*... we use the shared -10000 bias convention).
    """

    config: UniterConfig

    def setup(self):
        cfg = self.config
        h = cfg.hidden_size
        self.in_proj_weight = self.param(
            "in_proj_weight", _dense_init(cfg), (3 * h, h), jnp.float32
        )
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * h,), jnp.float32
        )
        self.out_proj = Dense(cfg, h, name="out_proj")

    def __call__(self, query, key, value, key_padding_mask=None, *,
                 deterministic: bool = True):
        """query: [B, Tq, D]; key/value: [B, Tk, D];
        key_padding_mask: [B, Tk] True at PAD. Returns [B, Tq, D]."""
        cfg = self.config
        h, d = cfg.num_attention_heads, cfg.head_dim
        b, tq, hid = query.shape
        tk = key.shape[1]
        w = self.in_proj_weight.astype(query.dtype)
        bias = self.in_proj_bias.astype(query.dtype)
        q = jnp.dot(query, w[:hid].T) + bias[:hid]
        k = jnp.dot(key, w[hid:2 * hid].T) + bias[hid:2 * hid]
        v = jnp.dot(value, w[2 * hid:].T) + bias[2 * hid:]
        q = q.reshape(b, tq, h, d)
        k = k.reshape(b, tk, h, d)
        v = v.reshape(b, tk, h, d)
        if key_padding_mask is not None:
            attn_bias = key_padding_mask.astype(jnp.float32) * -10000.0
        else:
            attn_bias = jnp.zeros((b, tk), jnp.float32)
        rng = None
        rate = cfg.attention_probs_dropout_prob
        if not deterministic and rate > 0.0:
            rng = self.make_rng("dropout")
        ctx = multi_head_attention(
            q, k, v, attn_bias,
            dropout_rate=rate, dropout_rng=rng, impl=cfg.attention_impl,
            batch_block=cfg.attn_batch_block,
        ).reshape(b, tq, hid)
        return self.out_proj(ctx)
