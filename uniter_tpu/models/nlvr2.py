"""NLVR2 task models: paired, triplet, and paired-with-cross-attention.

Reference: /root/reference/model/nlvr2.py. All three widen the token-type
table to 3 rows (left image type 1, right image type 2); the widening itself
is a checkpoint surgery (driver.load_trunk_checkpoint, reference
nlvr2.py:26-34 copies row 1 into row 2).

Paired format: examples arrive as 2 consecutive rows (left, right); the pair
logit concatenates their CLS vectors. PairedAttn adds bidirectional
cross-attention between the two streams + attention pooling
(nlvr2.py:128-204).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.common import encode_batch
from uniter_tpu.models.encoder import Dense, UniterModel
from uniter_tpu.models.heads import AttentionPool, CrossAttention
from uniter_tpu.models.losses import cross_entropy


class UniterForNlvr2Paired(nn.Module):
    """CLS-pair concat -> Linear(2H, 2). Reference model/nlvr2.py:17-62."""

    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.nlvr2_output = Dense(
            cfg, 2, in_features=2 * cfg.hidden_size, name="nlvr2_output"
        )

    def predict(self, batch, *, deterministic: bool = True):
        seq = encode_batch(self.uniter, batch, deterministic)
        pooled = self.uniter.pooler(seq)  # [2N, H]
        n_pair = pooled.shape[0] // 2
        return self.nlvr2_output(
            pooled.reshape(n_pair, 2 * pooled.shape[-1]).astype(jnp.float32)
        )

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            return cross_entropy(scores, batch["targets"])
        return scores


class UniterForNlvr2Triplet(nn.Module):
    """Single row holds both images; CLS -> Linear(H, 2).
    Reference model/nlvr2.py:65-107."""

    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.nlvr2_output = Dense(cfg, 2, name="nlvr2_output")

    def predict(self, batch, *, deterministic: bool = True):
        seq = encode_batch(self.uniter, batch, deterministic)
        return self.nlvr2_output(self.uniter.pooler(seq).astype(jnp.float32))

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            return cross_entropy(scores, batch["targets"])
        return scores


class UniterForNlvr2PairedAttn(nn.Module):
    """Paired format + bidirectional cross-attention + attention pooling.
    Reference model/nlvr2.py:128-204."""

    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.attn1 = CrossAttention(cfg, name="attn1")
        self.attn2 = CrossAttention(cfg, name="attn2")
        self.fc_dense = Dense(
            cfg, cfg.hidden_size, in_features=2 * cfg.hidden_size, name="fc_dense"
        )
        self.fc_dropout = nn.Dropout(cfg.hidden_dropout_prob)
        self.attn_pool = AttentionPool(
            cfg, cfg.attention_probs_dropout_prob, name="attn_pool"
        )
        self.nlvr2_output = Dense(
            cfg, 2, in_features=2 * cfg.hidden_size, name="nlvr2_output"
        )

    def predict(self, batch, *, deterministic: bool = True):
        cfg = self.config
        seq = encode_batch(self.uniter, batch, deterministic)  # [2N, S, H]
        bs, tl, d = seq.shape
        paired = seq.reshape(bs // 2, 2 * tl, d)
        left, right = paired[:, :tl], paired[:, tl:]
        pad = (batch["attn_mask"] == 0).reshape(bs // 2, 2 * tl)
        left_pad, right_pad = pad[:, :tl], pad[:, tl:]

        l2r = self.attn1(left, right, right, key_padding_mask=right_pad,
                         deterministic=deterministic)
        r2l = self.attn2(right, left, left, key_padding_mask=left_pad,
                         deterministic=deterministic)
        left_out = self.fc_dropout(
            nn.relu(self.fc_dense(jnp.concatenate([l2r, left], axis=-1))),
            deterministic=deterministic,
        )
        right_out = self.fc_dropout(
            nn.relu(self.fc_dense(jnp.concatenate([r2l, right], axis=-1))),
            deterministic=deterministic,
        )
        left_pooled = self.attn_pool(left_out, left_pad,
                                     deterministic=deterministic)
        right_pooled = self.attn_pool(right_out, right_pad,
                                      deterministic=deterministic)
        return self.nlvr2_output(
            jnp.concatenate([left_pooled, right_pooled], axis=-1).astype(
                jnp.float32
            )
        )

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            return cross_entropy(scores, batch["targets"])
        return scores


MODEL_REGISTRY = {
    "paired": UniterForNlvr2Paired,
    "triplet": UniterForNlvr2Triplet,
    "paired-attn": UniterForNlvr2PairedAttn,
}
