"""Referring-expression comprehension: scoring region tokens.

Reference: /root/reference/model/re.py. The static [txt; img] layout makes
``_get_image_hidden`` (reference re.py:125-149, a python loop over examples)
a single slice ``seq[:, T:]``. Non-object positions are filled with -1e4
(re.py:68). Loss is CE over regions ("cls") or a margin ranking loss with
mixed hard/easy negative sampling ("rank", re.py:94-123) — the sampling runs
in-jit from the 'sampling' rng collection instead of host-side numpy.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.common import encode_batch
from uniter_tpu.models.encoder import Dense, LayerNorm, UniterModel
from uniter_tpu.models.losses import cross_entropy, margin_ranking
from uniter_tpu.ops.activations import gelu

NEG_FILL = -1e4


class UniterForReferringExpressionComprehension(nn.Module):
    config: UniterConfig
    img_dim: int = 2048
    loss_type: str = "cls"  # "cls" | "rank"
    margin: float = 0.2
    hard_ratio: float = 0.3
    mlp: int = 1

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        if self.mlp == 1:
            self.re_output = Dense(cfg, 1, name="re_output")
        elif self.mlp == 2:
            self.re_hidden = Dense(cfg, cfg.hidden_size, name="re_hidden")
            self.re_ln = LayerNorm(cfg, name="re_ln")
            self.re_output = Dense(cfg, 1, name="re_output")
        else:
            raise ValueError("MLP restricted to 1 or 2 layers")

    def predict(self, batch, *, deterministic: bool = True):
        """Region scores [B, R] with non-objects filled to -1e4."""
        seq = encode_batch(self.uniter, batch, deterministic)
        t = batch["input_ids"].shape[1]
        img_hidden = seq[:, t:]  # [B, R, H]
        if self.mlp == 2:
            img_hidden = self.re_ln(gelu(self.re_hidden(img_hidden)))
        scores = self.re_output(img_hidden)[..., 0].astype(jnp.float32)
        obj_masks = batch.get("obj_masks")
        if obj_masks is None:
            obj_masks = ~batch["attn_mask"][:, t:].astype(bool)
        return jnp.where(obj_masks, NEG_FILL, scores)

    def _sample_neg(self, scores, targets, obj_masks):
        """Hard (top-scoring != target) vs easy (uniform valid != target)
        negative per example, chosen by bernoulli(hard_ratio) (re.py:94-123).
        """
        rng = self.make_rng("sampling")
        r_hard, r_easy = jax.random.split(rng)
        b, n = scores.shape
        is_target = jax.nn.one_hot(targets, n, dtype=jnp.bool_)
        # hard: argmax over scores excluding the target
        hard_ix = jnp.argmax(jnp.where(is_target, -jnp.inf, scores), axis=-1)
        # easy: uniform over valid & != target
        logits = jnp.where(is_target | obj_masks, -jnp.inf, 0.0)
        easy_ix = jax.random.categorical(r_easy, logits, axis=-1)
        use_hard = jax.random.uniform(r_hard, (b,)) < self.hard_ratio
        return jnp.where(use_hard, hard_ix, easy_ix)

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if not compute_loss:
            return scores
        targets = batch["targets"]
        if targets.ndim > 1:
            targets = targets[..., 0]
        if self.loss_type == "cls":
            return cross_entropy(scores, targets)
        obj_masks = batch.get("obj_masks")
        t = batch["input_ids"].shape[1]
        if obj_masks is None:
            obj_masks = ~batch["attn_mask"][:, t:].astype(bool)
        neg_ix = self._sample_neg(scores, targets, obj_masks)
        pos_sc = jax.nn.sigmoid(
            jnp.take_along_axis(scores, targets[:, None], axis=1)[:, 0]
        )
        neg_sc = jax.nn.sigmoid(
            jnp.take_along_axis(scores, neg_ix[:, None], axis=1)[:, 0]
        )
        return margin_ranking(pos_sc, neg_sc, self.margin)
