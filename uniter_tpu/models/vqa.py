"""VQA (and, via num_answer=3, SNLI-VE) task model.

Reference: /root/reference/model/vqa.py (3129-answer head, BCE-with-logits
soft-score loss) and model/ve.py (VE = num_answer 3).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.common import encode_batch
from uniter_tpu.models.encoder import Dense, LayerNorm, UniterModel
from uniter_tpu.models.losses import binary_cross_entropy_with_logits
from uniter_tpu.ops.activations import gelu


class UniterForVisualQuestionAnswering(nn.Module):
    """CLS -> Dense(H,2H)+GELU+LN -> Dense(2H, num_answer); elementwise BCE
    against VQA soft scores (model/vqa.py:17-52)."""

    config: UniterConfig
    img_dim: int = 2048
    num_answer: int = 3129

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.vqa_hidden = Dense(cfg, cfg.hidden_size * 2, name="vqa_hidden")
        self.vqa_ln = LayerNorm(cfg, name="vqa_ln")
        self.vqa_out = Dense(
            cfg, self.num_answer, in_features=cfg.hidden_size * 2, name="vqa_out"
        )

    def predict(self, batch, *, deterministic: bool = True):
        seq = encode_batch(self.uniter, batch, deterministic)
        pooled = self.uniter.pooler(seq)
        h = self.vqa_ln(gelu(self.vqa_hidden(pooled)))
        return self.vqa_out(h).astype(jnp.float32)

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            # [B, num_answer] elementwise; driver reduces mean()*num_answer
            # (reference train_vqa.py:188).
            return binary_cross_entropy_with_logits(scores, batch["targets"])
        return scores


class UniterForVisualEntailment(UniterForVisualQuestionAnswering):
    """SNLI-VE: the VQA head with 3 answers (model/ve.py:10-14)."""

    num_answer: int = 3
