"""VCR task model: per-candidate binary ranking.

Reference: /root/reference/model/vcr.py. Requires the 4-row token-type table
and +81 special word rows (driver.load_trunk_checkpoint widening surgeries; reference vcr.py:32-50). Train loss is CE over the
2-way score per candidate row; inference returns column 1 (vcr.py:72-77).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.common import encode_batch
from uniter_tpu.models.encoder import Dense, LayerNorm, UniterModel
from uniter_tpu.models.losses import cross_entropy

NUM_SPECIAL_TOKENS = 81  # reference train_vcr.py:37


class UniterForVisualCommonsenseReasoning(nn.Module):
    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.vcr_hidden = Dense(cfg, cfg.hidden_size * 2, name="vcr_hidden")
        self.vcr_ln = LayerNorm(cfg, name="vcr_ln")
        self.vcr_out = Dense(
            cfg, 2, in_features=cfg.hidden_size * 2, name="vcr_out"
        )

    def predict(self, batch, *, deterministic: bool = True):
        seq = encode_batch(self.uniter, batch, deterministic)
        pooled = self.uniter.pooler(seq)
        h = self.vcr_ln(nn.relu(self.vcr_hidden(pooled)))
        return self.vcr_out(h).astype(jnp.float32)  # [B, 2]

    def __call__(self, batch, compute_loss: bool = True, *,
                 deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            targets = batch["targets"]
            if targets.ndim > 1:
                targets = targets[..., 0]
            return cross_entropy(scores, targets)
        # Reference inference keeps only the positive-class column
        # (vcr.py:76-77).
        return scores[:, 1:]
