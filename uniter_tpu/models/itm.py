"""Image-text retrieval models: rank scoring + online hard-negative mining.

Reference: /root/reference/model/itm.py. ``rank_output`` is initialized from
row 1 of the pretrained ``itm_output`` (init_rank_output_from_itm below;
reference itm.py:25-28). The hard-negative variant scores (1 + n_neg)
candidates without grad, picks the top ``hard_size`` negatives with
``lax.top_k``, and re-forwards only [pos + hard] with grad — all inside one
compiled step (reference itm.py:58-139 does this eagerly with index_select).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.config import UniterConfig
from uniter_tpu.models.common import encode_batch
from uniter_tpu.models.encoder import Dense, UniterModel
from uniter_tpu.models.losses import margin_ranking


class UniterForImageTextRetrieval(nn.Module):
    """CLS -> rank_output Linear(H, 1); margin-triplet loss over
    (1 pos + negs) groups of ``sample_size`` (itm.py:14-55)."""

    config: UniterConfig
    img_dim: int = 2048
    margin: float = 0.2

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.itm_output = Dense(cfg, 2, name="itm_output")
        self.rank_output = Dense(cfg, 1, name="rank_output")

    def predict(self, batch, *, deterministic: bool = True):
        seq = encode_batch(self.uniter, batch, deterministic)
        pooled = self.uniter.pooler(seq)
        if self.is_initializing():
            # Touch itm_output so its (pretrained) params exist even though
            # only rank_output is used at run time (itm.py:20-28).
            self.itm_output(pooled)
        return self.rank_output(pooled).astype(jnp.float32)  # [B, 1]

    def rank_loss(self, scores, sample_size: int):
        """scores [B, 1] grouped as [n_groups, sample_size]; first element of
        each group is the positive (itm.py:45-53)."""
        s = jax.nn.sigmoid(scores.reshape(-1, sample_size))
        pos, neg = s[:, :1], s[:, 1:]
        return margin_ranking(pos, neg, self.margin)

    def __call__(self, batch, compute_loss: bool = True, *,
                 sample_size: int = 2, deterministic: bool = True):
        scores = self.predict(batch, deterministic=deterministic)
        if compute_loss:
            return self.rank_loss(scores, sample_size)
        return scores


class UniterForImageTextRetrievalHardNeg(UniterForImageTextRetrieval):
    """Score n_candidates (pos at index 0), mine top-``hard_size`` negatives,
    train on [pos + hard] (itm.py:58-139). Same param layout as the base
    (reference uses inheritance, so checkpoints are interchangeable).

    Batch contract: the WHOLE batch is ONE candidate group — row 0 is the
    positive, rows 1..N are real negatives for that positive, no padding
    rows (``hard_neg_collate`` builds exactly this). Multiple groups per
    batch would let top_k mix negatives across positives."""

    hard_size: int = 16

    def __call__(self, batch: Dict[str, Any], compute_loss: bool = True, *,
                 sample_size: int = 2, deterministic: bool = True):
        if not compute_loss:
            return self.predict(batch, deterministic=deterministic)
        n_cand = batch["input_ids"].shape[0]
        assert n_cand > self.hard_size, (
            f"hard_size={self.hard_size} needs > hard_size candidate rows, "
            f"got {n_cand} (batch must be one [pos + negatives] group)")
        # 1) no-grad scoring pass over all candidates (eval mode: no dropout)
        scores = jax.lax.stop_gradient(
            self.predict(batch, deterministic=True)
        )[:, 0]
        # 2) top-k negatives (candidate 0 is the positive, itm.py:102-107)
        _, hard = jax.lax.top_k(scores[1:], self.hard_size)
        indices = jnp.concatenate(
            [jnp.zeros((1,), hard.dtype), hard + 1], axis=0
        )
        hard_batch = {
            k: jnp.take(v, indices, axis=0)
            if hasattr(v, "ndim") and v.ndim > 0 and v.shape[0] == scores.shape[0]
            else v
            for k, v in batch.items()
        }
        # 3) training forward on the mined batch
        hard_scores = self.predict(hard_batch, deterministic=deterministic)
        return self.rank_loss(hard_scores, self.hard_size + 1)


def init_rank_output_from_itm(params):
    """rank_output <- itm_output row 1 (reference itm.py:25-28)."""
    itm_k = np.asarray(params["itm_output"]["kernel"])  # [H, 2]
    itm_b = np.asarray(params["itm_output"]["bias"])  # [2]
    params["rank_output"]["kernel"] = jnp.asarray(itm_k[:, 1:2])
    params["rank_output"]["bias"] = jnp.asarray(itm_b[1:2])
    return params


def seed_rank_head(params, sd):
    """``extra_map`` for load_trunk_checkpoint: itm_output comes from the
    (normalized) checkpoint when present, then rank_output is seeded from
    its match row (reference itm.py:25-28; the zero-shot path
    inf_itm.py:60-61). Shared by train_itm and zero-shot inf_itm."""
    if "itm_output.weight" in sd:
        params["itm_output"]["kernel"] = jnp.asarray(
            np.ascontiguousarray(np.asarray(sd["itm_output.weight"]).T))
        params["itm_output"]["bias"] = jnp.asarray(
            np.asarray(sd["itm_output.bias"]))
    return init_rank_output_from_itm(params)
