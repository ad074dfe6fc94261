"""UNITER pretraining model: MLM / MRFR / ITM(+WRA-OT) / MRC(-kl).

Reference: /root/reference/model/pretrain.py. TPU-native deltas:

  * Masked-position gathering uses **fixed-size slot tensors** supplied by
    the collate (``mlm_pos [B, M]`` / ``mrm_pos [B, Mr]`` index tensors with
    validity encoded by label -1 / weight 0) instead of boolean dynamic
    gathers (reference ``_compute_masked_hidden``, pretrain.py:129-133) —
    static shapes, same math.
  * The ITM OT loss needs no ``ot_scatter``: the static [txt; img] layout
    already keeps segments at fixed offsets (reference pretrain.py:167-191
    had to scatter the gather-compacted sequence back apart).
  * IPOT runs as a fixed-length lax.scan in fp32 under stop_gradient
    (ops/ot.py; reference model/ot.py:35-66 + fp32 note pretrain.py:186-188).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import IMG_DIM, IMG_LABEL_DIM, UniterConfig
from uniter_tpu.models.common import encode_batch, txt_img_pad_masks
from uniter_tpu.models.encoder import Dense, UniterModel
from uniter_tpu.models.heads import (
    MLMHead,
    RegionClassification,
    RegionFeatureRegression,
)
from uniter_tpu.models.losses import (
    cross_entropy_ignore,
    kl_div,
    weighted_mean,
)
from uniter_tpu.ops.ot import optimal_transport_dist

import jax


def gather_slots(seq, pos):
    """seq [B,S,H], pos [B,M] -> [B,M,H] (static-shape masked-hidden gather)."""
    return jnp.take_along_axis(seq, pos[..., None], axis=1)


class UniterForPretraining(nn.Module):
    config: UniterConfig
    img_dim: int = IMG_DIM
    img_label_dim: int = IMG_LABEL_DIM

    def setup(self):
        cfg = self.config
        self.uniter = UniterModel(cfg, self.img_dim, name="uniter")
        self.cls = MLMHead(cfg, name="cls")
        self.feat_regress = RegionFeatureRegression(
            cfg, self.img_dim, name="feat_regress"
        )
        self.region_classifier = RegionClassification(
            cfg, self.img_label_dim, name="region_classifier"
        )
        self.itm_output = Dense(cfg, 2, name="itm_output")

    # ---- MLM -------------------------------------------------------------
    def forward_mlm(self, batch, compute_loss=True, *, deterministic=False):
        seq = encode_batch(self.uniter, batch, deterministic)
        t = batch["input_ids"].shape[1]
        hidden = gather_slots(seq[:, :t], batch["mlm_pos"])  # [B, M, H]
        logits = self.cls(
            hidden, self.uniter.embeddings.word_embeddings.attend
        ).astype(jnp.float32)
        if compute_loss:
            return cross_entropy_ignore(logits, batch["mlm_tgt"], -1)
        return logits

    # ---- MRFR ------------------------------------------------------------
    def forward_mrfr(self, batch, compute_loss=True, *, deterministic=False):
        seq = encode_batch(self.uniter, batch, deterministic)
        t = batch["input_ids"].shape[1]
        hidden = gather_slots(seq[:, t:], batch["mrm_pos"])  # [B, Mr, H]
        pred = self.feat_regress(
            hidden, self.uniter.img_embeddings.img_linear.attend
        ).astype(jnp.float32)
        if compute_loss:
            tgt = batch["feat_targets"].astype(jnp.float32)
            w = batch["mrm_valid"].astype(jnp.float32)[..., None]
            w = jnp.broadcast_to(w, pred.shape)
            return jnp.square(pred - tgt) * w, w
        return pred

    # ---- ITM (+OT) -------------------------------------------------------
    def forward_itm(self, batch, compute_loss=True, compute_ot=True, *,
                    deterministic=False):
        seq = encode_batch(self.uniter, batch, deterministic)
        pooled = self.uniter.pooler(seq)
        itm_scores = self.itm_output(pooled).astype(jnp.float32)
        ot_dist = None
        if compute_ot:
            t = batch["input_ids"].shape[1]
            txt_pad, img_pad = txt_img_pad_masks(batch)
            ot_dist = optimal_transport_dist(
                seq[:, :t], seq[:, t:], txt_pad, img_pad
            )
        if compute_loss:
            loss, w = cross_entropy_ignore(itm_scores, batch["targets"], -1)
            return loss, w, ot_dist
        return itm_scores, ot_dist

    # ---- MRC(-kl) --------------------------------------------------------
    def forward_mrc(self, batch, task="mrc-kl", compute_loss=True, *,
                    deterministic=False):
        seq = encode_batch(self.uniter, batch, deterministic)
        t = batch["input_ids"].shape[1]
        hidden = gather_slots(seq[:, t:], batch["mrm_pos"])
        logits = self.region_classifier(hidden).astype(jnp.float32)  # [B,Mr,L]
        if not compute_loss:
            return logits
        tgt = batch["label_targets"].astype(jnp.float32)  # [B, Mr, L]
        valid = batch["mrm_valid"].astype(jnp.float32)  # [B, Mr]
        if "kl" in task:
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = kl_div(logp, tgt) * valid[..., None]
            w = jnp.broadcast_to(valid[..., None], loss.shape)
            return loss, w
        # hard label: argmax over non-background classes, +1; background (0)
        # excluded as target (pretrain.py:221-227)
        labels = jnp.argmax(tgt[..., 1:], axis=-1) + 1
        labels = jnp.where(valid > 0, labels, -1)
        return cross_entropy_ignore(logits, labels, -1)

    def init_all(self, batch):
        """Initialization entry touching every head (one encoder pass)."""
        seq = encode_batch(self.uniter, batch, True)
        t = batch["input_ids"].shape[1]
        pooled = self.uniter.pooler(seq)
        h_txt = gather_slots(seq[:, :t], batch["mlm_pos"])
        h_img = gather_slots(seq[:, t:], batch["mrm_pos"])
        return (
            self.cls(h_txt, self.uniter.embeddings.word_embeddings.attend),
            self.feat_regress(
                h_img, self.uniter.img_embeddings.img_linear.attend),
            self.region_classifier(h_img),
            self.itm_output(pooled),
        )

    # ---- dispatch --------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], task: str = "mlm",
                 compute_loss: bool = True, *, deterministic: bool = False):
        if task == "mlm":
            return self.forward_mlm(batch, compute_loss,
                                    deterministic=deterministic)
        if task == "mrfr":
            return self.forward_mrfr(batch, compute_loss,
                                     deterministic=deterministic)
        if task.startswith("itm"):
            return self.forward_itm(batch, compute_loss,
                                    compute_ot=batch.get("compute_ot", True),
                                    deterministic=deterministic)
        if task.startswith("mrc"):
            return self.forward_mrc(batch, task, compute_loss,
                                    deterministic=deterministic)
        raise ValueError(f"invalid task {task}")

    def scalar_loss(self, batch, task: str, *, ot_lambda: float = 0.0,
                    deterministic: bool = False):
        """The reference's per-step scalar loss (pretrain.py:269-296):
        mean over valid elements; ITM adds
        lambda * (sum(ot_pos) - sum(ot_neg)) / (n_pos + n_neg)."""
        if task.startswith("itm"):
            loss, w, ot_dist = self.forward_itm(
                batch, True, compute_ot=ot_lambda > 0.0,
                deterministic=deterministic,
            )
            itm_loss = weighted_mean(loss, w)
            if ot_dist is not None:
                targets = batch["targets"]
                pos = (targets == 1).astype(jnp.float32)
                neg = (targets == 0).astype(jnp.float32)
                n = jnp.maximum(jnp.sum(pos) + jnp.sum(neg), 1.0)
                ot_loss = (jnp.sum(ot_dist * pos) - jnp.sum(ot_dist * neg)) / n
                return itm_loss + ot_lambda * ot_loss, {
                    "itm_xe": itm_loss, "itm_ot": ot_loss}
            return itm_loss, {"itm_xe": itm_loss}
        loss, w = self(batch, task, True, deterministic=deterministic)
        scalar = weighted_mean(loss, w)
        return scalar, {task: scalar}
