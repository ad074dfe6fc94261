"""Per-example loss primitives shared by all task models.

Contract (SURVEY.md §7.2): models return *unreduced* losses; reduction and
scaling live in the driver/train-step, matching the reference where e.g. VQA
scales ``mean()*num_answers`` (train_vqa.py:188) and RE sums
(train_re.py:195).
"""

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Per-example CE. logits [..., C] fp32; labels int [...]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def cross_entropy_ignore(logits, labels, ignore_index=-1):
    """CE with an ignore label; returns (loss, weight) with weight 0 at
    ignored positions (torch F.cross_entropy(ignore_index=...) analog)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    loss = cross_entropy(logits, safe)
    w = valid.astype(jnp.float32)
    return loss * w, w


def binary_cross_entropy_with_logits(logits, targets):
    """Elementwise BCE-with-logits (VQA soft scores, model/vqa.py:46-50)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def kl_div(log_pred, target, eps=1e-12):
    """Elementwise KL(target || pred): target*(log target - log_pred), zero
    where target==0 (torch F.kl_div semantics, model/pretrain.py:217-220)."""
    t = target.astype(jnp.float32)
    return jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, eps)) - log_pred), 0.0)


def weighted_mean(loss, weight):
    """sum(loss*w)/sum(w) — the static-shape analog of ``loss.mean()`` over a
    dynamically-gathered vector."""
    w = weight.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def margin_ranking(pos, neg, margin):
    """clamp(margin + neg - pos, 0) broadcasting pos over negs."""
    return jnp.maximum(margin + neg - pos, 0.0)
