"""The single-stream UNITER encoder, TPU-native.

Capability parity with the reference's ``UniterModel``
(/root/reference/model/model.py:217-367) and BERT blocks
(/root/reference/model/layer.py:53-186), re-designed for XLA:

  * The joint sequence is laid out at **fixed segment offsets**
    ``[txt (incl. CLS/SEP, padded) ; img (padded)]`` instead of the
    reference's per-batch ``gather_index`` re-compaction
    (model/model.py:321-334). The gather is a packing optimization with no
    semantics — attention is permutation-invariant under the padding mask and
    position information is carried by explicit position embeddings — and
    per-batch dynamic shapes would defeat XLA compilation. Batches are padded
    to static length buckets; the additive mask does the rest.
  * The N identical BERT layers are stacked and driven by ``flax.linen.scan``
    so XLA compiles one layer body regardless of depth, with optional
    rematerialization for memory.
  * Params are stored fp32; activations run in ``config.dtype`` (bf16 on
    TPU). LayerNorm statistics and attention softmax always run fp32,
    matching apex-O2 behavior. LN eps is 1e-12 (model/model.py:229) and GELU
    is the erf form (model/layer.py:31-37) for checkpoint logit parity.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from uniter_tpu.config import UniterConfig
from uniter_tpu.ops.activations import ACT2FN
from uniter_tpu.ops.attention import multi_head_attention
from uniter_tpu.ops.dropout import dropout as dropout_op
from uniter_tpu.ops.ffn import ffn
from uniter_tpu.ops.fused_block import drop_res_ln, ln_drop
from uniter_tpu.ops.layer_norm import layer_norm

MASK_VALUE = -10000.0  # additive padding bias, reference model/model.py:345


class DropResLN(nn.Module):
    """``LayerNorm(dropout(x) + res)`` — the tail of both BERT sub-blocks
    (reference model/layer.py:104-127,158-170). Param layout matches a plain
    LayerNorm module (weight/bias), so checkpoints are unaffected by the
    fusion choice. With ``config.block_fusion == "pallas"`` the whole tail
    runs as one TPU kernel with in-kernel PRNG (ops/fused_block.py)."""

    config: UniterConfig
    rate: float

    @nn.compact
    def __call__(self, x, res, deterministic: bool = True):
        cfg = self.config
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        skip = deterministic or self.rate == 0.0
        rng = None if skip else self.make_rng("dropout")
        # The fused kernel earns its keep by keeping dropout bits out of
        # HBM; with dropout off (inference/validation) it is just a fusion
        # barrier in a pure-forward graph — measured SLOWER than XLA's own
        # fusion there (4299 vs 4563 retrieval pairs/s). Fuse only when the
        # mask is live.
        if cfg.block_fusion == "pallas" and not skip:
            return drop_res_ln(x, res, weight, bias, rate=self.rate, rng=rng,
                               eps=cfg.layer_norm_eps, impl="pallas")
        x = dropout_op(x, self.rate, rng, impl=cfg.dropout_impl,
                       deterministic=skip)
        return layer_norm(x + res, weight, bias, eps=cfg.layer_norm_eps,
                          impl=cfg.layer_norm_impl)


class LNDrop(nn.Module):
    """``dropout(LayerNorm(x))`` — the embedding tails (reference
    model/model.py:241-244,269-271). Param layout matches a plain LayerNorm
    module; with ``config.block_fusion == "pallas"`` the tail runs as one
    kernel with in-kernel PRNG (ops/fused_block.py ln_drop)."""

    config: UniterConfig
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        skip = deterministic or self.rate == 0.0
        rng = None if skip else self.make_rng("dropout")
        # fuse only when the dropout mask is live (see DropResLN)
        if cfg.block_fusion == "pallas" and not skip:
            return ln_drop(x, weight, bias, rate=self.rate, rng=rng,
                           eps=cfg.layer_norm_eps, impl="pallas")
        y = layer_norm(x, weight, bias, eps=cfg.layer_norm_eps,
                       impl=cfg.layer_norm_impl)
        return dropout_op(y, self.rate, rng, impl=cfg.dropout_impl,
                          deterministic=skip)


def _dense_init(config: UniterConfig):
    return nn.initializers.normal(stddev=config.initializer_range)


class LayerNorm(nn.Module):
    """LayerNorm with torch-style (weight, bias) params and fp32 statistics."""

    config: UniterConfig
    features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        d = self.features or x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(
            x, weight, bias,
            eps=self.config.layer_norm_eps,
            impl=self.config.layer_norm_impl,
        )


class Dense(nn.Module):
    """Linear layer with fp32 params, computing in the input dtype.

    ``in_features`` may be given explicitly (required when ``attend`` may be
    the first method traced); otherwise it is taken from the first input.
    """

    config: UniterConfig
    features: int
    in_features: Optional[int] = None

    def setup(self):
        d_in = self.in_features or self.config.hidden_size
        self.kernel = self.param(
            "kernel", _dense_init(self.config), (d_in, self.features), jnp.float32
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def __call__(self, x):
        dtype = x.dtype
        return jnp.dot(x, self.kernel.astype(dtype)) + self.bias.astype(dtype)

    def attend(self, x):
        """x @ kernel.T — weight tying against this layer's kernel (e.g. the
        MRFR head reuses img_linear, reference model/pretrain.py:27-32)."""
        return jnp.dot(x, self.kernel.T.astype(x.dtype))

    def pieces(self):
        return self.kernel, self.bias


class Embed(nn.Module):
    """Embedding table with fp32 storage; lookup returns compute dtype."""

    config: UniterConfig
    num: int
    features: Optional[int] = None

    def setup(self):
        d = self.features or self.config.hidden_size
        self.embedding = self.param(
            "embedding", _dense_init(self.config), (self.num, d), jnp.float32
        )

    def __call__(self, ids):
        return jnp.take(self.embedding, ids, axis=0, mode="clip").astype(
            self.config.compute_dtype
        )

    def attend(self, x):
        """x @ table.T — tied-decoder logits (MLM head, model/layer.py:212-215)."""
        return jnp.dot(x, self.embedding.T.astype(x.dtype))


class UniterTextEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LN -> dropout.

    Reference: model/model.py:217-245. ``type_vocab_size`` is configurable so
    task models can widen the token-type table (NLVR2 uses 3 rows, VCR 4 —
    reference model/nlvr2.py:26-34, model/vcr.py:32-41).
    """

    config: UniterConfig

    def setup(self):
        cfg = self.config
        self.word_embeddings = Embed(cfg, cfg.vocab_size, name="word_embeddings")
        self.position_embeddings = Embed(
            cfg, cfg.max_position_embeddings, name="position_embeddings"
        )
        self.token_type_embeddings = Embed(
            cfg, cfg.type_vocab_size, name="token_type_embeddings"
        )
        self.ln_dropout = LNDrop(cfg, cfg.hidden_dropout_prob,
                                 name="LayerNorm")

    def __call__(self, input_ids, position_ids, token_type_ids=None, *,
                 deterministic: bool = True):
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.ln_dropout(emb, deterministic=deterministic)


class UniterImageEmbeddings(nn.Module):
    """RoI features + 7-d bbox geometry -> token space.

    Reference: model/model.py:248-272. ``mask_embedding`` row 1 is added to
    features at MRM-masked positions; row 0 is pinned to zero (the reference
    zeroes it in-place every forward, model/model.py:263-265 — here we never
    read row 0 instead).
    """

    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.img_linear = Dense(cfg, cfg.hidden_size, in_features=self.img_dim, name="img_linear")
        self.img_layer_norm = LayerNorm(cfg, name="img_layer_norm")
        self.pos_linear = Dense(cfg, cfg.hidden_size, in_features=7, name="pos_linear")
        self.pos_layer_norm = LayerNorm(cfg, name="pos_layer_norm")
        self.mask_embedding = self.param(
            "mask_embedding", _dense_init(cfg), (2, self.img_dim), jnp.float32
        )
        self.ln_dropout = LNDrop(cfg, cfg.hidden_dropout_prob,
                                 name="LayerNorm")

    def __call__(self, img_feat, img_pos_feat, type_embeddings, img_masks=None, *,
                 deterministic: bool = True):
        cfg = self.config
        if img_masks is not None:
            add = jnp.where(
                img_masks[..., None].astype(bool),
                self.mask_embedding[1].astype(img_feat.dtype),
                jnp.zeros((), img_feat.dtype),
            )
            img_feat = img_feat + add
        im = self.img_layer_norm(
            self.img_linear(img_feat.astype(cfg.compute_dtype))
        )
        pos = self.pos_layer_norm(
            self.pos_linear(img_pos_feat.astype(cfg.compute_dtype))
        )
        return self.ln_dropout(im + pos + type_embeddings,
                               deterministic=deterministic)


class BertAttention(nn.Module):
    """Self-attention + output projection + residual LN.

    Reference: model/layer.py:53-127. QKV projections keep the reference's
    query/key/value module names for checkpoint mapping.
    """

    config: UniterConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, bias):
        cfg = self.config
        b, s, _ = hidden.shape
        h, d = cfg.num_attention_heads, cfg.head_dim

        if cfg.fused_qkv:
            # One [H, 3H] GEMM instead of three [H, H] GEMMs — better MXU
            # utilization; the param layout stays query/key/value (checkpoint
            # compatible), concatenated at apply time (a few MB, ~us).
            mods = [Dense(cfg, cfg.hidden_size, name=n)
                    for n in ("query", "key", "value")]
            w = jnp.concatenate([m.kernel for m in mods], axis=-1)
            bvec = jnp.concatenate([m.bias for m in mods], axis=-1)
            dt = hidden.dtype
            qkv = jnp.dot(hidden, w.astype(dt)) + bvec.astype(dt)
            q, k, v = [
                qkv[..., i * cfg.hidden_size:(i + 1) * cfg.hidden_size]
                .reshape(b, s, h, d) for i in range(3)
            ]
        else:
            def heads(name):
                return Dense(cfg, cfg.hidden_size, name=name)(
                    hidden).reshape(b, s, h, d)

            q, k, v = heads("query"), heads("key"), heads("value")
        rng = None
        if not self.deterministic and cfg.attention_probs_dropout_prob > 0.0:
            rng = self.make_rng("dropout")
        ctx = multi_head_attention(
            q, k, v, bias,
            dropout_rate=cfg.attention_probs_dropout_prob,
            dropout_rng=rng,
            impl=cfg.attention_impl,
            batch_block=cfg.attn_batch_block,
        ).reshape(b, s, cfg.hidden_size)
        out = Dense(cfg, cfg.hidden_size, name="output_dense")(ctx)
        return DropResLN(cfg, cfg.hidden_dropout_prob,
                         name="output_LayerNorm")(
            out, hidden, deterministic=self.deterministic)


class BertLayer(nn.Module):
    """Post-LN BERT layer: attention -> FFN(gelu) -> residual LN.

    Reference: model/layer.py:130-170.
    """

    config: UniterConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, bias):
        cfg = self.config
        attn_out = BertAttention(cfg, self.deterministic, name="attention")(
            hidden, bias
        )
        inter_mod = Dense(cfg, cfg.intermediate_size,
                          name="intermediate_dense")
        out_mod = Dense(cfg, cfg.hidden_size,
                        in_features=cfg.intermediate_size,
                        name="output_dense")
        if cfg.ffn_impl == "pallas" and cfg.hidden_act == "gelu":
            w1, b1 = inter_mod.pieces()
            w2, b2 = out_mod.pieces()
            out = ffn(attn_out, w1, b1, w2, b2, impl="pallas")
        else:
            inter = ACT2FN[cfg.hidden_act](inter_mod(attn_out))
            out = out_mod(inter)
        out = DropResLN(cfg, cfg.hidden_dropout_prob,
                        name="output_LayerNorm")(
            out, attn_out, deterministic=self.deterministic)
        return out


class BertAttentionCLS(nn.Module):
    """Inference-only attention computing ONLY the CLS (position-0) row.

    Param layout is identical to BertAttention, so the last slice of the
    scanned encoder stack binds directly. Used by the retrieval scoring
    fast path (utils/itm_fast.py): every retrieval head consumes only
    ``hidden[:, 0]`` (pooler -> rank_output, reference model/itm.py:33-44),
    so the final layer's other S-1 rows are dead compute — a [1, S] query
    slab replaces the [S, S] score matrix and the FFN runs on one row.
    """

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden, bias):
        cfg = self.config
        b, s, _ = hidden.shape
        h, d = cfg.num_attention_heads, cfg.head_dim
        q = Dense(cfg, cfg.hidden_size, name="query")(
            hidden[:, :1]).reshape(b, 1, h, d)
        k = Dense(cfg, cfg.hidden_size, name="key")(hidden).reshape(b, s, h, d)
        v = Dense(cfg, cfg.hidden_size, name="value")(
            hidden).reshape(b, s, h, d)
        # XLA path: a 1-row query is far below the Pallas kernel's tile
        # sizes; the einsum is tiny and fuses with the projections.
        ctx = multi_head_attention(q, k, v, bias, impl="xla").reshape(
            b, 1, cfg.hidden_size)
        out = Dense(cfg, cfg.hidden_size, name="output_dense")(ctx)
        return DropResLN(cfg, cfg.hidden_dropout_prob,
                         name="output_LayerNorm")(
            out, hidden[:, :1], deterministic=True)


class BertLayerCLS(nn.Module):
    """Final BERT layer computing only the CLS row (see BertAttentionCLS).

    Mathematically identical to BertLayer restricted to position 0 —
    attention is the only cross-position op, and its query rows are
    independent; FFN/LN are per-position.
    """

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden, bias):
        cfg = self.config
        attn_out = BertAttentionCLS(cfg, name="attention")(hidden, bias)
        inter = ACT2FN[cfg.hidden_act](
            Dense(cfg, cfg.intermediate_size, name="intermediate_dense")(
                attn_out))
        out = Dense(cfg, cfg.hidden_size, in_features=cfg.intermediate_size,
                    name="output_dense")(inter)
        return DropResLN(cfg, cfg.hidden_dropout_prob,
                         name="output_LayerNorm")(
            out, attn_out, deterministic=True)


class _ScanBody(nn.Module):
    config: UniterConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, hidden, bias):
        out = BertLayer(self.config, self.deterministic, name="bert_layer")(
            hidden, bias
        )
        return out, ()


class UniterEncoder(nn.Module):
    """N stacked BERT layers driven by lax.scan (one compiled layer body).

    Layer params are stacked along a leading [L, ...] axis. Reference:
    model/model.py:275-292. Only the final layer's states are returned
    (every reference consumer calls with ``output_all_encoded_layers=False``).
    """

    config: UniterConfig

    @nn.compact
    def __call__(self, hidden, bias, deterministic: bool = True):
        cfg = self.config
        body = _ScanBody
        if cfg.remat:
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_hidden_layers,
            in_axes=(nn.broadcast,),
            unroll=cfg.scan_unroll,
        )
        hidden, _ = scan(cfg, deterministic, name="layer")(hidden, bias)
        return hidden


class BertPooler(nn.Module):
    """[CLS] (position 0) -> Dense -> tanh. Reference: model/layer.py:173-185."""

    config: UniterConfig

    def setup(self):
        self.dense = Dense(self.config, self.config.hidden_size, name="dense")

    def __call__(self, hidden):
        return jnp.tanh(self.dense(hidden[:, 0]))


def attn_bias(attn_mask, dtype=jnp.float32):
    """0/1 validity mask [B, S] -> additive bias (0 valid / -10000 pad)."""
    return ((1.0 - attn_mask.astype(jnp.float32)) * MASK_VALUE).astype(dtype)


class UniterModel(nn.Module):
    """Joint vision-language encoder.

    Batch layout (static shapes): the joint sequence is
    ``[txt tokens (T, CLS at 0) ; img regions (R)]``; ``attn_mask`` is the
    [B, T+R] 0/1 validity mask over both segments. Pass ``input_ids=None``
    for image-only or ``img_feat=None`` for text-only encoding (the
    reference's three input modes, model/model.py:348-360).
    """

    config: UniterConfig
    img_dim: int = 2048

    def setup(self):
        cfg = self.config
        self.embeddings = UniterTextEmbeddings(cfg, name="embeddings")
        self.img_embeddings = UniterImageEmbeddings(
            cfg, self.img_dim, name="img_embeddings"
        )
        self.encoder = UniterEncoder(cfg, name="encoder")
        self.pooler = BertPooler(cfg, name="pooler")

    def encode(self, emb, attn_mask, deterministic=True):
        return self.encoder(emb, attn_bias(attn_mask), deterministic)

    def init_all(self, input_ids, position_ids, img_feat, img_pos_feat,
                 attn_mask, **kw):
        """Init entry that touches every submodule (incl. the pooler, which
        plain __call__ does not invoke)."""
        seq = self(input_ids, position_ids, img_feat, img_pos_feat,
                   attn_mask, **kw)
        return seq, self.pooler(seq)

    def __call__(
        self,
        input_ids=None,
        position_ids=None,
        img_feat=None,
        img_pos_feat=None,
        attn_mask=None,
        img_masks=None,
        txt_type_ids=None,
        img_type_ids=None,
        *,
        deterministic: bool = True,
    ):
        embs = []
        if input_ids is not None:
            embs.append(
                self.embeddings(
                    input_ids, position_ids, txt_type_ids,
                    deterministic=deterministic,
                )
            )
        if img_feat is not None:
            if img_type_ids is None:
                img_type_ids = jnp.ones(img_feat.shape[:2], dtype=jnp.int32)
            # Image token-type rows live in the shared text token-type table
            # (reference model/model.py:313-316).
            type_emb = self.embeddings.token_type_embeddings(img_type_ids)
            embs.append(
                self.img_embeddings(
                    img_feat, img_pos_feat, type_emb, img_masks,
                    deterministic=deterministic,
                )
            )
        emb = embs[0] if len(embs) == 1 else jnp.concatenate(embs, axis=1)
        return self.encode(emb, attn_mask, deterministic)
