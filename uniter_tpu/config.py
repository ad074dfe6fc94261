"""Model configuration.

Mirrors the hyperparameter surface of the reference's ``UniterConfig``
(/root/reference/model/model.py:24-114, loaded from config/uniter-{base,large}.json)
plus TPU-specific compute-policy knobs that have no reference equivalent
(dtype policy, kernel implementation selection, remat).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

import jax.numpy as jnp

# Constants shared with the reference (utils/const.py:7-9).
IMG_DIM = 2048
IMG_LABEL_DIM = 1601


@dataclasses.dataclass(frozen=True)
class UniterConfig:
    """BERT-style hyperparameters for the single-stream UNITER encoder."""

    vocab_size: int = 28996
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02

    # --- TPU-native additions (no reference equivalent) ---
    # Compute dtype for the encoder ("bfloat16" on TPU, "float32" for parity
    # testing). Params are always stored fp32, matching apex-O2's fp32 master
    # weights (reference keeps fp16 compute / fp32 master).
    dtype: str = "bfloat16"
    # Attention implementation: "pallas" (fused TPU kernel) or "xla".
    attention_impl: str = "xla"
    # Batch elements per attention-kernel grid step (divisor of B; auto-
    # clamped so the block still fits VMEM with ALL heads batched). >1
    # amortizes grid overhead and enlarges the MXU's batched GEMMs.
    attn_batch_block: int = 1
    # FFN implementation: "pallas" (fused matmul-gelu-matmul, intermediate
    # never leaves VMEM) or "xla".
    ffn_impl: str = "xla"
    # LayerNorm implementation: "pallas" or "xla". eps is pinned at 1e-12 to
    # match apex FusedLayerNorm usage (reference model/model.py:229).
    layer_norm_impl: str = "xla"
    # Dropout mask implementation: "xla" (flax-compatible bernoulli) or
    # "u16"/"u8" (16/8-bit thresholds, half/quarter the random-bit HBM
    # traffic; ops/dropout.py).
    dropout_impl: str = "xla"
    # "pallas": fuse each sub-block tail (dropout + residual + LayerNorm)
    # into one kernel with in-kernel PRNG (ops/fused_block.py). "none":
    # compose dropout_impl + layer_norm_impl separately.
    block_fusion: str = "none"
    layer_norm_eps: float = 1e-12
    # Fuse the Q/K/V projections into one [H, 3H] GEMM at apply time (param
    # layout stays query/key/value, so checkpoints are unaffected).
    fused_qkv: bool = False
    # Rematerialize each encoder layer in the backward pass.
    remat: bool = False
    # Unroll factor for the scanned encoder (1 = pure scan; num_hidden_layers
    # = fully unrolled, letting XLA fuse across layer boundaries at higher
    # compile cost).
    scan_unroll: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "UniterConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_dict(cls, d: Dict[str, Any], **overrides) -> "UniterConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "UniterConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f), **overrides)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"


def resolve_kernel_policies(cfg: UniterConfig) -> UniterConfig:
    """Resolve "auto" kernel policies for this process's backend, and
    downgrade Pallas implementations to the reference XLA paths off-
    accelerator (the kernels need the TPU backend / on-core PRNG).

    Drivers resolve before training; inference resolves again because a
    TPU-trained run's metadata stores the *resolved* policies, which must
    not crash a CPU inference of the same run.
    """
    import jax

    on_accel = jax.default_backend() != "cpu"
    att, bf = cfg.attention_impl, cfg.block_fusion
    ln, ffn = cfg.layer_norm_impl, cfg.ffn_impl
    if att == "auto":
        att = "pallas" if on_accel else "xla"
    if bf == "auto":
        bf = "pallas" if on_accel else "none"
    if not on_accel:
        att = "xla" if att in ("pallas", "pallas_nt") else att
        bf = "none" if bf == "pallas" else bf
        ln = "xla" if ln == "pallas" else ln
        ffn = "xla" if ffn == "pallas" else ffn
    return cfg.replace(attention_impl=att, block_fusion=bf,
                       layer_norm_impl=ln, ffn_impl=ffn)


def base_config(**overrides) -> UniterConfig:
    """uniter-base: 12L/768H/12 heads (reference config/uniter-base.json)."""
    return UniterConfig(**overrides)


def large_config(**overrides) -> UniterConfig:
    """uniter-large: 24L/1024H/16 heads (reference config/uniter-large.json)."""
    kw = dict(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
    )
    kw.update(overrides)
    return UniterConfig(**kw)


def tiny_config(**overrides) -> UniterConfig:
    """A small config for tests."""
    kw = dict(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        dtype="float32",
    )
    kw.update(overrides)
    return UniterConfig(**kw)
