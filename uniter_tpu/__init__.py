"""UNITER-TPU: a TPU-native (JAX/XLA/Pallas/pjit) vision-and-language framework.

Re-implements the full capability surface of ChenRocks/UNITER (single-stream
V+L transformer: BERT text embeddings + Faster-R-CNN region features, MLM /
MRFR / MRC(-kl) / ITM+WRA-OT pretraining, and 7 downstream task families) with
a TPU-first design: static length-bucketed batching, fused Pallas kernels for
the attention/LN hot path, `jit` over a `jax.sharding.Mesh` for data/model
parallelism, bf16 compute with fp32 params, and Orbax checkpointing.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from uniter_tpu.config import UniterConfig  # noqa: F401
