from uniter_tpu.ops.activations import gelu, swish, ACT2FN  # noqa: F401
from uniter_tpu.ops.layer_norm import layer_norm  # noqa: F401
from uniter_tpu.ops.attention import multi_head_attention  # noqa: F401
