from uniter_tpu.models.encoder import (  # noqa: F401
    LayerNorm,
    BertLayer,
    UniterEncoder,
    UniterTextEmbeddings,
    UniterImageEmbeddings,
    BertPooler,
    UniterModel,
)
