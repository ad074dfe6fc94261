from uniter_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    batch_sharding,
    param_sharding,
    replicate,
)
