# Reproducible runtime (the reference's Dockerfile role). On TPU VMs you
# normally run bare-metal with the preinstalled libtpu; this image serves
# CPU development / CI and GPU-less data prepro.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make liblz4-1 wget git && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml ./
COPY uniter_tpu ./uniter_tpu
COPY native ./native
COPY scripts ./scripts
COPY configs ./configs
COPY *.py ./

RUN pip install --no-cache-dir -e .[convert] && \
    g++ -O2 -shared -fPIC -std=c++17 \
        -o native/lmdbx/liblmdbx.so native/lmdbx/lmdbx.cc

# volume mounts mirror the reference: /txt /img /storage /pretrain
VOLUME ["/txt", "/img", "/storage", "/pretrain"]
ENV JAX_COMPILATION_CACHE_DIR=/storage/.jax_cache
CMD ["python", "-m", "pytest", "tests/", "-q"]
