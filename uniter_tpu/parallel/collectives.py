"""Host-level collectives for multi-host training.

Replaces the reference's horovod object collectives
(utils/distributed.py:179-209 ``all_gather_list`` / ``any_broadcast`` over
pickled NCCL byte tensors):

  * gradient/param collectives need NO explicit code here — they are XLA
    collectives inserted by sharding-annotated jit (see parallel/mesh.py);
  * host-side metric/object gather uses
    ``jax.experimental.multihost_utils.process_allgather`` over DCN;
  * task-mixing needs no broadcast at all: MetaLoader draws from a shared
    seeded RNG stream on every host (data/loader.py docstring).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def num_processes() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def all_gather_list(data: Any) -> List[Any]:
    """Gather arbitrary picklable objects from all hosts (reference
    utils/distributed.py:179-195). Single-process: identity list."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.asarray([payload.size], np.int32)
    sizes = multihost_utils.process_allgather(n).ravel()
    maxlen = int(sizes.max())
    padded = np.zeros((maxlen,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(jax.process_count())
    ]


def all_gather_array(x: np.ndarray) -> np.ndarray:
    """Stack an equal-shape array from every host along a new axis 0
    (reference hvd.allgather for the retrieval score matrix,
    utils/itm_eval.py:75)."""
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


_BARRIER_SEQ = iter(range(1 << 62))


def barrier(name: str = "barrier", timeout_s: float = 600.0):
    """Host-level barrier (reference hvd barrier semantics,
    utils/distributed.py usage in every driver).

    Uses the coordination service's gRPC barrier, NOT a device
    collective: a sync_global_devices barrier compiles and runs a psum,
    and XLA:CPU's Gloo context rendezvous carries a hardcoded 30s
    deadline — under large worker skew (staggered compiles on
    oversubscribed hosts) the barrier itself can DEADLINE_EXCEEDED. The
    gRPC barrier takes an explicit timeout and no compilation. Barrier
    calls must occur in the same order on every process (already the
    collective contract) — the shared sequence number makes each call
    site a unique barrier id, as the service requires."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(f"uniter:{name}:{next(_BARRIER_SEQ)}",
                               int(timeout_s * 1000))
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
