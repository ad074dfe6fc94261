"""Multi-host collectives exercised for real: a 2-process jax.distributed
CPU job runs all_gather_list / all_gather_array / barrier and the
process-strided dataset split (reference equivalents:
utils/distributed.py:179-209 pickle-over-allgather and data/data.py:218-225
ids[hvd.rank()::hvd.size()]). Single-process branches are covered
elsewhere; this is the only test where process_count() > 1."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # no virtual device count in workers
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, sys.argv[3])
from uniter_tpu.parallel.collectives import (
    all_gather_list, all_gather_array, barrier, num_processes, process_index)
assert num_processes() == 2 and process_index() == pid

# pickled-object gather with unequal payload sizes (tests the pad logic)
got = all_gather_list({"rank": pid, "pad": "x" * (10 + pid * 1000)})
assert [g["rank"] for g in got] == [0, 1], got
assert len(got[1]["pad"]) == 1010

# equal-shape array gather (the retrieval score-matrix path)
arr = all_gather_array(np.full((3, 2), pid, np.float32))
assert arr.shape == (2, 3, 2) and arr[0, 0, 0] == 0 and arr[1, 0, 0] == 1

barrier("test")

# process-strided dataset split: every id exactly once across processes
ids = [f"ex_{i}" for i in range(11)]
mine = ids[pid::2]
parts = all_gather_list(mine)
flat = sorted(x for part in parts for x in part)
assert flat == sorted(ids), flat
print("WORKER_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collectives(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
