"""Multi-host collectives exercised for real: P-process jax.distributed
CPU jobs (P=2 and P=4 — VERDICT r4 #6) run all_gather_list /
all_gather_array / barrier and the process-strided dataset split
(reference equivalents: utils/distributed.py:179-209
pickle-over-allgather and data/data.py:218-225
ids[hvd.rank()::hvd.size()]). Single-process branches are covered
elsewhere; these are the only tests where process_count() > 1."""

import os
import pytest
import socket
import subprocess
import sys

pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # no virtual device count in workers
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[4])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           shutdown_timeout_seconds=900)
sys.path.insert(0, sys.argv[3])
from uniter_tpu.parallel.collectives import (
    all_gather_list, all_gather_array, barrier, num_processes, process_index)
assert num_processes() == nproc and process_index() == pid

# pickled-object gather with unequal payload sizes (tests the pad logic)
got = all_gather_list({"rank": pid, "pad": "x" * (10 + pid * 1000)})
assert [g["rank"] for g in got] == list(range(nproc)), got
for i, g in enumerate(got):
    assert len(g["pad"]) == 10 + i * 1000

# equal-shape array gather (the retrieval score-matrix path)
arr = all_gather_array(np.full((3, 2), pid, np.float32))
assert arr.shape == (nproc, 3, 2)
for i in range(nproc):
    assert arr[i, 0, 0] == i

barrier("test")

# process-strided dataset split: every id exactly once across processes
ids = [f"ex_{i}" for i in range(11)]
mine = ids[pid::nproc]
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


def _run_workers(tmp_path, src, nproc, extra_args=(), name="worker"):
    worker = tmp_path / f"{name}.py"
    worker.write_text(src)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), port, str(pid), REPO,
             *[str(a) for a in extra_args], str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(nproc)
    ]
    # 1-vCPU hosts: P=4 workers' compiles serialize, so completion skew can
    # be large — give stragglers room (matches shutdown_timeout_seconds=900
    # in the worker templates; the 300s default loses the exit barrier when
    # a fast worker finishes >300s before a contended one).
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    return outs


@pytest.mark.parametrize("nproc", [2, 4])
def test_multi_process_collectives(tmp_path, nproc):
    outs = _run_workers(tmp_path, WORKER, nproc)
    for pid, out in enumerate(outs):
        assert f"WORKER_OK {pid}" in out, out


TRAIN_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 devices/process
port, pid, repo, dbroot = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
nproc = int(sys.argv[5])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           shutdown_timeout_seconds=900)
sys.path.insert(0, repo)
import jax.numpy as jnp
from uniter_tpu.config import tiny_config
from uniter_tpu.data.buckets import BucketSpec
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.data.vqa import VqaDataset
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
from uniter_tpu.training.loop import device_put_batch, jnp_batch, place_state
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.step import TrainState, make_train_step

assert len(jax.devices()) == 2 * nproc
mesh = make_mesh(MeshConfig(data=-1))
ds = VqaDataset(5, TxtTokDb(f"{dbroot}/txt", max_txt_len=20),
                DetectFeatDb(f"{dbroot}/img", 0.2, 10, 3, 5))
spec = BucketSpec(txt_buckets=(16,), img_buckets=(8,), token_budget=192,
                  size_mul=8)  # -> global batch 8 examples
loader = BucketLoader(ds, spec, seed=11, loop=True,
                      shard_index=pid, shard_count=nproc)
cfg = tiny_config()
model = UniterForVisualQuestionAnswering(cfg, img_dim=2048, num_answer=5)
init_b = dict(input_ids=jnp.zeros((2, 16), jnp.int32),
              position_ids=jnp.zeros((2, 16), jnp.int32),
              img_feat=jnp.zeros((2, 8, 2048), jnp.float32),
              img_pos_feat=jnp.zeros((2, 8, 7), jnp.float32),
              attn_mask=jnp.ones((2, 24), jnp.int32))
params = model.init({"params": jax.random.PRNGKey(0)}, init_b, False)[
    "params"]
tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
state = place_state(TrainState.create(params, tx), mesh)

def loss_fn(p, b, r):
    per = model.apply({"params": p}, b, True, deterministic=True)
    w = b["ex_weight"][:, None]
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w) * 5, 1.0), {}

step = make_train_step(loss_fn, mesh=mesh, loss_scale="mean", donate=False)
it = iter(loader)
losses = []
# line up the workers right before the first step: its execution creates
# the Gloo context under a hardcoded 30s rendezvous deadline, and init +
# trace skew on an oversubscribed host can exceed that (observed at P=4
# under full-suite load). The gRPC barrier bounds start-time skew to ms.
from uniter_tpu.parallel.collectives import barrier
barrier("pre_step")
for _ in range(3):
    batch = next(it)
    assert batch["input_ids"].shape[0] == 8 // nproc  # local block
    jb = device_put_batch(jnp_batch(batch), mesh)
    state, m = step(state, jb, jax.random.PRNGKey(0))
    losses.append(float(np.asarray(m["loss"])))
print("LOSSES", pid, " ".join(f"{x:.10f}" for x in losses), flush=True)
"""


def _write_vqa_dbs(tmp_path, n_txt=16):
    import numpy as np

    from uniter_tpu.data import write_img_db, write_txt_db

    rng = np.random.RandomState(0)
    img_names = [f"im_{i}.npz" for i in range(4)]
    recs = {n: dict(features=rng.randn(5, 2048).astype(np.float16),
                    norm_bb=rng.rand(5, 6).astype(np.float16),
                    conf=np.linspace(1, .5, 5).astype(np.float16),
                    soft_labels=rng.rand(5, 1601).astype(np.float16))
            for n in img_names}
    write_img_db(str(tmp_path / "img"), recs, conf_th=0.2, max_bb=10,
                 min_bb=3)
    meta = {"CLS": 2, "SEP": 3, "MASK": 4, "v_range": [6, 400]}
    trecs, t2i = {}, {}
    for i in range(n_txt):
        tid = f"q{i}"
        trecs[tid] = dict(
            input_ids=[int(x) for x in rng.randint(6, 400, 7)],
            img_fname=img_names[i % 4],
            target={"labels": [int(rng.randint(0, 5))], "scores": [1.0]})
        t2i[tid] = img_names[i % 4]
    write_txt_db(str(tmp_path / "txt"), trecs, meta, t2i)


def _vqa_oracle_setup(tmp_path, n_devices):
    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import tiny_config
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.img_db import DetectFeatDb
    from uniter_tpu.data.txt_db import TxtTokDb
    from uniter_tpu.data.vqa import VqaDataset
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = (make_mesh(MeshConfig(data=n_devices),
                      devices=jax.devices()[:n_devices])
            if n_devices else None)
    ds = VqaDataset(5, TxtTokDb(str(tmp_path / "txt"), max_txt_len=20),
                    DetectFeatDb(str(tmp_path / "img"), 0.2, 10, 3, 5))
    spec = BucketSpec(txt_buckets=(16,), img_buckets=(8,),
                      token_budget=192, size_mul=8)
    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(cfg, img_dim=2048, num_answer=5)
    init_b = dict(input_ids=jnp.zeros((2, 16), jnp.int32),
                  position_ids=jnp.zeros((2, 16), jnp.int32),
                  img_feat=jnp.zeros((2, 8, 2048), jnp.float32),
                  img_pos_feat=jnp.zeros((2, 8, 7), jnp.float32),
                  attn_mask=jnp.ones((2, 24), jnp.int32))
    params = model.init({"params": jax.random.PRNGKey(0)}, init_b, False)[
        "params"]
    return mesh, ds, spec, model, params


@pytest.mark.parametrize("nproc", [2, 4])
def test_multi_process_training_matches_single(tmp_path, nproc):
    """Distributed training over a P-process global mesh: all hosts follow
    the shared batch plan (loader-level sharding), assemble global batches
    from per-host blocks, and the loss trajectory matches a single-process
    run on the same plan exactly."""
    import numpy as np

    _write_vqa_dbs(tmp_path)
    outs = _run_workers(tmp_path, TRAIN_WORKER, nproc,
                        extra_args=[str(tmp_path)], name="train_worker")
    losses = {}
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES")][0]
        losses[pid] = [float(x) for x in line.split()[2:]]
    for pid in range(1, nproc):
        assert losses[0] == losses[pid], losses

    # single-process oracle: same plan (shard_count=1 yields full batches),
    # same model/optimizer, (2 * nproc)-device mesh
    import jax
    import jax.numpy as jnp

    from uniter_tpu.data.loader import BucketLoader
    from uniter_tpu.training.loop import (
        device_put_batch, jnp_batch, place_state,
    )
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState, make_train_step

    mesh, ds, spec, model, params = _vqa_oracle_setup(tmp_path, 2 * nproc)
    loader = BucketLoader(ds, spec, seed=11, loop=True)
    tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
    state = place_state(TrainState.create(params, tx), mesh)

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        w = b["ex_weight"][:, None]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w) * 5, 1.0), {}

    step = make_train_step(loss_fn, mesh=mesh, loss_scale="mean",
                           donate=False)
    it = iter(loader)
    single = []
    for _ in range(3):
        jb = device_put_batch(jnp_batch(next(it)), mesh)
        state, m = step(state, jb, jax.random.PRNGKey(0))
        single.append(float(np.asarray(m["loss"])))
    np.testing.assert_allclose(single, losses[0], rtol=1e-6, atol=1e-7)


RESUME_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 devices/process
port, pid, repo, dbroot = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
nproc = int(sys.argv[5])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           shutdown_timeout_seconds=900)
sys.path.insert(0, repo)
import jax.numpy as jnp
from uniter_tpu.config import tiny_config
from uniter_tpu.data.buckets import BucketSpec
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.data.vqa import VqaDataset
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
from uniter_tpu.training.loop import device_put_batch, jnp_batch, place_state
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.save import TrainStateSaver

mesh = make_mesh(MeshConfig(data=-1))
ds = VqaDataset(5, TxtTokDb(f"{dbroot}/txt", max_txt_len=20),
                DetectFeatDb(f"{dbroot}/img", 0.2, 10, 3, 5))
spec = BucketSpec(txt_buckets=(16,), img_buckets=(8,), token_budget=192,
                  size_mul=8)
loader = BucketLoader(ds, spec, seed=11, loop=True,
                      shard_index=pid, shard_count=nproc)
cfg = tiny_config()
model = UniterForVisualQuestionAnswering(cfg, img_dim=2048, num_answer=5)
init_b = dict(input_ids=jnp.zeros((2, 16), jnp.int32),
              position_ids=jnp.zeros((2, 16), jnp.int32),
              img_feat=jnp.zeros((2, 8, 2048), jnp.float32),
              img_pos_feat=jnp.zeros((2, 8, 7), jnp.float32),
              attn_mask=jnp.ones((2, 24), jnp.int32))
params = model.init({"params": jax.random.PRNGKey(0)}, init_b, False)[
    "params"]
tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
state = place_state(TrainState.create(params, tx), mesh)

# restore the checkpoint a SINGLE-process run saved at step 2 into this
# P-process topology (elastic resume: the shared-plan loader contract makes
# host count a free parameter)
saver = TrainStateSaver(f"{dbroot}/out")
state = saver.restore(state)
assert state is not None and int(state.step) == 2, state

def loss_fn(p, b, r):
    per = model.apply({"params": p}, b, True, deterministic=True)
    w = b["ex_weight"][:, None]
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w) * 5, 1.0), {}

step = make_train_step(loss_fn, mesh=mesh, loss_scale="mean", donate=False)
it = iter(loader)
for _ in range(2):   # skip the batches steps 1-2 consumed (same seed plan)
    next(it)
batch = next(it)
assert batch["input_ids"].shape[0] == 8 // nproc  # local block
jb = device_put_batch(jnp_batch(batch), mesh)
state, m = step(state, jb, jax.random.PRNGKey(0))
print("STEP3_LOSS", pid, f"{float(np.asarray(m['loss'])):.10f}", flush=True)
"""


@pytest.mark.parametrize("nproc", [2, 4])
def test_resume_single_process_ckpt_in_multi_process_run(tmp_path, nproc):
    """Elastic resume across topologies: a checkpoint saved by a
    1-process/4-device run restores into a P-process (2 devices each)
    job and the continued trajectory matches the uninterrupted
    single-process run. Host count is a free parameter because sharding
    lives in the loader (shared global batch plan), not the dataset."""
    import numpy as np

    _write_vqa_dbs(tmp_path)

    # phase A: single-process 4-device run, 3 steps; checkpoint at step 2
    import jax
    import jax.numpy as jnp

    from uniter_tpu.data.loader import BucketLoader
    from uniter_tpu.training.loop import (
        device_put_batch, jnp_batch, place_state,
    )
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState, make_train_step
    from uniter_tpu.utils.save import TrainStateSaver

    mesh, ds, spec, model, params = _vqa_oracle_setup(tmp_path, 4)
    loader = BucketLoader(ds, spec, seed=11, loop=True)
    tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
    state = place_state(TrainState.create(params, tx), mesh)

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        w = b["ex_weight"][:, None]
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w) * 5, 1.0), {}

    step = make_train_step(loss_fn, mesh=mesh, loss_scale="mean",
                           donate=False)
    saver = TrainStateSaver(str(tmp_path / "out"))
    it = iter(loader)
    oracle_losses = []
    for i in range(3):
        jb = device_put_batch(jnp_batch(next(it)), mesh)
        state, m = step(state, jb, jax.random.PRNGKey(0))
        oracle_losses.append(float(np.asarray(m["loss"])))
        if i == 1:
            saver.save(2, state)

    # phase B: P-process job restores the step-2 ckpt and runs step 3
    outs = _run_workers(tmp_path, RESUME_WORKER, nproc,
                        extra_args=[str(tmp_path)], name="resume_worker")
    step3 = {}
    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines()
                if ln.startswith("STEP3_LOSS")][0]
        step3[pid] = float(line.split()[2])
    for pid in range(1, nproc):
        assert step3[0] == step3[pid], step3
    np.testing.assert_allclose(step3[0], oracle_losses[2],
                               rtol=1e-6, atol=1e-7)


EVAL_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 devices/process
port, pid, repo, dbroot = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
nproc = int(sys.argv[5])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           shutdown_timeout_seconds=900)
sys.path.insert(0, repo)
import jax.numpy as jnp
from uniter_tpu.config import tiny_config
from uniter_tpu.data.buckets import BucketSpec
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.data.vqa import VqaDataset
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.parallel.collectives import all_gather_list
from uniter_tpu.training.infer import eval_put, local_eval_mesh
from uniter_tpu.training.loop import jnp_batch

# the eval mesh must span only THIS process's chips
mesh = local_eval_mesh()
assert mesh.shape["data"] == 2, mesh

# dataset-level sharding (the inf_* contract: host-local compute + gather);
# 18 texts do NOT divide evenly at nproc=4 (strided shards of 5/5/4/4)
ds = VqaDataset(5, TxtTokDb(f"{dbroot}/txt", max_txt_len=20),
                DetectFeatDb(f"{dbroot}/img", 0.2, 10, 3, 5),
                shard_index=pid, shard_count=nproc)
spec = BucketSpec(txt_buckets=(16,), img_buckets=(8,), token_budget=192,
                  size_mul=8)
loader = BucketLoader(ds, spec, shuffle=False, drop_last=False)
cfg = tiny_config()
model = UniterForVisualQuestionAnswering(cfg, img_dim=2048, num_answer=5)
init_b = dict(input_ids=jnp.zeros((2, 16), jnp.int32),
              position_ids=jnp.zeros((2, 16), jnp.int32),
              img_feat=jnp.zeros((2, 8, 2048), jnp.float32),
              img_pos_feat=jnp.zeros((2, 8, 7), jnp.float32),
              attn_mask=jnp.ones((2, 24), jnp.int32))
params = model.init({"params": jax.random.PRNGKey(0)}, init_b, False)[
    "params"]
predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
results = {}
for batch in loader:
    jb = eval_put(jnp_batch(batch), mesh)
    logits = np.asarray(predict(params, jb))
    n = len(batch["qids"])
    for qid, row in zip(batch["qids"], logits[:n]):
        results[qid] = row.astype(np.float32)
parts = all_gather_list(results)
merged = {}
for part in parts:
    merged.update(part)
assert len(merged) == 18, sorted(merged)
if pid == 0:
    np.savez(f"{dbroot}/eval_logits.npz", **merged)
print("EVAL_OK", pid, flush=True)
"""


@pytest.mark.parametrize("nproc", [2, 4])
def test_multi_process_chip_parallel_eval_matches_single(tmp_path, nproc):
    """Two-level eval parallelism for real: a P-process job shards the
    dataset per process (18 texts -> non-divisible tails at P=4), spreads
    each batch over its local chips (infer.local_eval_mesh + eval_put),
    gathers, and the merged logits equal a single-process single-mesh
    evaluation."""
    import numpy as np

    _write_vqa_dbs(tmp_path, n_txt=18)
    outs = _run_workers(tmp_path, EVAL_WORKER, nproc,
                        extra_args=[str(tmp_path)], name="eval_worker")
    for pid, out in enumerate(outs):
        assert f"EVAL_OK {pid}" in out, out

    # single-process oracle over the full dataset, default 8-device mesh
    import jax

    from uniter_tpu.data.loader import BucketLoader
    from uniter_tpu.training.infer import eval_put, local_eval_mesh
    from uniter_tpu.training.loop import jnp_batch

    _, ds, spec, model, params = _vqa_oracle_setup(tmp_path, 0)
    loader = BucketLoader(ds, spec, shuffle=False, drop_last=False)
    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
    mesh = local_eval_mesh()
    oracle = {}
    for batch in loader:
        jb = eval_put(jnp_batch(batch), mesh)
        logits = np.asarray(predict(params, jb))
        for qid, row in zip(batch["qids"],
                            logits[:len(batch["qids"])]):
            oracle[qid] = row

    dist = np.load(str(tmp_path / "eval_logits.npz"))
    assert sorted(dist.files) == sorted(oracle)
    for qid in oracle:
        np.testing.assert_allclose(dist[qid], oracle[qid],
                                   rtol=1e-5, atol=1e-6, err_msg=qid)


GLOBAL_PARAMS_EVAL_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 devices/process
port, pid, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
nproc = int(sys.argv[4])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid,
                           shutdown_timeout_seconds=900)
sys.path.insert(0, repo)
import jax.numpy as jnp
from uniter_tpu.config import tiny_config
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.parallel.mesh import (
    MeshConfig, make_mesh, param_sharding_full, replicate)
from uniter_tpu.training.infer import (
    eval_put, local_eval_mesh, local_eval_params)

mesh_g = make_mesh(MeshConfig(data=-1))   # GLOBAL training mesh
cfg = tiny_config()
model = UniterForVisualQuestionAnswering(cfg, img_dim=64, num_answer=5)
rng = np.random.RandomState(0)
b, t, r = 5, 8, 4   # 5 rows: NOT divisible by the 2-device local mesh
                    # (exercises eval_put's zero-pad + [:b] trim)
batch = dict(
    input_ids=rng.randint(1, 100, (b, t)).astype(np.int32),
    position_ids=np.broadcast_to(np.arange(t, dtype=np.int32),
                                 (b, t)).copy(),
    img_feat=rng.randn(b, r, 64).astype(np.float32),
    img_pos_feat=rng.rand(b, r, 7).astype(np.float32),
    attn_mask=np.ones((b, t + r), np.int32),
)
params = model.init({"params": jax.random.PRNGKey(0)},
                    {k: jnp.asarray(v) for k, v in batch.items()},
                    False)["params"]
predict = jax.jit(lambda p, bt: model.apply({"params": p}, bt, False))

lm = local_eval_mesh()
assert lm.shape["data"] == 2, lm
jb = eval_put(dict(batch), lm)
oracle = np.asarray(predict(params, jb))[:b]

# the in-training shape of the problem: params committed to the GLOBAL
# mesh (replicated, and FSDP-sharded), eval batch on the LOCAL mesh
gp = jax.device_put(params, replicate(mesh_g))
psh = param_sharding_full(params, mesh_g,
                          MeshConfig(fsdp=True, fsdp_min_size=16))
sp = jax.device_put(params, psh)
for name, cand in (("replicated", gp), ("fsdp", sp)):
    lp = local_eval_params(cand, lm)  # collective for fsdp — lockstep
    got = np.asarray(predict(lp, eval_put(dict(batch), lm)))[:b]
    np.testing.assert_allclose(got, oracle, rtol=1e-6, atol=1e-6,
                               err_msg=name)
print("GLOBAL_EVAL_OK", pid, flush=True)
"""


@pytest.mark.parametrize("nproc", [2, 4])
def test_local_eval_params_multi_process_global_and_fsdp(tmp_path, nproc):
    """Regression for the global-mesh-params x local-mesh-batch mix: in a
    P-process job, params committed to the global training mesh
    (replicated AND ZeRO-3-sharded) pass through local_eval_params and
    evaluate against local-mesh batches — including a batch row count the
    local device count does not divide (zero-pad + trim)."""
    outs = _run_workers(tmp_path, GLOBAL_PARAMS_EVAL_WORKER, nproc,
                        name="gp_worker")
    for pid, out in enumerate(outs):
        assert f"GLOBAL_EVAL_OK {pid}" in out, out
