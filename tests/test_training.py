"""Training substrate tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.config import tiny_config
from uniter_tpu.models.nlvr2 import UniterForNlvr2Triplet
from uniter_tpu.models.losses import cross_entropy
from uniter_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, make_mesh, param_sharding,
)
from uniter_tpu.training.optim import build_optimizer, decay_mask
from uniter_tpu.training.sched import get_lr_schedule
from uniter_tpu.training.step import TrainState, make_train_step

IMG_DIM = 32
B, T, R = 16, 8, 4


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(rng.randn(B, R, IMG_DIM), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
        targets=jnp.asarray(rng.randint(0, 2, (B,)), jnp.int32),
    )


def test_lr_schedule_matches_reference():
    sched = get_lr_schedule(3e-5, warmup_steps=800, num_train_steps=8000)

    def ref(global_step):
        # reference optim/sched.py:17-21,40-46
        if global_step < 800:
            lr = 3e-5 * global_step / 800
        else:
            lr = 3e-5 * max(0, (8000 - global_step) / (8000 - 800))
        return max(lr, 1e-8)

    for count in [0, 1, 100, 799, 800, 4000, 7999, 8000]:
        np.testing.assert_allclose(
            float(sched(count)), ref(count + 1), rtol=1e-6,
            err_msg=f"count={count}")


def test_decay_mask():
    params = {
        "uniter": {
            "embeddings": {"word_embeddings": {"embedding": jnp.ones((4, 4))},
                           "LayerNorm": {"weight": jnp.ones(4),
                                         "bias": jnp.zeros(4)}},
            "encoder": {"layer": {"bert_layer": {"attention": {
                "query": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}
            }}}},
        },
        "vqa_ln": {"weight": jnp.ones(4), "bias": jnp.zeros(4)},
    }
    mask = decay_mask(params)
    assert mask["uniter"]["embeddings"]["word_embeddings"]["embedding"]
    assert not mask["uniter"]["embeddings"]["LayerNorm"]["weight"]
    assert not mask["uniter"]["embeddings"]["LayerNorm"]["bias"]
    q = mask["uniter"]["encoder"]["layer"]["bert_layer"]["attention"]["query"]
    assert q["kernel"] and not q["bias"]
    assert not mask["vqa_ln"]["weight"]


def test_train_step_dp_mesh_loss_decreases():
    mesh = make_mesh(MeshConfig(data=8))
    cfg = tiny_config(type_vocab_size=3)
    model = UniterForNlvr2Triplet(cfg, img_dim=IMG_DIM)
    batch = make_batch()
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]

    tx = build_optimizer(
        params, get_lr_schedule(1e-3, 10, 1000), grad_norm=2.0,
        weight_decay=0.01,
    )
    state = TrainState.create(params, tx)
    state = jax.device_put(
        state, jax.tree.map(
            lambda _: jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()), state,
            is_leaf=lambda x: not isinstance(x, (dict, tuple, list)))
    )

    def loss_fn(params, batch, rng):
        per_ex = model.apply(
            {"params": params}, batch, True, deterministic=False,
            rngs={"dropout": rng})
        return jnp.mean(per_ex), {}

    step = make_train_step(loss_fn, mesh=mesh, loss_scale="sum")
    bsh = batch_sharding(mesh)
    batch = jax.device_put(batch, jax.tree.map(lambda _: bsh, batch))

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_grad_accumulation():
    cfg = tiny_config(type_vocab_size=3)
    model = UniterForNlvr2Triplet(cfg, img_dim=IMG_DIM)
    batch = make_batch()
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    tx = build_optimizer(params, 1e-3, grad_norm=-1, weight_decay=0.0)

    def loss_fn(params, batch, rng):
        per_ex = model.apply({"params": params}, batch, True,
                             deterministic=True)
        return jnp.mean(per_ex), {}

    # accum over 2 identical micro-batches == 2x the single-batch gradient;
    # compare resulting params after 1 step with/without accumulation on a
    # doubled loss.
    state_a = TrainState.create(params, tx)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
    step_a = make_train_step(loss_fn, accum_steps=2, donate=False)
    state_a, m_a = step_a(state_a, stacked, jax.random.PRNGKey(2))

    def loss2(params, batch, rng):
        l, m = loss_fn(params, batch, rng)
        return 2.0 * l, m

    state_b = TrainState.create(params, tx)
    step_b = make_train_step(loss2, donate=False)
    state_b, m_b = step_b(state_b, batch, jax.random.PRNGKey(2))

    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state_a.params, state_b.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6


import pytest


@pytest.mark.parametrize("fused", [False, True])
def test_resume_matches_continuous(tmp_path, fused):
    """save at step 2, restore, run to 4 == run 4 straight (exact resume,
    which the reference lacked — utils/save.py:70-73 TODO). Covers both the
    optax chain and the fused AdamW state (bf16 moments) through Orbax."""
    from uniter_tpu.utils.save import TrainStateSaver

    cfg = tiny_config(type_vocab_size=3)
    model = UniterForNlvr2Triplet(cfg, img_dim=IMG_DIM)
    batch = make_batch()
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]

    def loss_fn(p, b, rng):
        per_ex = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per_ex), {}

    def fresh_state():
        tx = build_optimizer(params, get_lr_schedule(1e-3, 2, 100),
                             grad_norm=2.0, weight_decay=0.01, fused=fused,
                             mu_dtype=jnp.bfloat16 if fused else None,
                             nu_dtype=jnp.bfloat16 if fused else None)
        return TrainState.create(params, tx)

    step = make_train_step(loss_fn, donate=False)

    # continuous: 4 steps
    s_cont = fresh_state()
    for i in range(4):
        s_cont, _ = step(s_cont, batch, jax.random.PRNGKey(i))

    # interrupted: 2 steps -> save -> restore -> 2 more
    saver = TrainStateSaver(str(tmp_path))
    s_a = fresh_state()
    for i in range(2):
        s_a, _ = step(s_a, batch, jax.random.PRNGKey(i))
    saver.save(2, s_a)
    s_b = saver.restore(fresh_state())
    assert int(s_b.step) == 2
    for i in range(2, 4):
        s_b, _ = step(s_b, batch, jax.random.PRNGKey(i))

    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s_cont.params, s_b.params))
    assert max(diffs) == 0.0, max(diffs)


def test_bucket_spec_covers_long_text_and_dual_imgdb():
    """VCR-class shapes must not be silently truncated by the bucket grid."""
    from types import SimpleNamespace

    from uniter_tpu.training.driver import bucket_spec

    class FakeDs:
        rows_per_example = 4

        def __len__(self):
            return 3

        def size_of(self, i):
            return 226, 16 + i  # gt+det concat regions up to 18

    class FakeMesh:
        shape = {"data": 1}

    opts = SimpleNamespace(max_txt_len=220, max_bb=10,
                           train_batch_size=4000)
    spec = bucket_spec(opts, FakeMesh(), FakeDs())
    assert spec.txt_bucket(226) >= 226
    assert spec.img_bucket(18) >= 18


def test_transfer_dtype_bf16_is_exact():
    """Casting img features to bf16 on the host before device_put produces
    bit-identical training to fp32 transfer (the model casts them to its
    compute dtype on device anyway, loop.TRANSFER_CAST_KEYS)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.training.loop import TrainLoop, place_state
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState

    cfg = tiny_config(dtype="bfloat16")
    model = UniterForVisualQuestionAnswering(cfg, img_dim=32, num_answer=5)
    rng = np.random.RandomState(0)
    host = dict(
        input_ids=rng.randint(1, 500, (8, 8)).astype(np.int32),
        position_ids=np.broadcast_to(
            np.arange(8, dtype=np.int32), (8, 8)).copy(),
        img_feat=rng.randn(8, 8, 32).astype(np.float32),
        img_pos_feat=rng.rand(8, 8, 7).astype(np.float32),
        attn_mask=np.ones((8, 16), np.int32),
        targets=rng.rand(8, 5).astype(np.float32),
    )
    jb = {k: jnp.asarray(v) for k, v in host.items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per), {}

    def run(transfer_dtype):
        mesh = make_mesh(MeshConfig(data=8))
        # fresh buffers per run — the loop's step donates its state
        p0 = jax.tree.map(jnp.array, params)
        tx = build_optimizer(p0, 1e-3, grad_norm=2.0, weight_decay=0.01)
        state = place_state(TrainState.create(p0, tx), mesh)

        def loader():
            while True:
                yield host

        loop = TrainLoop(loss_fn=loss_fn, state=state, train_loader=loader(),
                         mesh=mesh, num_train_steps=2, valid_steps=0,
                         log_steps=10, seed=3, loss_scale="sum",
                         transfer_dtype=transfer_dtype)
        return jax.tree.map(np.asarray, loop.run().params)

    a = run(None)
    b = run(jnp.bfloat16)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.max(np.abs(x - y))), a, b))
    assert max(diffs) == 0.0, max(diffs)


def test_steps_per_call_matches_single_step():
    """k optimizer steps per jit call == k single-step calls, exactly: the
    per-step dropout key is fold_in(base, state.step) in both, so the
    trajectories are bit-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.training.loop import TrainLoop, place_state
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState

    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(cfg, img_dim=32, num_answer=5)
    rng = np.random.RandomState(1)
    hosts = []
    for _ in range(4):  # distinct batches, same shape
        hosts.append(dict(
            input_ids=rng.randint(1, 500, (8, 8)).astype(np.int32),
            position_ids=np.broadcast_to(
                np.arange(8, dtype=np.int32), (8, 8)).copy(),
            img_feat=rng.randn(8, 8, 32).astype(np.float32),
            img_pos_feat=rng.rand(8, 8, 7).astype(np.float32),
            attn_mask=np.ones((8, 16), np.int32),
            targets=rng.rand(8, 5).astype(np.float32),
        ))
    jb = {k: jnp.asarray(v) for k, v in hosts[0].items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=False,
                          rngs={"dropout": r})
        return jnp.mean(per), {}

    def run(k):
        mesh = make_mesh(MeshConfig(data=8))
        p0 = jax.tree.map(jnp.array, params)
        tx = build_optimizer(p0, 1e-3, grad_norm=2.0, weight_decay=0.01)
        state = place_state(TrainState.create(p0, tx), mesh)

        def loader():
            while True:
                yield from hosts

        loop = TrainLoop(loss_fn=loss_fn, state=state, train_loader=loader(),
                         mesh=mesh, num_train_steps=4, valid_steps=0,
                         log_steps=4, seed=5, loss_scale="sum",
                         steps_per_call=k)
        st = loop.run()
        assert int(st.step) == 4
        return jax.tree.map(np.asarray, st.params)

    a = run(1)
    b = run(2)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda x, y: float(np.max(np.abs(x - y))), a, b))
    assert max(diffs) == 0.0, max(diffs)


def test_fused_adamw_matches_optax_chain():
    """fused_adamw (one-pass TPU optimizer) is leaf-exact vs the optax
    chain clip->adamw->masked(lr_mul) at fp32 moments."""
    rng = np.random.RandomState(3)
    params = {
        "uniter": {
            "q": {"kernel": jnp.asarray(rng.randn(8, 8), jnp.float32),
                  "bias": jnp.asarray(rng.randn(8), jnp.float32)},
            "LayerNorm": {"weight": jnp.ones(8), "bias": jnp.zeros(8)},
        },
        "vqa_output": {"kernel": jnp.asarray(rng.randn(8, 4), jnp.float32)},
    }
    sched = get_lr_schedule(1e-3, 3, 20)
    kw = dict(betas=(0.9, 0.98), weight_decay=0.01, grad_norm=2.0,
              lr_mul=10.0, lr_mul_paths=("vqa_output",))
    tx_ref = build_optimizer(params, sched, **kw)
    tx_fused = build_optimizer(params, sched, fused=True, **kw)
    s_ref, s_fused = tx_ref.init(params), tx_fused.init(params)
    p_ref = jax.tree.map(jnp.array, params)
    p_fused = jax.tree.map(jnp.array, params)
    import optax

    for i in range(6):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.randn(*p.shape) * (40.0 if i % 3 == 0 else 0.3),
                jnp.float32),
            params)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fused, s_fused = tx_fused.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u_fused)
        np.testing.assert_allclose(
            float(s_fused.gnorm), float(optax.global_norm(grads)), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fused_adamw_bf16_moments_track_fp32():
    """bf16 moment storage stays within bf16 rounding of the fp32 run."""
    params = {"w": jnp.ones((64, 64), jnp.float32)}
    tx32 = build_optimizer(params, 1e-3, fused=True, grad_norm=-1)
    tx16 = build_optimizer(params, 1e-3, fused=True, grad_norm=-1,
                           mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.mu["w"].dtype == jnp.bfloat16
    assert s16.nu["w"].dtype == jnp.bfloat16
    p32 = dict(params)
    p16 = dict(params)
    import optax

    rng = np.random.RandomState(0)
    for _ in range(10):
        g = {"w": jnp.asarray(rng.randn(64, 64), jnp.float32)}
        u, s32 = tx32.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u)
        u, s16 = tx16.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u)
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=2e-2, atol=2e-5)


def test_fused_adamw_master_mode_tracks_fp32_exactly():
    """bf16 param storage + fp32 master (--param_dtype bfloat16): with
    identical grads the MASTER trajectory is bit-identical to the fp32
    fused run (the update math never reads the bf16 copies), and the bf16
    params are exactly the master's bf16 cast after every step."""
    from uniter_tpu.training.step import TrainState

    rng = np.random.RandomState(7)
    base = {"w": jnp.asarray(rng.randn(64, 64), jnp.float32),
            "b": jnp.asarray(rng.randn(64), jnp.float32)}
    p32 = dict(base)
    kw = dict(betas=(0.9, 0.98), weight_decay=0.01, grad_norm=2.0)
    tx32 = build_optimizer(p32, 1e-3, fused=True, **kw)
    txm = build_optimizer(base, 1e-3, fused=True, master=True, **kw)
    s32 = TrainState.create(p32, tx32)
    # the driver flow (make_train_state): init from fp32 (exact masters),
    # THEN cast the stored params down; 'b' is small and stays fp32
    sm = TrainState.create(dict(base), txm)
    sm = sm.replace(params={"w": base["w"].astype(jnp.bfloat16),
                            "b": base["b"]})
    assert sm.opt_state.master["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(sm.opt_state.master["w"]),
                                  np.asarray(base["w"]))
    for _ in range(5):
        g = {"w": jnp.asarray(rng.randn(64, 64), jnp.float32),
             "b": jnp.asarray(rng.randn(64), jnp.float32)}
        s32 = s32.apply_gradients(g)
        sm = sm.apply_gradients(g)
        # master == fp32 params, exactly
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(sm.opt_state.master[k]),
                np.asarray(s32.params[k]), err_msg=k)
        # stored params are the master's cast
        assert sm.params["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(sm.params["w"]),
            np.asarray(sm.opt_state.master["w"].astype(jnp.bfloat16)))
        assert sm.params["b"].dtype == jnp.float32


@pytest.mark.e2e  # spawns a full training subprocess
def test_sigterm_preemption_saves_and_resumes(tmp_path):
    """SIGTERM mid-run (the TPU spot/maintenance reclaim signal) -> the loop
    stops at the next step boundary with a resumable checkpoint, restores
    the previous signal handler, and a rerun reaches num_train_steps with a
    trajectory identical to an uninterrupted run. The reference dies
    mid-step with no optimizer-state save (utils/save.py:70-73 TODO)."""
    import os
    import signal

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.training.loop import TrainLoop, place_state
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState
    from uniter_tpu.utils.save import TrainStateSaver

    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(cfg, img_dim=32, num_answer=5)
    rng = np.random.RandomState(7)
    host = dict(
        input_ids=rng.randint(1, 500, (8, 8)).astype(np.int32),
        position_ids=np.broadcast_to(
            np.arange(8, dtype=np.int32), (8, 8)).copy(),
        img_feat=rng.randn(8, 8, 32).astype(np.float32),
        img_pos_feat=rng.rand(8, 8, 7).astype(np.float32),
        attn_mask=np.ones((8, 16), np.int32),
        targets=rng.rand(8, 5).astype(np.float32),
    )
    jb = {k: jnp.asarray(v) for k, v in host.items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per), {}

    mesh = make_mesh(MeshConfig(data=8))

    def fresh_state():
        p0 = jax.tree.map(jnp.array, params)
        tx = build_optimizer(p0, 1e-3, grad_norm=2.0, weight_decay=0.01)
        return place_state(TrainState.create(p0, tx), mesh)

    def plain_loader():
        while True:
            yield host

    def make_loop(state, loader, saver=None):
        # prefetch=0: the loader runs inline on the main thread, so the
        # in-loader kill below is delivered at a deterministic step
        return TrainLoop(loss_fn=loss_fn, state=state, train_loader=loader,
                         mesh=mesh, num_train_steps=6, valid_steps=0,
                         log_steps=100, seed=3, loss_scale="sum", prefetch=0,
                         saver=saver)

    # oracle: 6 steps uninterrupted
    oracle = make_loop(fresh_state(), plain_loader()).run()
    assert int(oracle.step) == 6

    # interrupted: SIGTERM while fetching the 3rd batch
    def sig_loader():
        i = 0
        while True:
            i += 1
            if i == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield host

    prev_handler = signal.getsignal(signal.SIGTERM)
    saver = TrainStateSaver(str(tmp_path))
    loop = make_loop(fresh_state(), sig_loader(), saver=saver)
    state = loop.run()
    assert loop.preempted
    stopped = int(state.step)
    assert 0 < stopped < 6
    assert saver.latest_step() == stopped
    assert signal.getsignal(signal.SIGTERM) is prev_handler

    # resume to completion and match the oracle exactly
    resumed = saver.restore(fresh_state())
    assert int(resumed.step) == stopped
    loop2 = make_loop(resumed, plain_loader(), saver=saver)
    final = loop2.run()
    assert not loop2.preempted and int(final.step) == 6
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        oracle.params, final.params))
    assert max(diffs) == 0.0, max(diffs)


def test_preemption_guard_poll_semantics():
    """Local-flag latch: no stop before the signal, stop on every poll
    after; uninstall restores the previous handler."""
    import signal

    from uniter_tpu.training.preempt import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.poll()
        g._handler(signal.SIGTERM, None)  # simulate delivery
        assert g.poll() and g.poll()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_async_save_is_durable_before_read(tmp_path):
    """save(block=False) returns immediately but restore()/latest_* wait
    for the pending write — async checkpoints are never read half-done."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState
    from uniter_tpu.utils.save import TrainStateSaver, load_params_msgpack

    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(cfg, img_dim=32, num_answer=5)
    rng = np.random.RandomState(0)
    jb = dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (4, 8)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (4, 8)),
        img_feat=jnp.asarray(rng.randn(4, 4, 32), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(4, 4, 7), jnp.float32),
        attn_mask=jnp.ones((4, 12), jnp.int32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]
    tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
    state = TrainState.create(params, tx)

    saver = TrainStateSaver(str(tmp_path))
    saver.save(3, state, block=False)
    assert saver.latest_step() == 3  # waits for the pending save
    restored = saver.restore(state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params)))
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        restored.params, state.params))
    assert max(diffs) == 0.0
    exported = load_params_msgpack(saver.latest_params_file(), params)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        exported, state.params))
    assert max(diffs) == 0.0


def test_resume_fast_forwards_data_stream(tmp_path):
    """Resume must continue on the batches the interrupted run never saw —
    not silently replay from batch 0. With a varying-batch loader, the
    resumed trajectory equals the uninterrupted one only if TrainLoop
    fast-forwards the loader to state.step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training.loop import TrainLoop
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.step import TrainState
    from uniter_tpu.utils.save import TrainStateSaver

    T, R = 8, 8

    class VaryDs:
        rows_per_example = 1

        def __len__(self):
            return 64

        def size_of(self, i):
            return (T - 2, R - 2)

        def get_record(self, i, rng):
            r = np.random.RandomState(i * 31 + 7)
            return dict(
                input_ids=r.randint(1, 500, (T,)).astype(np.int32),
                img_feat=r.randn(R, 32).astype(np.float32),
                img_pos_feat=r.rand(R, 7).astype(np.float32),
                target=r.rand(5).astype(np.float32),
            )

        @staticmethod
        def collate(recs, t_b, r_b, bs):
            out = dict(
                input_ids=np.zeros((bs, T), np.int32),
                position_ids=np.broadcast_to(
                    np.arange(T, dtype=np.int32), (bs, T)).copy(),
                img_feat=np.zeros((bs, R, 32), np.float32),
                img_pos_feat=np.zeros((bs, R, 7), np.float32),
                attn_mask=np.ones((bs, T + R), np.int32),
                targets=np.zeros((bs, 5), np.float32),
            )
            for j, r in enumerate(recs):
                out["input_ids"][j] = r["input_ids"]
                out["img_feat"][j] = r["img_feat"]
                out["img_pos_feat"][j] = r["img_pos_feat"]
                out["targets"][j] = r["target"]
            return out

    spec = BucketSpec(txt_buckets=(T,), img_buckets=(R,),
                      token_budget=8 * (T + R), size_mul=8)

    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(cfg, img_dim=32, num_answer=5)
    jb = {k: jnp.asarray(v)
          for k, v in VaryDs.collate([VaryDs().get_record(0, None)],
                                     T, R, 8).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb, False)[
        "params"]

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per), {}

    def fresh_state():
        p0 = jax.tree.map(jnp.array, params)
        tx = build_optimizer(p0, 1e-3, grad_norm=2.0, weight_decay=0.01)
        return TrainState.create(p0, tx)

    def make_loop(state, n, saver=None):
        loader = BucketLoader(VaryDs(), spec, seed=13, loop=True)
        return TrainLoop(loss_fn=loss_fn, state=state, train_loader=loader,
                         mesh=None, num_train_steps=n, valid_steps=0,
                         log_steps=100, seed=3, loss_scale="sum",
                         saver=saver)

    cont = make_loop(fresh_state(), 4).run()

    saver = TrainStateSaver(str(tmp_path))
    make_loop(fresh_state(), 2, saver=saver).run()
    resumed = saver.restore(fresh_state())
    assert int(resumed.step) == 2
    final = make_loop(resumed, 4).run()

    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        cont.params, final.params))
    assert max(diffs) == 0.0, max(diffs)
