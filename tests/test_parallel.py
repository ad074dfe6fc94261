"""Parallelism tests: FSDP + tensor-parallel sharding on the virtual mesh,
and DP-vs-single-device numerical equivalence of the train step."""

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.config import tiny_config
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, make_mesh, param_sharding, param_sharding_tp,
)
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.step import TrainState, make_train_step

IMG_DIM = 32
B, T, R = 16, 8, 8


def make_batch(n_ans=8):
    rng = np.random.RandomState(0)
    return dict(
        input_ids=jnp.asarray(rng.randint(1, 500, (B, T)), jnp.int32),
        position_ids=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)),
        img_feat=jnp.asarray(rng.randn(B, R, IMG_DIM), jnp.float32),
        img_pos_feat=jnp.asarray(rng.rand(B, R, 7), jnp.float32),
        attn_mask=jnp.ones((B, T + R), jnp.int32),
        targets=jnp.asarray(rng.rand(B, n_ans), jnp.float32),
    )


def _setup(n_ans=8):
    cfg = tiny_config()
    model = UniterForVisualQuestionAnswering(
        cfg, img_dim=IMG_DIM, num_answer=n_ans)
    batch = make_batch(n_ans)
    params = model.init({"params": jax.random.PRNGKey(0)}, batch, False)[
        "params"]
    return model, params, batch


def test_tp_sharding_runs():
    """Forward under a 4x2 (data x model) mesh with Megatron TP specs."""
    mesh = make_mesh(MeshConfig(data=4, model=2))
    model, params, batch = _setup()
    specs = param_sharding_tp(params, mesh)
    # qkv kernels column-sharded, output projections row-sharded
    enc = specs["uniter"]["encoder"]["layer"]["bert_layer"]
    assert enc["attention"]["query"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")
    assert enc["attention"]["output_dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert enc["output_dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, "model", None)

    sharded = jax.device_put(params, specs)
    bsh = batch_sharding(mesh)
    sb = jax.device_put(batch, jax.tree.map(lambda _: bsh, batch))
    out = jax.jit(lambda p, b: model.apply({"params": p}, b, False))(
        sharded, sb)
    ref = jax.jit(lambda p, b: model.apply({"params": p}, b, False))(
        params, batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


import pytest


@pytest.mark.parametrize("scale", ["mean", "sum"])
def test_dp_matches_single_device(scale):
    """Train step on the 8-way DP mesh == single-device step. Every driver
    trains with loss_scale="sum" (reference grad-sum semantics,
    utils/distributed.py:16-43 denom=1): the global mean loss is scaled by
    the dp size, so the single-device equivalent is loss_fn * dp."""
    model, params, batch = _setup()

    def run(mesh, scale, factor=1.0):
        def loss_fn(p, b, rng):
            per = model.apply({"params": p}, b, True, deterministic=True)
            return jnp.mean(per) * factor, {}

        tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
        state = TrainState.create(params, tx)
        b = batch
        if mesh is not None:
            bsh = batch_sharding(mesh)
            state = jax.device_put(
                state, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))
            b = jax.device_put(batch, jax.tree.map(lambda _: bsh, batch))
        step = make_train_step(loss_fn, mesh=mesh, loss_scale=scale,
                               donate=False)
        state, m = step(state, b, jax.random.PRNGKey(0))
        return jax.tree.map(np.asarray, state.params)

    mesh = make_mesh(MeshConfig(data=8))
    dp = run(mesh, scale)
    single = run(None, "mean", factor=8.0 if scale == "sum" else 1.0)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), dp, single))
    assert max(diffs) < 1e-5, max(diffs)


def test_fsdp_train_step_matches_replicated():
    """FSDP-sharded params + matching sharded Adam moments produce the same
    update as fully-replicated state (ZeRO-3 is a layout, not a semantics,
    change). Covers the dryrun's placement (mesh.param_sharding_full +
    opt_state_sharding)."""
    from uniter_tpu.parallel.mesh import (
        opt_state_sharding, param_sharding_full, replicate,
    )

    model, params, batch = _setup()

    def loss_fn(p, b, rng):
        per = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per), {}

    def run(fsdp):
        mesh = make_mesh(MeshConfig(data=8))
        mcfg = MeshConfig(data=8, fsdp=fsdp, fsdp_min_size=64)
        tx = build_optimizer(params, 1e-3, grad_norm=2.0, weight_decay=0.01)
        state = TrainState.create(params, tx)
        psh = param_sharding_full(params, mesh, mcfg)
        state = state.replace(
            params=jax.device_put(state.params, psh),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_sharding(state.opt_state, tx, psh, mesh)),
            step=jax.device_put(state.step, replicate(mesh)),
        )
        bsh = batch_sharding(mesh)
        b = jax.device_put(batch, jax.tree.map(lambda _: bsh, batch))
        step = make_train_step(loss_fn, mesh=mesh, loss_scale="sum",
                               donate=False)
        state, m = step(state, b, jax.random.PRNGKey(0))
        return jax.tree.map(np.asarray, state.params)

    fsdp = run(True)
    rep = run(False)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), fsdp, rep))
    assert max(diffs) < 1e-5, max(diffs)
