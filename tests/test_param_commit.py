"""Scoring paths must commit checkpoint-loaded HOST (numpy) params to
device ONCE — never re-upload them per tile/minibatch jit call.

A per-call implicit re-upload is invisible on a local backend but
catastrophic through a slow host->device link: the 5k x 1k full-scale
retrieval eval (scripts/bench_itm_fullscale.py) staged ~130GB of param
re-transfers through the TPU relay client and OOM'd the host before the
commit-once fix. The transfer guard turns any IMPLICIT host->device
transfer inside the scoring loops into an error (explicit
jax.device_put stays allowed), so these tests fail if a scoring path
regresses to passing host arrays into a jit.

Reference comparison: in torch the modules own their CUDA weights so
this cannot happen (reference utils/itm_eval.py:93-114); in JAX params
travel as call arguments, making placement the caller's contract.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _corpus(n_txt=10, n_img=6, t=12, r=5, d=32):
    rng = np.random.RandomState(0)
    toks = [rng.randint(5, 200, rng.randint(3, t - 2))
            for _ in range(n_txt)]
    feats = {f"i{j}": (rng.randn(r, d).astype(np.float32),
                       rng.rand(r, 7).astype(np.float32), r)
             for j in range(n_img)}
    return SimpleNamespace(
        ids=[f"t{i}" for i in range(n_txt)],
        all_img_ids=list(feats),
        txt_db=SimpleNamespace(combine_inputs=lambda ids: np.concatenate(
            [[101], np.asarray(ids, np.int64), [102]])),
        img_db=SimpleNamespace(get_img_feat=lambda name: feats[name]),
        example=lambda i: {"input_ids": toks[i]},
    ), d


def _retrieval_model(d):
    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.itm import UniterForImageTextRetrieval

    cfg = tiny_config(attention_impl="xla", block_fusion="none")
    model = UniterForImageTextRetrieval(cfg, img_dim=d)
    init_batch = dict(
        input_ids=jnp.zeros((2, 12), jnp.int32),
        position_ids=jnp.zeros((2, 12), jnp.int32),
        img_feat=jnp.zeros((2, 5, d), jnp.float32),
        img_pos_feat=jnp.zeros((2, 5, 7), jnp.float32),
        attn_mask=jnp.ones((2, 17), jnp.int32))
    dev_params = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                            False)["params"]
    # the shape checkpoint loads arrive in: a pure-numpy host tree
    host_params = jax.tree.map(np.asarray, dev_params)
    return model, dev_params, host_params


@pytest.mark.parametrize("use_mesh", [False, True])
def test_fast_score_matrix_no_implicit_uploads(use_mesh):
    import jax

    from uniter_tpu.utils.itm_fast import fast_score_matrix

    ds, d = _corpus()
    model, dev_params, host_params = _retrieval_model(d)
    kw = dict(txt_tile=4, img_tile=4, dtype="float32")
    if use_mesh:
        from uniter_tpu.parallel.mesh import MeshConfig, make_mesh

        kw["mesh"] = make_mesh(MeshConfig(data=8))
    ref, _ = fast_score_matrix(model, dev_params, ds, 12, 5, **kw)
    with jax.transfer_guard_host_to_device("disallow"):
        mat, _ = fast_score_matrix(model, host_params, ds, 12, 5, **kw)
    np.testing.assert_allclose(mat, ref, rtol=1e-5, atol=1e-5)


def test_fast_windowed_scores_no_implicit_uploads():
    import jax

    from uniter_tpu.utils.itm_fast import fast_windowed_scores

    ds, d = _corpus()
    # windowed validation needs the HN val-window attributes
    ds.bs = 4
    ds.txt2img = {t: ds.all_img_ids[i % len(ds.all_img_ids)]
                  for i, t in enumerate(ds.ids)}
    ds._img_pos = {im: j for j, im in enumerate(ds.all_img_ids)}
    model, dev_params, host_params = _retrieval_model(d)
    ref, _ = fast_windowed_scores(model, dev_params, ds, 12, 5,
                                  txt_chunk=4, dtype="float32")
    with jax.transfer_guard_host_to_device("disallow"):
        mat, _ = fast_windowed_scores(model, host_params, ds, 12, 5,
                                      txt_chunk=4, dtype="float32")
    np.testing.assert_allclose(mat, ref, rtol=1e-5, atol=1e-5)


def test_inference_score_matrix_commits_params():
    """The batched (reference-style) scorer also commits host params once;
    per-batch DATA uploads go through eval_put (explicit) so the guard
    isolates exactly the param-placement contract."""
    import jax

    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.utils.itm_eval import inference_score_matrix

    class FakeDs:
        ids = [f"t{i}" for i in range(4)]

        def __len__(self):
            return len(self.ids)

        def get_batches(self, i, t, r):
            return [dict(x=np.full((3, 2), i, np.float32),
                         ex_weight=np.ones((3,), np.float32))]

    predict = jax.jit(lambda p, b: b["x"][:, :1] * p["w"])
    params = {"w": np.asarray([2.0], np.float32)}  # host tree
    mesh = make_mesh(MeshConfig(data=8))
    with jax.transfer_guard_host_to_device("disallow"):
        mat, ids = inference_score_matrix(
            predict, FakeDs(), params, 2, 2, mesh=mesh)
    np.testing.assert_allclose(mat, 2.0 * np.arange(4)[:, None]
                               * np.ones((1, 3)))
    assert ids == FakeDs.ids
