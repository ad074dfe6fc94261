"""Hand-computed retrieval metrics + config-precedence contract."""

import argparse
import json

import numpy as np

from uniter_tpu.utils.itm_eval import itm_eval
from uniter_tpu.utils.misc import parse_with_config


def test_itm_eval_hand_computed():
    # 3 texts, 3 images; t0<->i0, t1<->i1, t2<->i1 (i1 has two captions)
    txt_ids = ["t0", "t1", "t2"]
    img_ids = ["i0", "i1", "i2"]
    txt2img = {"t0": "i0", "t1": "i1", "t2": "i1"}
    img2txts = {"i0": ["t0"], "i1": ["t1", "t2"], "i2": []}
    score = np.array([
        [0.9, 0.1, 0.0],   # t0: gt i0 rank 0
        [0.8, 0.5, 0.1],   # t1: gt i1 rank 1
        [0.1, 0.9, 0.2],   # t2: gt i1 rank 0
    ])
    logs = itm_eval(score, txt_ids, img_ids, txt2img, img2txts)
    # image retrieval: ranks 0,1,0 -> R@1 = 2/3
    assert abs(logs["img_r1"] - 2 / 3) < 1e-9
    assert logs["img_r5"] == 1.0
    # text retrieval per image (i2 skipped, no captions):
    #  i0 column [0.9, 0.8, 0.1]: gt t0 is top -> rank 0
    #  i1 column [0.1, 0.5, 0.9]: gts {t1,t2}; best is t2 at rank 0
    assert logs["txt_r1"] == 1.0
    assert abs(logs["r_mean"]
               - ((1 + 1 + 1) / 3 + (2 / 3 + 1 + 1) / 3) / 2) < 1e-9


def test_parse_with_config_precedence(tmp_path):
    cfg = {"learning_rate": 5e-4, "output_dir": "/from/json", "seed": 9}
    path = tmp_path / "c.json"
    path.write_text(json.dumps(cfg))
    parser = argparse.ArgumentParser()
    parser.add_argument("--config")
    parser.add_argument("--learning_rate", type=float, default=1e-5)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    argv = ["--config", str(path), "--learning_rate", "3e-4"]
    args = parse_with_config(parser, argv)
    assert args.learning_rate == 3e-4      # CLI beats JSON
    assert args.output_dir == "/from/json"  # JSON beats default
    assert args.seed == 9
    assert not hasattr(args, "config")


def test_all_recipe_configs_parse_and_tasks_known():
    """Every configs/*.json parses; pretrain recipes only reference tasks the
    dataset registries know (the reference spells MRC-kl 'mrckl')."""
    import glob
    import json
    import os

    import pretrain
    import pretrain_vcr

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "*.json")))
    assert len(files) >= 23
    for f in files:
        cfg = json.load(open(f))
        name = os.path.basename(f)
        registry = (pretrain_vcr.DATASETS if "vcr" in name
                    else pretrain.DATASET_REGISTRY)
        for key in ("train_datasets", "val_datasets"):
            for dset in cfg.get(key) or []:
                for task in dset["tasks"]:
                    assert task in registry, (name, task)
        if "model_config" in cfg:
            mc = os.path.join(root, os.path.basename(cfg["model_config"]))
            assert os.path.exists(mc), cfg["model_config"]


def test_kernel_policy_resolution_cpu():
    """TPU-trained runs store RESOLVED kernel policies (block_fusion
    "pallas" etc.) in model.json; CPU inference must downgrade them to the
    XLA reference paths instead of crashing in pallas lowering, and "auto"
    resolves per backend (review r2 finding)."""
    from uniter_tpu.training.infer import model_config_from_meta

    cfg = model_config_from_meta(dict(
        vocab_size=32, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        attention_impl="pallas", block_fusion="pallas",
        layer_norm_impl="pallas", ffn_impl="pallas"))
    assert cfg.attention_impl == "xla"
    assert cfg.block_fusion == "none"
    assert cfg.layer_norm_impl == "xla"
    assert cfg.ffn_impl == "xla"
    cfg = model_config_from_meta(dict(
        vocab_size=32, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        attention_impl="auto", block_fusion="auto"))
    assert cfg.attention_impl == "xla" and cfg.block_fusion == "none"


def test_moment_dtype_requires_fused():
    import pytest
    from uniter_tpu.training.driver import optim_kwargs

    class O:
        betas = [0.9, 0.98]
        weight_decay = 0.01
        grad_norm = 2.0
        optim = "adamw"
        fused_adamw = 0
        moment_dtype = "bfloat16"

    with pytest.raises(ValueError):
        optim_kwargs(O())
    O.fused_adamw = 1
    kw = optim_kwargs(O())
    assert kw["fused"] and kw["nu_dtype"] is not None


def test_trainloop_emits_reference_scalars():
    """The log window emits the reference's TB scalar set: loss, grad_norm,
    lr (train_nlvr2.py:183-205), perf/ex_per_s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uniter_tpu.config import tiny_config
    from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
    from uniter_tpu.training.loop import TrainLoop
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule
    from uniter_tpu.training.step import TrainState
    from uniter_tpu.utils import logger as logger_mod

    cfg = tiny_config()
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
    sched = get_lr_schedule(1e-3, 1, 10)
    tx = build_optimizer(params, sched, grad_norm=2.0, weight_decay=0.01)
    state = TrainState.create(params, tx)

    def loss_fn(p, b, r):
        per = model.apply({"params": p}, b, True, deterministic=True)
        return jnp.mean(per), {}

    def loader():
        while True:
            yield host

    seen = []
    orig = logger_mod.TB_LOGGER.add_scalar
    logger_mod.TB_LOGGER.add_scalar = (
        lambda name, val, step=None: seen.append(name))
    try:
        TrainLoop(loss_fn=loss_fn, state=state, train_loader=loader(),
                  mesh=None, num_train_steps=2, valid_steps=0, log_steps=2,
                  seed=0, lr_schedule=sched).run()
    finally:
        logger_mod.TB_LOGGER.add_scalar = orig
    assert {"loss", "grad_norm", "lr", "perf/ex_per_s"} <= set(seen), seen


def test_check_token_range_catches_missing_widening():
    """The TPU embedding gather clips OOB ids silently (XLA), so the driver
    fails fast when sampled records exceed the model's vocab/type tables."""
    import pytest as _pytest

    from uniter_tpu.config import tiny_config
    from uniter_tpu.training.driver import check_token_range

    class Ds:
        def __init__(self, ids, tids=()):
            self.ids, self.tids = ids, tids

        def __len__(self):
            return 4

        def get_record(self, i, rng):
            return {"input_ids": self.ids, "txt_type_ids": list(self.tids)}

    cfg = tiny_config()  # vocab 512, type_vocab 2
    check_token_range(cfg, Ds([1, 5, 511]))  # in range: fine
    with _pytest.raises(ValueError, match="vocab_size"):
        check_token_range(cfg, Ds([1, 512]))
    with _pytest.raises(ValueError, match="type_vocab_size"):
        check_token_range(cfg, Ds([1], tids=[0, 3]))
    # nested per-choice lists (VCR-style records)
    with _pytest.raises(ValueError, match="vocab_size"):
        check_token_range(cfg, Ds([[1, 2], [700]]))


def test_train_ve_alias_wiring():
    # train_ve is deliberately the VQA driver with VE defaults (reference
    # train_ve.py reuses model/ve.py == UniterForVisualQuestionAnswering
    # with 3 answers); guard the alias so a vqa-parser change can't
    # silently break the VE recipe.
    import train_ve
    import train_vqa

    assert train_ve.main is train_vqa.main
    opts = train_ve.get_parser().parse_args([])
    assert opts.num_answer == 3
    assert opts.learning_rate == 8e-5
    assert opts.num_train_steps == 4000
    assert opts.warmup_steps == 400
