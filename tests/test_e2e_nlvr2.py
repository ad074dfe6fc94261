"""End-to-end slice: NLVR2 driver on synthetic DBs, few steps on the
8-device CPU mesh (the M1 milestone of SURVEY.md §7)."""

import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips


@pytest.fixture(scope="module")
def nlvr2_env(tmp_path_factory):
    from uniter_tpu.data import write_img_db, write_txt_db

    root = tmp_path_factory.mktemp("nlvr2")
    rng = np.random.RandomState(0)
    img_names = [f"nlvr2_{i:04d}.npz" for i in range(8)]
    img_records = {
        n: dict(
            features=rng.randn(rng.randint(5, 10), 2048).astype(np.float16),
        ) for n in img_names
    }
    for n, rec in img_records.items():
        nbb = rec["features"].shape[0]
        rec["norm_bb"] = rng.rand(nbb, 6).astype(np.float16)
        rec["conf"] = np.linspace(1, 0.3, nbb).astype(np.float16)
        rec["soft_labels"] = rng.rand(nbb, 1601).astype(np.float16)
    img_dir = str(root / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    meta = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 300]}
    recs, t2i = {}, {}
    for i in range(16):
        tid = f"ex_{i}"
        pair = [img_names[(2 * i) % 8], img_names[(2 * i + 1) % 8]]
        recs[tid] = dict(
            input_ids=[int(x) for x in
                       np.random.randint(110, 300, np.random.randint(4, 10))],
            img_fname=pair,
            target=i % 2,
        )
        t2i[tid] = pair
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
    return dict(img_dir=img_dir, txt_dir=txt_dir, cfg=cfg_path,
                out=str(root / "out"))


@pytest.mark.parametrize("model_kind", ["paired-attn", "triplet"])
def test_train_nlvr2_e2e(nlvr2_env, model_kind):
    import train_nlvr2

    argv = [
        "--train_txt_db", nlvr2_env["txt_dir"],
        "--train_img_db", nlvr2_env["img_dir"],
        "--val_txt_db", nlvr2_env["txt_dir"],
        "--val_img_db", nlvr2_env["img_dir"],
        "--model_config", nlvr2_env["cfg"],
        "--model", model_kind,
        "--output_dir", nlvr2_env["out"] + model_kind,
        "--train_batch_size", "256",
        "--val_batch_size", "256",
        "--num_train_steps", "4",
        "--valid_steps", "4",
        "--warmup_steps", "2",
        "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32",
        "--seed", "1",
    ]
    from uniter_tpu.utils.misc import parse_with_config

    opts = parse_with_config(train_nlvr2.get_parser(), argv)
    state = train_nlvr2.main(opts)
    assert int(state.step) == 4
    # checkpoint written + hps provenance
    out = opts.output_dir
    assert os.path.exists(os.path.join(out, "log", "hps.json"))
    ckpts = os.listdir(os.path.join(out, "ckpt"))
    assert len(ckpts) >= 1
