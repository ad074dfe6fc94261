"""Inference drivers + prepro + official eval script, end to end:
prepro (local vocab) -> txt_db -> train 2 steps -> inf_nlvr2 -> eval_nlvr2.
"""

import json
import os
import sys

import numpy as np
import pytest
pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    from uniter_tpu.data import write_img_db

    root = tmp_path_factory.mktemp("pipe")
    rng = np.random.RandomState(0)

    # 1) vocab + annotations
    words = ["the", "left", "image", "contains", "dog", "cat", "two",
             "one", "red", "blue"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "!"] + words
    vocab_path = str(root / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab))

    ann_path = str(root / "dev.json")
    examples = []
    for i in range(8):
        for k in range(2):  # two pairs per sentence (consistency groups)
            examples.append({
                "identifier": f"dev-{i:04d}-{k}-0.png",
                "sentence": " ".join(
                    rng.choice(words, rng.randint(3, 7)).tolist()),
                "label": "True" if (i + k) % 2 == 0 else "False",
            })
    with open(ann_path, "w") as f:
        f.write("\n".join(json.dumps(e) for e in examples))

    # 2) prepro -> txt_db
    import prepro

    out_db = str(root / "txt_db")

    class Opts:
        annotation = ann_path
        output = out_db
        task = "nlvr"
        split = "dev"
        instances = None
        iid_to_ann_ids = None
        toker = vocab_path
        store = "lmdb"  # exercise the native engine in the pipeline

    prepro.main(Opts())

    # 3) img_db covering the referenced images
    img_names = set()
    with open(os.path.join(out_db, "txt2img.json")) as f:
        for pair in json.load(f).values():
            img_names.update(pair)
    img_records = {}
    for n in sorted(img_names):
        nbb = rng.randint(4, 9)
        img_records[n] = dict(
            features=rng.randn(nbb, 2048).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1, 0.3, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, 1601).astype(np.float16),
        )
    img_dir = str(root / "img_db")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    model_cfg = dict(
        vocab_size=len(vocab), hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        hidden_act="gelu", initializer_range=0.02,
    )
    cfg_path = str(root / "model.json")
    with open(cfg_path, "w") as f:
        json.dump(model_cfg, f)
    return dict(txt=out_db, img=img_dir, cfg=cfg_path, ann=ann_path,
                root=str(root))


def test_prepro_made_valid_db(pipeline):
    from uniter_tpu.data.txt_db import TxtTokDb

    db = TxtTokDb(pipeline["txt"], max_txt_len=60)
    assert len(db.id2len) == 16
    some_id = next(iter(db.id2len))
    rec = db[some_id]
    assert isinstance(rec["input_ids"], list) and len(rec["input_ids"]) > 0
    assert len(rec["img_fname"]) == 2
    assert db.cls_ == 2 and db.sep == 3 and db.mask == 4


def test_train_infer_eval_roundtrip(pipeline):
    import train_nlvr2
    import inf_nlvr2
    from scripts.eval_nlvr2 import main as eval_main
    from uniter_tpu.utils.misc import parse_with_config

    out_dir = pipeline["root"] + "/train_out"
    argv = [
        "--train_txt_db", pipeline["txt"], "--train_img_db", pipeline["img"],
        "--val_txt_db", pipeline["txt"], "--val_img_db", pipeline["img"],
        "--model_config", pipeline["cfg"], "--model", "paired",
        "--output_dir", out_dir,
        "--train_batch_size", "256", "--val_batch_size", "256",
        "--num_train_steps", "2", "--valid_steps", "2",
        "--warmup_steps", "1", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "3",
    ]
    opts = parse_with_config(train_nlvr2.get_parser(), argv)
    train_nlvr2.main(opts)

    inf_out = pipeline["root"] + "/inf_out"
    iargv = inf_nlvr2.get_parser().parse_args([
        "--txt_db", pipeline["txt"], "--img_db", pipeline["img"],
        "--train_dir", out_dir, "--output_dir", inf_out,
        "--batch_size", "256",
    ])
    csv_path = inf_nlvr2.main(iargv)
    assert os.path.exists(csv_path)
    with open(csv_path) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == 16

    acc, cons = eval_main(csv_path, pipeline["ann"])
    assert 0.0 <= acc <= 1.0 and 0.0 <= cons <= 1.0
