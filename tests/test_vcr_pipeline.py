"""VCR data + training pipeline tests on synthetic dual-image DBs."""

import json
import os

import numpy as np
import pytest
pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips


@pytest.fixture(scope="module")
def vcr_env(tmp_path_factory):
    from uniter_tpu.data import write_img_db
    from uniter_tpu.data.txt_db import TxtDb

    root = tmp_path_factory.mktemp("vcr")
    rng = np.random.RandomState(0)

    def make_img_db(subdir, names, gt=False):
        recs = {}
        for n in names:
            nbb = rng.randint(4, 8)
            recs[n] = dict(
                features=rng.randn(nbb, 2048).astype(np.float16),
                norm_bb=rng.rand(nbb, 6).astype(np.float16),
                conf=np.linspace(1, 0.3, nbb).astype(np.float16),
                soft_labels=rng.rand(nbb, 1601).astype(np.float16),
            )
        d = str(root / subdir)
        if gt:  # released gt layout: feat_numbb100 store + nbb sidecar
            write_img_db(d, recs, conf_th=-1, num_bb=100)
        else:
            write_img_db(d, recs, conf_th=0.2, max_bb=8, min_bb=3)
        return d

    gt_names = [f"vcr_gt_{i}.npz" for i in range(4)]
    det_names = [f"vcr_det_{i}.npz" for i in range(4)]
    img_gt = make_img_db("img_gt", gt_names, gt=True)
    img_det = make_img_db("img_det", det_names)

    txt_dir = str(root / "txt")
    os.makedirs(txt_dir)
    db = TxtDb(txt_dir, readonly=False)
    id2len_qa, id2len_qar, t2i = {}, {}, {}
    for i in range(8):
        tid = f"vcr_{i}"
        q = [int(x) for x in rng.randint(110, 280, rng.randint(4, 8))]
        rec = dict(
            input_ids=q,
            input_ids_as=[[int(x) for x in rng.randint(110, 280, 4)]
                          for _ in range(4)],
            input_ids_rs=[[int(x) for x in rng.randint(110, 280, 5)]
                          for _ in range(4)],
            qa_target=int(rng.randint(0, 4)),
            qar_target=int(rng.randint(0, 4)),
            img_fname=[gt_names[i % 4], det_names[i % 4]],
        )
        db[tid] = rec
        id2len_qa[tid] = len(q) + 6
        id2len_qar[tid] = len(q) + 12
        t2i[tid] = rec["img_fname"]
    for name, obj in (("id2len_qa", id2len_qa), ("id2len_qar", id2len_qar),
                      ("txt2img", t2i),
                      ("meta", {"CLS": 101, "SEP": 102, "MASK": 103,
                                "v_range": [104, 281]})):
        with open(os.path.join(txt_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f)
    img2txts = {}
    for t, pair in t2i.items():
        for im in pair:
            img2txts.setdefault(im, []).append(t)
    with open(os.path.join(txt_dir, "img2txts.json"), "w") as f:
        json.dump(img2txts, f)

    model_cfg = dict(
        vocab_size=281, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        hidden_act="gelu", initializer_range=0.02,
    )
    cfg_path = str(root / "model.json")
    with open(cfg_path, "w") as f:
        json.dump(model_cfg, f)
    return dict(txt=txt_dir, img_gt=img_gt, img_det=img_det, cfg=cfg_path,
                root=str(root))


def test_vcr_dataset_rows(vcr_env):
    from uniter_tpu.data.vcr import VcrDataset, VcrEvalDataset, VcrTxtTokDb
    from uniter_tpu.data.img_db import DetectFeatDb

    txt = VcrTxtTokDb(vcr_env["txt"], max_txt_len=120, task="qa")
    gt = DetectFeatDb(vcr_env["img_gt"], conf_th=-1, max_bb=8, min_bb=3,
                      num_bb=100)
    det = DetectFeatDb(vcr_env["img_det"], conf_th=0.2, max_bb=8, min_bb=3)
    ds = VcrDataset(txt, img_db_gt=gt, img_db=det)
    rec = ds.get_record(0, np.random.RandomState(0))
    assert len(rec["rows"]) == 4
    assert sum(r["target"] for r in rec["rows"]) == 1
    # dual-db features concatenated
    nbb = gt.name2nbb["vcr_gt_0.npz"] + det.name2nbb["vcr_det_0.npz"]
    assert rec["rows"][0]["img_feat"].shape[0] == nbb
    # type ids: question 0, answer 2
    types = rec["rows"][0]["txt_type_ids"]
    assert set(np.unique(types)) <= {0, 2}

    ev = VcrEvalDataset(
        "val", VcrTxtTokDb(vcr_env["txt"], max_txt_len=-1, task="qa,qar"),
        img_db_gt=gt, img_db=det)
    rec = ev.get_record(0, None)
    assert len(rec["rows"]) == 8  # 4 qa + 4 val qar (gold answer)


def test_pretrain_vcr_datasets(vcr_env):
    from uniter_tpu.data.pretrain_vcr import (
        MlmDatasetForVCR, MrcDatasetForVCR, MrfrDatasetForVCR,
    )
    from uniter_tpu.data.vcr import VcrTxtTokDb
    from uniter_tpu.data.img_db import DetectFeatDb

    txt = VcrTxtTokDb(vcr_env["txt"], max_txt_len=120, task="qar")
    gt = DetectFeatDb(vcr_env["img_gt"], conf_th=-1, max_bb=8, min_bb=3,
                      num_bb=100)
    det = DetectFeatDb(vcr_env["img_det"], conf_th=0.2, max_bb=8, min_bb=3)
    rng = np.random.RandomState(1)

    mlm = MlmDatasetForVCR(txt, img_db_gt=gt, img_db=det)
    rec = mlm.get_record(0, rng)
    assert (rec["txt_labels"] != -1).sum() >= 1
    assert set(np.unique(rec["txt_type_ids"])) <= {0, 2, 3}
    b = MlmDatasetForVCR.collate([rec], 32, 16, 4)
    assert b["mlm_pos"].shape == b["mlm_tgt"].shape

    mrfr = MrfrDatasetForVCR(0.3, txt, img_db_gt=gt, img_db=det)
    rec = mrfr.get_record(0, rng)
    b = MrfrDatasetForVCR.collate([rec], 32, 16, 4)
    assert b["feat_targets"].shape[2] == 2048

    mrc = MrcDatasetForVCR(0.3, txt, img_db_gt=gt, img_db=det)
    rec = mrc.get_record(0, rng)
    b = MrcDatasetForVCR.collate([rec], 32, 16, 4)
    assert b["label_targets"].shape[2] == 1601


def test_pretrain_vcr_e2e(vcr_env):
    import pretrain_vcr
    from uniter_tpu.utils.misc import parse_with_config

    argv = [
        "--model_config", vcr_env["cfg"],
        "--output_dir", vcr_env["root"] + "/ptvcr_out",
        "--train_img_db", vcr_env["img_det"],
        "--train_img_db_gt", vcr_env["img_gt"],
        "--train_batch_size", "256", "--num_train_steps", "3",
        "--valid_steps", "3", "--warmup_steps", "1",
        "--max_bb", "8", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    opts = parse_with_config(pretrain_vcr.get_parser(), argv)
    opts.train_datasets = [
        {"name": "vcr", "db": vcr_env["txt"], "vcr_task": "qar",
         "tasks": ["mlm", "mrfr", "mrc-kl"], "mix_ratio": [2, 1, 1]},
    ]
    opts.val_datasets = [
        {"name": "vcr", "db": vcr_env["txt"], "vcr_task": "qar",
         "tasks": ["mlm", "mrc-kl"], "mix_ratio": [1, 1]},
    ]
    state = pretrain_vcr.main(opts)
    assert int(state.step) == 3
    scalars = open(vcr_env["root"] + "/ptvcr_out/log/scalars.jsonl").read()
    assert "valid/mlm_vcr_acc" in scalars, scalars[-500:]
