"""L0 closure: prepro recipes for VQA / VE / ITM / VCR produce txt_dbs that
the task datasets load and collate (the reference shipped these DBs
pre-built; reference prepro.py only covered NLVR2 + RE)."""

import json
import os

import numpy as np
import pytest

import prepro


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue",
             "a", "on", "true", "person", "wearing", "hat"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "!"] + words
    p = tmp_path_factory.mktemp("voc") / "vocab.txt"
    p.write_text("\n".join(vocab))
    return str(p)


def _opts(**kw):
    base = dict(task="nlvr", split="train", instances=None,
                iid_to_ann_ids=None, vqa_annotations=None, ans2label=None,
                img_format=None, store="lmdb")
    base.update(kw)
    return type("Opts", (), base)()


def _img_db(path, names, nbb=5):
    from uniter_tpu.data import write_img_db

    rng = np.random.RandomState(0)
    recs = {
        n: dict(features=rng.randn(nbb, 2048).astype(np.float16),
                norm_bb=rng.rand(nbb, 6).astype(np.float16),
                conf=np.linspace(1, 0.5, nbb).astype(np.float16),
                soft_labels=rng.rand(nbb, 1601).astype(np.float16))
        for n in names
    }
    write_img_db(str(path), recs, conf_th=0.2, max_bb=10, min_bb=3)
    return str(path)


def test_prepro_vqa(tmp_path, vocab_path):
    questions = [
        {"question_id": i, "image_id": i % 2,
         "question": "what color is the dog"}
        for i in range(6)
    ]
    annotations = [
        {"question_id": i,
         "answers": [{"answer": "red"}] * 4 + [{"answer": "blue"}] * 2}
        for i in range(6)
    ]
    qp = tmp_path / "questions.json"
    qp.write_text(json.dumps({"questions": questions}))
    ap = tmp_path / "annotations.json"
    ap.write_text(json.dumps({"annotations": annotations}))
    a2l = tmp_path / "ans2label.json"
    a2l.write_text(json.dumps({"red": 0, "blue": 1, "dog": 2}))

    out = str(tmp_path / "txt_db")
    prepro.main(_opts(task="vqa", annotation=str(qp),
                      vqa_annotations=str(ap), ans2label=str(a2l),
                      output=out, toker=vocab_path))

    from uniter_tpu.data.txt_db import TxtTokDb
    from uniter_tpu.data.vqa import VqaDataset
    from uniter_tpu.data.img_db import DetectFeatDb

    txt_db = TxtTokDb(out, max_txt_len=20)
    img = _img_db(tmp_path / "img",
                  [f"coco_{i:012}.npz" for i in range(2)])
    ds = VqaDataset(3, txt_db, DetectFeatDb(img, 0.2, 10, 3, 5))
    rec = ds.get_record(0, np.random.RandomState(0))
    batch = type(ds).collate([rec], 16, 8, 8)
    assert batch["targets"].shape == (8, 3)
    # red: 4 human answers -> score 1.0; blue: 2 -> 2/3
    row = batch["targets"][0]
    assert row[0] == 1.0 and abs(row[1] - 2 / 3) < 1e-6


def test_prepro_ve(tmp_path, vocab_path):
    lines = [
        json.dumps({"pairID": f"p{i}", "Flickr30K_ID": str(100 + i % 2),
                    "sentence2": "a dog wearing a hat",
                    "gold_label": ["entailment", "neutral",
                                   "contradiction"][i % 3]})
        for i in range(6)
    ]
    ann = tmp_path / "ve.jsonl"
    ann.write_text("\n".join(lines))
    out = str(tmp_path / "txt_db")
    prepro.main(_opts(task="ve", annotation=str(ann), output=out,
                      toker=vocab_path))

    from uniter_tpu.data.txt_db import TxtTokDb
    from uniter_tpu.utils.misc import VE_ENT2IDX

    db = TxtTokDb(out, max_txt_len=20)
    assert len(db.id2len) == 6
    assert db["p0"]["target"]["labels"] == [VE_ENT2IDX["entailment"]]


def test_prepro_itm(tmp_path, vocab_path):
    captions = {"annotations": [
        {"id": i, "image_id": i % 3, "caption": "a red dog on a blue cat"}
        for i in range(9)
    ]}
    ann = tmp_path / "caps.json"
    ann.write_text(json.dumps(captions))
    out = str(tmp_path / "txt_db")
    prepro.main(_opts(task="itm", annotation=str(ann), output=out,
                      toker=vocab_path))

    from uniter_tpu.data.itm import ItmDataset
    from uniter_tpu.data.img_db import DetectFeatDb
    from uniter_tpu.data.txt_db import TxtTokDb

    txt_db = TxtTokDb(out, max_txt_len=20)
    img = _img_db(tmp_path / "img",
                  [f"coco_{i:012}.npz" for i in range(3)])
    ds = ItmDataset(txt_db, DetectFeatDb(img, 0.2, 10, 3, 5))
    rec = ds.get_record(0, np.random.RandomState(0))
    assert rec["target"] in (0, 1)
    assert len(txt_db.img2txts) == 3


def test_prepro_vcr(tmp_path, vocab_path):
    lines = [
        json.dumps({
            "annot_id": f"ex{i}",
            "objects": ["person", "dog"],
            "img_fn": f"movie/{i:04d}.jpg",
            "question": ["what", "is", [0], "wearing"],
            "answer_choices": [["a", "hat"], ["a", "red", "hat"],
                               [[1]], ["blue"]],
            "rationale_choices": [["true"], [[0], "is", "red"],
                                  ["cat"], ["dog", "on", "hat"]],
            "answer_label": i % 4,
            "rationale_label": (i + 1) % 4,
        })
        for i in range(4)
    ]
    ann = tmp_path / "vcr.jsonl"
    ann.write_text("\n".join(lines))
    out = str(tmp_path / "txt_db")
    prepro.main(_opts(task="vcr", annotation=str(ann), output=out,
                      toker=vocab_path))
    assert os.path.exists(os.path.join(out, "id2len_qa.json"))

    from uniter_tpu.data.vcr import VcrDataset, VcrTxtTokDb
    from uniter_tpu.data.img_db import DetectFeatDb

    txt_db = VcrTxtTokDb(out, max_txt_len=40, task="qa")
    names_gt = [f"vcr_gt_{i:04d}.npz" for i in range(4)]
    names = [f"vcr_{i:04d}.npz" for i in range(4)]
    gt = _img_db(tmp_path / "img_gt", names_gt, nbb=4)
    det = _img_db(tmp_path / "img", names, nbb=6)
    ds = VcrDataset(txt_db, img_db_gt=DetectFeatDb(gt, 0.2, 10, 3, 4),
                    img_db=DetectFeatDb(det, 0.2, 10, 3, 5))
    rec = ds.get_record(0, np.random.RandomState(0))
    assert len(rec["rows"]) == 4
    assert sum(r["target"] for r in rec["rows"]) == 1
    # object mention became a special id beyond the base vocab
    meta = json.load(open(os.path.join(out, "meta.json")))
    v_end = meta["v_range"][1]
    q_ids = txt_db["ex0"]["input_ids"]
    assert any(t >= v_end for t in q_ids)
