"""Annotation preprocessing: raw NLVR2 / RefCOCO annotations -> txt_db
(reference prepro.py).

Word-wise BPE tokenization (prepro.py:20-29), NLVR2 jsonl processing
(:32-53), referring-expression processing (:56-112), and the meta.json
CLS/SEP/MASK/v_range contract (:126-133). Uses transformers' BertTokenizer
(the successor of pytorch-pretrained-bert; identical vocab + ids).
"""

from __future__ import annotations

import argparse
import json
import os

from uniter_tpu.data.txt_db import TxtDb
from uniter_tpu.utils.logger import LOGGER


def bert_tokenize(tokenizer, text: str):
    """Word-wise BPE: tokenize each whitespace word independently
    (prepro.py:20-29)."""
    ids = []
    for word in text.strip().split():
        ws = tokenizer.tokenize(word)
        if not ws:
            continue
        ids.extend(tokenizer.convert_tokens_to_ids(ws))
    return ids


def process_nlvr2(jsonl, db, tokenize, missing=None):
    id2len, txt2img = {}, {}
    for line in jsonl:
        line = line.strip()
        if not line:
            continue
        example = json.loads(line)
        id_ = example["identifier"]
        img_id = "-".join(id_.split("-")[:-1])
        img_fname = [f"nlvr2_{img_id}-img0.npz", f"nlvr2_{img_id}-img1.npz"]
        if missing and (img_fname[0] in missing or img_fname[1] in missing):
            continue
        input_ids = tokenize(example["sentence"])
        target = (1 if example["label"] == "True" else 0) \
            if "label" in example else None
        txt2img[id_] = img_fname
        id2len[id_] = len(input_ids)
        example["input_ids"] = input_ids
        example["img_fname"] = img_fname
        example["target"] = target
        db[id_] = example
    return id2len, txt2img


def process_vqa(questions, annotations, ans2label, db, tokenize,
                img_format="coco_{:012}.npz"):
    """VQA v2 questions (+ optional annotations) -> txt_db records with the
    soft-score target contract data/vqa.py consumes ({labels, scores};
    score = min(1, count/3), the official VQA accuracy weighting). The
    reference shipped these DBs pre-built; this is the missing L0 recipe."""
    from collections import Counter

    id2len, txt2img = {}, {}
    for q in questions:
        qid = str(q["question_id"])
        input_ids = tokenize(q["question"])
        img_fname = img_format.format(int(q["image_id"]))
        target = None
        if annotations is not None:
            ann = annotations[int(q["question_id"])]
            counts = Counter(a["answer"] for a in ann["answers"])
            labels, scores = [], []
            for a, c in counts.items():
                if a in ans2label:
                    labels.append(int(ans2label[a]))
                    scores.append(min(1.0, c / 3.0))
            target = {"labels": labels, "scores": scores}
        db[qid] = dict(question_id=q["question_id"], input_ids=input_ids,
                       img_fname=img_fname, target=target)
        id2len[qid] = len(input_ids)
        txt2img[qid] = img_fname
    return id2len, txt2img


def process_ve(jsonl, db, tokenize,
               img_format="flickr30k_{}.npz"):
    """SNLI-VE jsonl (sentence2 hypothesis + gold_label) -> txt_db with the
    3-way target as a {labels, scores} dict (VE = 3-answer VQA,
    reference data/ve.py + utils/misc.py VE_ENT2IDX)."""
    from uniter_tpu.utils.misc import VE_ENT2IDX

    id2len, txt2img = {}, {}
    for line in jsonl:
        line = line.strip()
        if not line:
            continue
        ex = json.loads(line)
        id_ = str(ex["pairID"])
        input_ids = tokenize(ex["sentence2"])
        img_fname = img_format.format(str(ex["Flickr30K_ID"]))
        label = ex.get("gold_label")
        target = (None if label in (None, "-")
                  else {"labels": [VE_ENT2IDX[label]], "scores": [1.0]})
        db[id_] = dict(input_ids=input_ids, img_fname=img_fname,
                       target=target)
        id2len[id_] = len(input_ids)
        txt2img[id_] = img_fname
    return id2len, txt2img


def process_captions(captions, db, tokenize, img_format="coco_{:012}.npz"):
    """COCO/Flickr caption annotations ({'annotations': [{id, image_id,
    caption}]}) -> ITM/pretraining txt_db (one record per caption;
    txt2img + img2txts for retrieval)."""
    id2len, txt2img = {}, {}
    for ann in captions["annotations"]:
        id_ = str(ann["id"])
        input_ids = tokenize(ann["caption"])
        img_fname = img_format.format(int(ann["image_id"])) \
            if not isinstance(ann["image_id"], str) \
            else img_format.format(ann["image_id"])
        db[id_] = dict(input_ids=input_ids, img_fname=img_fname)
        id2len[id_] = len(input_ids)
        txt2img[id_] = img_fname
    return id2len, txt2img


# VCR object mentions become per-object special tokens appended after the
# base vocab (the VCR model widens word_embeddings by 81 rows,
# reference model/vcr.py:43-50 / train_vcr.py:37).
VCR_NUM_SPECIAL = 81


def _tokenize_vcr(mixed, objects, tokenize, vocab_size):
    """VCR token stream: strings are BPE'd; object references ([idx, ...])
    map to special ids vocab_size + min(idx, 80)."""
    ids = []
    for tok in mixed:
        if isinstance(tok, list):
            for idx in tok:
                ids.append(vocab_size + min(int(idx), VCR_NUM_SPECIAL - 1))
        else:
            ids.extend(tokenize(str(tok)))
    del objects
    return ids


def process_vcr(jsonl, db, tokenize, vocab_size):
    """VCR jsonl -> txt_db with per-choice token lists and the id2len_qa /
    id2len_qar bucketing files VcrTxtTokDb expects (data/vcr.py:25-33).
    Lengths record the longest candidate variant."""
    id2len_qa, id2len_qar, txt2img = {}, {}, {}
    for line in jsonl:
        line = line.strip()
        if not line:
            continue
        ex = json.loads(line)
        id_ = str(ex["annot_id"])
        objects = ex.get("objects", [])
        q = _tokenize_vcr(ex["question"], objects, tokenize, vocab_size)
        a_s = [_tokenize_vcr(a, objects, tokenize, vocab_size)
               for a in ex["answer_choices"]]
        r_s = [_tokenize_vcr(r, objects, tokenize, vocab_size)
               for r in ex.get("rationale_choices", [])]
        img = os.path.splitext(os.path.basename(ex["img_fn"]))[0]
        img_fname = (f"vcr_gt_{img}.npz", f"vcr_{img}.npz")
        db[id_] = dict(
            input_ids=q, input_ids_as=a_s, input_ids_rs=r_s,
            qa_target=int(ex.get("answer_label", -1)),
            qar_target=int(ex.get("rationale_label", -1)),
            img_fname=img_fname)
        max_a = max((len(a) for a in a_s), default=0)
        max_r = max((len(r) for r in r_s), default=0)
        id2len_qa[id_] = len(q) + max_a
        id2len_qar[id_] = len(q) + max_a + max_r
        txt2img[id_] = img_fname
    return id2len_qa, id2len_qar, txt2img


def process_referring_expressions(refs, instances, iid_to_ann_ids, db,
                                  tokenize, split):
    image_set = {r["image_id"] for r in refs if r["split"] == split}
    images = [
        {"id": img["id"], "file_name": img["file_name"],
         "ann_ids": iid_to_ann_ids[str(img["id"])],
         "height": img["height"], "width": img["width"]}
        for img in instances["images"] if img["id"] in image_set
    ]
    annotations = [
        {"id": a["id"], "area": a["area"], "bbox": a["bbox"],
         "image_id": a["image_id"], "category_id": a["category_id"],
         "iscrowd": a.get("iscrowd", 0)}
        for a in instances["annotations"] if a["image_id"] in image_set
    ]
    anns = {a["id"]: a for a in annotations}
    categories = instances["categories"]
    refs = [r for r in refs if r["split"] == split]
    id2len = {}
    for ref in refs:
        img_fname = f"visual_grounding_coco_gt_{int(ref['image_id']):012}.npz"
        for sent in ref["sentences"]:
            input_ids = tokenize(sent["sent"])
            id2len[str(sent["sent_id"])] = len(input_ids)
            db[str(sent["sent_id"])] = {
                "sent_id": sent["sent_id"], "sent": sent["sent"],
                "ref_id": ref["ref_id"], "ann_id": ref["ann_id"],
                "image_id": ref["image_id"],
                "bbox": anns[ref["ann_id"]]["bbox"],
                "input_ids": input_ids, "img_fname": img_fname,
            }
    return id2len, images, annotations, categories, refs


def build_tokenizer(toker_name: str):
    from transformers import BertTokenizer

    if os.path.isfile(toker_name):  # local vocab.txt (offline environments)
        toker = BertTokenizer(toker_name, do_lower_case=False)
    else:
        toker = BertTokenizer.from_pretrained(
            toker_name, do_lower_case="uncased" in toker_name)
    meta = {
        "UNK": toker.convert_tokens_to_ids(["[UNK]"])[0],
        "CLS": toker.convert_tokens_to_ids(["[CLS]"])[0],
        "SEP": toker.convert_tokens_to_ids(["[SEP]"])[0],
        "MASK": toker.convert_tokens_to_ids(["[MASK]"])[0],
        "v_range": [toker.convert_tokens_to_ids(["!"])[0],
                    len(toker.vocab)],
        "tokenizer": toker_name,
    }
    return (lambda text: bert_tokenize(toker, text)), meta


def main(opts):
    if os.path.exists(opts.output) and os.listdir(opts.output):
        raise ValueError("Found existing DB. Please explicitly remove "
                         "for re-processing")
    os.makedirs(opts.output, exist_ok=True)
    tokenize, meta = build_tokenizer(opts.toker)
    meta.update({k: v for k, v in vars(opts).items() if k != "toker"})
    with open(os.path.join(opts.output, "meta.json"), "w") as f:
        json.dump(meta, f, indent=4)

    if opts.store == "lmdb":
        # buffer records, bulk-write data.mdb at the end
        class _Buf:
            def __init__(self):
                self.records = {}
            def __setitem__(self, k, v):
                self.records[k] = v
        db = _Buf()
    else:
        db = TxtDb(opts.output, readonly=False)
    def dump_maps(txt2img):
        with open(os.path.join(opts.output, "txt2img.json"), "w") as f:
            json.dump(txt2img, f)
        img2txts = {}
        for t, img in txt2img.items():
            for im in (img if isinstance(img, (list, tuple)) else [img]):
                img2txts.setdefault(im, []).append(t)
        with open(os.path.join(opts.output, "img2txts.json"), "w") as f:
            json.dump(img2txts, f)

    if opts.task == "nlvr":
        with open(opts.annotation) as ann:
            missing = None
            if getattr(opts, "missing", None):
                with open(opts.missing) as mf:
                    missing = set(json.load(mf))
            id2len, txt2img = process_nlvr2(ann, db, tokenize,
                                            missing=missing)
        dump_maps(txt2img)
    elif opts.task == "vqa":
        with open(opts.annotation) as f:
            qs = json.load(f)
        questions = qs["questions"] if isinstance(qs, dict) else qs
        annotations = None
        ans2label = {}
        if opts.vqa_annotations:
            with open(opts.vqa_annotations) as f:
                anns = json.load(f)
            anns = anns["annotations"] if isinstance(anns, dict) else anns
            annotations = {int(a["question_id"]): a for a in anns}
            # --ans2label defaults to the in-tree vocabulary (the
            # reference hardcodes utils/ans2label.json); regenerate with
            # scripts/make_ans2label.py for custom vocabs
            from uniter_tpu.utils.vqa_answers import load_ans2label

            ans2label = load_ans2label(opts.ans2label or None)
        id2len, txt2img = process_vqa(
            questions, annotations, ans2label, db, tokenize,
            img_format=opts.img_format or "coco_{:012}.npz")
        dump_maps(txt2img)
    elif opts.task == "ve":
        with open(opts.annotation) as ann:
            id2len, txt2img = process_ve(
                ann, db, tokenize,
                img_format=opts.img_format or "flickr30k_{}.npz")
        dump_maps(txt2img)
    elif opts.task == "itm":
        with open(opts.annotation) as f:
            captions = json.load(f)
        id2len, txt2img = process_captions(
            captions, db, tokenize,
            img_format=opts.img_format or "coco_{:012}.npz")
        dump_maps(txt2img)
    elif opts.task == "vcr":
        with open(opts.annotation) as ann:
            id2len_qa, id2len_qar, txt2img = process_vcr(
                ann, db, tokenize, vocab_size=meta["v_range"][1])
        dump_maps(txt2img)
        for name, obj in (("id2len_qa", id2len_qa),
                          ("id2len_qar", id2len_qar)):
            with open(os.path.join(opts.output, f"{name}.json"), "w") as f:
                json.dump(obj, f)
        id2len = id2len_qar  # generic id2len.json mirrors the longest task
    elif opts.task == "re":
        if opts.annotation.endswith(".p"):
            # MAttNet-layout refs pickle (refs(unc).p / refs(umd).p — the
            # files the reference's create_txtdb_re.sh feeds in)
            import pickle

            with open(opts.annotation, "rb") as f:
                refs = pickle.load(f)
        else:
            with open(opts.annotation) as f:
                refs = json.load(f)
        with open(opts.instances) as f:
            instances = json.load(f)
        with open(opts.iid_to_ann_ids) as f:
            iid_to_ann_ids = json.load(f).get("iid_to_ann_ids")
        id2len, images, annotations, categories, refs = \
            process_referring_expressions(
                refs, instances, iid_to_ann_ids, db, tokenize, opts.split)
        for name, obj in (("refs", refs), ("annotations", annotations),
                          ("categories", categories), ("images", images)):
            with open(os.path.join(opts.output, f"{name}.json"), "w") as f:
                json.dump(obj, f)
    else:
        raise ValueError(f"unknown task {opts.task}")
    if opts.store == "lmdb":
        from uniter_tpu.data import lz4f
        from uniter_tpu.data import msgpack_numpy as msgnp
        from uniter_tpu.data.lmdb_native import write_lmdb

        write_lmdb(opts.output, {
            k: lz4f.compress(msgnp.packb(v)) for k, v in db.records.items()
        })
    with open(os.path.join(opts.output, "id2len.json"), "w") as f:
        json.dump(id2len, f)
    LOGGER.info("processed %d examples into %s", len(id2len), opts.output)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--annotation", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--task", default="nlvr",
                        choices=["nlvr", "re", "vqa", "ve", "itm", "vcr"])
    parser.add_argument("--split", default="train")
    parser.add_argument("--instances", help="RE: instances.json")
    parser.add_argument("--iid_to_ann_ids", help="RE: iid->ann_ids json")
    parser.add_argument("--vqa_annotations",
                        help="VQA: annotations json (omit for test splits)")
    parser.add_argument("--ans2label", help="VQA: answer->label json")
    parser.add_argument("--img_format", default=None,
                        help="img_fname format string, e.g. "
                             "'coco_train2014_{:012}.npz'")
    parser.add_argument("--missing", default=None,
                        help="json list of image fnames absent from the "
                             "img_db (their examples are skipped)")
    parser.add_argument("--toker", default="bert-base-cased")
    parser.add_argument("--store", default="lmdb", choices=["lmdb", "dir"],
                        help="record store format (lmdb = reference format)")
    main(parser.parse_args())
