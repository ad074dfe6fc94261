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
    if opts.task == "nlvr":
        with open(opts.annotation) as ann:
            id2len, txt2img = process_nlvr2(ann, db, tokenize,
                                            missing=None)
        with open(os.path.join(opts.output, "txt2img.json"), "w") as f:
            json.dump(txt2img, f)
        img2txts = {}
        for t, pair in txt2img.items():
            for im in pair:
                img2txts.setdefault(im, []).append(t)
        with open(os.path.join(opts.output, "img2txts.json"), "w") as f:
            json.dump(img2txts, f)
    elif opts.task == "re":
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
    parser.add_argument("--task", default="nlvr", choices=["nlvr", "re"])
    parser.add_argument("--split", default="train")
    parser.add_argument("--instances", help="RE: instances.json")
    parser.add_argument("--iid_to_ann_ids", help="RE: iid->ann_ids json")
    parser.add_argument("--toker", default="bert-base-cased")
    parser.add_argument("--store", default="lmdb", choices=["lmdb", "dir"],
                        help="record store format (lmdb = reference format)")
    main(parser.parse_args())
