"""VQA inference (reference inf_vqa.py): writes ``results.json``
[{question_id, answer}] using the ans2label mapping, optionally dumping
logits npz (inf_vqa.py:85-96)."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.data.vqa import VqaDataset
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.training import infer
from uniter_tpu.training.loop import jnp_batch
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER


def main(opts):
    hps, model_json = infer.load_train_meta(opts.train_dir)
    cfg = infer.model_config_from_meta(
        model_json, dtype="float32",
        attention_impl=getattr(hps, "attention_impl", "xla"))
    num_answer = hps.num_answer
    model = UniterForVisualQuestionAnswering(
        cfg, img_dim=IMG_DIM, num_answer=num_answer)

    # resolution order (reference inf_vqa.py:45-47 reads the training
    # run's dumped copy): explicit flag > train_dir/ckpt/ans2label.json >
    # in-tree artifact (if it matches the head width) > index labels
    from uniter_tpu.utils.vqa_answers import default_ans2label_path

    a2l_path = opts.ans2label
    if not a2l_path:
        cand = os.path.join(opts.train_dir, "ckpt", "ans2label.json")
        if os.path.exists(cand):
            a2l_path = cand
    ans2label = None
    if a2l_path:
        with open(a2l_path) as f:
            ans2label = json.load(f)
    else:
        cand = default_ans2label_path()
        if cand is not None:
            with open(cand) as f:
                d = json.load(f)
            if len(d) == num_answer:
                ans2label = d
    if ans2label is None:
        ans2label = {str(i): i for i in range(num_answer)}
    label2ans = {v: k for k, v in ans2label.items()}

    txt_db = TxtTokDb(opts.txt_db, max_txt_len=-1)
    img_db = DetectFeatDb(opts.img_db, conf_th=hps.conf_th,
                          max_bb=hps.max_bb, min_bb=hps.min_bb,
                          num_bb=hps.num_bb,
                          compress=bool(getattr(hps, "compressed_db",
                                                False)))
    # texts shard across processes; results all-gathered before writing
    # (reference inf_vqa.py runs multi-GPU with hvd all_gather)
    from uniter_tpu.training.driver import shard_kw

    ds = VqaDataset(num_answer, txt_db, img_db, **shard_kw())
    loader = BucketLoader(
        ds, spec_from_dataset(ds, opts.batch_size),
        shuffle=False, drop_last=False)

    batch0 = next(iter(loader))
    jb0 = {k: jnp.asarray(v) for k, v in jnp_batch(batch0).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]
    params = infer.load_params(
        infer.resolve_ckpt(opts.train_dir, opts.ckpt), params)

    # each process's batches spread over its local chips (reference
    # inf_vqa.py runs every GPU; texts are already process-sharded)
    mesh = infer.local_eval_mesh()
    # commit the checkpoint-loaded (numpy) params to the mesh ONCE so the
    # per-batch jit doesn't re-upload the tree every call
    params = infer.local_eval_params(params, mesh)
    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
    results, all_logits = [], {}
    for batch in loader:
        jb = infer.eval_put(jnp_batch(batch), mesh)
        logits = np.asarray(predict(params, jb))
        n = len(batch["qids"])
        for qid, row in zip(batch["qids"], logits[:n]):
            results.append(
                {"question_id": qid, "answer": label2ans[int(row.argmax())]})
            if opts.save_logits:
                all_logits[str(qid)] = row.astype(np.float16)

    from uniter_tpu.parallel.collectives import all_gather_list, process_index

    gathered = all_gather_list((results, all_logits))
    results = [r for part, _ in gathered for r in part]
    all_logits = {k: v for _, part in gathered for k, v in part.items()}
    out = os.path.join(opts.output_dir, "results.json")
    if process_index() == 0:
        os.makedirs(opts.output_dir, exist_ok=True)
        with open(out, "w") as f:
            json.dump(results, f)
        if opts.save_logits:
            np.savez(os.path.join(opts.output_dir, "logits.npz"),
                     **all_logits)
        LOGGER.info("wrote %d answers to %s", len(results), out)
    return out


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--txt_db", required=True)
    parser.add_argument("--img_db", required=True)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--ans2label", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=8192)
    parser.add_argument("--save_logits", action="store_true")
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
