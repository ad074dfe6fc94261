"""VCR inference (reference inf_vcr.py): qa / qar / joint accuracy on val,
and leaderboard-format CSV on test (per question: 4 answer probs + 4x4
answer-conditioned rationale probs, reference inf_vcr.py:56-84)."""

from __future__ import annotations

import argparse
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.vcr import VcrEvalDataset, VcrTxtTokDb
from uniter_tpu.models.vcr import (
    NUM_SPECIAL_TOKENS, UniterForVisualCommonsenseReasoning,
)
from uniter_tpu.training import infer
from uniter_tpu.training.loop import jnp_batch
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER


def softmax2(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def main(opts):
    hps, model_json = infer.load_train_meta(opts.train_dir)
    cfg = infer.model_config_from_meta(
        model_json, type_vocab_size=4, dtype="float32",
        attention_impl=getattr(hps, "attention_impl", "xla"))
    # the trained VCR model carries the +81 special-token word rows
    # (train_vcr widens before loading; model.json records the base vocab)
    cfg = cfg.replace(vocab_size=cfg.vocab_size + NUM_SPECIAL_TOKENS)
    model = UniterForVisualCommonsenseReasoning(cfg, img_dim=IMG_DIM)

    txt_db = VcrTxtTokDb(opts.txt_db, max_txt_len=-1, task="qa,qar")
    from uniter_tpu.training.driver import open_img_db, shard_kw

    img_db = open_img_db(opts.img_db, hps)
    # gt convention (conf_th=-1 / num_bb=100) lives in open_img_db
    img_db_gt = open_img_db(opts.img_db_gt, hps, gt=True)

    ds = VcrEvalDataset(opts.split, txt_db, img_db_gt=img_db_gt,
                        img_db=img_db, **shard_kw())
    loader = BucketLoader(
        ds, spec_from_dataset(ds, opts.batch_size),
        shuffle=False, drop_last=False, collate=ds.collate_fn)

    batch0 = next(iter(loader))
    jb0 = {k: jnp.asarray(v) for k, v in jnp_batch(batch0).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]
    params = infer.load_params(
        infer.resolve_ckpt(opts.train_dir, opts.ckpt), params)

    # each process's batches spread over its local chips (reference
    # inf_vcr.py runs every GPU; questions are already process-sharded)
    mesh = infer.local_eval_mesh()
    # commit the checkpoint-loaded (numpy) params to the mesh ONCE so the
    # per-batch jit doesn't re-upload the tree every call
    params = infer.local_eval_params(params, mesh)
    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
    n_qa, n_qar, n_ex = 0, 0, 0
    rows_out = []
    for batch in loader:
        jb = infer.eval_put(jnp_batch(batch), mesh)
        scores = np.asarray(predict(params, jb))[:, 0]
        off = 0
        for i, n_rows in enumerate(batch["n_rows"]):
            qa_scores = scores[off:off + 4]
            qar_scores = scores[off + 4:off + n_rows]
            if opts.split == "val":
                qa_ok = int(qa_scores.argmax()) == int(
                    batch["qa_targets"][i])
                qar_ok = (len(qar_scores) == 4 and int(qar_scores.argmax())
                          == int(batch["qar_targets"][i]))
                n_qa += int(qa_ok)
                n_qar += int(qa_ok and qar_ok)
            else:
                # leaderboard: 4 answer probs + 4 groups of 4 rationale probs
                row = [batch["qids"][i]]
                row += list(softmax2(qa_scores))
                for g in range(4):
                    grp = qar_scores[g * 4:(g + 1) * 4]
                    row += list(softmax2(grp)) if len(grp) == 4 else [0.25] * 4
                rows_out.append(row)
            n_ex += 1
            off += n_rows

    from uniter_tpu.parallel.collectives import all_gather_list, process_index

    n_qa, n_qar, n_ex = (sum(v) for v in zip(
        *all_gather_list((n_qa, n_qar, n_ex))))
    os.makedirs(opts.output_dir, exist_ok=True)
    if opts.split == "val":
        logs = {"qa_acc": n_qa / max(n_ex, 1),
                "qar_joint_acc": n_qar / max(n_ex, 1), "n_ex": n_ex}
        LOGGER.info("VCR val: %s", logs)
        import json

        if process_index() == 0:
            with open(os.path.join(opts.output_dir, "results_val.json"),
                      "w") as f:
                json.dump(logs, f)
        return logs
    # submission rows are only needed on the CSV path — gathering them on
    # the val split would move every per-example probability row over DCN
    # for nothing
    rows_out = [r for part in all_gather_list(rows_out) for r in part]
    header = (["annot_id"] + [f"answer_{i}" for i in range(4)]
              + [f"rationale_conditioned_on_a{g}_{i}"
                 for g in range(4) for i in range(4)])
    out_csv = os.path.join(opts.output_dir, f"{opts.split}_submission.csv")
    if process_index() == 0:
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows_out)
        LOGGER.info("wrote %d rows to %s", len(rows_out), out_csv)
    return out_csv


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--txt_db", required=True)
    parser.add_argument("--img_db", required=True)
    parser.add_argument("--img_db_gt", required=True)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--split", default="val", choices=["val", "test"])
    parser.add_argument("--batch_size", type=int, default=8192)
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
