"""Referring-expression inference (reference inf_re.py): IoU>0.5 accuracy
over gt and detected boxes; writes per-sentence predictions."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.re import ReEvalDataset, ReTxtTokDb, compute_iou
from uniter_tpu.models.re import UniterForReferringExpressionComprehension
from uniter_tpu.training import infer
from uniter_tpu.training.loop import jnp_batch
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER


def main(opts):
    hps, model_json = infer.load_train_meta(opts.train_dir)
    cfg = infer.model_config_from_meta(
        model_json, dtype="float32",
        attention_impl=getattr(hps, "attention_impl", "xla"))
    model = UniterForReferringExpressionComprehension(
        cfg, img_dim=IMG_DIM, loss_type=getattr(hps, "train_loss", "cls"),
        mlp=getattr(hps, "mlp", 1))

    # gt convention (conf_th=-1 / num_bb=100 when the path names a gt DB,
    # reference inf_re.py:67-71) lives in driver.open_img_db
    from uniter_tpu.parallel.collectives import all_gather_list, process_index
    from uniter_tpu.training.driver import open_img_db, shard_kw

    img_db = open_img_db(opts.img_db, hps,
                         gt="coco_gt" in opts.img_db)
    # each process's batches spread over its local chips (reference
    # inf_re.py runs every GPU; sentences are already process-sharded)
    mesh = infer.local_eval_mesh()
    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))

    # colon-separated txt_db evaluates every split in one invocation
    # (reference inf_re.py:76-77, scripts/eval_refcoco*.sh pass
    # refcoco_val.db:refcoco_testA.db:refcoco_testB.db)
    splits = [p for p in opts.txt_db.split(":") if p]
    feat = "gt" if opts.use_gt_feat else "det"

    def split_name(p):
        base = os.path.basename(os.path.normpath(p))
        return base[:-3] if base.endswith(".db") else base

    names = [split_name(p) for p in splits]
    if len(set(names)) != len(names):
        # distinct split paths with colliding basenames would silently
        # overwrite each other's results files — disambiguate by index
        names = [f"{n}{i}" for i, n in enumerate(names)]
    params = None
    tot_correct, tot_ex = 0, 0
    for txt_path, sname in zip(splits, names):
        txt_db = ReTxtTokDb(txt_path, max_txt_len=-1)
        ds = ReEvalDataset(txt_db, img_db, use_gt_feat=opts.use_gt_feat,
                           **shard_kw())
        loader = BucketLoader(
            ds, spec_from_dataset(ds, opts.batch_size),
            shuffle=False, drop_last=False)

        if params is None:
            batch0 = next(iter(loader))
            jb0 = {k: jnp.asarray(v) for k, v in jnp_batch(batch0).items()}
            params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "sampling": jax.random.PRNGKey(1)}, jb0, False)["params"]
            params = infer.load_params(
                infer.resolve_ckpt(opts.train_dir, opts.ckpt), params)
            # commit the loaded (numpy) params to the mesh ONCE so the
            # per-batch jit doesn't re-upload the tree every call
            params = infer.local_eval_params(params, mesh)

        n_correct, n_ex = 0, 0
        predictions = []
        for batch in loader:
            jb = infer.eval_put(jnp_batch(batch), mesh)
            scores = np.asarray(predict(params, jb))
            w = np.asarray(batch["ex_weight"]) > 0
            preds = scores.argmax(-1)
            for i in np.nonzero(w)[0]:
                obj_boxes = batch["obj_boxes"][i]
                pred_box = obj_boxes[min(int(preds[i]), len(obj_boxes) - 1)]
                iou = compute_iou(pred_box, batch["tgt_box"][i])
                correct = iou > 0.5
                n_correct += int(correct)
                n_ex += 1
                predictions.append({
                    "sent_id": batch["sent_ids"][i],
                    "pred_box": [float(x) for x in pred_box],
                    "iou": float(iou),
                })

        parts = all_gather_list((n_correct, n_ex, predictions))
        n_correct = sum(p[0] for p in parts)
        n_ex = sum(p[1] for p in parts)
        predictions = [x for p in parts for x in p[2]]
        acc = n_correct / max(n_ex, 1)
        tot_correct += n_correct
        tot_ex += n_ex
        # single split keeps the plain name (back-compat); multi-split
        # names the file by db basename like the reference's
        # results_*_{split}_on_{img_dir} convention (inf_re.py:106-109)
        name = (f"results_{feat}.json" if len(splits) == 1 else
                f"results_{sname}_{feat}.json")
        if process_index() == 0:
            os.makedirs(opts.output_dir, exist_ok=True)
            with open(os.path.join(opts.output_dir, name), "w") as f:
                json.dump({"acc": acc, "n_ex": n_ex,
                           "predictions": predictions}, f)
        LOGGER.info("RE %s %s-feature accuracy: %.4f (%d ex)",
                    sname, feat, acc, n_ex)
    return tot_correct / max(tot_ex, 1)


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--txt_db", required=True,
                        help="colon-separated split DBs, e.g. "
                             "refcoco_val.db:refcoco_testA.db:"
                             "refcoco_testB.db (reference inf_re.py:76)")
    parser.add_argument("--img_db", required=True)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--use_gt_feat", action="store_true")
    parser.add_argument("--batch_size", type=int, default=8192)
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
