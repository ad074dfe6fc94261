"""Image-text retrieval evaluation (reference utils/itm_eval.py).

``itm_eval``: R@1/5/10 in both directions + mean ranks from the full
score matrix (reference :19-66). ``inference`` builds the
[n_txt, n_img] score matrix; rows are sharded across processes and
all-gathered (reference :70-114 used hvd.allgather; multi-host here uses
jax.experimental.multihost_utils.process_allgather).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def itm_eval(score_matrix: np.ndarray, txt_ids: List[str],
             img_ids: List[str], txt2img: Dict[str, str],
             img2txts: Dict[str, List[str]]) -> Dict[str, float]:
    # image retrieval (text query -> rank of gt image)
    img2j = {i: j for j, i in enumerate(img_ids)}
    gt_img_j = np.asarray([img2j[txt2img[t]] for t in txt_ids])
    order = np.argsort(-score_matrix, axis=1)  # descending
    rank = np.argmax(order == gt_img_j[:, None], axis=1)
    ir_r1 = float((rank < 1).mean())
    ir_r5 = float((rank < 5).mean())
    ir_r10 = float((rank < 10).mean())

    # text retrieval (image query -> best rank over its gt texts)
    txt2i = {t: i for i, t in enumerate(txt_ids)}
    tr_ranks = []
    for j, img in enumerate(img_ids):
        gt_is = [txt2i[t] for t in img2txts[img] if t in txt2i]
        if not gt_is:
            continue
        col_order = np.argsort(-score_matrix[:, j])
        pos = np.isin(col_order, gt_is).nonzero()[0]
        tr_ranks.append(pos.min() if len(pos) else len(txt_ids))
    tr_ranks = np.asarray(tr_ranks)
    tr_r1 = float((tr_ranks < 1).mean())
    tr_r5 = float((tr_ranks < 5).mean())
    tr_r10 = float((tr_ranks < 10).mean())

    tr_mean = (tr_r1 + tr_r5 + tr_r10) / 3
    ir_mean = (ir_r1 + ir_r5 + ir_r10) / 3
    r_mean = (tr_mean + ir_mean) / 2
    return {
        "txt_r1": tr_r1, "txt_r5": tr_r5, "txt_r10": tr_r10,
        "txt_r_mean": tr_mean,
        "img_r1": ir_r1, "img_r5": ir_r5, "img_r10": ir_r10,
        "img_r_mean": ir_mean,
        "r_mean": r_mean,
    }


def inference_score_matrix(predict_fn, eval_dataset, params, t_bucket,
                           r_bucket, shard_index=0, shard_count=1,
                           mesh=None):
    """Compute score_matrix rows [n_txt_shard, n_img] (reference :93-114).

    predict_fn(params, batch) -> [B, 1] rank scores (jit-compiled once per
    minibatch shape). Texts are sharded across processes; with a ``mesh``
    (local devices) each minibatch's row axis is additionally sharded over
    the mesh's data axis so every local chip scores a slice (the reference
    runs the whole job's GPUs on eval, utils/itm_eval.py:99-110). Padding
    rows (ex_weight 0 from fixed-size windows, plus any mesh-divisibility
    zero rows) are trimmed from each window's scores.
    """
    import jax
    import jax.numpy as jnp

    # commit params ONCE: checkpoint-loaded numpy params would otherwise
    # re-upload the full tree per minibatch (catastrophic on slow
    # host->device links; see itm_fast.fast_score_matrix's note)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        params = jax.tree.map(
            lambda x: (jax.device_put(x, rep)
                       if isinstance(x, np.ndarray) else x), params)
    else:
        params = jax.tree.map(
            lambda x: (jax.device_put(x)
                       if isinstance(x, np.ndarray) else x), params)

    rows = []
    txt_ids = []
    n = len(eval_dataset)
    for i in range(shard_index, n, shard_count):
        scores = []
        for batch in eval_dataset.get_batches(i, t_bucket, r_bucket):
            n_real = (int(batch["ex_weight"].sum())
                      if "ex_weight" in batch
                      else batch["input_ids"].shape[0])
            if mesh is not None:
                from uniter_tpu.training.infer import eval_put

                jb = eval_put({k: v for k, v in batch.items()
                               if isinstance(v, np.ndarray)}, mesh)
            else:
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            out = predict_fn(params, jb)
            scores.append(np.asarray(out)[:n_real, 0])
        rows.append(np.concatenate(scores))
        txt_ids.append(eval_dataset.ids[i])
    return np.stack(rows) if rows else np.zeros((0, 0)), txt_ids
