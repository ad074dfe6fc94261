"""Learning proofs: every task family trains to high accuracy through the
real CLI drivers (VERDICT r4 #1).

The smoke e2e tests prove the drivers *compute*; these prove the system
*learns* — the system-level analogue of the reference's real-data
validation loops (reference pretrain.py:390-544, train_nlvr2.py:241-276).
Each fixture builds a synthetic DB whose labels are a deterministic
function of the IMAGE features (marker dimensions), so convergence
requires the visual path, the cross-modal attention, the loss plumbing,
the LR schedule, and the label signs to all be correct — a wrong
mask-slot or label-sign bug that still lets loss tick down cannot pass.

Text inputs are held CONSTANT across examples wherever the label is
image-determined (VQA, NLVR2), so the model cannot shortcut via text
memorization; ITM/RE bind a text token to an image/region marker, so the
model must learn a cross-modal pointer.
"""

import functools
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # slow CLI-driver pipeline: -m 'not e2e' skips

IMG_DIM = 2048
META = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 300]}

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def single_device_subprocess(fn):
    """Re-run this test in a fresh 1-device pytest subprocess.

    The hundreds-of-steps learning runs wedge NONDETERMINISTICALLY on the
    shared in-process 8-device virtual mesh: XLA:CPU's in-process
    collective rendezvous loses wakeups on oversubscribed hosts and
    rendezvous.cc SIGABRTs the whole pytest process after its 40s
    termination timeout. First observed on collective-permute programs
    (HN mining gather), then on a plain all-reduce DP train step
    (test_learn_vqa, r5) — so ALL long learning runs isolate to a
    1-device mesh (no collectives -> no rendezvous; conftest.py respects
    a pre-set device count). Multi-device coverage of the same drivers
    stays with the short-run smoke e2e tests, test_multiprocess, and
    __graft_entry__'s dryrun; these tests prove learning dynamics, where
    the device count is irrelevant.
    """

    @functools.wraps(fn)
    def wrapper(tmp_path):
        if os.environ.get("UNITER_LEARN_ISOLATED") == "1":
            return fn(tmp_path)
        env = dict(os.environ)
        env.update(
            UNITER_LEARN_ISOLATED="1",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            PYTHONPATH="",
        )
        proc = subprocess.run(
            [sys.executable, "-m", "pytest",
             f"{os.path.abspath(__file__)}::{fn.__name__}",
             "-q", "-x", "-p", "no:cacheprovider"],
            env=env, capture_output=True, text=True, timeout=2400,
            cwd=_REPO)
        assert proc.returncode == 0, (
            proc.stdout[-3000:] + "\n" + proc.stderr[-2000:])

    return wrapper


def _model_cfg(root, vocab=300, hidden=48):
    # hidden=96 for the cross-modal BINDING tasks (ITM/RE): a 48-dim
    # 2-layer trunk's CLS barely separates pairs at init (~1e-5 logit
    # spread) and the margin loss stalls; doubling width makes the
    # pointer task train in a few hundred steps
    cfg = dict(
        vocab_size=vocab, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=2 * hidden,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", initializer_range=0.02,
    )
    path = str(root / "model.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def _feat(rng, nbb, marker_dims=(), scale=4.0):
    """Low-noise features with strong marker dimensions (survive fp16)."""
    f = (rng.randn(nbb, IMG_DIM) * 0.5).astype(np.float16)
    for d in marker_dims:
        f[:, d] += scale
    return f


def _img_record(rng, nbb, features):
    return dict(
        features=features,
        norm_bb=rng.rand(nbb, 6).astype(np.float16),
        conf=np.ones(nbb, np.float16),
        soft_labels=rng.rand(nbb, 1601).astype(np.float16),
    )


# ---------------------------------------------------------------- NLVR2


@single_device_subprocess
def test_learn_nlvr2(tmp_path):
    """Label = whether the LEFT image carries the marker; text constant.
    train_nlvr2 -> inf_nlvr2 -> accuracy >= 0.95 on the train set."""
    from uniter_tpu.data import write_img_db, write_txt_db
    import train_nlvr2
    import inf_nlvr2
    from uniter_tpu.utils.misc import parse_with_config

    rng = np.random.RandomState(0)
    img_names = [f"nlvr2_{i:04d}.npz" for i in range(8)]
    # images 0-3 carry the marker (dims 0:16 boosted), 4-7 do not
    img_records = {
        n: _img_record(rng, 6, _feat(rng, 6, marker_dims=range(16)
                                     if i < 4 else ()))
        for i, n in enumerate(img_names)}
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    recs, t2i = {}, {}
    for i in range(24):
        left, right = img_names[i % 8], img_names[(i + 3) % 8]
        tid = f"ex_{i}"
        recs[tid] = dict(input_ids=[150, 151, 152, 153],  # constant text
                         img_fname=[left, right],
                         target=int(i % 8 < 4))
        t2i[tid] = [left, right]
    txt_dir = str(tmp_path / "txt")
    write_txt_db(txt_dir, recs, META, t2i)

    out = str(tmp_path / "out")
    argv = [
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--model_config", _model_cfg(tmp_path), "--model", "paired-attn",
        "--output_dir", out,
        "--train_batch_size", "512", "--val_batch_size", "512",
        "--num_train_steps", "150", "--valid_steps", "1000",
        "--warmup_steps", "10", "--learning_rate", "1e-3",
        "--dropout", "0", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    state = train_nlvr2.main(
        parse_with_config(train_nlvr2.get_parser(), argv))
    assert int(state.step) == 150

    iargv = inf_nlvr2.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_dir,
        "--train_dir", out, "--output_dir", str(tmp_path / "inf"),
        "--batch_size", "512",
    ])
    csv_path = inf_nlvr2.main(iargv)
    preds = dict(line.split(",") for line in
                 open(csv_path).read().strip().splitlines())
    correct = sum((preds[t] == "True") == bool(recs[t]["target"])
                  for t in recs)
    acc = correct / len(recs)
    assert acc >= 0.95, f"NLVR2 did not learn: train acc {acc}"


# ------------------------------------------------------------------ VQA


@single_device_subprocess
def test_learn_vqa(tmp_path):
    """Answer = the image's one-hot class marker; text constant.
    train_vqa -> inf_vqa -> accuracy >= 0.95 on the train set."""
    from uniter_tpu.data import write_img_db, write_txt_db
    import train_vqa
    import inf_vqa
    from uniter_tpu.utils.misc import parse_with_config

    rng = np.random.RandomState(0)
    n_cls = 7
    img_names = [f"coco_{i:06d}.npz" for i in range(n_cls)]
    img_records = {
        n: _img_record(rng, 6, _feat(rng, 6, marker_dims=(30 + i,)))
        for i, n in enumerate(img_names)}
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    recs, t2i = {}, {}
    for i in range(21):
        tid = f"q_{i}"
        cls = i % n_cls
        recs[tid] = dict(input_ids=[150, 151, 152],  # constant text
                         img_fname=img_names[cls],
                         target={"labels": [cls], "scores": [1.0]})
        t2i[tid] = img_names[cls]
    txt_dir = str(tmp_path / "txt")
    write_txt_db(txt_dir, recs, META, t2i)

    out = str(tmp_path / "out")
    argv = [
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--model_config", _model_cfg(tmp_path), "--output_dir", out,
        "--num_answer", str(n_cls),
        "--train_batch_size", "512", "--val_batch_size", "512",
        "--num_train_steps", "150", "--valid_steps", "1000",
        "--warmup_steps", "10", "--learning_rate", "1e-3",
        "--dropout", "0", "--max_bb", "10", "--min_bb", "3",
        "--dtype", "float32", "--seed", "1",
    ]
    state = train_vqa.main(parse_with_config(train_vqa.get_parser(), argv))
    assert int(state.step) == 150

    iargv = inf_vqa.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_dir,
        "--train_dir", out, "--output_dir", str(tmp_path / "inf"),
        "--batch_size", "512",
    ])
    answers = json.load(open(inf_vqa.main(iargv)))
    by_qid = {a["question_id"]: a["answer"] for a in answers}
    correct = sum(by_qid[t] == str(recs[t]["target"]["labels"][0])
                  for t in recs)
    acc = correct / len(recs)
    assert acc >= 0.95, f"VQA did not learn: train acc {acc}"


# --------------------------------------------------------- ITM hard-neg


def test_learn_itm_hard_negatives(tmp_path):
    """Cross-modal binding: text i is the token (110+i) repeated, image i
    carries a one-hot feature marker at dim (20+i). The HN driver must
    learn matched-vs-mismatched; inf_itm R@1 >= 0.9 both directions.

    Runs in a SUBPROCESS on a single-device mesh (the
    single_device_subprocess rationale; this test pre-dates the decorator
    with a bespoke worker because it chains two CLI drivers and parses
    the R@K line from stdout). The multi-device HN path stays covered by
    the short-run smoke e2e tests and __graft_entry__'s dryrun."""
    from uniter_tpu.data import write_img_db, write_txt_db

    rng = np.random.RandomState(0)
    n_img = 8
    img_names = [f"flickr_{i:06d}.npz" for i in range(n_img)]
    img_records = {
        n: _img_record(rng, 6, _feat(rng, 6, marker_dims=(20 + i,)))
        for i, n in enumerate(img_names)}
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=8, min_bb=3)

    recs, t2i = {}, {}
    for i in range(n_img):
        tid = f"cap_{i}"
        recs[tid] = dict(input_ids=[110 + i] * 5, img_fname=img_names[i])
        t2i[tid] = img_names[i]
    txt_dir = str(tmp_path / "txt")
    write_txt_db(txt_dir, recs, META, t2i)

    out = str(tmp_path / "out")
    worker = tmp_path / "hn_worker.py"
    worker.write_text(f"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import train_itm_hard_negatives as hn
import inf_itm
from uniter_tpu.utils.misc import parse_with_config

argv = [
    "--train_txt_db", {txt_dir!r}, "--train_img_db", {img_dir!r},
    "--val_txt_db", {txt_dir!r}, "--val_img_db", {img_dir!r},
    "--model_config", {_model_cfg(tmp_path, hidden=96)!r},
    "--output_dir", {out!r},
    "--negative_size", "7", "--hard_neg_size", "3",
    "--num_train_steps", "800", "--valid_steps", "10000",
    "--warmup_steps", "20", "--learning_rate", "5e-4",
    "--dropout", "0", "--train_batch_size", "4",
    "--max_bb", "8", "--min_bb", "3", "--inf_minibatch_size", "8",
    "--txt_bucket", "16", "--img_bucket", "8",
    "--dtype", "float32", "--seed", "1",
]
state = hn.main(parse_with_config(hn.get_parser(), argv))
assert int(state.step) == 800
logs = inf_itm.main(inf_itm.get_parser().parse_args([
    "--txt_db", {txt_dir!r}, "--img_db", {img_dir!r},
    "--batch_size", "8", "--txt_bucket", "16", "--img_bucket", "8",
    "--txt_tile", "8", "--img_tile", "8", "--dtype", "float32",
    "--train_dir", {out!r}, "--output_dir", {str(tmp_path / 'inf')!r},
]))
print("HN_LOGS " + json.dumps(logs))
""")
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = ""
    proc = subprocess.run([sys.executable, str(worker)], env=env,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("HN_LOGS ")][0]
    logs = json.loads(line[len("HN_LOGS "):])
    assert logs["txt_r1"] >= 0.9, f"ITM did not learn: {logs}"
    assert logs["img_r1"] >= 0.9, f"ITM did not learn: {logs}"


# ------------------------------------------------------------------- RE


@single_device_subprocess
def test_learn_re(tmp_path):
    """Cross-modal pointer: the sentence's token (110+k) names region k,
    region k carries a one-hot marker at dim (100+k) and a disjoint
    vertical-strip box. train_re -> inf_re IoU>0.5 accuracy >= 0.95."""
    from uniter_tpu.data import write_img_db
    from uniter_tpu.data.txt_db import TxtDb
    import train_re
    import inf_re
    from uniter_tpu.utils.misc import parse_with_config

    rng = np.random.RandomState(0)
    n_img, nbb, W, H = 4, 6, 640, 480
    img_records, images = {}, []
    for i in range(n_img):
        iid = 1000 + i
        feats = _feat(rng, nbb)
        for k in range(nbb):
            feats[k, 100 + k] += 4.0  # region identity marker
        # disjoint vertical strips: IoU between different regions is 0
        bb = np.zeros((nbb, 6), np.float16)
        for k in range(nbb):
            bb[k] = [k / nbb, 0.0, (k + 1) / nbb, 1.0, 1 / nbb, 1.0]
        img_records[f"visual_grounding_coco_gt_{iid:012}.npz"] = dict(
            features=feats, norm_bb=bb, conf=np.ones(nbb, np.float16),
            soft_labels=rng.rand(nbb, 1601).astype(np.float16))
        images.append(dict(id=iid, file_name=f"{iid}.jpg",
                           ann_ids=[iid * 10 + k for k in range(nbb)],
                           height=H, width=W))
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=1)

    txt_dir = str(tmp_path / "txt")
    os.makedirs(txt_dir)
    db = TxtDb(txt_dir, readonly=False)
    refs, anns, id2len = [], [], {}
    sid = 0
    for i, img in enumerate(images):
        for k, ann_id in enumerate(img["ann_ids"]):
            anns.append(dict(
                id=ann_id, area=(W // nbb) * H,
                bbox=[k * W / nbb, 0.0, W / nbb, float(H)],  # xywh strip k
                image_id=img["id"], category_id=1, iscrowd=0))
        ref_sents = []
        for k in range(nbb):  # one ref per region
            ids = [110 + k] * 4
            db[str(sid)] = dict(
                sent_id=sid, sent="", ref_id=i * nbb + k,
                ann_id=img["ann_ids"][k], image_id=img["id"],
                bbox=[k * W / nbb, 0.0, W / nbb, float(H)], input_ids=ids)
            id2len[str(sid)] = len(ids)
            ref_sents.append(sid)
            refs.append(dict(ref_id=i * nbb + k, ann_id=img["ann_ids"][k],
                             image_id=img["id"], split="train",
                             sent_ids=[sid], sentences=[]))
            sid += 1
    for name, obj in (("refs", refs), ("annotations", anns),
                      ("categories", [dict(id=1, name="obj",
                                           supercategory="thing")]),
                      ("images", images), ("id2len", id2len),
                      ("meta", META)):
        with open(os.path.join(txt_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f)

    out = str(tmp_path / "out")
    argv = [
        "--train_txt_db", txt_dir, "--train_img_db", img_dir,
        "--val_txt_db", txt_dir, "--val_img_db", img_dir,
        "--model_config", _model_cfg(tmp_path, hidden=96),
        "--output_dir", out,
        "--train_batch_size", "512", "--val_batch_size", "512",
        "--num_train_steps", "800", "--valid_steps", "10000",
        "--warmup_steps", "20", "--learning_rate", "1e-3",
        "--dropout", "0", "--max_bb", "10", "--min_bb", "1",
        "--dtype", "float32", "--seed", "1", "--train_loss", "cls",
    ]
    state = train_re.main(parse_with_config(train_re.get_parser(), argv))
    assert int(state.step) == 800

    iargv = inf_re.get_parser().parse_args([
        "--txt_db", txt_dir, "--img_db", img_dir,
        "--train_dir", out, "--output_dir", str(tmp_path / "inf"),
        "--use_gt_feat", "--batch_size", "512",
    ])
    acc = inf_re.main(iargv)
    assert acc >= 0.95, f"RE did not learn: IoU>0.5 acc {acc}"


# ------------------------------------------------------------- pretrain


@single_device_subprocess
def test_learn_pretrain_mlm_itm(tmp_path):
    """Mixed-task pretraining learns: MLM val loss drops below half its
    init, ITM val accuracy reaches >= 0.85 (reference pretrain.py's
    in-training validation as the oracle)."""
    from uniter_tpu.data import write_img_db, write_txt_db
    import pretrain
    import jax
    from uniter_tpu.utils.misc import parse_with_config

    rng = np.random.RandomState(0)
    n_img = 8
    img_names = [f"coco_{i:06d}.npz" for i in range(n_img)]
    img_records = {
        n: _img_record(rng, 6, _feat(rng, 6, marker_dims=(20 + i,)))
        for i, n in enumerate(img_names)}
    img_dir = str(tmp_path / "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=10, min_bb=3)

    recs, t2i = {}, {}
    for i in range(24):
        tid = f"cap_{i}"
        # identity token ties the caption to its image (ITM learnable);
        # the random tail gives MLM something memorizable per record
        ids = [110 + (i % n_img)] * 3 + [
            int(x) for x in rng.randint(150, 300, 5)]
        recs[tid] = dict(input_ids=ids, img_fname=img_names[i % n_img])
        t2i[tid] = img_names[i % n_img]
    txt_dir = str(tmp_path / "txt")
    write_txt_db(txt_dir, recs, META, t2i)

    def make_opts(steps):
        argv = [
            "--model_config", _model_cfg(tmp_path, hidden=96),
            "--output_dir", str(tmp_path / "out"),
            "--train_batch_size", "512", "--val_batch_size", "512",
            "--num_train_steps", str(steps), "--valid_steps", "100000",
            # the mix was tuned at 1e-3 on the 8-device mesh, where
            # loss_scale="sum" scales the DP gradient by dp; at dp=1 the
            # ITM head needs a larger LR to converge in 800 steps (8e-3,
            # the exact dp=8 step size, destabilizes MLM — 3e-3 trains
            # both)
            "--warmup_steps", "10", "--learning_rate", "3e-3",
            "--dropout", "0", "--max_bb", "10", "--min_bb", "3",
            "--dtype", "float32", "--seed", "1", "--itm_ot_lambda", "0",
        ]
        opts = parse_with_config(pretrain.get_parser(), argv)
        opts.train_datasets = [
            {"name": "synth", "db": txt_dir, "img": img_dir,
             "tasks": ["mlm", "itm"], "mix_ratio": [1, 1]}]
        opts.val_datasets = list(opts.train_datasets)
        return opts

    opts = make_opts(800)
    from uniter_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=-1))
    model, _cfg, params0 = pretrain.build_model_and_params(
        opts, jax.random.PRNGKey(1))
    raw = pretrain.create_dataloaders(opts.val_datasets, opts, mesh,
                                      train=False)
    val_loaders = {name: loader for name, (loader, _r) in raw.items()}
    logs0 = pretrain.validate(model, params0, val_loaders)

    state = pretrain.main(opts)
    assert int(state.step) == 800
    logs1 = pretrain.validate(model, state.params, val_loaders)

    mlm_key = next(k for k in logs1 if k.startswith("mlm")
                   and k.endswith("_acc"))
    itm_key = next(k for k in logs1 if k.startswith("itm")
                   and k.endswith("_acc"))
    # init MLM acc is ~1/vocab; memorization + the cross-modal identity
    # token must lift it far above that
    assert logs1[mlm_key] >= 0.5, (
        f"MLM did not learn: {logs0[mlm_key]} -> {logs1[mlm_key]}")
    assert logs1[itm_key] >= 0.85, f"ITM did not learn: {logs1[itm_key]}"
